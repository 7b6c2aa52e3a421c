package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The portable polynomial codepoint fold behind the oracle-checkable
  * sketch family (MinHash/SimHash base hash — see `Dedup.scala`,
  * "portable sketch-hash family"): H(s) = fold over codepoints of
  * (acc * B + cp) % P with 30-bit prime P, bit-identical to the DuckDB
  * derivation `list_reduce(list_prepend(0, list_transform(
  * string_split(s, ''), c -> unicode(c))), (acc, c) -> (acc*B + c) % P)`.
  *
  * As a native codegen `Expression` the fold runs as one tight JIT'd
  * loop over the UTF8String's codepoints; the first cut used Spark's
  * `aggregate(filter(split(s, '')))` higher-order chain, which evaluates
  * interpreted AND materializes a per-char array per row — measured ~2x
  * on the sketch queries' map side. */
object HashOps {
  def polyFold(s: UTF8String, b: Long, p: Long): Long = {
    var acc = 0L
    val it = s.codePointIterator()
    while (it.hasNext) {
      acc = (acc * b + it.next()) % p
    }
    acc
  }
}

case class PolyHash(child: Expression, b: Long, p: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType ||
        child.dataType == org.apache.spark.sql.types.NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    HashOps.polyFold(v.asInstanceOf[UTF8String], b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashOps.polyFold($c, ${b}L, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  def polyHash(c: Column, b: Long, p: Long): Column =
    Bridge.column(PolyHash(Bridge.expression(c), b, p))
}
