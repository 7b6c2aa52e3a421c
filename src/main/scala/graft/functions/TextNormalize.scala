package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent/diacritic stripping — a text-normalization scalar Spark lacks
  * natively (DuckDB ships `strip_accents`). CANONICAL decomposition (NFD)
  * then drop combining marks: 'São Paulo' -> 'Sao Paulo'. NFD, not NFKD:
  * DuckDB's strip_accents is utf8proc canonical decompose+stripmark, so
  * compatibility characters (NBSP, ligatures, '²') pass through unchanged
  * in both engines — NFKD here would silently break oracle bit-parity on
  * any corpus containing them. Catalyst `Expression` with codegen (static
  * call), not a UDF. */
object AccentStrip {
  private val marks = java.util.regex.Pattern.compile("\\p{M}+")

  def strip(s: UTF8String): UTF8String = {
    val norm = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    UTF8String.fromString(marks.matcher(norm).replaceAll(""))
  }
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType ||
        child.dataType == org.apache.spark.sql.types.NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    AccentStrip.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AccentStrip.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalize {
  /** strip_accents as a Column function. */
  def stripAccents(c: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(c)))

  /** Canonical text-normalization pipeline for corpus preprocessing:
    * accent-strip -> lowercase -> collapse whitespace -> trim. All
    * codegen'd scalar expressions. */
  def normalize(c: Column): Column = {
    import org.apache.spark.sql.functions._
    trim(regexp_replace(lower(stripAccents(c)), "\\s+", " "))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strip_accents",
      exprs => exprs match {
        case Seq(e) => StripAccents(e)
        case _ => throw new IllegalArgumentException("strip_accents(text)")
      },
      "scala_udf")
}
