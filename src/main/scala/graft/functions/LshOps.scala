package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH band keys as ONE codegen'd expression.
  *
  * The dataflow formulation (posexplode the 64-dim vector, join a
  * broadcast plane table, re-aggregate 16 projections per vector) puts
  * numPlanes x dim intermediate ROWS on the wire per vector — 5M rows at
  * sf0.1 — before the per-vector sign/band arithmetic even starts. The
  * hyperplane weights are pseudo-random from xxhash64 (seed 42, the SQL
  * function's default — identical to the plane-table derivation:
  * weight(plane, pos) = (pmod(xxhash64(plane*dim + pos), 2000001) - 1e6)
  * / 1e6), so nothing needs to be materialized or shipped at all: each
  * vector computes its numPlanes projections in a tight JIT'd loop and
  * packs sign bits into numBands band buckets in place. Projection
  * summation is fixed index order (deterministic, partitioning-proof,
  * unlike the aggregate-based sum).
  */
object LshOps {
  /** Must stay bit-identical to the SQL derivation
    * `(pmod(xxhash64(id), 2000001) - 1000000) / 1000000.0`. */
  def weight(id: Long): Double =
    (java.lang.Math.floorMod(XXH64.hashLong(id, 42L), 2000001L) -
      1000000L) / 1000000.0

  def bands(v: ArrayData, numPlanes: Int, numBands: Int): ArrayData = {
    val dim = v.numElements()
    val perBand = numPlanes / numBands
    val out = new Array[Long](numBands)
    var p = 0
    while (p < numPlanes) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        s += v.getDouble(i) * weight(p.toLong * dim + i)
        i += 1
      }
      if (s > 0) out(p / perBand) |= (1L << (p % perBand))
      p += 1
    }
    ArrayData.toArrayData(out)
  }
}

case class LshBands(child: Expression, numPlanes: Int, numBands: Int)
    extends UnaryExpression {
  require(numPlanes % numBands == 0,
    s"numPlanes ($numPlanes) must be a multiple of numBands ($numBands)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_bands"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bands expects ARRAY<DOUBLE>, got ${t.sql}")
    }

  override protected def nullSafeEval(v: Any): Any =
    LshOps.bands(v.asInstanceOf[ArrayData], numPlanes, numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.LshOps.bands($v, $numPlanes, $numBands)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshFunctions {
  def lshBands(v: Column, numPlanes: Int, numBands: Int): Column =
    Bridge.column(LshBands(Bridge.expression(v), numPlanes, numBands))
}
