package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH band keys as ONE codegen'd expression.
  *
  * The dataflow formulation (posexplode the 64-dim vector, join a
  * broadcast plane table, re-aggregate 16 projections per vector) puts
  * numPlanes x dim intermediate ROWS on the wire per vector — 5M rows at
  * sf0.1 — before the per-vector sign/band arithmetic even starts. The
  * hyperplane weights are pseudo-random from a PORTABLE two-round
  * integer mix (weights in [-1, 1] at 1e-6 resolution — identical to the
  * plane-table derivation [[graft.operators.Similarity.planes]] and to
  * the DuckDB oracle, which computes the same closed form; every
  * intermediate product stays under 2^61 so both engines are exact
  * int64, and the final /1e6 is one correctly-rounded IEEE division), so
  * nothing needs to be materialized or shipped at all: each vector
  * computes its numPlanes projections in a tight JIT'd loop and packs
  * sign bits into numBands band buckets in place. Projection summation
  * is fixed index order (deterministic, partitioning-proof, unlike the
  * aggregate-based sum).
  */
object LshOps {
  /** Must stay bit-identical to the SQL derivation in
    * [[graft.operators.Similarity.planes]] and the q_ann_lsh oracle.
    * Affine rounds alone leave a lattice (consecutive ids differ by a
    * fixed stride — measured LSH recall collapsed); the two modular
    * SQUARINGS break the linearity while every product stays < 2^61
    * (operands < 2^30), so both engines remain in exact int64. */
  def weight(id: Long): Double = {
    val m1 = (id * 2048144789L + 1000003L) % 1000000007L
    val m2 = (m1 * m1) % 1000000007L
    val m3 = (m2 * 69069L + id) % 999999937L
    val m4 = (m3 * m3) % 999999937L
    (m4 % 2000001L - 1000000L) / 1000000.0
  }

  /** The full plane table is numPlanes x dim doubles (16x64 or 64x64 —
    * a few KB): memoized per JVM so the hot loop multiplies against a
    * flat array instead of re-deriving the mix per element (the 4-mod
    * derivation per (plane, dim) call measured ~4x on the band step). */
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  private def weightsFor(numPlanes: Int, dim: Int): Array[Double] =
    weightCache.computeIfAbsent((numPlanes, dim),
      { case (np2, d) => Array.tabulate(np2 * d)(i => weight(i.toLong)) })

  def bands(v: ArrayData, numPlanes: Int, numBands: Int): ArrayData = {
    val dim = v.numElements()
    val perBand = numPlanes / numBands
    val w = weightsFor(numPlanes, dim)
    val out = new Array[Long](numBands)
    var p = 0
    while (p < numPlanes) {
      var s = 0.0
      var i = 0
      val base = p * dim
      while (i < dim) {
        s += v.getDouble(i) * w(base + i)
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
