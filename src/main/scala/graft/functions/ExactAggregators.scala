package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` UDAFs with exact integer accumulation — the
  * Dataset-API extension point for aggregates the built-ins can't express
  * exactly. Buffers are flat case classes (Tungsten-encoded, spill-safe);
  * `finish` may use arbitrary-precision math since it runs once per group.
  */
object ExactAggregators {

  final case class WSum(var w: Long, var wx: Long)

  /** Exact weighted mean of an integer measure: Σ(w·x)/Σw with the
    * engine-portable 1e-6 floor quantization (the BigInt widening in
    * `finish` keeps the ×1e6 scaling exact where a double or long would
    * overflow). Input: (weight, x). */
  object WeightedMean extends Aggregator[(Long, Long), WSum, Double] {
    def zero: WSum = WSum(0L, 0L)
    def reduce(b: WSum, a: (Long, Long)): WSum = {
      b.w += a._1; b.wx += a._1 * a._2; b
    }
    def merge(x: WSum, y: WSum): WSum = { x.w += y.w; x.wx += y.wx; x }
    def finish(r: WSum): Double =
      if (r.w == 0L) Double.NaN
      else (BigInt(r.wx) * 1000000 / BigInt(r.w)).toDouble / 1e6
    def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-API form: `weightedMean(weightCol, xCol)`. */
  val weightedMean: (Column, Column) => Column = {
    val f = udaf(WeightedMean, Encoders.product[(Long, Long)])
    (w, x) => f(w, x)
  }

  /** Exact element-wise sum of equal-length Long arrays, kept PACKED
    * through the whole aggregation tree. Partial aggregation applies:
    * each map task folds its rows into one array per group, so a
    * groupBy(key).agg(vecSum(arr)) shuffles (partitions × groups)
    * arrays instead of (rows × dims) exploded elements — the update
    * half of the k-means iteration drops from an n·d-row exchange to a
    * k-array one. Addition is associative/commutative in exact Long
    * arithmetic, so the result is partitioning-independent. */
  object VecSum extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], a: Array[Long]): Array[Long] =
      if (a == null) b
      else if (b.isEmpty) a.clone
      else { var i = 0; while (i < b.length) { b(i) += a(i); i += 1 }; b }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else { var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Column-API form: `vecSum(arrCol)` — arrCol: ARRAY<BIGINT>. */
  val vecSum: Column => Column = {
    val f = udaf(VecSum, ExpressionEncoder[Array[Long]]())
    v => f(v)
  }
}
