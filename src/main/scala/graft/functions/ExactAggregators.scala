package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
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
}
