package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reusable exact-quantile operator over integer-valued measures, with no
  * per-group value buffers — the scalable replacement for `percentile()`:
  *
  *   count per (group, value) → cumulative window over the value axis →
  *   locate the two order statistics straddling each quantile position →
  *   linear interpolation.
  *
  * Shuffles carry (group, distinct-value) histogram rows, never raw rows;
  * memory per task is one histogram partition. With DYADIC quantile
  * fractions (k/2^m: 0.25, 0.5, 0.75, …) over integer values the
  * interpolation is exact in IEEE double and matches DuckDB's
  * quantile_cont bit-for-bit (type-7 / linear interpolation semantics).
  */
object Quantiles {

  /** Long-format exact quantiles: one row per (group, q) with the
    * interpolated value and the group count. `valueCol` must be
    * integer-valued (cast upstream); `qs` should be dyadic for bit-exact
    * cross-engine results. */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String],
                     valueCol: Column, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty)
    val g = groupCols.map(col)
    val hist = df.groupBy(g :+ valueCol.as("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(g: _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__lo", col("__cum") - col("__cnt"))
    val pos = hist.groupBy(g: _*)
      .agg(sum(col("__cnt")).as("n"))
      .select(g ++ Seq(col("n"),
        explode(array(qs.map(lit): _*)).as("q")): _*)
      .withColumn("__p", (col("n") - 1).cast("double") * col("q"))
      .withColumn("__kf", floor(col("__p")).cast("long"))
      .withColumn("__kc", ceil(col("__p")).cast("long"))
    def groupEq = groupCols
      .map(c => col(s"p.$c") === col(s"c.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    def valueAt(k: Column, name: String) =
      pos.as("p").join(cum.as("c"),
        groupEq && col("c.__lo") <= k && k < col("c.__cum"))
        .select(groupCols.map(c => col(s"p.$c").as(c)) ++ Seq(
          col("p.q").as("q"), col("p.n").as("n"), col("p.__p").as("__p"),
          col("p.__kf").as("__kf"), col("c.__v").as(name)): _*)
    val lower = valueAt(col("p.__kf"), "__vlo")
    val upper = valueAt(col("p.__kc"), "__vhi")
      .select(groupCols.map(col) ++ Seq(col("q"), col("__vhi")): _*)
    lower.join(upper, groupCols :+ "q")
      .select(groupCols.map(col) ++ Seq(col("q"), col("n"),
        (col("__vlo").cast("double") +
          (col("__vhi") - col("__vlo")).cast("double") *
            (col("__p") - col("__kf").cast("double"))).as("quant")): _*)
  }

  /** Doc-length quartiles per language — the quantile operator applied to
    * the corpus length distribution (the report behind length-filter
    * thresholds in curation). */
  def lenQuantiles(spark: org.apache.spark.sql.SparkSession,
                   dir: String): DataFrame = {
    val docs = Star.table(spark, dir, "documents")
    exactQuantiles(docs, Seq("lang"), col("n_chars"),
      Seq(0.25, 0.5, 0.75))
      .groupBy("lang")
      .agg(max(when(col("q") === 0.25, col("quant"))).as("p25"),
        max(when(col("q") === 0.5, col("quant"))).as("p50"),
        max(when(col("q") === 0.75, col("quant"))).as("p75"),
        max(col("n")).as("n_docs"))
      .orderBy("lang")
  }

  private val lenQuantilesSql =
    """SELECT lang,
      |  quantile_cont(n_chars, 0.25) AS p25,
      |  quantile_cont(n_chars, 0.5) AS p50,
      |  quantile_cont(n_chars, 0.75) AS p75,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  val defs: Seq[graft.QueryDef] = Seq(
    graft.QueryDef("q_len_quantiles", lenQuantiles, Some(lenQuantilesSql)),
  )
}
