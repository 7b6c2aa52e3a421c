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
    * cross-engine results.
    *
    * Single-pass plan: ONE scan -> histogram group-by (one shuffle) ->
    * one sorted window pass attaching both the running count and the
    * group total (same partitioning, same sort — Catalyst plans one
    * Sort + one Window) -> each row decides locally whether it is the
    * floor/ceil order statistic of some q -> a vocabulary-sized final
    * aggregate. An earlier formulation derived the positions and the two
    * straddling values with separate aggregate + two range joins, which
    * re-computed the histogram three times and scanned it twice more —
    * measured ~3x slower at sf0.1.
    *
    * The cumulative count is a TWO-LEVEL prefix sum, not one window per
    * group: near-unique measures (prices) make the histogram nearly as
    * large as the data, and a per-group window would sort it in
    * #groups tasks. Instead each value lands in an order-preserving
    * coarse bucket (arithmetic shift — floor-division by 2^16, monotone
    * for negatives too); the local cumulative sorts within (group,
    * bucket) in parallel, and bucket totals (a groups x buckets relation
    * — tiny, broadcast) prefix into per-bucket offsets. local + offset =
    * the exact global running count, with the sort fanned across every
    * core / executor regardless of group count. */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String],
                     valueCol: Column, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty)
    val g = groupCols.map(col)
    // one exchange total on the histogram path: the explicit repartition
    // on (group, bucket) satisfies BOTH the histogram grouping (its keys
    // are a functional superset) and the local window's clustering, so
    // the aggregate and the sort run partition-local with no further
    // shuffle of histogram rows
    val hist = df
      .repartition(g :+ shiftright(valueCol, 16): _*)
      .groupBy(g ++ Seq(shiftright(valueCol, 16).as("__b"),
        valueCol.as("__v")): _*)
      .agg(count(lit(1)).as("__cnt"))
    val bKeys = groupCols :+ "__b"
    val wLoc = Window.partitionBy(bKeys.map(col): _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wOff = Window.partitionBy(g: _*).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // offsets come from the RAW side, not from hist: deriving them from
    // hist would duplicate the expensive histogram aggregate into both
    // plan branches (Catalyst does not share subplans). The raw-side
    // group-by collapses map-side to groups x buckets — its shuffle is
    // a few hundred rows, so this branch costs one extra scan, not a
    // second histogram build. (r16 re-probed the alternative — pin hist
    // with localCheckpoint and derive offsets from it: WORSE, 2.30 ->
    // 2.66 s same-window over the three quantile queries at sf0.1; the
    // histogram is near-data-sized for near-unique measures, so its
    // materialization costs more than the extra serial scan. A second
    // r16 probe — repartition the offs branch identically so
    // ReuseExchange shares the hist shuffle — also measured worse,
    // 2.26 -> 2.38 s same-window: the offs branch then consumes the
    // FULL-ROW shuffle where its map-side partial aggregation needed
    // only groups × buckets rows.)
    val offs = df.groupBy(
        g :+ shiftright(valueCol, 16).as("__b"): _*)
      .agg(count(lit(1)).as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("__bt")).over(wAll))
      .select(bKeys.map(col) :+ col("__off") :+ col("n"): _*)
    val cum = hist
      .withColumn("__lcum", sum(col("__cnt")).over(wLoc))
      .join(broadcast(offs), bKeys)
      .withColumn("__cum", col("__lcum") + col("__off"))
      .withColumn("__lo", col("__cum") - col("__cnt"))
    val straddle = cum
      .select(g ++ Seq(col("__v"), col("__cum"), col("__lo"), col("n"),
        explode(array(qs.map(lit): _*)).as("q")): _*)
      .withColumn("__p", (col("n") - 1).cast("double") * col("q"))
      .withColumn("__kf", floor(col("__p")).cast("long"))
      .withColumn("__kc", ceil(col("__p")).cast("long"))
      // discrete (type-1) position: the ceil(q*n)-th order statistic,
      // DuckDB quantile_disc's convention (dyadic q x integer n is exact
      // in double, so ceil agrees across engines)
      .withColumn("__kd",
        greatest(ceil(col("q") * col("n")) - 1, lit(0L)).cast("long"))
      .filter((col("__lo") <= col("__kf") && col("__kf") < col("__cum")) ||
        (col("__lo") <= col("__kc") && col("__kc") < col("__cum")) ||
        (col("__lo") <= col("__kd") && col("__kd") < col("__cum")))
    straddle
      .groupBy(g :+ col("q"): _*)
      .agg(max(col("n")).as("n"), max(col("__p")).as("__p"),
        max(col("__kf")).as("__kf"),
        max(when(col("__lo") <= col("__kf") && col("__kf") < col("__cum"),
          col("__v"))).as("__vlo"),
        max(when(col("__lo") <= col("__kc") && col("__kc") < col("__cum"),
          col("__v"))).as("__vhi"),
        max(when(col("__lo") <= col("__kd") && col("__kd") < col("__cum"),
          col("__v"))).as("__vd"))
      .select(groupCols.map(col) ++ Seq(col("q"), col("n"),
        (col("__vlo").cast("double") +
          (col("__vhi") - col("__vlo")).cast("double") *
            (col("__p") - col("__kf").cast("double"))).as("quant"),
        // discrete quantile rides the same histogram pass
        col("__vd").as("quant_disc")): _*)
  }

  /** Per-priority discrete quartiles of the order value — the
    * quantile_disc twin of q_percentiles, sharing the single-exchange
    * histogram plan (an actual member of the sorted multiset, the form
    * needed when the measure is categorical-coded or must be exact). */
  def quantileDisc(spark: org.apache.spark.sql.SparkSession,
                   dir: String): DataFrame = {
    val o = Star.table(spark, dir, "orders")
    exactQuantiles(o, Seq("o_orderpriority"),
      Star.cents(col("o_totalprice")), Seq(0.25, 0.5, 0.75))
      .groupBy("o_orderpriority")
      .agg(max(when(col("q") === 0.25, col("quant_disc"))).as("p25_c"),
        max(when(col("q") === 0.5, col("quant_disc"))).as("p50_c"),
        max(when(col("q") === 0.75, col("quant_disc"))).as("p75_c"),
        max(col("n")).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  private val quantileDiscSql =
    s"""SELECT o_orderpriority,
       |  quantile_disc(${Star.Sql.cents("o_totalprice")}, 0.25) AS p25_c,
       |  quantile_disc(${Star.Sql.cents("o_totalprice")}, 0.5) AS p50_c,
       |  quantile_disc(${Star.Sql.cents("o_totalprice")}, 0.75) AS p75_c,
       |  COUNT(*) AS n_orders
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

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
    graft.QueryDef("q_quantile_disc", quantileDisc, Some(quantileDiscSql)),
  )
}
