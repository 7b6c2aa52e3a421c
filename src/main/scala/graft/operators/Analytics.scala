package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytics-engine completeness batch: pivot, string-function suite,
  * date arithmetic, exact percentiles, and statistical sketches.
  *
  * Percentile portability note: the oracle-checked percentiles use DYADIC
  * fractions (0.25/0.5/0.75) over exact integer cents — linear
  * interpolation with a power-of-two fraction over integers is exact in
  * IEEE double no matter how the engine factors the formula, so Spark's
  * `percentile` and DuckDB's `quantile_cont` agree bit-for-bit. Variance/
  * correlation/HLL sketches have engine-specific accumulation orders and
  * are registered rows-only. */
object Analytics {

  /** Wide pivot: order counts per priority x status (fixed value list —
    * the scalable form: no extra pass to discover pivot values). */
  def pivotOrders(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("o_orderpriority")

  private val pivotOrdersSql =
    """SELECT o_orderpriority,
      |  COUNT_IF(o_orderstatus = 'F') AS F,
      |  COUNT_IF(o_orderstatus = 'O') AS O,
      |  COUNT_IF(o_orderstatus = 'P') AS P
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** String-function suite over customer names. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "customer")
      .select(
        col("c_custkey"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("segment_tr"),
        levenshtein(col("c_mktsegment"), lit("MACHINERY")).as("lev_machinery"),
        length(col("c_name")).cast("long").as("name_len"))
      .orderBy("c_custkey")

  private val stringFuncsSql =
    """SELECT c_custkey,
      |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
      |  substring(c_name, 1, 8) AS name_prefix,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS segment_tr,
      |  CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS lev_machinery,
      |  CAST(length(c_name) AS BIGINT) AS name_len
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Date arithmetic suite over distinct order months: month shifts with
    * end-of-month clamping, last_day, day difference, month truncation. */
  def dateMath(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "orders")
      .select(col("o_orderdate").cast("date").as("d")).distinct()
      .select(
        col("d"),
        add_months(col("d"), 1).as("plus_month"),
        last_day(col("d")).as("month_end"),
        datediff(col("d"), lit("1995-01-01").cast("date")).cast("long")
          .as("days_since_epoch_start"),
        date_trunc("month", col("d")).cast("date").as("month_start"))
      .orderBy("d")

  private val dateMathSql =
    """SELECT d,
      |  (d + INTERVAL 1 MONTH)::DATE AS plus_month,
      |  last_day(d) AS month_end,
      |  CAST(date_diff('day', DATE '1995-01-01', d) AS BIGINT)
      |    AS days_since_epoch_start,
      |  date_trunc('month', d)::DATE AS month_start
      |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
      |ORDER BY d""".stripMargin

  /** Exact quartiles of extended price (cents domain, dyadic fractions). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "lineitem")
      .withColumn("price_c", Star.cents(col("l_extendedprice")))
      .groupBy("l_returnflag")
      .agg(
        (expr("percentile(price_c, 0.25)") / 100.0).as("p25"),
        (expr("percentile(price_c, 0.5)") / 100.0).as("p50"),
        (expr("percentile(price_c, 0.75)") / 100.0).as("p75"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  private val percentilesSql =
    s"""SELECT l_returnflag,
       |  quantile_cont(${Star.Sql.cents("l_extendedprice")}, 0.25) / 100.0 AS p25,
       |  quantile_cont(${Star.Sql.cents("l_extendedprice")}, 0.5) / 100.0 AS p50,
       |  quantile_cont(${Star.Sql.cents("l_extendedprice")}, 0.75) / 100.0 AS p75,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Statistical sketches (rows-only: accumulation order is
    * engine-specific): HLL distinct estimate, sample stddev/variance,
    * price-discount correlation, skewness. */
  def statsSketch(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        stddev_samp(col("l_extendedprice")).as("price_stddev"),
        var_samp(col("l_extendedprice")).as("price_var"),
        corr(col("l_extendedprice"), col("l_discount")).as("price_disc_corr"),
        skewness(col("l_extendedprice")).as("price_skew"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Top-3 events per user through the custom TopKPerGroup physical
    * operator (graft.plans) — proving the partial-heap plan produces
    * oracle-exact results. The oracle is the plain window formulation. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup.topK(
      Star.events(spark, dir).select("user_id", "event_id", "value"),
      Seq("user_id"), Seq(("value", true), ("event_id", false)), 3)
      .orderBy(col("user_id"), col("value").desc, col("event_id"))

  private val topkPerGroupSql =
    """SELECT user_id, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY value DESC, event_id) AS rn
      |  FROM events) t
      |WHERE rn <= 3
      |ORDER BY user_id, value DESC, event_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_topk_per_group", topkPerGroup, Some(topkPerGroupSql)),
    QueryDef("q_pivot", pivotOrders, Some(pivotOrdersSql)),
    QueryDef("q_string_funcs", stringFuncs, Some(stringFuncsSql)),
    QueryDef("q_date_math", dateMath, Some(dateMathSql)),
    QueryDef("q_percentiles", percentiles, Some(percentilesSql)),
    QueryDef("q_stats_sketch", statsSketch, None),
  )
}
