package graft.operators

import graft.QueryDef
import graft.inmet.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Star.{dsum, dsumX, davgX, davgNonNullX}

/** Core relational operator inventory (SURVEY.md §2) expressed over the
  * harness star schema, one registered query per operator family, each with
  * a DuckDB oracle. Conventions for oracle-stable output:
  *   - every float aggregate uses the exact-sum helpers — Star.dsumX/davgX
  *     (codegen split-accumulator) for raw ≤2-decimal money / integer-ish
  *     columns, Star.dsum/davg (decimal) where the input is an arbitrary
  *     computed double (the events `value` column);
  *   - every result carries a total order (unique tiebreak column);
  *   - derived integer parts are cast to BIGINT to match DuckDB result types.
  *
  * Scale notes are per-query in the scaladoc; the common themes: filters are
  * plain column predicates (parquet-pushed), dimension joins are broadcast,
  * and aggregations rely on Catalyst's partial->final HashAggregate so only
  * group cardinality crosses the shuffle.
  */
object Relational {

  /** A2/TPC-H-Q1-style wide aggregate: scan-heavy, map-side partial agg; at
    * 100 TB the shuffle carries only |returnflag x linestatus| = 6 groups per
    * partition. Filter is pushed into the parquet scan. */
  def aggPricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Star.table(spark, dir, "lineitem")
    // Exact cents-domain products: money columns carry exactly 2 decimals,
    // so (price_cents * (100-disc_pct) * (100+tax_pct)) is pure integer
    // arithmetic — order-independent and engine-portable, unlike summing
    // double products.
    val pc = Star.cents(col("l_extendedprice"))
    val dc = Star.cents(col("l_discount"))
    val tc = Star.cents(col("l_tax"))
    // NO fan-out here: a repartition before a reducible group-by ships raw
    // rows where 6-group partials would do — measured a wash locally (the
    // one-task shuffle write replaces the one-task partial agg) and an
    // anti-pattern on a real multi-split table.
    li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsumX(col("l_quantity")).as("sum_qty"),
        dsumX(col("l_extendedprice")).as("sum_base_price"),
        (sum(pc * (lit(100L) - dc)).cast("double") / 1e4).as("sum_disc_price"),
        (sum(pc * (lit(100L) - dc) * (lit(100L) + tc)).cast("double") / 1e6)
          .as("sum_charge"),
        davgX(col("l_quantity")).as("avg_qty"),
        davgX(col("l_extendedprice")).as("avg_price"),
        davgX(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val aggPricingSql = {
    val pc = Star.Sql.cents("l_extendedprice")
    val dc = Star.Sql.cents("l_discount")
    val tc = Star.Sql.cents("l_tax")
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Star.Sql.dsumX("l_quantity")} AS sum_qty,
       |  ${Star.Sql.dsumX("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM($pc * (100 - $dc)) AS DOUBLE) / 1e4 AS sum_disc_price,
       |  CAST(SUM($pc * (100 - $dc) * (100 + $tc)) AS DOUBLE) / 1e6 AS sum_charge,
       |  ${Star.Sql.davgX("l_quantity")} AS avg_qty,
       |  ${Star.Sql.davgX("l_extendedprice")} AS avg_price,
       |  ${Star.Sql.davgX("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  /** A1: whole-table scalar min/max/count (the calendar-bounds pattern). */
  def scalarMinmax(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "orders")
      .agg(
        min(col("o_orderdate").cast("date")).as("d_min"),
        max(col("o_orderdate").cast("date")).as("d_max"),
        count(lit(1)).as("n"))

  private val scalarMinmaxSql =
    """SELECT CAST(MIN(o_orderdate) AS DATE) AS d_min,
      |  CAST(MAX(o_orderdate) AS DATE) AS d_max, COUNT(*) AS n
      |FROM orders""".stripMargin

  /** J1: fact x small dim with an explicit broadcast hint — no shuffle of
    * the fact side at any scale. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val li = Star.table(spark, dir, "lineitem")
    val part = Star.table(spark, dir, "part")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_items"),
        dsumX(col("l_quantity")).as("sum_qty"),
        (sum(Star.cents(col("l_extendedprice"))
          * (lit(100L) - Star.cents(col("l_discount")))).cast("double") / 1e4)
          .as("revenue"))
      .orderBy("p_brand")
  }

  private val joinBroadcastSql =
    s"""SELECT p_brand, COUNT(*) AS n_items,
       |  ${Star.Sql.dsumX("l_quantity")} AS sum_qty,
       |  CAST(SUM(${Star.Sql.cents("l_extendedprice")}
       |    * (100 - ${Star.Sql.cents("l_discount")})) AS DOUBLE) / 1e4 AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand
       |ORDER BY p_brand""".stripMargin

  /** J2/J3: snowflaked multi-join (orders x customer x nation x region),
    * dims broadcast, one shuffle for the final group-by. */
  def joinMulti(spark: SparkSession, dir: String): DataFrame = {
    val o = Star.table(spark, dir, "orders")
    val c = Star.table(spark, dir, "customer")
    val n = Star.table(spark, dir, "nation")
    val r = Star.table(spark, dir, "region")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"),
        year(col("o_orderdate")).cast("long").as("ano"))
      .agg(
        dsumX(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name", "ano")
  }

  private val joinMultiSql =
    s"""SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS ano,
       |  ${Star.Sql.dsumX("o_totalprice")} AS revenue, COUNT(*) AS n_orders
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, CAST(year(o_orderdate) AS BIGINT)
       |ORDER BY r_name, ano""".stripMargin

  /** A3's avg-of-avgs keystone: daily aggregate re-aggregated monthly —
    * the two-level pipeline must NOT collapse into a single hourly avg. */
  def twoLevelAgg(spark: SparkSession, dir: String): DataFrame = {
    // Fixed-point two-level aggregate: daily totals as exact integer cents,
    // daily averages floor-quantized at 1e-4 dollars (exact integer
    // division), so the monthly avg-of-avgs is bit-stable across engines
    // and partitionings.
    val daily = Star.table(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("data"))
      .agg(sum(Star.cents(col("o_totalprice"))).as("total_c"),
        count(lit(1)).as("n"))
      .withColumn("avg_u", Star.idiv(col("total_c") * 100L, col("n")))
    daily
      .groupBy(year(col("data")).cast("long").as("ano"),
        month(col("data")).cast("long").as("mes"))
      .agg(
        (Star.idiv(sum(col("avg_u")), count(lit(1))).cast("double") / 1e4)
          .as("mensal_avg_of_daily"),
        (sum(col("total_c")).cast("double") / 100.0).as("mensal_total"),
        count(when(col("total_c") > 10000000L, 1)).as("dias_altos"))
      .orderBy("ano", "mes")
  }

  private val twoLevelAggSql =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS data,
       |    SUM(${Star.Sql.cents("o_totalprice")}) AS total_c, COUNT(*) AS n
       |  FROM orders GROUP BY 1),
       |d2 AS (SELECT data, total_c, (total_c * 100) // n AS avg_u FROM daily)
       |SELECT CAST(year(data) AS BIGINT) AS ano, CAST(month(data) AS BIGINT) AS mes,
       |  CAST(SUM(avg_u) // COUNT(*) AS DOUBLE) / 1e4 AS mensal_avg_of_daily,
       |  CAST(SUM(total_c) AS DOUBLE) / 100.0 AS mensal_total,
       |  CAST(COUNT_IF(total_c > 10000000) AS BIGINT) AS dias_altos
       |FROM d2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** F9: surrogate-key construction (CONCAT/TRIM/UPPER/COALESCE). */
  def surrogateKey(spark: SparkSession, dir: String): DataFrame = {
    def part(c: String) = trim(upper(coalesce(col(c), lit(""))))
    Star.table(spark, dir, "customer")
      .select(
        concat(part("c_mktsegment"), lit("-"), col("c_custkey").cast("string"))
          .as("sk"),
        col("c_name"), col("c_acctbal"))
      .orderBy("sk")
  }

  private val surrogateKeySql =
    """SELECT CONCAT(TRIM(UPPER(COALESCE(c_mktsegment, ''))), '-',
      |              CAST(c_custkey AS VARCHAR)) AS sk,
      |  c_name, c_acctbal
      |FROM customer
      |ORDER BY sk""".stripMargin

  /** F10: date-part extraction (ISO week semantics in both engines). */
  def dateparts(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "orders")
      .select(col("o_orderdate").cast("date").as("data")).distinct()
      .select(col("data"),
        dayofmonth(col("data")).cast("long").as("dia"),
        month(col("data")).cast("long").as("mes"),
        year(col("data")).cast("long").as("ano"),
        quarter(col("data")).cast("long").as("quartil"),
        weekofyear(col("data")).cast("long").as("semana_do_ano"))
      .orderBy("data")

  private val datepartsSql =
    """SELECT data, CAST(dayofmonth(data) AS BIGINT) AS dia,
      |  CAST(month(data) AS BIGINT) AS mes, CAST(year(data) AS BIGINT) AS ano,
      |  CAST(quarter(data) AS BIGINT) AS quartil,
      |  CAST(weekofyear(data) AS BIGINT) AS semana_do_ano
      |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS data FROM orders)
      |ORDER BY data""".stripMargin

  /** G1: dense gap-free calendar via sequence+explode — the generation
    * stays in the plan; no driver collect even for the min/max bounds. */
  def calendar(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "orders")
      .agg(min(col("o_orderdate").cast("date")).as("mn"),
        max(col("o_orderdate").cast("date")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("data"))
      .select(col("data"),
        dayofmonth(col("data")).cast("long").as("dia"),
        month(col("data")).cast("long").as("mes"),
        year(col("data")).cast("long").as("ano"),
        quarter(col("data")).cast("long").as("quartil"),
        weekofyear(col("data")).cast("long").as("semana_do_ano"))
      .orderBy("data")

  private val calendarSql =
    """WITH mm AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS mn,
      |                   CAST(MAX(o_orderdate) AS DATE) AS mx FROM orders),
      |d AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS data
      |      FROM mm)
      |SELECT data, CAST(dayofmonth(data) AS BIGINT) AS dia,
      |  CAST(month(data) AS BIGINT) AS mes, CAST(year(data) AS BIGINT) AS ano,
      |  CAST(quarter(data) AS BIGINT) AS quartil,
      |  CAST(weekofyear(data) AS BIGINT) AS semana_do_ano
      |FROM d ORDER BY data""".stripMargin

  /** U1/U2: schema-aligned union of two sources. */
  def unionParties(spark: SparkSession, dir: String): DataFrame = {
    val c = Star.table(spark, dir, "customer").select(
      lit("customer").as("kind"), col("c_name").as("name"),
      col("c_nationkey").as("nationkey"), col("c_acctbal").as("acctbal"))
    val s = Star.table(spark, dir, "supplier").select(
      lit("supplier").as("kind"), col("s_name").as("name"),
      col("s_nationkey").as("nationkey"), col("s_acctbal").as("acctbal"))
    c.unionByName(s).orderBy("kind", "name")
  }

  private val unionPartiesSql =
    """SELECT 'customer' AS kind, c_name AS name, c_nationkey AS nationkey,
      |       c_acctbal AS acctbal FROM customer
      |UNION ALL
      |SELECT 'supplier', s_name, s_nationkey, s_acctbal FROM supplier
      |ORDER BY kind, name""".stripMargin

  /** F5: decimal-comma numeral parse (the INMET cleansing scalar), driven
    * through the same `Ingest.commaDouble` expression the pipeline uses. */
  def commaDecimal(spark: SparkSession, dir: String): DataFrame = {
    // fan BEFORE the parse: per-row string format + comma-decimal parse
    // dominates this query (the single-split local scan would run it all
    // on one core — measured 1.4 s -> 0.8 s at sf0.1); the group-by then
    // reduces 3 partial rows per partition, so the added exchange is noise
    val li = Star.fan(spark, Star.table(spark, dir, "lineitem"))
    val s = concat(col("l_quantity").cast("int").cast("string"), lit(","),
      col("l_linenumber").cast("string"))
    li.select(col("l_returnflag"), Ingest.commaDouble(s).as("v"))
      .groupBy("l_returnflag")
      .agg(dsumX(col("v")).as("sum_parsed"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  private val commaDecimalSql =
    s"""WITH t AS (
       |  SELECT l_returnflag,
       |    CAST(REPLACE(CONCAT(CAST(CAST(l_quantity AS INT) AS VARCHAR), ',',
       |                        CAST(l_linenumber AS VARCHAR)), ',', '.')
       |         AS DOUBLE) AS v
       |  FROM lineitem)
       |SELECT l_returnflag, ${Star.Sql.dsumX("v")} AS sum_parsed, COUNT(*) AS n
       |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** F6: mixed-format date parsing (yyyy/MM/dd vs dd/MM/yyyy in the same
    * column), via the pipeline's `Ingest.parseDateFlexible`. */
  def multiformatDates(spark: SparkSession, dir: String): DataFrame = {
    val li = Star.table(spark, dir, "lineitem")
    val s = when(col("l_orderkey") % 2 === 0,
      date_format(col("l_shipdate"), "yyyy/MM/dd"))
      .otherwise(date_format(col("l_shipdate"), "dd/MM/yyyy"))
    // two-step select (r16): parseDateFlexible references its input 6×
    // (3 RLIKE probes + 3 parse arms), and handing it the rendered-string
    // EXPRESSION inlined the CASE/date_format render into every
    // reference (the before-plan's Project carries six date_format
    // pairs). Through an alias, CollapseProject keeps the render as its
    // own projection — non-cheap expressions consumed more than once
    // are not re-inlined — so each row renders once and parses once.
    li.select(s.as("s"))
      .select(Ingest.parseDateFlexible(col("s")).as("d"))
      .groupBy(year(col("d")).cast("long").as("ano"),
        month(col("d")).cast("long").as("mes"))
      .agg(count(lit(1)).as("n"))
      .orderBy("ano", "mes")
  }

  private val multiformatDatesSql =
    """WITH t AS (
      |  SELECT CASE WHEN l_orderkey % 2 = 0
      |              THEN strftime(l_shipdate, '%Y/%m/%d')
      |              ELSE strftime(l_shipdate, '%d/%m/%Y') END AS s
      |  FROM lineitem),
      |p AS (SELECT COALESCE(try_strptime(s, '%Y/%m/%d'),
      |                      try_strptime(s, '%d/%m/%Y'))::DATE AS d FROM t)
      |SELECT CAST(year(d) AS BIGINT) AS ano, CAST(month(d) AS BIGINT) AS mes,
      |       COUNT(*) AS n
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** F8: the zero-fill-vs-null-skip divergence, made observable: the same
    * column aggregated both ways plus the null count. */
  def zerofillAvg(spark: SparkSession, dir: String): DataFrame = {
    val li = Star.table(spark, dir, "lineitem")
    val x = when(col("l_tax") < 0.03, lit(null).cast("double"))
      .otherwise(col("l_tax"))
    li.select(col("l_returnflag"), x.as("x"))
      .groupBy("l_returnflag")
      .agg(
        davgX(coalesce(col("x"), lit(0.0))).as("avg_zerofill"),
        davgNonNullX(col("x")).as("avg_nullskip"),
        (count(lit(1)) - count(col("x"))).as("n_null"))
      .orderBy("l_returnflag")
  }

  private val zerofillAvgSql =
    s"""WITH t AS (
       |  SELECT l_returnflag,
       |    CASE WHEN l_tax < 0.03 THEN NULL ELSE l_tax END AS x
       |  FROM lineitem)
       |SELECT l_returnflag,
       |  ${Star.Sql.davgX("COALESCE(x, 0.0)")} AS avg_zerofill,
       |  ${Star.Sql.davgNonNullX("x")} AS avg_nullskip,
       |  COUNT(*) - COUNT(x) AS n_null
       |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Window/dedup: latest event per (user, type) via row_number. */
  def windowRownum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Star.events(spark, dir)
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy("user_id", "event_type")
  }

  private val windowRownumSql =
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** Window: per-user running total (exact decimal prefix sums). */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val ev = Star.events(spark, dir)
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("event_id"),
      sum(col("value").cast(DecimalType(18, 4))).over(w)
        .cast("double").as("running_value"))
      .orderBy("user_id", "event_id")
  }

  private val windowRunningSql =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
      |    PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_value
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  /** Top-k with deterministic tiebreak (sort + limit). */
  def topk(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(10)

  private val topkSql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin

  /** P-family/TPC-H-Q6: tight scan with every predicate pushed to parquet. */
  def filterPushdown(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg((sum(Star.cents(col("l_extendedprice"))
          * Star.cents(col("l_discount"))).cast("double") / 1e4).as("revenue"),
        count(lit(1)).as("n"))

  private val filterPushdownSql =
    s"""SELECT CAST(SUM(${Star.Sql.cents("l_extendedprice")}
       |    * ${Star.Sql.cents("l_discount")}) AS DOUBLE) / 1e4 AS revenue,
       |  COUNT(*) AS n
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Left-semi join (EXISTS). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Star.table(spark, dir, "customer")
    val o = Star.table(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  private val semiJoinSql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join (NOT EXISTS). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Star.table(spark, dir, "customer")
    val o = Star.table(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  private val antiJoinSql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** DISTINCT projection. */
  def distinctPairs(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "orders")
      .select("o_orderpriority", "o_orderstatus").distinct()
      .orderBy("o_orderpriority", "o_orderstatus")

  private val distinctPairsSql =
    """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  /** Event-time bucketing (batch form of the streaming windowed agg). */
  def timeBucket(spark: SparkSession, dir: String): DataFrame =
    Star.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("bucket", "event_type")

  private val timeBucketSql =
    s"""SELECT date_trunc('hour', ts) AS bucket, event_type,
       |  COUNT(*) AS n, ${Star.Sql.dsum("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** COUNT_IF family (conditional counting). */
  def countIf(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(
        count(when(col("c_acctbal") < 0, 1)).as("n_negative"),
        count(when(col("c_acctbal") >= 5000, 1)).as("n_high"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  private val countIfSql =
    """SELECT c_mktsegment,
      |  CAST(COUNT_IF(c_acctbal < 0) AS BIGINT) AS n_negative,
      |  CAST(COUNT_IF(c_acctbal >= 5000) AS BIGINT) AS n_high,
      |  COUNT(*) AS n
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Semi-structured extraction: schema'd JSON parse of the `props`
    * column (from_json — codegen'd, no UDF), aggregated per event type. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val ev = Star.events(spark, dir)
    val k = from_json(col("props"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))).getField("k")
    ev.select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(
        sum(col("k")).as("sum_k"),
        (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"),
        countDistinct(col("k")).as("n_distinct_k"),
        count(when(col("k").isNull, 1)).as("n_null"))
      .orderBy("event_type")
  }

  private val jsonExtractSql =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
      |    / COUNT(*) AS avg_k,
      |  COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS n_distinct_k,
      |  CAST(COUNT_IF(json_extract(props, '$.k') IS NULL) AS BIGINT) AS n_null
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Hierarchical totals via ROLLUP (subtotals + grand total), with
    * GROUPING ids so null-valued rollup rows are unambiguous. */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "orders")
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        dsumX(col("o_totalprice")).as("revenue"))
      .orderBy(asc_nulls_first("o_orderpriority"),
        asc_nulls_first("o_orderstatus"), col("gid"))

  private val rollupOrdersSql =
    s"""SELECT o_orderpriority, o_orderstatus,
      |  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  ${Star.Sql.dsumX("o_totalprice")} AS revenue
      |FROM orders
      |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST, gid""".stripMargin

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than 30 minutes. Pure window arithmetic in exact integer
    * microseconds (lag -> gap flag -> running sum = session id), one
    * shuffle on user_id — the batch twin of the stateful streaming
    * sessionizer. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 30L * 60 * 1000000
    val ev = Star.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val flagged = ev.withColumn("new_session",
      when(col("us") - lag(col("us"), 1).over(w) > gapUs || lag(col("us"), 1).over(w).isNull, 1L)
        .otherwise(0L))
    flagged
      .withColumn("session_id", sum(col("new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("session_start_us"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .orderBy("user_id", "session_id")
  }

  private val sessionizeSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN us - lag(us) OVER w > 1800000000
      |              OR lag(us) OVER w IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sess AS (
      |  SELECT user_id, us,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  COUNT(*) AS n_events,
      |  MIN(us) AS session_start_us,
      |  MAX(us) - MIN(us) AS duration_us
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** INTERSECT / EXCEPT: nations having customers vs suppliers. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val custNations = Star.table(spark, dir, "customer")
      .select(col("c_nationkey").as("nationkey")).distinct()
    val suppNations = Star.table(spark, dir, "supplier")
      .select(col("s_nationkey").as("nationkey")).distinct()
    val both = custNations.intersect(suppNations)
      .withColumn("which", lit("both"))
    val custOnly = custNations.except(suppNations)
      .withColumn("which", lit("customers_only"))
    both.unionByName(custOnly).orderBy("which", "nationkey")
  }

  private val setOpsSql =
    """WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
      |s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      |SELECT nationkey, 'both' AS which FROM (SELECT * FROM c INTERSECT SELECT * FROM s)
      |UNION ALL
      |SELECT nationkey, 'customers_only' FROM (SELECT * FROM c EXCEPT SELECT * FROM s)
      |ORDER BY which, nationkey""".stripMargin

  /** Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL): nation
    * keys as MULTISETS — intersect keeps min(multiplicity), except
    * subtracts it. Catalyst rewrites both into count-compare generators;
    * counts-grain shuffle only. */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val c = Star.table(spark, dir, "customer")
      .select(col("c_nationkey").as("nationkey"))
    val s = Star.table(spark, dir, "supplier")
      .select(col("s_nationkey").as("nationkey"))
    val inter = c.intersectAll(s).groupBy("nationkey")
      .agg(count(lit(1)).as("n")).withColumn("which", lit("intersect_all"))
    val exc = c.exceptAll(s).groupBy("nationkey")
      .agg(count(lit(1)).as("n")).withColumn("which", lit("except_all"))
    inter.unionByName(exc)
      .select("which", "nationkey", "n")
      .orderBy("which", "nationkey")
  }

  private val setOpsAllSql =
    """WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
      |s AS (SELECT s_nationkey AS nationkey FROM supplier),
      |i AS (SELECT * FROM c INTERSECT ALL SELECT * FROM s),
      |e AS (SELECT * FROM c EXCEPT ALL SELECT * FROM s)
      |SELECT 'intersect_all' AS which, nationkey, COUNT(*) AS n
      |FROM i GROUP BY nationkey
      |UNION ALL
      |SELECT 'except_all', nationkey, COUNT(*) FROM e GROUP BY nationkey
      |ORDER BY which, nationkey""".stripMargin

  /** Scalar + correlated subqueries: customers above the global average
    * balance, with their order counts via a correlated count. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    // unique view names + drop-after-analysis: spark.sql resolves the
    // views eagerly, so the returned plan is self-contained and the
    // session catalog is left unchanged (no cross-invocation races)
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val cv = s"customer_sq_$tag"
    val ov = s"orders_sq_$tag"
    Star.table(spark, dir, "customer").createOrReplaceTempView(cv)
    Star.table(spark, dir, "orders").createOrReplaceTempView(ov)
    try {
      // exact deterministic global average: cents-sum / count
      spark.sql(
        s"""SELECT c_custkey, c_name, c_acctbal,
           |  (SELECT COUNT(*) FROM $ov o
           |   WHERE o.o_custkey = c.c_custkey) AS n_orders
           |FROM $cv c
           |WHERE c_acctbal > (SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
           |                          / 100.0 / COUNT(*)
           |                   FROM $cv)
           |ORDER BY c_custkey""".stripMargin)
    } finally {
      spark.catalog.dropTempView(cv)
      spark.catalog.dropTempView(ov)
    }
  }

  private val scalarSubquerySql =
    """SELECT c_custkey, c_name, c_acctbal,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
      |                          / 100.0 / COUNT(*)
      |                   FROM customer)
      |ORDER BY c_custkey""".stripMargin

  /** Banded temporal range self-join: pairs of same-user events within 60
    * seconds. A naive inequality join becomes a nested-loop at scale;
    * instead each event lands in a coarse time bucket and its neighbor
    * buckets (explode x3), candidates equi-join on (user, bucket), and the
    * exact |dt| <= 60s predicate filters — one hash join, no BNLJ
    * (plan-asserted in tests). Exact integer microseconds throughout. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bandUs = 60L * 1000000
    val ev = Star.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val bucketed = ev.withColumn("bucket", expr(s"us DIV $bandUs"))
    val a = bucketed.select(col("user_id"), col("event_id").as("id_a"),
      col("us").as("us_a"), col("bucket"))
    val b = bucketed.select(col("user_id"), col("event_id").as("id_b"),
      col("us").as("us_b"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1))
        .as("bucket"))
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_a") - col("us_b")) <= bandUs)
      // no distinct needed: a's single bucket meets b's three distinct
      // exploded buckets at most once per (a, b) pair
      .groupBy("user_id").agg(count(lit(1)).as("n_close_pairs"))
      .orderBy("user_id")
  }

  private val rangeJoinSql =
    """SELECT a.user_id, COUNT(*) AS n_close_pairs
      |FROM (SELECT user_id, event_id AS id_a, epoch_us(ts) AS us_a FROM events) a
      |JOIN (SELECT user_id, event_id AS id_b, epoch_us(ts) AS us_b FROM events) b
      |  ON a.user_id = b.user_id AND a.id_a < b.id_b
      |  AND abs(a.us_a - b.us_b) <= 60000000
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin

  /** RANGE-frame window: per-user rolling 1-hour sum of value (exact
    * decimal cents over an integer-microsecond range frame). */
  def windowRange(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Star.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), Star.cents(col("value")).as("v_c"))
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-3600L * 1000000, 0)
    ev.select(col("user_id"), col("event_id"),
      (sum(col("v_c")).over(w).cast("double") / 100.0).as("rolling_1h"))
      .orderBy("user_id", "event_id")
  }

  private val windowRangeSql =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |    ${Star.Sql.cents("value")} AS v_c
       |  FROM events)
       |SELECT user_id, event_id,
       |  CAST(SUM(v_c) OVER (PARTITION BY user_id ORDER BY us
       |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
       |    / 100.0 AS rolling_1h
       |FROM ev
       |ORDER BY user_id, event_id""".stripMargin

  /** SQL front-end parity: ONE shared ANSI SQL string is both the Spark
    * implementation (spark.sql over the registered star-schema views) and
    * the DuckDB oracle — proving the engine's SQL surface, not just its
    * DataFrame surface, computes the reference semantics. The text sticks
    * to the dialect intersection (standard joins, DATE literals,
    * round/CAST money arithmetic), which is exactly the subset a user
    * migrating SQL between engines would rely on. */
  private val sqlFrontendSql =
    """SELECT r_name, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_c
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= DATE '1996-01-01'
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  def sqlFrontend(spark: SparkSession, dir: String): DataFrame = {
    Star.registerViews(spark, dir)
    spark.sql(sqlFrontendSql)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_sql_frontend", sqlFrontend, Some(sqlFrontendSql)),
    QueryDef("q_range_join", rangeJoin, Some(rangeJoinSql)),
    QueryDef("q_window_range", windowRange, Some(windowRangeSql)),
    QueryDef("q_set_ops", setOps, Some(setOpsSql)),
    QueryDef("q_set_ops_all", setOpsAll, Some(setOpsAllSql)),
    QueryDef("q_scalar_subquery", scalarSubquery, Some(scalarSubquerySql)),
    QueryDef("q_agg_pricing", aggPricing, Some(aggPricingSql)),
    QueryDef("q_json_extract", jsonExtract, Some(jsonExtractSql)),
    QueryDef("q_rollup", rollupOrders, Some(rollupOrdersSql)),
    QueryDef("q_sessionize", sessionize, Some(sessionizeSql)),
    QueryDef("q_scalar_minmax", scalarMinmax, Some(scalarMinmaxSql)),
    QueryDef("q_join_broadcast", joinBroadcast, Some(joinBroadcastSql)),
    QueryDef("q_join_multi", joinMulti, Some(joinMultiSql)),
    QueryDef("q_two_level_agg", twoLevelAgg, Some(twoLevelAggSql)),
    QueryDef("q_surrogate_key", surrogateKey, Some(surrogateKeySql)),
    QueryDef("q_dateparts", dateparts, Some(datepartsSql)),
    QueryDef("q_calendar", calendar, Some(calendarSql)),
    QueryDef("q_union", unionParties, Some(unionPartiesSql)),
    QueryDef("q_comma_decimal", commaDecimal, Some(commaDecimalSql)),
    QueryDef("q_multiformat_dates", multiformatDates, Some(multiformatDatesSql)),
    QueryDef("q_zerofill_avg", zerofillAvg, Some(zerofillAvgSql)),
    QueryDef("q_window_rownum", windowRownum, Some(windowRownumSql)),
    QueryDef("q_window_running", windowRunning, Some(windowRunningSql)),
    QueryDef("q_topk", topk, Some(topkSql)),
    QueryDef("q_filter_pushdown", filterPushdown, Some(filterPushdownSql)),
    QueryDef("q_semi_join", semiJoin, Some(semiJoinSql)),
    QueryDef("q_anti_join", antiJoin, Some(antiJoinSql)),
    QueryDef("q_distinct", distinctPairs, Some(distinctPairsSql)),
    QueryDef("q_time_bucket", timeBucket, Some(timeBucketSql)),
    QueryDef("q_count_if", countIf, Some(countIfSql)),
  )
}
