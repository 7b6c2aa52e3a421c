package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Breadth batch (round 2): the relational/windowing/text surface beyond
  * the round-1 set — outer/cross joins, SQL-path EXISTS, lead/lag, ntile +
  * distribution ranks, window frames (first/last/nth), collect_set
  * aggregation, UNPIVOT, GROUPING SETS, edit distance, regexp_extract_all,
  * TF-IDF top-k terms, day-1 retention, signup->purchase funnel, and a
  * fixed-bound histogram.
  *
  * Determinism doctrine as in [[Star]]: every float output is either an
  * exact integer ratio (ratio6 / IEEE division of exact small ints) or an
  * exact decimal sum; every window ORDER BY carries a unique tie-breaker;
  * every DuckDB aggregate that would widen to HUGEINT is cast back to
  * BIGINT (pandas turns HUGEINT into float64 and the driver's hash then
  * sees 10.0 vs 10).
  */
object Breadth {

  // ---------------------------------------------------------------- joins

  /** FULL OUTER over two filtered views of customer, so both sides are
    * guaranteed unmatched rows at every SF (all custkeys appear in orders,
    * so a customer/orders full-outer would degenerate to inner). */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Star.table(spark, dir, "customer")
    val a = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key"), col("c_acctbal").as("bal_a"))
    val b = c.filter(col("c_acctbal") >= 5000)
      .select(col("c_custkey").as("key"), col("c_acctbal").as("bal_b"))
    a.join(b, Seq("key"), "full_outer")
      .select(col("key"),
        col("bal_a").isNotNull.cast("long").as("in_building"),
        col("bal_b").isNotNull.cast("long").as("in_high"),
        coalesce(col("bal_a"), col("bal_b")).as("bal"))
      .orderBy("key")
  }

  private val fullOuterJoinSql =
    """WITH a AS (SELECT c_custkey AS key, c_acctbal AS bal_a FROM customer
      |           WHERE c_mktsegment = 'BUILDING'),
      |b AS (SELECT c_custkey AS key, c_acctbal AS bal_b FROM customer
      |      WHERE c_acctbal >= 5000)
      |SELECT COALESCE(a.key, b.key) AS key,
      |  CAST(a.bal_a IS NOT NULL AS BIGINT) AS in_building,
      |  CAST(b.bal_b IS NOT NULL AS BIGINT) AS in_high,
      |  COALESCE(a.bal_a, b.bal_b) AS bal
      |FROM a FULL JOIN b ON a.key = b.key
      |ORDER BY key""".stripMargin

  /** Cartesian product of two tiny dims (explicit crossJoin — the only
    * join shape where a nested loop is the RIGHT plan). */
  def crossJoin(spark: SparkSession, dir: String): DataFrame = {
    val r = Star.table(spark, dir, "region").select(col("r_name"))
    val s = Star.table(spark, dir, "customer")
      .select(col("c_mktsegment").as("segment")).distinct()
    r.crossJoin(s).orderBy("r_name", "segment")
  }

  private val crossJoinSql =
    """SELECT r_name, segment
      |FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment AS segment
      |                        FROM customer) s
      |ORDER BY r_name, segment""".stripMargin

  /** Correlated EXISTS / NOT EXISTS through the SQL front-end (planned by
    * Catalyst as semi/anti joins — asserted in PlanSpec). */
  def existsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Star.table(spark, dir, "customer").createOrReplaceTempView("b_customer")
    Star.table(spark, dir, "orders").createOrReplaceTempView("b_orders")
    spark.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM b_customer c
        |WHERE EXISTS (SELECT 1 FROM b_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM b_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)
  }

  private val existsSubquerySql =
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------- windows

  /** lag/lead navigation: per-customer order history with day gaps.
    * ORDER BY (o_orderdate, o_orderkey) — the key makes ties deterministic. */
  def windowLeadLag(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Star.table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), col("prev_date")).cast("long"))
      .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  private val windowLeadLagSql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  lag(o_orderdate, 1) OVER w AS prev_date,
      |  CAST(date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate)
      |       AS BIGINT) AS gap_days,
      |  lead(o_orderdate, 1) OVER w AS next_date
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** Distribution ranks: ntile quartiles + percent_rank + cume_dist over
    * a unique (c_acctbal, c_custkey) order. percent_rank/cume_dist are
    * IEEE divisions of exact small integers — bit-identical cross-engine.
    *
    * NOT a `Window.orderBy` — an unpartitioned window plans as a
    * single-partition sort (one task ranks the whole table). The global
    * rank comes from the range-partitioned zipWithIndex idiom
    * (Star.globalRank); the three rank functions are then closed-form in
    * (rank, n) because the order key is unique: every row is its own
    * peer group, so ntile/percent_rank/cume_dist reduce to integer
    * arithmetic on the rank — evaluated map-side, fully parallel. */
  def ntileRanks(spark: SparkSession, dir: String): DataFrame = {
    val base = Star.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    val ranked = Star.globalRank(spark, base, "__rk",
      col("c_acctbal"), col("c_custkey"))
    // scalar row count broadcast alongside (count-only scan is metadata-cheap)
    val n = broadcast(base.agg(count(lit(1)).as("__n")))
    // ntile(k): the first n%k buckets take ceil(n/k) rows, the rest
    // floor(n/k) — the SQL-standard fill both engines implement. All
    // arithmetic is exact integer DIV/%, never a rounded double.
    val k = 4
    ranked.crossJoin(n)
      .withColumn("__q", expr(s"__n DIV $k"))
      .withColumn("__r", col("__n") % k)
      .select(col("c_custkey"), col("c_acctbal"),
        when(col("__rk") < (col("__q") + 1) * col("__r"),
            expr("__rk DIV (__q + 1)") + 1)
          .otherwise(expr("(__rk - __r) DIV __q") + 1)
          .as("quartile"),
        // unique order key => rank has no peers: percent_rank = rk/(n-1),
        // cume_dist = (rk+1)/n — the same IEEE divisions as the builtins
        when(col("__n") === 1, 0.0)
          .otherwise(col("__rk").cast("double") /
            (col("__n") - 1).cast("double")).as("pct_rank"),
        ((col("__rk") + 1).cast("double") /
          col("__n").cast("double")).as("cume"))
      .orderBy("c_acctbal", "c_custkey")
  }

  private val ntileRanksSql =
    """SELECT c_custkey, c_acctbal,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_acctbal, c_custkey""".stripMargin

  /** Whole-partition frames: earliest/latest/second-earliest ship date
    * per order. The window orders by the OUTPUT column first (then
    * linenumber), so tied sort keys can never flip the picked value —
    * (l_orderkey, l_linenumber) is not unique in the generated data. */
  def firstLastValue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_shipdate", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Star.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .withColumn("first_ship", first(col("l_shipdate")).over(w))
      .withColumn("last_ship", last(col("l_shipdate")).over(w))
      .withColumn("second_ship", nth_value(col("l_shipdate"), 2).over(w))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("line"),
        col("l_shipdate"), col("first_ship"), col("last_ship"),
        col("second_ship"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus;
      // l_shipdate makes the sort total (remaining ties are identical rows)
      .orderBy("l_orderkey", "line", "l_shipdate")
  }

  private val firstLastValueSql =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line, l_shipdate,
      |  first_value(l_shipdate) OVER w AS first_ship,
      |  last_value(l_shipdate) OVER w AS last_ship,
      |  nth_value(l_shipdate, 2) OVER w AS second_ship
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_orderkey
      |             ORDER BY l_shipdate, l_linenumber
      |             ROWS BETWEEN UNBOUNDED PRECEDING
      |             AND UNBOUNDED FOLLOWING)
      |ORDER BY l_orderkey, line, l_shipdate""".stripMargin

  // ----------------------------------------------------- shaping / groups

  /** collect_set aggregation emitted as a canonical sorted string (arrays
    * hash unreliably across engines; the string form is exact). */
  def arrayAgg(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(
        concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
          .as("statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  private val arrayAggSql =
    """SELECT o_custkey,
      |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
      |    AS statuses,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** UNPIVOT (wide -> long) of the pivoted status counts — exercises both
    * directions of the reshape in one plan. */
  def unpivotOrders(spark: SparkSession, dir: String): DataFrame = {
    val wide = Star.table(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
    wide.unpivot(
        Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")),
        "status", "n")
      .orderBy("o_orderpriority", "status")
  }

  private val unpivotOrdersSql =
    """WITH wide AS (
      |  SELECT o_orderpriority,
      |    CAST(COUNT_IF(o_orderstatus = 'F') AS BIGINT) AS f,
      |    CAST(COUNT_IF(o_orderstatus = 'O') AS BIGINT) AS o,
      |    CAST(COUNT_IF(o_orderstatus = 'P') AS BIGINT) AS p
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, 'F' AS status, f AS n FROM wide
      |UNION ALL
      |SELECT o_orderpriority, 'O', o FROM wide
      |UNION ALL
      |SELECT o_orderpriority, 'P', p FROM wide
      |ORDER BY o_orderpriority, status""".stripMargin

  /** Explicit GROUPING SETS (the third grouping-sets shape next to the
    * registered CUBE and ROLLUP), labeled via COALESCE so the output needs
    * no engine-specific grouping_id numbering. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Star.fan(spark, Star.table(spark, dir, "lineitem")).createOrReplaceTempView("b_lineitem")
    spark.sql(
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
         |  COALESCE(l_linestatus, 'ALL') AS lstatus,
         |  COUNT(*) AS n,
         |  ${sqlDsum("l_quantity")} AS sum_qty
         |FROM b_lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         |                        (l_returnflag), ())
         |ORDER BY rflag, lstatus""".stripMargin)
  }

  // Spark + DuckDB share the decimal-exact sum spelling
  private def sqlDsum(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"

  private val groupingSetsSql =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
       |  COALESCE(l_linestatus, 'ALL') AS lstatus,
       |  COUNT(*) AS n,
       |  ${Star.Sql.dsum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
       |                        (l_returnflag), ())
       |ORDER BY rflag, lstatus""".stripMargin

  // ----------------------------------------------------------------- text

  /** Edit-distance near-dup pairs (levenshtein on a fixed prefix over a
    * bounded id range — at corpus scale the same predicate runs over
    * blocking-key candidates, mirroring the MinHash-LSH candidate shape). */
  def levenshteinPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = Star.table(spark, dir, "documents")
      .filter(col("doc_id") < 60)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("p"))
    d.select(col("doc_id").as("id_a"), col("p").as("pa"))
      .join(d.select(col("doc_id").as("id_b"), col("p").as("pb")),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pa"), col("pb")).cast("long").as("dist"))
      .filter(col("dist") <= 14)
      .orderBy("id_a", "id_b")
  }

  private val levenshteinPairsSql =
    """WITH d AS (SELECT doc_id, substr(text, 1, 24) AS p FROM documents
      |           WHERE doc_id < 60)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |WHERE levenshtein(a.p, b.p) <= 14
      |ORDER BY id_a, id_b""".stripMargin

  /** regexp_extract_all over the JSON props — all digit runs, first one
    * recovered as the k value (cross-validates the from_json path). */
  def regexpExtractAll(spark: SparkSession, dir: String): DataFrame =
    Star.events(spark, dir)
      .select(col("event_type"),
        expr("regexp_extract_all(props, '[0-9]+', 0)").as("nums"))
      .select(col("event_type"),
        size(col("nums")).cast("long").as("n_nums"),
        expr("CAST(try_element_at(nums, 1) AS BIGINT)").as("k"))
      .groupBy("event_type")
      .agg(
        sum(col("n_nums")).as("total_nums"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"),
        count(when(col("k").isNull, 1)).as("n_null"))
      .orderBy("event_type")

  private val regexpExtractAllSql =
    """WITH t AS (
      |  SELECT event_type, regexp_extract_all(props, '[0-9]+') AS nums
      |  FROM events),
      |u AS (SELECT event_type, CAST(len(nums) AS BIGINT) AS n_nums,
      |        CAST(nums[1] AS BIGINT) AS k
      |      FROM t)
      |SELECT event_type,
      |  CAST(SUM(n_nums) AS BIGINT) AS total_nums,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MAX(k) AS max_k,
      |  CAST(COUNT_IF(k IS NULL) AS BIGINT) AS n_null
      |FROM u GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Per-doc top-3 terms by TF-IDF, integer-rational idf
    * (idf_u = N*1e6 // df) so scores are bit-stable across engines. */
  def tfidfTopk(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Star.table(spark, dir, "documents")
    // fan keyed on doc_id: the tf group-by (doc_id, term) and the per-doc
    // rank window both reuse this partitioning — zero further exchanges
    // on the doc axis
    val tok = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
    // HashPartitioning(doc_id) from the fan satisfies the (doc_id, term)
    // grouping AND the rank window below — the tf aggregate and the window
    // run with no further exchange. The doc-frequency side reduces to
    // vocabulary cardinality (map-side partials shrink it before its tiny
    // shuffle) and BROADCASTS, so the doc x term relation itself is never
    // re-shuffled by term — previously that term-keyed join plus the
    // re-partition back to doc_id were the two dominant exchanges. At
    // vocabularies too big to broadcast, fall back to the shuffle join.
    // tf pinned once (r16): referenced by the df branch and the scored
    // join — see bm25Topk; same trade measured there.
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(df_), "term")
      .crossJoin(broadcast(total))
      .withColumn("idf_u", Star.idiv(col("n_docs") * 1000000L, col("df")))
      .withColumn("score", col("tf") * col("idf_u"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("doc_id", "term", "tf", "score", "rnk")
      .orderBy("doc_id", "rnk")
  }

  private val tfidfTopkSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf,
      |    CAST(tf.tf * ((n.n_docs * 1000000) // df.df) AS BIGINT) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
      |        PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rnk
      |      FROM scored)
      |SELECT doc_id, term, tf, score, rnk FROM r WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  // ----------------------------------------------------------- behavioral

  /** Day-1 retention: users active on day d who return on d+1. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val d = Star.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val nxt = d.select(col("user_id"), col("day").as("next_day"))
    val j = d.join(nxt,
      d("user_id") === nxt("user_id") &&
        nxt("next_day") === date_add(d("day"), 1), "left")
    j.groupBy(d("day"))
      .agg(
        count(lit(1)).as("dau"),
        count(col("next_day")).as("retained"))
      .withColumn("retention_rate",
        Star.ratio6(col("retained"), col("dau")))
      .orderBy("day")
  }

  private val retentionSql =
    """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |           FROM events),
      |j AS (SELECT a.day, a.user_id, b.day AS next_day
      |      FROM d a LEFT JOIN d b
      |        ON a.user_id = b.user_id AND b.day = a.day + 1)
      |SELECT day, COUNT(*) AS dau, COUNT(next_day) AS retained,
      |  (CAST((CAST(COUNT(next_day) AS BIGINT) * 1000000)
      |     // CAST(COUNT(*) AS BIGINT) AS DOUBLE) / 1000000.0)
      |    AS retention_rate
      |FROM j GROUP BY day ORDER BY day""".stripMargin

  /** Signup -> purchase funnel by signup week: of the users whose first
    * signup lands in week w, how many purchase within 7 days. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Star.events(spark, dir)
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val conv = s.join(p,
        s("user_id") === p("user_id") &&
          col("p_ts") > col("signup_ts") &&
          col("p_ts") <= col("signup_ts") + expr("INTERVAL 7 DAYS"), "left")
      .groupBy(s("user_id"), col("signup_ts"))
      .agg(max(col("p_ts").isNotNull.cast("long")).as("converted"))
    conv.groupBy(date_trunc("week", col("signup_ts")).cast("date").as("week"))
      .agg(
        count(lit(1)).as("n_signups"),
        sum(col("converted")).as("n_converted"))
      .withColumn("conv_rate", Star.ratio6(col("n_converted"), col("n_signups")))
      .orderBy("week")
  }

  private val funnelSql =
    """WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
      |           WHERE event_type = 'signup' GROUP BY user_id),
      |p AS (SELECT user_id, ts AS p_ts FROM events
      |      WHERE event_type = 'purchase'),
      |conv AS (
      |  SELECT s.user_id, s.signup_ts,
      |    MAX(CAST(p.p_ts IS NOT NULL AS BIGINT)) AS converted
      |  FROM s LEFT JOIN p
      |    ON s.user_id = p.user_id
      |   AND p.p_ts > s.signup_ts
      |   AND p.p_ts <= s.signup_ts + INTERVAL 7 DAY
      |  GROUP BY s.user_id, s.signup_ts)
      |SELECT CAST(date_trunc('week', signup_ts) AS DATE) AS week,
      |  COUNT(*) AS n_signups,
      |  CAST(SUM(converted) AS BIGINT) AS n_converted,
      |  (CAST((CAST(SUM(converted) AS BIGINT) * 1000000)
      |     // CAST(COUNT(*) AS BIGINT) AS DOUBLE) / 1000000.0) AS conv_rate
      |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin

  /** Fixed-bound histogram of order totals: 10 x $50k bins in exact cents
    * arithmetic (integer bin ids, decimal-exact bin totals). */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "orders")
      .withColumn("price_c", Star.cents(col("o_totalprice")))
      .withColumn("bin",
        least(lit(9L), Star.idiv(col("price_c"), lit(5000000L))))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        (sum(col("price_c")).cast("double") / 100.0).as("bin_total"))
      .orderBy("bin")

  private val histogramSql =
    s"""WITH t AS (
       |  SELECT least(9, ${Star.Sql.cents("o_totalprice")} // 5000000) AS bin,
       |    ${Star.Sql.cents("o_totalprice")} AS price_c
       |  FROM orders)
       |SELECT bin, COUNT(*) AS n,
       |  CAST(SUM(price_c) AS DOUBLE) / 100.0 AS bin_total
       |FROM t GROUP BY bin ORDER BY bin""".stripMargin

  // -------------------------------------------------------------- sources

  /** JSON source surface: `spark.read.json` over a Dataset[String] (the
    * event props), schema inferred by the source — the JSON-lines
    * equivalent of the CSV-from-lines INMET path (SURVEY §2 S5). */
  def jsonSource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = Star.events(spark, dir)
      .filter(col("props").isNotNull)
      .select("props").as[String]
    val parsed = spark.read.json(lines)
    parsed.agg(
      count(lit(1)).as("n_rows"),
      count(col("k")).as("n_k"),
      sum(col("k")).as("sum_k"),
      min(col("k")).as("min_k"),
      max(col("k")).as("max_k"))
  }

  private val jsonSourceSql =
    """SELECT COUNT(*) AS n_rows,
      |  COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_k,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS sum_k,
      |  MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
      |FROM events WHERE props IS NOT NULL""".stripMargin

  /** Higher-order array functions (filter/transform/aggregate/slice over
    * the token array) — lambdas evaluate per doc, no explode/shuffle. */
  def higherOrder(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        expr("size(filter(w, x -> length(x) > 3))").cast("long")
          .as("n_long_tokens"),
        expr("concat_ws(',', transform(slice(w, 1, 3), x -> upper(x)))")
          .as("head3_upper"),
        expr("aggregate(w, 0L, (acc, x) -> acc + length(x))").as("total_chars"))
      .orderBy("doc_id")

  private val higherOrderSql =
    """WITH t AS (SELECT doc_id,
      |             regexp_split_to_array(trim(text), '\s+') AS w
      |           FROM documents)
      |SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(w, x -> length(x) > 3)) AS BIGINT)
      |    AS n_long_tokens,
      |  array_to_string(list_transform(w[1:3], x -> upper(x)), ',')
      |    AS head3_upper,
      |  CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
      |    AS total_chars
      |FROM t ORDER BY doc_id""".stripMargin

  /** Ordered string aggregation (LISTAGG/STRING_AGG): suppliers per
    * nation, comma-joined in name order. Sorting INSIDE the aggregate
    * (array_sort over the collected list) keeps the result independent of
    * row arrival order — the only portable form of string aggregation. */
  def listagg(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "supplier")
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"),
        concat_ws(",", array_sort(collect_list(col("s_name"))))
          .as("supplier_names"))
      .orderBy("s_nationkey")

  private val listaggSql =
    """SELECT s_nationkey, COUNT(*) AS n_suppliers,
      |  string_agg(s_name, ',' ORDER BY s_name) AS supplier_names
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** DISTINCT aggregates: Catalyst plans these as a two-level expand +
    * aggregate; the partial pass dedups (key, value) pairs map-side so the
    * shuffle carries distinct pairs, not raw rows. */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        sum_distinct(Star.cents(col("l_quantity"))).as("sum_distinct_qty_c"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  private val distinctAggSql =
    s"""SELECT l_returnflag,
       |  COUNT(DISTINCT l_partkey) AS n_parts,
       |  COUNT(DISTINCT l_suppkey) AS n_supps,
       |  CAST(SUM(DISTINCT ${Star.Sql.cents("l_quantity")}) AS BIGINT)
       |    AS sum_distinct_qty_c,
       |  COUNT(*) AS n_rows
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Bounded sliding window frame (7-row trailing moving sum/avg) over the
    * daily order-total series. The window is unpartitioned but runs on the
    * DATE axis — cardinality bounded by wall-clock, the 100 TB of orders
    * is reduced to it by the keyed group-by first. */
  def windowSliding(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Star.table(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("d"))
      .agg(sum(Star.cents(col("o_totalprice"))).as("day_c"))
    val w = Window.orderBy("d").rowsBetween(-6, 0)
    daily
      .withColumn("mov_sum_c", sum(col("day_c")).over(w))
      .withColumn("mov_n", count(lit(1)).over(w))
      .select(col("d"), col("day_c"),
        col("mov_sum_c"),
        Star.ratio6(col("mov_sum_c"), col("mov_n")).as("mov_avg_c"))
      .orderBy("d")
  }

  private val windowSlidingSql =
    s"""WITH daily AS (
       |  SELECT o_orderdate AS d,
       |    CAST(SUM(${Star.Sql.cents("o_totalprice")}) AS BIGINT) AS day_c
       |  FROM orders GROUP BY o_orderdate)
       |SELECT d, day_c,
       |  CAST(SUM(day_c) OVER w AS BIGINT) AS mov_sum_c,
       |  ${Star.Sql.ratio6("SUM(day_c) OVER w", "COUNT(*) OVER w")}
       |    AS mov_avg_c
       |FROM daily
       |WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
       |ORDER BY d""".stripMargin

  /** Percent-of-total (ratio-to-report): each nation's revenue share
    * within its region — a grouped aggregate re-scanned by a window sum
    * partitioned on the coarser key. One shuffle for the group-by; the
    * window reuses region-grain rows (region x nation cardinality). */
  def pctOfTotal(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Star.table(spark, dir, "orders").as("o")
      .join(Star.table(spark, dir, "customer").as("c"),
        col("o.o_custkey") === col("c.c_custkey"))
      .join(broadcast(Star.table(spark, dir, "nation").as("n")),
        col("c.c_nationkey") === col("n.n_nationkey"))
      .join(broadcast(Star.table(spark, dir, "region").as("r")),
        col("n.n_regionkey") === col("r.r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(Star.cents(col("o_totalprice"))).as("revenue_c"))
    rev
      .withColumn("region_c",
        sum(col("revenue_c")).over(Window.partitionBy("r_name")))
      .select(col("r_name"), col("n_name"), col("revenue_c"),
        Star.ratio6(col("revenue_c"), col("region_c")).as("pct_of_region"))
      .orderBy("r_name", "n_name")
  }

  private val pctOfTotalSql =
    s"""WITH rev AS (
       |  SELECT r_name, n_name,
       |    CAST(SUM(${Star.Sql.cents("o_totalprice")}) AS BIGINT)
       |      AS revenue_c
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  GROUP BY r_name, n_name)
       |SELECT r_name, n_name, revenue_c,
       |  ${Star.Sql.ratio6("revenue_c",
           "SUM(revenue_c) OVER (PARTITION BY r_name)")} AS pct_of_region
       |FROM rev ORDER BY r_name, n_name""".stripMargin

  /** Strictly-sequenced 3-step funnel with per-step conversion windows:
    * signup → first click within 3 days → first purchase within 3 days of
    * THAT click (each step anchored on the previous step's event, not the
    * funnel start). Three aggregates + joins all keyed on user_id — one
    * hash partitioning end to end, then a single global rollup row. */
  def funnelWindowed(spark: SparkSession, dir: String): DataFrame = {
    val ev = Star.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val t1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val t2 = ev.filter(col("event_type") === "click").as("c")
      .join(t1, Seq("user_id"))
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 3 DAYS"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase").as("p")
      .join(t2, Seq("user_id"))
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 3 DAYS"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    t1.join(t2.select(col("user_id").as("u2")),
        col("user_id") === col("u2"), "left")
      .join(t3.select(col("user_id").as("u3")),
        col("user_id") === col("u3"), "left")
      .agg(count(lit(1)).as("n_signup"),
        count(col("u2")).as("n_click_3d"),
        count(col("u3")).as("n_purchase_3d"))
      .select(col("n_signup"), col("n_click_3d"), col("n_purchase_3d"),
        Star.ratio6(col("n_click_3d"), col("n_signup")).as("step2_rate"),
        Star.ratio6(col("n_purchase_3d"), col("n_signup")).as("step3_rate"))
  }

  private val funnelWindowedSql =
    s"""WITH t1 AS (
       |  SELECT user_id, MIN(ts) AS t1 FROM events
       |  WHERE event_type = 'signup' GROUP BY user_id),
       |t2 AS (
       |  SELECT e.user_id, MIN(e.ts) AS t2
       |  FROM events e JOIN t1 ON e.user_id = t1.user_id
       |  WHERE e.event_type = 'click' AND e.ts > t1.t1
       |    AND e.ts <= t1.t1 + INTERVAL 3 DAY
       |  GROUP BY e.user_id),
       |t3 AS (
       |  SELECT e.user_id, MIN(e.ts) AS t3
       |  FROM events e JOIN t2 ON e.user_id = t2.user_id
       |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
       |    AND e.ts <= t2.t2 + INTERVAL 3 DAY
       |  GROUP BY e.user_id)
       |SELECT COUNT(*) AS n_signup,
       |  COUNT(t2.user_id) AS n_click_3d,
       |  COUNT(t3.user_id) AS n_purchase_3d,
       |  ${Star.Sql.ratio6("COUNT(t2.user_id)", "COUNT(*)")} AS step2_rate,
       |  ${Star.Sql.ratio6("COUNT(t3.user_id)", "COUNT(*)")} AS step3_rate
       |FROM t1
       |LEFT JOIN t2 ON t1.user_id = t2.user_id
       |LEFT JOIN t3 ON t1.user_id = t3.user_id""".stripMargin

  /** URL decomposition over deterministic synthetic URLs: protocol, host,
    * path, and one query parameter via the native parse_url expression
    * (the oracle decomposes with equivalent regexes). Pure map-side. */
  def urlParse(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "documents")
      .select(col("doc_id"), concat(lit("https://host"), col("doc_id") % 7,
        lit(".example/p/"), col("doc_id") % 13, lit("/doc?id="),
        col("doc_id"), lit("&ref=src"), col("doc_id") % 3).as("url"))
      .select(col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("id")).as("id_param"),
        parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref_param"))
      .orderBy("doc_id")

  private val urlParseSql =
    """WITH u AS (
      |  SELECT doc_id, 'https://host' || CAST(doc_id % 7 AS VARCHAR)
      |    || '.example/p/' || CAST(doc_id % 13 AS VARCHAR) || '/doc?id='
      |    || CAST(doc_id AS VARCHAR) || '&ref=src'
      |    || CAST(doc_id % 3 AS VARCHAR) AS url
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_extract(url, '^https?://([^/]+)', 1) AS host,
      |  regexp_extract(url, '^https?://[^/]+([^?]*)', 1) AS path,
      |  regexp_extract(url, 'id=([0-9]+)', 1) AS id_param,
      |  regexp_extract(url, 'ref=([a-z0-9]+)', 1) AS ref_param
      |FROM u ORDER BY doc_id""".stripMargin

  /** Month-over-month revenue growth: calendar-axis lag + exact-rational
    * delta ratio (floor division agrees across engines for negative
    * deltas too). The heavy reduction is the monthly group-by; the window
    * runs on months. */
  def momGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = Star.table(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(sum(Star.cents(col("o_totalprice"))).as("rev_c"))
    val w = Window.orderBy("month")
    monthly
      .withColumn("prev_c", lag(col("rev_c"), 1).over(w))
      .select(col("month"), col("rev_c"),
        // growth = cur/prev - 1 keeps the quantized division POSITIVE —
        // floor vs truncate-toward-zero diverge on negative quotients
        // (Spark floors, DuckDB // truncates), the subtraction doesn't
        when(col("prev_c").isNull, lit(null))
          .otherwise(Star.ratio6(col("rev_c"), col("prev_c")) - 1.0)
          .as("mom_growth"))
      .orderBy("month")
  }

  private val momGrowthSql =
    s"""WITH m AS (
       |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       |    CAST(SUM(${Star.Sql.cents("o_totalprice")}) AS BIGINT) AS rev_c
       |  FROM orders GROUP BY 1)
       |SELECT month, rev_c,
       |  CASE WHEN LAG(rev_c) OVER (ORDER BY month) IS NULL THEN NULL
       |       ELSE ${Star.Sql.ratio6("rev_c",
                "LAG(rev_c) OVER (ORDER BY month)")} - 1.0 END AS mom_growth
       |FROM m ORDER BY month""".stripMargin

  /** Pareto (80/20) analysis: suppliers ranked by revenue with cumulative
    * share, cut at the 80% line — group-by reduction first, then rank and
    * prefix-sum over supplier-grain rows only.
    *
    * Supplier grain grows with SF, so `Window.orderBy(...)` (a
    * single-partition sort — one task at any scale) is out. The global
    * rank is the range-partitioned zipWithIndex idiom (Star.globalRank);
    * the cumulative revenue is a TWO-LEVEL prefix sum over the rank:
    * a partitioned local cumsum within rank-buckets of 2^16 rows runs in
    * parallel, and bucket totals (an n/2^16-row relation) prefix into
    * per-bucket offsets — the only unpartitioned window left runs on
    * that tiny aggregated relation, never on supplier rows. The grand
    * total broadcasts from its own count-scan aggregate. */
  def paretoSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Star.table(spark, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(sum(Star.cents(col("l_extendedprice"))).as("rev_c"))
    val ranked = Star.globalRank(spark, rev, "__rk",
      col("rev_c").desc, col("l_suppkey"))
      .withColumn("__b", shiftright(col("__rk"), 16))
    val wLoc = Window.partitionBy("__b").orderBy("__rk")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wOff = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // bucket totals + grand total in one pass over the bucket relation
    val offs = ranked.groupBy("__b").agg(sum(col("rev_c")).as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(wOff), lit(0L)))
      .withColumn("total_c", sum(col("__bt")).over(wAll))
      .select("__b", "__off", "total_c")
    ranked
      .withColumn("__lcum", sum(col("rev_c")).over(wLoc))
      .join(broadcast(offs), "__b")
      .withColumn("cum_c", col("__lcum") + col("__off"))
      .withColumn("cum_share", Star.ratio6(col("cum_c"), col("total_c")))
      .filter(col("cum_share") <= 0.8)
      .select((col("__rk") + 1).as("rnk"), col("l_suppkey"), col("rev_c"),
        col("cum_share"))
      .orderBy("rnk")
  }

  private val paretoSuppliersSql =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    CAST(SUM(${Star.Sql.cents("l_extendedprice")}) AS BIGINT) AS rev_c
       |  FROM lineitem GROUP BY l_suppkey),
       |ranked AS (
       |  SELECT l_suppkey, rev_c,
       |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
       |    CAST(SUM(rev_c) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS BIGINT) AS cum_c,
       |    CAST(SUM(rev_c) OVER () AS BIGINT) AS total_c
       |  FROM rev WINDOW w AS (ORDER BY rev_c DESC, l_suppkey))
       |SELECT rnk, l_suppkey, rev_c,
       |  ${Star.Sql.ratio6("cum_c", "total_c")} AS cum_share
       |FROM ranked
       |WHERE ${Star.Sql.ratio6("cum_c", "total_c")} <= 0.8
       |ORDER BY rnk""".stripMargin

  /** Cumulative unique users by day (the growth-curve metric). Running
    * COUNT(DISTINCT) is re-scan-quadratic; the scalable form is the
    * first-seen trick: distinct is reduced to each user's FIRST day (one
    * user-keyed aggregate), then a date-axis cumulative sum — the window
    * runs on calendar cardinality, not event volume. */
  def cumulativeUniques(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstSeen = Star.events(spark, dir)
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("first_day"))
      .groupBy("first_day").agg(count(lit(1)).as("new_users"))
    firstSeen
      .withColumn("cum_users", sum(col("new_users")).over(
        Window.orderBy("first_day")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("first_day"), col("new_users"),
        col("cum_users").cast("long").as("cum_users"))
      .orderBy("first_day")
  }

  private val cumulativeUniquesSql =
    """WITH fs AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      |  FROM events GROUP BY user_id),
      |daily AS (
      |  SELECT first_day, COUNT(*) AS new_users FROM fs GROUP BY first_day)
      |SELECT first_day, new_users,
      |  CAST(SUM(new_users) OVER (ORDER BY first_day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_users
      |FROM daily ORDER BY first_day""".stripMargin

  /** DAU and rolling 7-day WAU. Sliding COUNT(DISTINCT) doesn't compose,
    * so the input is first reduced to distinct (user, day) presence rows —
    * at 100 TB that collapses event volume to users x active-days — and
    * WAU re-expands each presence row over the 7 days it supports
    * (generate + re-aggregate), never re-scanning events. */
  def dauWau(spark: SparkSession, dir: String): DataFrame = {
    val presence = Star.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val dau = presence.groupBy("d").agg(count(lit(1)).as("dau"))
    val wau = presence
      .select(col("user_id"), explode(sequence(col("d"),
        date_add(col("d"), 6), expr("interval 1 day"))).as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("d"))
      .select(col("d"), col("dau"), col("wau"))
      .orderBy("d")
  }

  private val dauWauSql =
    """WITH presence AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |dau AS (SELECT d, COUNT(*) AS dau FROM presence GROUP BY d),
      |expand AS (
      |  SELECT DISTINCT user_id,
      |    CAST(unnest(generate_series(d, d + 6, INTERVAL 1 DAY)) AS DATE)
      |      AS d
      |  FROM presence),
      |wau AS (SELECT d, COUNT(*) AS wau FROM expand GROUP BY d)
      |SELECT dau.d, dau.dau, wau.wau
      |FROM dau JOIN wau ON dau.d = wau.d
      |ORDER BY dau.d""".stripMargin

  /** Fixed-SIZE deterministic sample per group (vs sampleStratified's
    * fixed-rate): the 3 docs per language with the smallest key hash —
    * reproducible, rank-based, one shuffle on the stratum key. */
  def sampleTopHash(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(col("h"), col("doc_id"))
    Star.table(spark, dir, "documents")
      .withColumn("h", (col("doc_id") * lit(2654435761L)) % lit(4294967296L))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("lang"), col("rn"), col("doc_id"))
      .orderBy("lang", "rn")
  }

  private val sampleTopHashSql =
    """SELECT lang, rn, doc_id FROM (
      |  SELECT lang, doc_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id)
      |      AS BIGINT) AS rn
      |  FROM documents) t
      |WHERE rn <= 3 ORDER BY lang, rn""".stripMargin

  /** Deterministic per-group mode: most frequent order priority per market
    * segment, ties toward the lexicographically smaller value. Built as
    * count + rank rather than `mode()` (whose tie behavior is
    * engine-arbitrary). Two bounded aggregations — the second runs on
    * (segment x priority) grain. */
  def modePerGroup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = Star.table(spark, dir, "orders").as("o")
      .join(Star.table(spark, dir, "customer").as("c"),
        col("o.o_custkey") === col("c.c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("cnt").desc, col("o_orderpriority"))
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_mktsegment"), col("o_orderpriority").as("mode_priority"),
        col("cnt").as("n"))
      .orderBy("c_mktsegment")
  }

  private val modePerGroupSql =
    """WITH cnts AS (
      |  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS cnt
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT c_mktsegment, o_orderpriority AS mode_priority, cnt AS n
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |        ORDER BY cnt DESC, o_orderpriority) AS rn FROM cnts) t
      |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin

  /** First-order Markov transition matrix of the event stream: per-user
    * (state -> next state) bigram counts and row-normalized probabilities.
    * One shuffle on user_id for the lead window; the matrix itself is
    * |types|^2 — constant-size output from any input volume. */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Star.events(spark, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("row_n",
        sum(col("n")).over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n"),
        Star.ratio6(col("n"), col("row_n")).as("p"))
      .orderBy("from_type", "to_type")
  }

  private val transitionMatrixSql =
    s"""WITH pairs AS (
       |  SELECT event_type AS from_type,
       |    LEAD(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS to_type
       |  FROM events),
       |cnts AS (
       |  SELECT from_type, to_type, COUNT(*) AS n FROM pairs
       |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
       |SELECT from_type, to_type, n,
       |  ${Star.Sql.ratio6("n", "SUM(n) OVER (PARTITION BY from_type)")} AS p
       |FROM cnts ORDER BY from_type, to_type""".stripMargin

  /** Map-typed columns end to end: each event builds a map column from
    * its parsed JSON prop and its exact cents value (map_from_arrays),
    * the map EXPLODES to (key, value) rows, and a per-key aggregate
    * summarizes — the construct → explode → reduce cycle generic
    * property-bag processing needs. Pure map-side until the tiny per-key
    * aggregate; the oracle unrolls the same two entries relationally
    * (identical semantics, no engine-specific map layout on the wire). */
  def mapOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Star.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        Star.cents(col("value")).as("v_c"))
    ev.select(col("event_id"),
        explode(map_from_arrays(
          array(lit("prop_k"), lit("value_cents")),
          array(col("k_val"), col("v_c")))).as(Seq("key", "val")))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("val")).as("total"),
        min(col("val")).as("min_val"), max(col("val")).as("max_val"))
      .orderBy("key")
  }

  private val mapOpsSql =
    s"""WITH ev AS (
       |  SELECT event_id,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k_val,
       |    ${Star.Sql.cents("value")} AS v_c
       |  FROM events),
       |kv AS (
       |  SELECT 'prop_k' AS key, k_val AS val FROM ev
       |  UNION ALL
       |  SELECT 'value_cents', v_c FROM ev)
       |SELECT key, COUNT(*) AS n, CAST(SUM(val) AS BIGINT) AS total,
       |  MIN(val) AS min_val, MAX(val) AS max_val
       |FROM kv GROUP BY key ORDER BY key""".stripMargin

  /** Exact rolling median (a HOLISTIC window aggregate — unlike sum/avg
    * it cannot be computed incrementally from partials): per-user 7-row
    * event window, median = the explicit order statistic of the sorted
    * window buffer. Both engines evaluate the identical formulation
    * (sorted window list + 1-based element picks + IEEE mean of the two
    * middles), so results are bit-exact despite being doubles.
    *
    * Scale shape: one shuffle on user_id (the window partition key);
    * within partitions the 7-element buffer is O(w log w) per row — the
    * honest cost of holistic window aggregates. An incremental two-heap
    * implementation would be the 1000×-window upgrade; at w=7 the
    * buffer IS the fast path. */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-6, 0)
    val arr = sort_array(collect_list(col("value")).over(w))
    val n = size(arr)
    val med = when(n % 2 === 1,
        element_at(arr, ((n + 1) / 2).cast("int")))
      .otherwise((element_at(arr, (n / 2).cast("int")) +
        element_at(arr, (n / 2).cast("int") + 1)) / 2.0)
    Star.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("med7", med)
      .orderBy("user_id", "ts", "event_id")
  }

  private val rollingMedianSql =
    """SELECT user_id, event_id, ts, value,
      |  CASE WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
      |       ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) / 2.0
      |  END AS med7
      |FROM (
      |  SELECT user_id, event_id, ts, value,
      |    list_sort(list(value) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
      |  FROM events)
      |ORDER BY user_id, ts, event_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_rolling_median", rollingMedian, Some(rollingMedianSql)),
    QueryDef("q_map_ops", mapOps, Some(mapOpsSql)),
    QueryDef("q_mom_growth", momGrowth, Some(momGrowthSql)),
    QueryDef("q_pareto_suppliers", paretoSuppliers,
      Some(paretoSuppliersSql)),
    QueryDef("q_cumulative_uniques", cumulativeUniques,
      Some(cumulativeUniquesSql)),
    QueryDef("q_sample_top_hash", sampleTopHash, Some(sampleTopHashSql)),
    QueryDef("q_dau_wau", dauWau, Some(dauWauSql)),
    QueryDef("q_funnel_windowed", funnelWindowed, Some(funnelWindowedSql)),
    QueryDef("q_url_parse", urlParse, Some(urlParseSql)),
    QueryDef("q_mode_per_group", modePerGroup, Some(modePerGroupSql)),
    QueryDef("q_transition_matrix", transitionMatrix,
      Some(transitionMatrixSql)),
    QueryDef("q_listagg", listagg, Some(listaggSql)),
    QueryDef("q_distinct_agg", distinctAgg, Some(distinctAggSql)),
    QueryDef("q_window_sliding", windowSliding, Some(windowSlidingSql)),
    QueryDef("q_pct_of_total", pctOfTotal, Some(pctOfTotalSql)),
    QueryDef("q_higher_order", higherOrder, Some(higherOrderSql)),
    QueryDef("q_json_source", jsonSource, Some(jsonSourceSql)),
    QueryDef("q_full_outer_join", fullOuterJoin, Some(fullOuterJoinSql)),
    QueryDef("q_cross_join", crossJoin, Some(crossJoinSql)),
    QueryDef("q_exists_subquery", existsSubquery, Some(existsSubquerySql)),
    QueryDef("q_window_lead_lag", windowLeadLag, Some(windowLeadLagSql)),
    QueryDef("q_ntile_ranks", ntileRanks, Some(ntileRanksSql)),
    QueryDef("q_first_last_value", firstLastValue, Some(firstLastValueSql)),
    QueryDef("q_array_agg", arrayAgg, Some(arrayAggSql)),
    QueryDef("q_unpivot", unpivotOrders, Some(unpivotOrdersSql)),
    QueryDef("q_grouping_sets", groupingSets, Some(groupingSetsSql)),
    QueryDef("q_levenshtein", levenshteinPairs, Some(levenshteinPairsSql)),
    QueryDef("q_regexp_extract_all", regexpExtractAll, Some(regexpExtractAllSql)),
    QueryDef("q_tfidf_topk", tfidfTopk, Some(tfidfTopkSql)),
    QueryDef("q_retention", retention, Some(retentionSql)),
    QueryDef("q_funnel", funnel, Some(funnelSql)),
    QueryDef("q_histogram", histogram, Some(histogramSql)),
  )
}
