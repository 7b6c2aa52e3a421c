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
      |  CAST(COUNT_IF(o_orderstatus = 'F') AS BIGINT) AS F,
      |  CAST(COUNT_IF(o_orderstatus = 'O') AS BIGINT) AS O,
      |  CAST(COUNT_IF(o_orderstatus = 'P') AS BIGINT) AS P
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

  /** Exact quartiles of extended price WITHOUT buffering values: the
    * `percentile()` exact aggregate holds every group value in memory —
    * impossible at 100 TB. Here the value domain is bounded (integer
    * cents), so exact order statistics come from a value histogram:
    * count per (group, value) → cumulative window → locate the two order
    * stats straddling each dyadic quantile position and interpolate. The
    * shuffles carry distinct-value rows, never raw rows, and nothing is
    * buffered beyond one histogram partition. Interpolation with dyadic
    * fractions over integers is exact in IEEE double, matching DuckDB's
    * quantile_cont bit-for-bit. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Quantiles.exactQuantiles(
      Star.table(spark, dir, "lineitem"), Seq("l_returnflag"),
      Star.cents(col("l_extendedprice")), Seq(0.25, 0.5, 0.75))
      .withColumn("quant", col("quant") / 100.0)
      .groupBy("l_returnflag")
      .agg(max(when(col("q") === 0.25, col("quant"))).as("p25"),
        max(when(col("q") === 0.5, col("quant"))).as("p50"),
        max(when(col("q") === 0.75, col("quant"))).as("p75"),
        max(col("n")).as("n"))
      .orderBy("l_returnflag")

  private val percentilesSql =
    s"""SELECT l_returnflag,
       |  quantile_cont(${Star.Sql.cents("l_extendedprice")}, 0.25) / 100.0 AS p25,
       |  quantile_cont(${Star.Sql.cents("l_extendedprice")}, 0.5) / 100.0 AS p50,
       |  quantile_cont(${Star.Sql.cents("l_extendedprice")}, 0.75) / 100.0 AS p75,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Portable statistical sketch, hash-oracled end to end — approximate
    * distinct counting plus dispersion statistics that a cross-engine
    * gate can check bit-for-bit:
    *
    *  - `approx_parts`: KMV (k-minimum-values) distinct estimate of parts
    *    per return flag. Partkeys map through a universal hash onto
    *    [0, P); the k=1024 smallest DISTINCT hash values per group are
    *    kept via the TopKPerGroup partial-heap operator (per-partition
    *    heaps, then merge — never a single-task global sort), and the
    *    k-th smallest yields the estimate (k-1)*P / h_(k): one double
    *    division, reproducible in any engine. Below k distinct values
    *    the sketch IS the population and the count is exact; above,
    *    relative error ~1/sqrt(k-2) = 3.2%. Spark's builtin
    *    approx_count_distinct (HLL++ over xxhash64, engine-private
    *    register layout — not cross-engine reproducible) stays pinned
    *    by ExtensionOpsSpec instead.
    *  - price variance/stddev/corr/skewness from raw power sums
    *    accumulated as EXACT integers (cents in DECIMAL(38,0): order-
    *    and partitioning-independent; the third power sum fits decimal
    *    precision to ~sf100), combined into moments with IDENTICAL
    *    double expression trees in Spark and DuckDB — IEEE 754 then
    *    makes the doubles bit-equal. Skewness deliberately avoids
    *    pow(B, 1.5) (library-dependent rounding) in favor of
    *    B*sqrt(B), both correctly-rounded IEEE ops. */
  /** Count-Min heavy hitters over the token stream — THE bounded-state
    * frequency primitive for an unbounded 100 TB corpus: d=4 rows of
    * w=512 counters (2 048 cells total, independent of token
    * cardinality), each cell an order-independent SUM, so the sketch is
    * mergeable across partitions/executors/days and — unlike
    * Misra-Gries/SpaceSaving, whose state depends on arrival order —
    * deterministically equal on any engine. Hashes are the portable
    * polynomial fold + universal-family rows the MinHash sketches use,
    * so DuckDB derives the identical 2 048 cells and the gate
    * hash-compares real sketch ESTIMATES, not just plumbing. Output:
    * the top-20 true-count tokens (same tokenization as q_vocab_topk)
    * with exact count and CMS estimate; est >= true always (CMS never
    * undercounts), equality iff no bucket collision in some row.
    *
    * Plan shape: one map-side-combined aggregate to 2 048 cells + the
    * exact vocab top-k it is judged against; the 20-row topk joins the
    * tiny cell table — planner broadcasts both sides' builds. */
  def heavyHittersCms(spark: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    val W = 512
    val D = 4
    def rowA(j: Int): Long = (j * 2654435761L + 1000003L) % P
    def rowB(j: Int): Long = (j * 40503L + 12345L) % P
    val toks = Star.fan(spark, Star.table(spark, dir, "documents"))
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .select(col("word"),
        graft.functions.HashFunctions.polyHash(col("word"), 131L, P).as("h"))
    // 4 (row, bucket) cells per token -> 2048-cell bucket sums.
    // Pinned ONCE (localCheckpoint): the estimate probe references the
    // sketch per hash row, and the pre-r16 form — one join per row over
    // a FILTERED view of this relation — re-ran the whole tokenize+hash+
    // explode lineage four times (plus once for topk: five corpus passes
    // per execution, caught by the r16 job-count decomposition). The
    // sketch is 2 048 rows BY CONSTRUCTION (d×w), so the pin is bounded
    // at any corpus size.
    val cells = toks.select(posexplode(array((0 until D).map(j =>
        ((col("h") * rowA(j) + rowB(j)) % P % W)): _*)))
      .groupBy(col("pos").as("j"), col("col").as("bucket"))
      .agg(count(lit(1)).as("cell_n"))
      .localCheckpoint(true)
    val topk = toks.groupBy("word", "h").agg(count(lit(1)).as("true_n"))
      .orderBy(col("true_n").desc, col("word")).limit(20)
    // one probe join on (row, bucket) + a min per word replaces the four
    // chained per-row joins: CMS estimate = min over rows of the hit cell
    val probes = topk.select(col("word"), col("true_n"),
        posexplode(array((0 until D).map(j =>
          ((col("h") * rowA(j) + rowB(j)) % P % W)): _*)))
      .select(col("word"), col("true_n"),
        col("pos").as("j"), col("col").as("bucket"))
    probes.join(cells, Seq("j", "bucket"))
      .groupBy("word", "true_n")
      .agg(min("cell_n").as("est_n"))
      .select("word", "true_n", "est_n")
      .orderBy(col("true_n").desc, col("word"))
  }

  private val heavyHittersCmsSql = {
    val P = 1000000007L
    val W = 512
    def rowA(j: Int): Long = (j * 2654435761L + 1000003L) % P
    def rowB(j: Int): Long = (j * 40503L + 12345L) % P
    val hashSql = "list_reduce(list_prepend(0::BIGINT, list_transform(" +
      "string_split(word, ''), c -> unicode(c)::BIGINT)), " +
      s"(acc, c) -> (acc * 131 + c) % $P)"
    val cellUnion = (0 until 4).map(j =>
      s"SELECT $j AS j, (h * ${rowA(j)} + ${rowB(j)}) % $P % $W AS bucket " +
        "FROM toks").mkString(" UNION ALL ")
    val estMin = (0 until 4).map(j =>
      s"(SELECT cell_n FROM cells WHERE j = $j AND " +
        s"bucket = (t.h * ${rowA(j)} + ${rowB(j)}) % $P % $W)")
      .mkString("LEAST(", ", ", ")")
    s"""WITH words AS (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
       |  FROM documents),
       |toks AS (SELECT word, $hashSql AS h FROM words),
       |cells AS (
       |  SELECT j, bucket, COUNT(*) AS cell_n FROM ($cellUnion) u
       |  GROUP BY j, bucket),
       |topk AS (
       |  SELECT word, h, COUNT(*) AS true_n FROM toks GROUP BY word, h
       |  ORDER BY true_n DESC, word LIMIT 20)
       |SELECT word, true_n, $estMin AS est_n
       |FROM topk t ORDER BY true_n DESC, word""".stripMargin
  }

  def statsSketch(spark: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    val kmvK = 1024
    val li = Star.table(spark, dir, "lineitem")
    val h = (lit(654435747L) * (col("l_partkey") % P) + lit(12345L)) % P
    val kmv = graft.plans.TopKPerGroup
      .topK(li.select(col("l_returnflag"), h.as("h")).distinct(),
        Seq("l_returnflag"), Seq(("h", false)), kmvK)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("kc"), max("h").as("kth"))
      .select(col("l_returnflag"),
        when(col("kc") < kmvK, col("kc").cast("double"))
          .otherwise(lit((kmvK - 1).toDouble) * lit(P.toDouble)
            / col("kth").cast("double"))
          .as("approx_parts"))
    val c12 = Star.cents(col("l_extendedprice"))
      .cast(org.apache.spark.sql.types.DecimalType(12, 0))
    val moments = li
      .select(col("l_returnflag"), c12.as("c"),
        Star.cents(col("l_extendedprice")).as("cl"),
        Star.cents(col("l_discount")).as("d"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("c")).as("sp"),
        sum(col("c") * col("c")).as("spp"),
        sum(col("c") * col("c") * col("c")).as("sppp"),
        sum(col("d")).as("sd"),
        sum(col("d") * col("d")).as("sdd"),
        sum(col("cl") * col("d")).as("spd"))
    def dbl(x: org.apache.spark.sql.Column) = x.cast("double")
    val nD = dbl(col("n"))
    val bP = nD * dbl(col("spp")) - dbl(col("sp")) * dbl(col("sp"))
    val bD = nD * dbl(col("sdd")) - dbl(col("sd")) * dbl(col("sd"))
    val a3 = nD * nD * dbl(col("sppp")) -
      lit(3.0) * nD * dbl(col("sp")) * dbl(col("spp")) +
      lit(2.0) * dbl(col("sp")) * dbl(col("sp")) * dbl(col("sp"))
    moments
      .select(col("l_returnflag"), col("n"),
        (bP / (nD * (nD - lit(1.0))) / lit(10000.0)).as("price_var"),
        (sqrt(bP / (nD * (nD - lit(1.0)))) / lit(100.0)).as("price_stddev"),
        ((nD * dbl(col("spd")) - dbl(col("sp")) * dbl(col("sd")))
          / (sqrt(bP) * sqrt(bD))).as("price_disc_corr"),
        (a3 / (bP * sqrt(bP))).as("price_skew"))
      .join(kmv, Seq("l_returnflag"))
      .orderBy("l_returnflag")
  }

  private val statsSketchSql = {
    val bP = "(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)" +
      " - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))"
    val bD = "(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)" +
      " - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))"
    val a3 = "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(sppp AS DOUBLE)" +
      " - 3.0 * CAST(n AS DOUBLE) * CAST(sp AS DOUBLE) * CAST(spp AS DOUBLE)" +
      " + 2.0 * CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))"
    s"""WITH h AS (
       |  SELECT DISTINCT l_returnflag,
       |    (654435747 * (l_partkey % 1000000007) + 12345) % 1000000007 AS h
       |  FROM lineitem),
       |r AS (
       |  SELECT l_returnflag, h,
       |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
       |  FROM h),
       |kmv AS (
       |  SELECT l_returnflag,
       |    CASE WHEN COUNT(*) < 1024 THEN CAST(COUNT(*) AS DOUBLE)
       |         ELSE 1023.0 * 1000000007.0 / CAST(MAX(h) AS DOUBLE) END
       |      AS approx_parts
       |  FROM r WHERE rn <= 1024 GROUP BY l_returnflag),
       |m AS (
       |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(c::HUGEINT) AS sp, SUM(c::HUGEINT * c) AS spp,
       |    SUM(c::HUGEINT * c * c) AS sppp,
       |    CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(d*d) AS BIGINT) AS sdd,
       |    CAST(SUM(c*d) AS BIGINT) AS spd
       |  FROM (SELECT l_returnflag, ${Star.Sql.cents("l_extendedprice")} AS c,
       |          ${Star.Sql.cents("l_discount")} AS d FROM lineitem)
       |  GROUP BY l_returnflag)
       |SELECT m.l_returnflag, n, approx_parts,
       |  $bP / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 10000.0
       |    AS price_var,
       |  sqrt($bP / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0
       |    AS price_stddev,
       |  (CAST(n AS DOUBLE) * CAST(spd AS DOUBLE)
       |      - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE))
       |    / (sqrt($bP) * sqrt($bD)) AS price_disc_corr,
       |  $a3 / ($bP * sqrt($bP)) AS price_skew
       |FROM m JOIN kmv ON m.l_returnflag = kmv.l_returnflag
       |ORDER BY m.l_returnflag""".stripMargin
  }

  /** Exact second-moment statistics, oracle-checked — the deterministic
    * counterpart of the rows-only sketch above. Moments are accumulated as
    * EXACT integers (quantity and discount-percent are small ints;
    * order-independent, partitioning-independent), then the variance /
    * stddev / correlation formulas are evaluated over those integers with
    * IDENTICAL double expression trees in Spark and DuckDB — IEEE 754 makes
    * the results bit-equal. (Price moments would overflow BIGINT under
    * ANSI at sf>=0.1, which is why the price stats stay in the sketch.)
    * Bounds: n*sxx < 2^63 holds to ~sf10. */
  def statsExact(spark: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast("long")
    val d = Star.cents(col("l_discount")) // 0..10 (percent as exact int)
    val moments = Star.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), q.as("q"), d.as("d"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sq"), sum(col("q") * col("q")).as("sqq"),
        sum(col("d")).as("sd"), sum(col("d") * col("d")).as("sdd"),
        sum(col("q") * col("d")).as("sqd"))
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val nQ = col("n") * col("sqq") - col("sq") * col("sq")
    val nD = col("n") * col("sdd") - col("sd") * col("sd")
    val nQD = col("n") * col("sqd") - col("sq") * col("sd")
    moments.select(
        col("l_returnflag"), col("n"),
        (dbl(nQ) / dbl(col("n") * (col("n") - 1))).as("qty_var"),
        sqrt(dbl(nQ) / dbl(col("n") * (col("n") - 1))).as("qty_stddev"),
        (dbl(nD) / dbl(col("n") * (col("n") - 1))).as("disc_var"),
        (dbl(nQD) / sqrt(dbl(nQ) * dbl(nD))).as("qty_disc_corr"))
      .orderBy("l_returnflag")
  }

  private val statsExactSql =
    s"""WITH m AS (
       |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(q*q) AS BIGINT) AS sqq,
       |    CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(d*d) AS BIGINT) AS sdd,
       |    CAST(SUM(q*d) AS BIGINT) AS sqd
       |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
       |          ${Star.Sql.cents("l_discount")} AS d
       |        FROM lineitem)
       |  GROUP BY l_returnflag)
       |SELECT l_returnflag, n,
       |  CAST(n*sqq - sq*sq AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) AS qty_var,
       |  sqrt(CAST(n*sqq - sq*sq AS DOUBLE) / CAST(n*(n-1) AS DOUBLE))
       |    AS qty_stddev,
       |  CAST(n*sdd - sd*sd AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) AS disc_var,
       |  CAST(n*sqd - sq*sd AS DOUBLE)
       |    / sqrt(CAST(n*sqq - sq*sq AS DOUBLE) * CAST(n*sdd - sd*sd AS DOUBLE))
       |    AS qty_disc_corr
       |FROM m ORDER BY l_returnflag""".stripMargin

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

  /** CUBE: all grouping-set combinations of (priority, status). */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "orders")
      .cube("o_orderpriority", "o_orderstatus")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        Star.dsumX(col("o_totalprice")).as("revenue"))
      .orderBy(asc_nulls_first("o_orderpriority"),
        asc_nulls_first("o_orderstatus"), col("gid"))

  private val cubeOrdersSql =
    s"""SELECT o_orderpriority, o_orderstatus,
      |  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  ${Star.Sql.dsumX("o_totalprice")} AS revenue
      |FROM orders
      |GROUP BY CUBE(o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST, gid""".stripMargin

  /** argmin/argmax: the order id holding each priority's price extreme.
    * Ties are broken deterministically by folding the unique key into the
    * ordering value (cents * 10^7 + orderkey — exact in BIGINT for the
    * harness scale range). */
  def argExtremes(spark: SparkSession, dir: String): DataFrame = {
    val o = Star.table(spark, dir, "orders")
      .withColumn("rank_val",
        Star.cents(col("o_totalprice")) * 10000000L + col("o_orderkey"))
    o.groupBy("o_orderpriority")
      .agg(
        max_by(col("o_orderkey"), col("rank_val")).as("max_price_order"),
        min_by(col("o_orderkey"), col("rank_val")).as("min_price_order"),
        max(Star.cents(col("o_totalprice"))).as("max_price_c"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  private val argExtremesSql =
    s"""WITH o AS (
       |  SELECT o_orderpriority, o_orderkey, o_totalprice,
       |    ${Star.Sql.cents("o_totalprice")} * 10000000 + o_orderkey AS rank_val
       |  FROM orders)
       |SELECT o_orderpriority,
       |  arg_max(o_orderkey, rank_val) AS max_price_order,
       |  arg_min(o_orderkey, rank_val) AS min_price_order,
       |  MAX(${Star.Sql.cents("o_totalprice")}) AS max_price_c,
       |  COUNT(*) AS n
       |FROM o GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Pearson correlation matrix with EXACT moment accumulation: the five
    * sums (Σx, Σy, Σxy, Σx², Σy²) are computed as wide decimals over
    * integer cents — order-independent and engine-identical — and only the
    * final closed-form combination runs in double arithmetic, evaluated by
    * the same expression tree in both engines. `corr()` built-ins
    * accumulate in floats and are NOT portable; this is, at the same
    * single-shuffle cost (one partial+final aggregate). */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    // r16 probe: converting these ten decimal sums to dsumX-style split
    // long accumulators measured a WASH (0.99 vs 1.01 s same-window at
    // sf0.1) — unlike the decimal(18,4) money sums dsumX replaced, the
    // (18,0) sum buffer stays on Spark's compact long-backed decimal
    // path, so there is no BigDecimal tax to remove. Kept as decimals.
    import org.apache.spark.sql.types.DecimalType
    val d18 = DecimalType(18, 0)
    val qty = col("l_quantity").cast("long").cast(d18)
    val price = Star.cents(col("l_extendedprice")).cast(d18)
    val disc = Star.cents(col("l_discount")).cast(d18)
    def corrCols(x: org.apache.spark.sql.Column,
                 y: org.apache.spark.sql.Column, tag: String) = Seq(
      sum(x).cast(DecimalType(38, 0)).as(s"sx_$tag"),
      sum(y).cast(DecimalType(38, 0)).as(s"sy_$tag"),
      sum(x * y).cast(DecimalType(38, 0)).as(s"sxy_$tag"),
      sum(x * x).cast(DecimalType(38, 0)).as(s"sxx_$tag"),
      sum(y * y).cast(DecimalType(38, 0)).as(s"syy_$tag"))
    def corrOf(tag: String) = {
      val n = col("n").cast("double")
      def d(c: String) = col(s"${c}_$tag").cast("double")
      ((n * d("sxy") - d("sx") * d("sy")) /
        (sqrt(n * d("sxx") - d("sx") * d("sx")) *
          sqrt(n * d("syy") - d("sy") * d("sy")))).as(s"corr_$tag")
    }
    // fan: 10 exact DECIMAL(38) sums per row dominate the single-split
    // local scan — per-row compute is the case where the fan-out pays
    Star.fan(spark, Star.table(spark, dir, "lineitem"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        corrCols(qty, price, "qty_price") ++
          corrCols(disc, price, "disc_price"): _*)
      .select(col("l_returnflag"), col("n"),
        corrOf("qty_price"), corrOf("disc_price"))
      .orderBy("l_returnflag")
  }

  private val corrMatrixSql = {
    def corrSql(x: String, y: String, tag: String) =
      s"""CAST(SUM($x) AS DECIMAL(38,0)) AS sx_$tag,
         |    CAST(SUM($y) AS DECIMAL(38,0)) AS sy_$tag,
         |    CAST(SUM($x * $y) AS DECIMAL(38,0)) AS sxy_$tag,
         |    CAST(SUM($x * $x) AS DECIMAL(38,0)) AS sxx_$tag,
         |    CAST(SUM($y * $y) AS DECIMAL(38,0)) AS syy_$tag""".stripMargin
    def combine(tag: String) =
      s"""((CAST(n AS DOUBLE) * CAST(sxy_$tag AS DOUBLE)
         |     - CAST(sx_$tag AS DOUBLE) * CAST(sy_$tag AS DOUBLE))
         |   / (sqrt(CAST(n AS DOUBLE) * CAST(sxx_$tag AS DOUBLE)
         |           - CAST(sx_$tag AS DOUBLE) * CAST(sx_$tag AS DOUBLE))
         |      * sqrt(CAST(n AS DOUBLE) * CAST(syy_$tag AS DOUBLE)
         |             - CAST(sy_$tag AS DOUBLE) * CAST(sy_$tag AS DOUBLE))))
         |    AS corr_$tag""".stripMargin
    s"""WITH t AS (
       |  SELECT l_returnflag,
       |    CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,0)) AS qty,
       |    CAST(${Star.Sql.cents("l_extendedprice")} AS DECIMAL(18,0)) AS price,
       |    CAST(${Star.Sql.cents("l_discount")} AS DECIMAL(18,0)) AS disc
       |  FROM lineitem),
       |m AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    ${corrSql("qty", "price", "qty_price")},
       |    ${corrSql("disc", "price", "disc_price")}
       |  FROM t GROUP BY l_returnflag)
       |SELECT l_returnflag, n,
       |  ${combine("qty_price")},
       |  ${combine("disc_price")}
       |FROM m ORDER BY l_returnflag""".stripMargin
  }

  /** Z-score outlier detection per event type: moments from exact decimal
    * sums (order-independent), z computed by the same double expression in
    * both engines, outliers = |z| >= 3. The per-type stats table is tiny
    * and broadcast back onto the full scan — one aggregation shuffle
    * total, the detection pass is map-side. */
  def zscoreOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val vc = Star.cents(col("value")).cast(DecimalType(18, 0))
    val stats = Star.events(spark, dir)
      .groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("n"),
        sum(vc).cast(DecimalType(38, 0)).as("sx"),
        sum(vc * vc).cast(DecimalType(38, 0)).as("sxx"))
      .select(col("et"), col("n"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean_c"),
        sqrt((col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) /
          (col("n").cast("double") * (col("n").cast("double") - 1)))
          .as("std_c"))
    Star.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        Star.cents(col("value")).as("v_c"))
      .join(broadcast(stats), col("event_type") === col("et"))
      .withColumn("z",
        (col("v_c").cast("double") - col("mean_c")) / col("std_c"))
      .filter(abs(col("z")) >= 3.0)
      .select(col("event_id"), col("event_type"), col("v_c"),
        round(col("z"), 4).as("z_r4"))
      .orderBy("event_id")
  }

  private val zscoreOutliersSql =
    s"""WITH stats AS (
       |  SELECT event_type AS et, COUNT(*) AS n,
       |    CAST(SUM(CAST(${Star.Sql.cents("value")} AS DECIMAL(18,0)))
       |      AS DECIMAL(38,0)) AS sx,
       |    CAST(SUM(CAST(${Star.Sql.cents("value")} AS DECIMAL(18,0))
       |           * CAST(${Star.Sql.cents("value")} AS DECIMAL(18,0)))
       |      AS DECIMAL(38,0)) AS sxx
       |  FROM events GROUP BY event_type),
       |m AS (
       |  SELECT et, n, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
       |    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS std_c
       |  FROM stats)
       |SELECT event_id, event_type,
       |  ${Star.Sql.cents("value")} AS v_c,
       |  round((CAST(${Star.Sql.cents("value")} AS DOUBLE) - mean_c)
       |        / std_c, 4) AS z_r4
       |FROM events JOIN m ON event_type = et
       |WHERE abs((CAST(${Star.Sql.cents("value")} AS DOUBLE) - mean_c)
       |          / std_c) >= 3.0
       |ORDER BY event_id""".stripMargin

  /** Quantity-weighted mean price per return flag through the typed
    * `Aggregator` UDAF path (graft.functions.ExactAggregators): exact long
    * accumulation in a Tungsten-encoded buffer, BigInt-widened rational
    * finish. Plans as a normal partial+final ObjectHashAggregate — the
    * custom aggregate rides map-side combine like a built-in. */
  def weightedAvg(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        graft.functions.ExactAggregators.weightedMean(
          col("l_quantity").cast("long"),
          Star.cents(col("l_extendedprice"))).as("wavg_price_c"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  private val weightedAvgSql =
    s"""SELECT l_returnflag,
       |  CAST((CAST(SUM(CAST(l_quantity AS BIGINT)
       |               * ${Star.Sql.cents("l_extendedprice")}) AS HUGEINT)
       |        * 1000000)
       |       // CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS BIGINT)
       |    / 1000000.0 AS wavg_price_c,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Table profiling (the data-quality sweep every pipeline runs first):
    * per column — row count, nulls, distincts, min/max rendered to text.
    * One pass over the table computing all columns' stats in a single
    * aggregate row, then unpivoted to (column, metric...) form — the scan
    * count stays 1 regardless of column count. */
  def profileTable(spark: SparkSession, dir: String): DataFrame = {
    val o = Star.table(spark, dir, "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    } :+ count(lit(1)).as("__n")
    val wide = o.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      wide.select(lit(c).as("column_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_str"), col(s"${c}__mx").as("max_str"))
    }.reduce(_ unionAll _)
    stacked.orderBy("column_name")
  }

  private val profileTableSql = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_str,
         |  CAST(MAX($c) AS VARCHAR) AS max_str
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** Per-group ordinary-least-squares trend: slope/intercept of value
    * over time for each event type, from EXACT integer moment sums —
    * x = whole hours since the corpus epoch, y = value in cents, so
    * n·Σxy − Σx·Σy and n·Σx² − (Σx)² are pure integer arithmetic
    * (bounds hold to sf≈1 per group; beyond that, widen to decimal) and
    * the final slope/intercept divisions are IEEE-deterministic.
    * One map-side-combined aggregate — the same single-pass shape as
    * the moment-based correlation matrix. */
  def linregPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val x = floor((unix_micros(col("ts")) -
      unix_micros(lit("2024-01-01").cast("timestamp"))) / 3600000000L)
      .cast("long")
    val y = Star.cents(col("value"))
    val g = Star.events(spark, dir)
      .select(col("event_type"), x.as("x"), y.as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = num.cast("double") / den.cast("double")
    g.select(col("event_type"), col("n"),
        slope.as("slope_c_per_h"),
        ((col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("n").cast("double")).as("intercept_c"))
      .orderBy("event_type")
  }

  private val linregPerGroupSql = {
    val x = "(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 3600000000"
    val y = Star.Sql.cents("value")
    s"""WITH m AS (
       |  SELECT event_type, COUNT(*) AS n,
       |    CAST(SUM($x) AS BIGINT) AS sx,
       |    CAST(SUM($y) AS BIGINT) AS sy,
       |    CAST(SUM(($x) * ($y)) AS BIGINT) AS sxy,
       |    CAST(SUM(($x) * ($x)) AS BIGINT) AS sxx
       |  FROM events GROUP BY event_type)
       |SELECT event_type, n,
       |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
       |    AS slope_c_per_h,
       |  (CAST(sy AS DOUBLE) -
       |    (CAST(n * sxy - sx * sy AS DOUBLE) /
       |     CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
       |    / CAST(n AS DOUBLE) AS intercept_c
       |FROM m ORDER BY event_type""".stripMargin
  }

  /** Robust outliers via MEDIAN ABSOLUTE DEVIATION — the z-score's
    * outlier-resistant sibling (a single wild value shifts the mean and
    * stddev but not the medians). Exact integer order statistics both
    * passes: doubled-median med2 = 2·Σ(middle values)/|middle| from the
    * rank window, doubled deviations |2y − med2|, doubled-again MAD,
    * and the flag 2·dev2 > 3·mad4 — never a float until presentation.
    *
    * Scale note: rank-per-group windows are the right shape when groups
    * are numerous and small-to-medium (each window sorts locally after
    * the one hash exchange). For FEW huge groups, the value-bucket
    * two-level form (see Quantiles.exactQuantiles) replaces the
    * single-task-per-group sort — same doctrine, different layout. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g")
    def medians2(df: DataFrame, valueCol: String): DataFrame = {
      val ww = Window.partitionBy("g").orderBy(valueCol)
      df.withColumn("rk", row_number().over(ww))
        .withColumn("n", count(lit(1)).over(w))
        .filter((col("n") % 2 === 1 && col("rk") === (col("n") + 1) / 2) ||
          (col("n") % 2 === 0 &&
            (col("rk") === col("n") / 2 || col("rk") === col("n") / 2 + 1)))
        .groupBy("g")
        // integer DIV, not double-divide-then-cast: the quotient must stay
        // in exact integer arithmetic per the determinism doctrine (DIV
        // and DuckDB's // both truncate toward zero), independent of the
        // middle-row count staying tiny
        .agg(expr(s"(sum($valueCol) * 2L) div count(*)").as("m2"))
    }
    val base = Star.events(spark, dir)
      .select(col("event_type").as("g"), Star.cents(col("value")).as("y"))
    val med = medians2(base, "y")
    val dev = base.join(broadcast(med), "g")
      .select(col("g"), col("y"), col("m2"),
        abs(col("y") * 2L - col("m2")).as("dev2"))
    val mad = medians2(dev.select(col("g"), col("dev2")), "dev2")
      .withColumnRenamed("m2", "mad4")
    dev.join(broadcast(mad), "g")
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        (max("m2").cast("double") / 2.0).as("median_c"),
        (max("mad4").cast("double") / 4.0).as("mad_c"),
        sum(when(col("dev2") * 2L > lit(3L) * col("mad4"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("g")
  }

  private val madOutliersSql = {
    val y = Star.Sql.cents("value")
    def med2(src: String, v: String): String =
      s"""SELECT g, CAST(SUM($v) * 2 // COUNT(*) AS BIGINT) AS m2
         |  FROM (
         |    SELECT g, $v,
         |      ROW_NUMBER() OVER (PARTITION BY g ORDER BY $v) AS rk,
         |      COUNT(*) OVER (PARTITION BY g) AS n
         |    FROM $src)
         |  WHERE (n % 2 = 1 AND rk = (n + 1) // 2)
         |     OR (n % 2 = 0 AND (rk = n // 2 OR rk = n // 2 + 1))
         |  GROUP BY g""".stripMargin
    s"""WITH base AS (
       |  SELECT event_type AS g, $y AS y FROM events),
       |med AS (
       |${med2("base", "y")}),
       |dev AS (
       |  SELECT base.g, y, m2, abs(y * 2 - m2) AS dev2
       |  FROM base JOIN med ON base.g = med.g),
       |mad AS (
       |${med2("dev", "dev2")})
       |SELECT dev.g, COUNT(*) AS n,
       |  CAST(MAX(dev.m2) AS DOUBLE) / 2.0 AS median_c,
       |  CAST(MAX(mad.m2) AS DOUBLE) / 4.0 AS mad_c,
       |  CAST(SUM(CASE WHEN dev2 * 2 > 3 * mad.m2 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_outliers
       |FROM dev JOIN mad ON dev.g = mad.g
       |GROUP BY dev.g ORDER BY dev.g""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_mad_outliers", madOutliers, Some(madOutliersSql)),
    QueryDef("q_linreg_group", linregPerGroup, Some(linregPerGroupSql)),
    QueryDef("q_profile_table", profileTable, Some(profileTableSql)),
    QueryDef("q_weighted_avg", weightedAvg, Some(weightedAvgSql)),
    QueryDef("q_zscore_outliers", zscoreOutliers, Some(zscoreOutliersSql)),
    QueryDef("q_corr_matrix", corrMatrix, Some(corrMatrixSql)),
    QueryDef("q_cube", cubeOrders, Some(cubeOrdersSql)),
    QueryDef("q_arg_extremes", argExtremes, Some(argExtremesSql)),
    QueryDef("q_topk_per_group", topkPerGroup, Some(topkPerGroupSql)),
    QueryDef("q_pivot", pivotOrders, Some(pivotOrdersSql)),
    QueryDef("q_string_funcs", stringFuncs, Some(stringFuncsSql)),
    QueryDef("q_date_math", dateMath, Some(dateMathSql)),
    QueryDef("q_percentiles", percentiles, Some(percentilesSql)),
    QueryDef("q_stats_sketch", statsSketch, Some(statsSketchSql)),
    QueryDef("q_heavy_hitters_cms", heavyHittersCms, Some(heavyHittersCmsSql)),
    QueryDef("q_stats_exact", statsExact, Some(statsExactSql)),
  )
}
