package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal warehouse operators: slowly-changing-dimension (type 2)
  * history build, snapshot diffing (CDC without a log), and time-series
  * gap-fill with linear interpolation.
  */
object Temporal {

  /** SCD-2 dimension build from an event log: collapse each user's event
    * stream into contiguous state intervals (valid_from, valid_to,
    * is_current), keeping only rows where the state actually changed.
    * Two window passes over the same (user_id × time) ordering — Catalyst
    * plans them into a single sort + two window stages with no extra
    * exchange, so the whole build is one shuffle keyed on user_id. */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Star.events(spark, dir)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("user_id", "valid_from")
  }

  private val scd2Sql =
    """WITH marked AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |changes AS (
      |  SELECT user_id, event_type AS state, ts, event_id FROM marked
      |  WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, state, ts AS valid_from,
      |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS valid_to,
      |  (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
      |    AS is_current
      |FROM changes ORDER BY user_id, valid_from""".stripMargin

  /** Snapshot diff (CDC by comparison): aggregate per-customer order state
    * at two historical cutoffs and classify the delta. The full-outer join
    * keys both sides on the same column, so at scale the two aggregates
    * and the join share one hash partitioning — a single shuffle of
    * customer-grain rows (already reduced from order grain map-side). */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Star.table(spark, dir, "orders")
    def snap(cutoff: String) = o
      .filter(col("o_orderdate") < lit(cutoff))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(Star.cents(col("o_totalprice"))).as("total_c"))
    snap("1996-01-01").as("a")
      .join(snap("1997-01-01").as("b"),
        col("a.o_custkey") === col("b.o_custkey"), "full_outer")
      .select(
        coalesce(col("a.o_custkey"), col("b.o_custkey")).as("custkey"),
        when(col("a.o_custkey").isNull, "added")
          .when(col("b.o_custkey").isNull, "removed")
          .when(col("a.n") =!= col("b.n") ||
            col("a.total_c") =!= col("b.total_c"), "changed")
          .otherwise("unchanged").as("change_type"),
        col("a.n").as("orders_a"), col("b.n").as("orders_b"),
        col("a.total_c").as("total_a_c"), col("b.total_c").as("total_b_c"))
      .filter(col("change_type") =!= "unchanged")
      .orderBy("custkey")
  }

  private val snapshotDiffSql =
    s"""WITH a AS (
       |  SELECT o_custkey, COUNT(*) AS n,
       |    CAST(SUM(${Star.Sql.cents("o_totalprice")}) AS BIGINT) AS total_c
       |  FROM orders WHERE o_orderdate < DATE '1996-01-01'
       |  GROUP BY o_custkey),
       |b AS (
       |  SELECT o_custkey, COUNT(*) AS n,
       |    CAST(SUM(${Star.Sql.cents("o_totalprice")}) AS BIGINT) AS total_c
       |  FROM orders WHERE o_orderdate < DATE '1997-01-01'
       |  GROUP BY o_custkey)
       |SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
       |  CASE WHEN a.o_custkey IS NULL THEN 'added'
       |       WHEN b.o_custkey IS NULL THEN 'removed'
       |       WHEN a.n <> b.n OR a.total_c <> b.total_c THEN 'changed'
       |       ELSE 'unchanged' END AS change_type,
       |  a.n AS orders_a, b.n AS orders_b,
       |  a.total_c AS total_a_c, b.total_c AS total_b_c
       |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
       |WHERE (CASE WHEN a.o_custkey IS NULL THEN 'added'
       |            WHEN b.o_custkey IS NULL THEN 'removed'
       |            WHEN a.n <> b.n OR a.total_c <> b.total_c THEN 'changed'
       |            ELSE 'unchanged' END) <> 'unchanged'
       |ORDER BY custkey""".stripMargin

  /** Time-series gap-fill + linear interpolation: bucket a sparse event
    * stream by hour, densify against a generated hour calendar, and fill
    * holes by interpolating between the nearest observed neighbors.
    * Interpolated values use exact integer-rational arithmetic
    * (counts × hour offsets, Star.ratio6) — bit-stable across engines.
    *
    * Scale note: the single unpartitioned window runs on the CALENDAR
    * axis, whose cardinality is bounded by wall-clock time (≈ 9k rows per
    * decade of hours), not by data volume — the 100 TB of events is
    * reduced to that axis by the keyed group-by before any window runs.
    * Series-per-key variants would partition the same windows by key. */
  def gapfillInterp(spark: SparkSession, dir: String): DataFrame = {
    val ev = Star.events(spark, dir)
    val hourly = ev
      .filter(col("event_type") === "error" && col("value") > 80)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("observed"))
    val cal = ev
      .agg(date_trunc("hour", min("ts")).as("h0"),
        date_trunc("hour", max("ts")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("h"))
    val wPrev = Window.orderBy("h")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.orderBy("h")
      .rowsBetween(1, Window.unboundedFollowing)
    cal.join(hourly, Seq("h"), "left")
      .withColumn("hrs", expr("unix_timestamp(h) DIV 3600"))
      .withColumn("obs_hrs", when(col("observed").isNotNull, col("hrs")))
      .withColumn("prev_v", last(col("observed"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_h", last(col("obs_hrs"), ignoreNulls = true).over(wPrev))
      .withColumn("next_v", first(col("observed"), ignoreNulls = true).over(wNext))
      .withColumn("next_h", first(col("obs_hrs"), ignoreNulls = true).over(wNext))
      .select(col("h"), col("observed"),
        when(col("observed").isNotNull, col("observed").cast("double"))
          .when(col("prev_v").isNull || col("next_v").isNull, lit(null))
          .otherwise(Star.ratio6(
            col("prev_v") * (col("next_h") - col("hrs")) +
              col("next_v") * (col("hrs") - col("prev_h")),
            col("next_h") - col("prev_h"))).as("filled"))
      .orderBy("h")
  }

  private val gapfillInterpSql =
    s"""WITH span AS (
       |  SELECT date_trunc('hour', MIN(ts)) AS h0,
       |         date_trunc('hour', MAX(ts)) AS h1 FROM events),
       |cal AS (
       |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
       |  FROM span),
       |obs AS (
       |  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS observed
       |  FROM events WHERE event_type = 'error' AND value > 80
       |  GROUP BY 1),
       |j AS (
       |  SELECT cal.h, obs.observed,
       |    epoch_us(cal.h) // 3600000000 AS hrs,
       |    CASE WHEN obs.observed IS NOT NULL
       |      THEN epoch_us(cal.h) // 3600000000 END AS obs_hrs
       |  FROM cal LEFT JOIN obs ON obs.h = cal.h),
       |f AS (
       |  SELECT h, observed, hrs,
       |    LAST_VALUE(observed IGNORE NULLS) OVER (ORDER BY h
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
       |    LAST_VALUE(obs_hrs IGNORE NULLS) OVER (ORDER BY h
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_h,
       |    FIRST_VALUE(observed IGNORE NULLS) OVER (ORDER BY h
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
       |    FIRST_VALUE(obs_hrs IGNORE NULLS) OVER (ORDER BY h
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_h
       |  FROM j)
       |SELECT h, observed,
       |  CASE WHEN observed IS NOT NULL THEN CAST(observed AS DOUBLE)
       |       WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
       |       ELSE ${Star.Sql.ratio6(
               "prev_v * (next_h - hrs) + next_v * (hrs - prev_h)",
               "next_h - prev_h")} END AS filled
       |FROM f ORDER BY h""".stripMargin

  /** OHLC bars (open/high/low/close) per day x event type: open/close via
    * whole-partition first/last over the (ts, event_id) ordering, extremes
    * and volume as plain aggregates. One shuffle on the bar key; the
    * window and the group-by share the same partitioning. Values ride in
    * exact integer cents. */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("d", "event_type")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Star.events(spark, dir)
      .select(to_date(col("ts")).as("d"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        Star.cents(col("value")).as("v_c"))
      .withColumn("open_c", first(col("v_c")).over(w))
      .withColumn("close_c", last(col("v_c")).over(w))
      .groupBy("d", "event_type")
      .agg(max(col("open_c")).as("open_c"), max(col("v_c")).as("high_c"),
        min(col("v_c")).as("low_c"), max(col("close_c")).as("close_c"),
        count(lit(1)).as("n"), sum(col("v_c")).as("volume_c"))
      .orderBy("d", "event_type")
  }

  private val ohlcBarsSql =
    s"""WITH ev AS (
       |  SELECT CAST(ts AS DATE) AS d, event_type, epoch_us(ts) AS us,
       |    event_id, ${Star.Sql.cents("value")} AS v_c
       |  FROM events),
       |fl AS (
       |  SELECT d, event_type, v_c,
       |    FIRST_VALUE(v_c) OVER w AS open_c,
       |    LAST_VALUE(v_c) OVER w AS close_c
       |  FROM ev
       |  WINDOW w AS (PARTITION BY d, event_type ORDER BY us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
       |SELECT d, event_type, MAX(open_c) AS open_c, MAX(v_c) AS high_c,
       |  MIN(v_c) AS low_c, MAX(close_c) AS close_c, COUNT(*) AS n,
       |  CAST(SUM(v_c) AS BIGINT) AS volume_c
       |FROM fl GROUP BY d, event_type ORDER BY d, event_type""".stripMargin

  /** MERGE/upsert emulation (no transactional table format in scope): the
    * base dimension full-outer-joins a changes set; matched rows take the
    * update, unmatched-by-source rows pass through, unmatched-by-target
    * rows insert. One shuffle on the merge key — identical plan shape to
    * what a MERGE INTO compiles to. The changes set is derived
    * deterministically from orders (each customer's 1997+ order count and
    * cents total). */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Star.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        Star.cents(col("c_acctbal")).as("acctbal_c"))
    val changes = Star.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Star.cents(col("o_totalprice"))).as("spend_c"))
    base.as("b")
      .join(changes.as("c"), col("b.c_custkey") === col("c.o_custkey"),
        "full_outer")
      .select(
        coalesce(col("b.c_custkey"), col("c.o_custkey")).as("c_custkey"),
        coalesce(col("b.c_name"), lit("UNKNOWN")).as("c_name"),
        coalesce(col("b.c_mktsegment"), lit("UNKNOWN")).as("c_mktsegment"),
        (coalesce(col("b.acctbal_c"), lit(0L)) -
          coalesce(col("c.spend_c"), lit(0L))).as("acctbal_c"),
        coalesce(col("c.n_orders"), lit(0L)).as("n_orders"),
        when(col("b.c_custkey").isNull, "insert")
          .when(col("c.o_custkey").isNull, "keep")
          .otherwise("update").as("merge_action"))
      .orderBy("c_custkey")
  }

  private val mergeUpsertSql =
    s"""WITH changes AS (
       |  SELECT o_custkey, COUNT(*) AS n_orders,
       |    CAST(SUM(${Star.Sql.cents("o_totalprice")}) AS BIGINT) AS spend_c
       |  FROM orders WHERE o_orderdate >= DATE '1997-01-01'
       |  GROUP BY o_custkey)
       |SELECT COALESCE(b.c_custkey, c.o_custkey) AS c_custkey,
       |  COALESCE(b.c_name, 'UNKNOWN') AS c_name,
       |  COALESCE(b.c_mktsegment, 'UNKNOWN') AS c_mktsegment,
       |  COALESCE(${Star.Sql.cents("b.c_acctbal")}, 0)
       |    - COALESCE(c.spend_c, 0) AS acctbal_c,
       |  COALESCE(c.n_orders, 0) AS n_orders,
       |  CASE WHEN b.c_custkey IS NULL THEN 'insert'
       |       WHEN c.o_custkey IS NULL THEN 'keep'
       |       ELSE 'update' END AS merge_action
       |FROM customer b FULL OUTER JOIN changes c ON b.c_custkey = c.o_custkey
       |ORDER BY c_custkey""".stripMargin

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): null keys match
    * each other — the join Spark plans as a hash join on a null-tolerant
    * key, NOT a nested loop. Keys are made sparse-nullable from the order
    * priority. */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Star.table(spark, dir, "orders")
      .select(col("o_orderkey"),
        when(col("o_orderpriority") === "1-URGENT", lit(null))
          .otherwise(col("o_orderpriority")).as("k"))
    val dim = Star.table(spark, dir, "orders")
      .groupBy(when(col("o_orderpriority") === "1-URGENT", lit(null))
        .otherwise(col("o_orderpriority")).as("k"))
      .agg(count(lit(1)).as("n_in_class"))
    o.as("l").join(broadcast(dim).as("r"), col("l.k") <=> col("r.k"))
      .groupBy(col("l.k").as("k"))
      .agg(count(lit(1)).as("n_rows"), max(col("n_in_class")).as("n_in_class"))
      .orderBy(col("k").asc_nulls_first)
  }

  private val nullSafeJoinSql =
    """WITH o AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
      |         ELSE o_orderpriority END AS k
      |  FROM orders),
      |dim AS (
      |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
      |              ELSE o_orderpriority END AS k,
      |    COUNT(*) AS n_in_class
      |  FROM orders GROUP BY 1)
      |SELECT l.k, COUNT(*) AS n_rows, MAX(r.n_in_class) AS n_in_class
      |FROM o l JOIN dim r ON l.k IS NOT DISTINCT FROM r.k
      |GROUP BY l.k ORDER BY l.k NULLS FIRST""".stripMargin

  /** Merged-interval coverage (the classic gaps-and-islands sweep): each
    * order opens a 30-day interval; per customer, total days covered by
    * the UNION of intervals (overlaps merged). Island detection via the
    * running max of interval ends — one shuffle on the entity key, pure
    * integer date arithmetic. */
  def intervalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val iv = Star.table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("s"))
      .withColumn("e", date_add(col("s"), 30))
    val w = Window.partitionBy("o_custkey").orderBy(col("s"), col("e"))
    val islands = iv
      .withColumn("prev_max_e", max(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    islands
      .groupBy("o_custkey", "island")
      .agg(min(col("s")).as("is_s"), max(col("e")).as("is_e"),
        count(lit(1)).as("n_iv"))
      .groupBy("o_custkey")
      .agg(sum(datediff(col("is_e"), col("is_s"))).cast("long")
          .as("covered_days"),
        count(lit(1)).as("n_islands"),
        sum(col("n_iv")).cast("long").as("n_orders"))
      .orderBy("o_custkey")
  }

  private val intervalCoverageSql =
    """WITH iv AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS s,
      |    CAST(o_orderdate AS DATE) + 30 AS e
      |  FROM orders),
      |marked AS (
      |  SELECT o_custkey, s, e,
      |    MAX(e) OVER (PARTITION BY o_custkey ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
      |  FROM iv),
      |islands AS (
      |  SELECT o_custkey, s, e,
      |    SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
      |             THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY o_custkey ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM marked),
      |per_island AS (
      |  SELECT o_custkey, island, MIN(s) AS is_s, MAX(e) AS is_e,
      |    COUNT(*) AS n_iv
      |  FROM islands GROUP BY o_custkey, island)
      |SELECT o_custkey,
      |  CAST(SUM(date_diff('day', is_s, is_e)) AS BIGINT) AS covered_days,
      |  COUNT(*) AS n_islands,
      |  CAST(SUM(n_iv) AS BIGINT) AS n_orders
      |FROM per_island GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Per-key gap-fill with forward fill (LOCF): hourly error-count series
    * per event_type, densified against the shared hour calendar, holes
    * carrying the last observed value forward. The companion to
    * [[gapfillInterp]] with the windows PARTITIONED BY the series key —
    * the form that scales to millions of independent series, since each
    * key's calendar-length window sorts locally within one hash partition
    * (one shuffle on event_type; the calendar cross-join is map-side, the
    * dim side being bounded by wall-clock hours x key cardinality). */
  def gapfillByKey(spark: SparkSession, dir: String): DataFrame = {
    val ev = Star.events(spark, dir)
    val hourly = ev
      .filter(col("value") > 80)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("observed"))
    val cal = ev
      .agg(date_trunc("hour", min("ts")).as("h0"),
        date_trunc("hour", max("ts")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("h"))
    val keys = ev.select(col("event_type")).distinct()
    val wPrev = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, 0)
    keys.crossJoin(cal)
      .join(hourly, Seq("event_type", "h"), "left")
      .withColumn("filled_locf",
        last(col("observed"), ignoreNulls = true).over(wPrev))
      .orderBy("event_type", "h")
  }

  private val gapfillByKeySql =
    """WITH span AS (
      |  SELECT date_trunc('hour', MIN(ts)) AS h0,
      |         date_trunc('hour', MAX(ts)) AS h1 FROM events),
      |cal AS (
      |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM span),
      |keys AS (SELECT DISTINCT event_type FROM events),
      |obs AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS observed
      |  FROM events WHERE value > 80
      |  GROUP BY 1, 2)
      |SELECT keys.event_type, cal.h, obs.observed,
      |  LAST_VALUE(obs.observed IGNORE NULLS) OVER (
      |    PARTITION BY keys.event_type ORDER BY cal.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_locf
      |FROM keys CROSS JOIN cal
      |LEFT JOIN obs ON obs.event_type = keys.event_type AND obs.h = cal.h
      |ORDER BY keys.event_type, cal.h""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_gapfill_by_key", gapfillByKey, Some(gapfillByKeySql)),
    QueryDef("q_interval_coverage", intervalCoverage,
      Some(intervalCoverageSql)),
    QueryDef("q_merge_upsert", mergeUpsert, Some(mergeUpsertSql)),
    QueryDef("q_null_safe_join", nullSafeJoin, Some(nullSafeJoinSql)),
    QueryDef("q_ohlc_bars", ohlcBars, Some(ohlcBarsSql)),
    QueryDef("q_scd2", scd2, Some(scd2Sql)),
    QueryDef("q_snapshot_diff", snapshotDiff, Some(snapshotDiffSql)),
    QueryDef("q_gapfill_interp", gapfillInterp, Some(gapfillInterpSql)),
  )
}
