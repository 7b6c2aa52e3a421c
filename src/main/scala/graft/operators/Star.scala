package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Loaders + determinism helpers for the harness star schema
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * Determinism doctrine: every floating-point aggregate the engine exposes
  * for oracle comparison is computed as an EXACT decimal sum (order-
  * independent) cast back to double, optionally divided by a count. This
  * makes results bit-identical across partitionings, engines (Spark vs
  * DuckDB), and cluster sizes — a property plain double summation does not
  * have. The same helpers are mirrored on the SQL side (`Sql` object).
  */
object Star {

  // Analyzed base-relation cache, keyed by (session, path) with the
  // source identity tag as the cached VALUE's guard. `spark.read.parquet`
  // re-reads footers for schema inference and rebuilds the file index on
  // EVERY call — a fixed metadata tax paid by every query over the same
  // immutable snapshot. A real engine (and the DuckDB oracle, whose views
  // are registered once per connection) resolves a table's metadata once
  // per session; this cache is that catalog. The identity tag (len+mtime)
  // keeps a regenerated testdata snapshot from serving a stale relation —
  // and because the tag lives in the value, a regeneration REPLACES the
  // entry instead of accumulating one per snapshot (a tag-in-key layout
  // leaked every superseded relation, and its session, forever).
  // DataFrames are immutable — reuse across queries is free.
  private val tableCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, DataFrame)]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val tag = graft.sources.FixtureCache.sourceTag(dir, name)
    val key = (spark, path)
    val cur = tableCache.get(key)
    if (cur != null && cur._1 == tag) return cur._2
    // miss or superseded snapshot (rare path): also drop entries pinning
    // stopped sessions, so a closed session's relations can be GC'd
    tableCache.keySet.removeIf(_._1.sparkContext.isStopped)
    val df = spark.read.parquet(path)
    tableCache.put(key, (tag, df))
    df
  }

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Pin the star relations in columnar cache for a multi-query session
    * (the bench pass, a notebook, a serve tier's hot dimension set) —
    * the engine's buffer pool. Every query construction goes through
    * [[table]], whose analyzed relation is plan-equal across queries, so
    * one `.persist()` here substitutes an InMemoryTableScan (columnar,
    * batch-stat filter pushdown, column pruning) for the parquet scan in
    * EVERY subsequent query over the same snapshot — the per-query scan
    * + decode tax of a ~200-query pass collapses into one materialization.
    * MEMORY_AND_DISK: pressure spills columnar batches instead of
    * failing; at cluster scale the same call pins the working set across
    * executors (storage memory is the unified pool's borrowable half, so
    * an over-large pin degrades to disk reads, never OOM).
    * Returns the pinned relations (callers exclude their block ids from
    * between-query cleanup). `events` is pinned in its NORMALIZED form —
    * the shape every query consumes. */
  def pinTables(spark: SparkSession, dir: String): Seq[DataFrame] =
    tableNames.map { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }

  /** SQL front-end: register every star-schema table as a temp view so
    * users can drive the engine with plain `spark.sql` (combine with
    * `spark.sql.extensions=graft.plans.GraftExtensions` for the custom
    * expressions and the TopKPerGroup operator). `events` gets the same
    * nanos→micros normalization as the DataFrame path. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** Local testdata parquet is written as ONE row group per file, so a scan
    * yields a single split — map-side work would run on 1 core no matter
    * how many the session has. On a cluster the same table arrives as
    * thousands of splits. `fan` recovers scan parallelism locally with an
    * explicit round-robin repartition (AQE never coalesces an explicit
    * count; filters and pruning still push through it into the scan).
    * Apply it ONLY where per-row/per-pair compute dominates the extra
    * shuffle — an always-on fan-out taxes every cheap single-stage query
    * with one more exchange, which full-bench measurement showed is a net
    * loss. */
  /** Fan a (typically single-file, hence single-split) scan out to the
    * cluster's parallelism. HASH on the whole row, not round-robin
    * (r16): every keyless `repartition(n)` first pays a local sort of
    * its input (`spark.sql.execution.sortBeforeRepartition`, on by
    * default since SPARK-23207, so retried tasks reproduce the same
    * row-to-partition assignment) — measured at ~35 % of q_corr_matrix
    * (1.05 → 0.68 s with the sort off). A DETERMINISTIC hash of all
    * columns needs no such sort: re-run tasks re-derive the same
    * placement from row content (the guide's pmod(xxhash64(...))
    * doctrine). The hash keys on the FIRST column only — hashing every
    * column was A/B'd a wash (long text/array columns cost as much to
    * hash as the sort they replace); the contract, audited across all
    * 29 call sites, is that fan consumers pass an ID-LED relation
    * (doc_id / vec_id / media_id / l_orderkey first), whose
    * cardinality ≫ partitions keeps the spread even. */
  def fan(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism,
      xxhash64(col(df.columns.head)))

  /** `events` has shipped as both parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read as long nanos, truncate to micros,
    * matching DuckDB) and TIMESTAMP(MICROS) (reads directly as a
    * timestamp under inferTimestampNTZ=false + UTC session). Branch on the
    * inferred type so either layout yields the same micro-precision ts.
    * Self-contained: the loader pins its own reader confs (nanos-as-long,
    * NTZ inference off) AND carries a TimestampNTZType arm, so a caller
    * session built without the entry-point conf pins still gets
    * session-TZ TIMESTAMP semantics (unix_micros, watermarks) instead of
    * a silently-shifted NTZ column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // the NTZ arm below interprets wall-clock values through the session
    // zone — pin it here so a session without the entry-point conf pins
    // still yields the intended UTC instants
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // a pre-pin session may have cached the footer-inferred NTZ schema;
        // reinterpret the wall-clock micros as a UTC-instant TIMESTAMP
        raw.withColumn("ts", to_utc_timestamp(col("ts"), "UTC"))
      case _ => raw
    }
  }

  /** Order-independent exact sum of a double measure: cast each value to
    * DECIMAL(18,4) (exact for the 2-decimal money / integer-ish measures in
    * the star schema), sum exactly, return as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** [[dsum]] for RAW ≤2-decimal money / integer-ish columns ONLY — the
    * [[cents]] precondition: `round(x·10⁴)` lands on the same integer in
    * every engine because the true value is a ≤4-decimal rational, never
    * a rounding tie. (COMPUTED doubles — e.g. the events `value` column
    * — stay on the decimal [[dsum]]: their myriad product can straddle a
    * tie and the engines' round() disagree there.)
    *
    * Implementation: a 128-bit-exact SPLIT ACCUMULATOR in plain long
    * arithmetic — myriads split at 2²⁰ into (hi, lo); two long sums per
    * measure run in whole-stage codegen (no per-row BigDecimal — the
    * decimal(18,4) sum's buffer widens past Spark's 18-digit compact
    * representation and pays JavaBigDecimal per row: measured 0.93 s vs
    * 0.53 s for the 5-aggregate pricing block at sf0.1); ONE decimal
    * recombine per GROUP restores the exact total. v = (v>>20)·2²⁰ +
    * (v & (2²⁰−1)) holds for all two's-complement v, negatives included.
    * Exactness bounds, documented not incidental: per group,
    * rows < 2⁶³/2²⁰ ≈ 8.8e12 (lo side) and Σ|x| < ~9.6e20 units (hi
    * side) — beyond any 100 TB partition of a money measure. */
  def dsumX(c: Column): Column = {
    val m = round(c * 10000).cast("long")
    ((sum(m.bitwiseAND(lit(1048575L))) +
      sum(shiftright(m, 20)).cast(DecimalType(38, 0)) * lit(1048576L))
      .cast("double") / 1e4)
  }

  /** Deterministic average = exact sum / group size (COUNT(*)). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** [[davg]] on the [[dsumX]] fast path (same input precondition). */
  def davgX(c: Column): Column = dsumX(c) / count(lit(1))

  /** Deterministic average over non-null values only (null-skipping). */
  def davgNonNull(c: Column): Column = dsum(c) / count(c)

  /** [[davgNonNull]] on the [[dsumX]] fast path (same precondition). */
  def davgNonNullX(c: Column): Column = dsumX(c) / count(c)

  /** 2-decimal money double -> exact integer cents (BIGINT). The raw money
    * columns carry exactly 2 decimals, so `round(x*100)` lands on the same
    * integer in every engine — the basis for exact product arithmetic.
    * (Casting COMPUTED doubles to decimals is NOT portable: engines round
    * shortest-decimal-repr vs binary-multiply and disagree near ties.) */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact integer floor division of non-negative integer-valued columns.
    * Portable determinism: floor of an integer quotient is unambiguous in
    * every engine, unlike rounding a computed double. Bounds for exactness
    * (enforced by choosing scalings at call sites): num < 2^53 and
    * num * 1.2e-16 < 1/den, comfortably true for all registered queries up
    * to sf >= 10. */
  def idiv(num: Column, den: Column): Column =
    floor(num.cast("double") / den.cast("double")).cast("long")

  /** Rational num/den emitted as a double with exact 1e-6 floor
    * quantization. 128-bit exact at ANY corpus scale: the previous
    * `long * 1000000` form overflowed once num exceeded ~9.2e12 —
    * corpus-scale money cumulative sums cross that at ≈6× sf0.1 (the
    * ×10 ratio bench caught q_pareto_suppliers throwing
    * ARITHMETIC_OVERFLOW), and its double-based idiv was only exact
    * below 2^53 anyway. DECIMAL(38,0) multiply is exact to 1e38 and
    * `IntegralDivide` on decimals is exact integer floor; the DuckDB
    * twin ([[Sql.ratio6]]) widens to HUGEINT for the same 128-bit
    * domain, so both engines stay value-identical from test scale to
    * cluster scale.
    * POSITIVE quotients only: Spark-side truncation and DuckDB's `//`
    * agree on positives but diverge on negatives (truncate-toward-zero
    * vs floor) — rearrange call sites so the division is positive
    * (e.g. growth = ratio6(cur, prev) - 1, never
    * ratio6(cur - prev, prev)). */
  def ratio6(num: Column, den: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val dec = DecimalType(38, 0)
    Bridge.column(IntegralDivide(
      Bridge.expression(num.cast(dec) * lit(1000000L).cast(dec)),
      Bridge.expression(den.cast(dec))))
      .cast("double") / 1000000.0
  }

  /** Contiguous 0-based global rank over a total order WITHOUT a
    * single-task window. `Window.orderBy(...)` plans as Exchange
    * SinglePartition + Sort — one task ranks the whole relation at any
    * scale. Here `orderBy` is Spark's range-partitioned parallel sort
    * (sampled split points, every core sorts a slice) and `zipWithIndex`
    * assigns contiguous ids with one lightweight per-partition count job,
    * preserving the total order deterministically. `sortCols` must be a
    * UNIQUE key of the relation — ties would make the rank
    * partition-layout-dependent. */
  def globalRank(spark: SparkSession, df: DataFrame, rankCol: String,
                 sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.Row
    val sorted = df.orderBy(sortCols: _*)
    // deliberately NOT persisted before zipWithIndex (r16 A/B: caching
    // the deserialized sorted rows measured slower than the recompute —
    // see the snmPass note). A second r16 probe replaced the whole
    // idiom with sort → localCheckpoint → monotonically_increasing_id
    // decomposed into (partition, position) + broadcast partition
    // offsets — all-codegen, no Row conversion, single sort evaluation
    // — and measured WORSE too (5-query consumer set 4.56 → 4.88 s):
    // checkpoint-storing the full sorted relation (shingle arrays on
    // the SNM path) costs more than zipWithIndex's recompute. An
    // UN-checkpointed variant is unsound: the offsets branch and the
    // main branch would be two separate evaluations of a
    // sampling-partitioned range exchange, so row-to-partition
    // assignment could diverge between them.
    val schema = sorted.schema.add(rankCol, LongType)
    spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** SQL-side mirrors of the helpers, DuckDB dialect. */
  object Sql {
    def dsum(c: String): String =
      s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"
    def davg(c: String): String = s"(${dsum(c)} / COUNT(*))"
    // dsumX mirror: DuckDB's SUM(BIGINT) is exact HUGEINT, so the split
    // is unnecessary — what must MATCH is the two-step conversion
    // (exact myriad integer → double, then the /10⁴ division), not the
    // accumulator layout. Identical rationals + identical IEEE ops →
    // byte-identical doubles at any scale.
    def dsumX(c: String): String =
      s"(CAST(SUM(CAST(round(($c) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0)"
    def davgX(c: String): String = s"(${dsumX(c)} / COUNT(*))"
    def davgNonNull(c: String): String = s"(${dsum(c)} / COUNT($c))"
    def davgNonNullX(c: String): String = s"(${dsumX(c)} / COUNT($c))"
    def cents(c: String): String = s"CAST(round($c * 100) AS BIGINT)"
    def idiv(num: String, den: String): String = s"(($num) // ($den))"
    def ratio6(num: String, den: String): String =
      s"(CAST((CAST($num AS HUGEINT) * 1000000) // CAST($den AS HUGEINT) AS DOUBLE) / 1000000.0)"
  }
}
