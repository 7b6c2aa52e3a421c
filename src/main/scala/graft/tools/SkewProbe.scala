package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
import org.apache.spark.sql.functions._

/** AQE skew-join probe at scale: runs the AqeSkewSpec join shape (skewed
  * fact ⋈ per-key dim, then exact aggregation) against the skewed events
  * corpora from `tools/build_scale_probe.py --skew` and reports wall time
  * plus the runtime skew-split metrics pulled from the executed adaptive
  * plan. Expectation at 10x (BASELINE.md): the hot partition's split
  * count GROWS with the hot key's row count (AQE keeps slicing it to the
  * advisory size) and wall time stays sub-linear — the whole point of
  * runtime re-planning vs a pinned single reducer.
  *
  * Usage: SkewProbe <skewDir> [label]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_skew/skew_x1")
    val label = if (args.length > 1) args(1) else dir
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-skew-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // local-scale thresholds (same as AqeSkewSpec): the sf0.1-derived
      // corpus is MBs, not GBs, so the production 256MB advisory size
      // would never register a skew; thresholds scale with the corpus,
      // the BEHAVIOR under them is what the probe pins
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      // threshold/advisory overridable: the hot partition's bytes are
      // COMPRESSED shuffle bytes (its constant key column compresses
      // away), so the register point is corpus-dependent
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        sys.env.getOrElse("SKEW_THRESHOLD", "65536"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SKEW_ADVISORY", "16384"))
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // AQE splits a skewed reducer partition along MAP-task boundaries
      // (each split re-reads a map-index range), so a shuffle fed by one
      // map task is unsplittable no matter how skewed — and the probe
      // corpus is a single parquet file. Cap the scan split size so the
      // file fans into many map tasks, as any real cluster scan would.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SKEW_SPLIT_BYTES", "1048576"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SKEW_LOGLEVEL", "ERROR"))

    val events = spark.read.parquet(s"$dir/events.parquet")
    // per-key dim built once from the fact's key space (distinct
    // user_ids); process-unique path so concurrent probes (the x1/x10
    // A/B) can't clobber each other's input mid-read
    val dimPath = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_skew_dim_${ProcessHandle.current().pid()}.parquet"
    val dim = events.select(col("user_id")).distinct()
      .select(col("user_id"), format_string("user_%d", col("user_id")).as("name"))
    dim.write.mode("overwrite").parquet(dimPath)
    val dimT = spark.read.parquet(dimPath)

    val joined = events.join(dimT.hint("shuffle_merge"), Seq("user_id"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(graft.operators.Star.cents(col("value"))).as("sv_c"))

    // warm-up (footers + codegen) on a twin execution, then a timed
    // collect on `joined` ITSELF — the AQE skew metrics live on the
    // QueryExecution that ran, so the inspected Dataset must be the one
    // executed (a .write wraps the plan in a separate execution whose
    // adaptive plan the metrics pull below would never see). The result
    // is one row per user key (~1.5k), so collect is driver-safe.
    joined.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    val grouped = joined.collect()
    val sec = (System.nanoTime() - t0) / 1e9

    // pull skew metrics from the final adaptive plan. Both
    // AdaptiveSparkPlanExec and every QueryStageExec (Result/Shuffle) are
    // LEAVES to collect(), so descend through their wrapped plans
    // explicitly.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def allReads(p: SparkPlan): Seq[AQEShuffleReadExec] =
      p.collect {
        case r: AQEShuffleReadExec => Seq(r)
        case a: AdaptiveSparkPlanExec => allReads(a.executedPlan)
        case q: QueryStageExec => allReads(q.plan)
      }.flatten
    val reads = allReads(joined.queryExecution.executedPlan)
    val skewedParts = reads.flatMap(_.metrics.get("numSkewedPartitions")
      .map(_.value)).sum
    val skewedSplits = reads.flatMap(_.metrics.get("numSkewedSplits")
      .map(_.value)).sum
    val hot = grouped.find(_.getLong(0) == 0L)
      .map(_.getLong(1)).getOrElse(-1L)
    val planSkew = joined.queryExecution.executedPlan.toString
      .contains("skew=true")
    if (sys.env.contains("SKEW_DEBUG")) {
      reads.foreach(r => System.err.println(
        s"SKEWDBG read: ${r.metrics.map { case (k, m) => s"$k=${m.value}" }
          .mkString(", ")}"))
      System.err.println(joined.queryExecution.executedPlan.toString)
    }
    spark.stop()
    // the per-pid dim fixture is probe-run scratch — reap it so repeated
    // probes don't accumulate parquet dirs in tmpdir
    val dimDir = java.nio.file.Paths.get(dimPath)
    if (java.nio.file.Files.exists(dimDir)) {
      val walk = java.nio.file.Files.walk(dimDir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
    println(s"""{"probe":"skew","label":"$label","sec":${f"$sec%.3f"},""" +
      s""""skewed_partitions":$skewedParts,"skew_splits":$skewedSplits,""" +
      s""""plan_skew":$planSkew,"hot_rows":$hot}""")
  }
}
