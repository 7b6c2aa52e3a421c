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
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "262144")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = spark.read.parquet(s"$dir/events.parquet")
    // per-key dim built once from the fact's key space (distinct user_ids)
    val dim = events.select(col("user_id")).distinct()
      .select(col("user_id"), format_string("user_%d", col("user_id")).as("name"))
    dim.write.mode("overwrite").parquet("/tmp/graft_skew_dim.parquet")
    val dimT = spark.read.parquet("/tmp/graft_skew_dim.parquet")

    val joined = events.join(dimT.hint("shuffle_merge"), Seq("user_id"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(graft.operators.Star.cents(col("value"))).as("sv_c"))

    // warm-up (footers + codegen), then timed run
    joined.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    joined.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9

    // pull skew metrics from the final adaptive plan
    val reads = joined.queryExecution.executedPlan.collect {
      case r: AQEShuffleReadExec => r }
    val skewedParts = reads.flatMap(_.metrics.get("numSkewedPartitions")
      .map(_.value)).sum
    val skewedSplits = reads.flatMap(_.metrics.get("numSkewedSplits")
      .map(_.value)).sum
    val hot = joined.filter(col("user_id") === 0)
      .collect().headOption.map(r => r.getLong(1)).getOrElse(-1L)
    spark.stop()
    println(s"""{"probe":"skew","label":"$label","sec":${f"$sec%.3f"},""" +
      s""""skewed_partitions":$skewedParts,"skew_splits":$skewedSplits,""" +
      s""""hot_rows":$hot}""")
  }
}
