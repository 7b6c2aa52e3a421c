package graft.tools

import org.apache.spark.sql.SparkSession

/** Fixed-shard serve-exponent probe (BASELINE campaign, r11 verdict
  * item 5): the registered serve fixtures model the arriving shard as
  * 10 % OF the corpus, so their measured decade exponents fold fixture
  * growth (shard 10× per decade) into the chain's. This probe runs the
  * same three serve chains with a CONSTANT-size shard (source id < cap,
  * the ×1 fixture's own shard) against each scale's persisted index —
  * the exponent it measures is the chain's: index probe + verify, which
  * for a bucketed, partition-pruned index should be ~flat in corpus
  * size (expect e ≲ 0.3).
  *
  * Usage: runMain graft.tools.FixedShardProbe <sfDir> [docCap] [vecCap] [reps]
  * Defaults: docCap 5000 (= sf0.1 documents n), vecCap 2000 (= sf0.1
  * embeddings n) — so at ×1 the fixed shard IS the registered shard.
  */
object FixedShardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val docCap = if (args.length > 1) args(1).toLong else 5000L
    val vecCap = if (args.length > 2) args(2).toLong else 2000L
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val chains = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "dedup_incremental_fixed" ->
        (() => graft.operators.Dedup
          .dedupIncrementalFixedShard(spark, sfDir, docCap)),
      "contamination_serve_fixed" ->
        (() => graft.operators.Training
          .contaminationServeFixedShard(spark, sfDir, docCap)),
      "semantic_incremental_fixed" ->
        (() => graft.operators.Similarity
          .semanticDedupIncrementalFixedShard(spark, sfDir, vecCap)),
      // r12 verdict item 6: the capped serve through the APPEND LANE —
      // confirms the companion's population deltas stay shard-sized
      "semantic_capped_append_fixed" ->
        (() => graft.operators.Similarity
          .semanticDedupCappedAppendFixedShard(spark, sfDir, vecCap)))

    for ((label, mk) <- chains) {
      def run(): Double = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val rows = mk().count() // also builds index snapshots if absent
      val times = (1 to reps).map(_ => run())
      println(f"[fixedshard] $label%-28s rows=$rows%-7d " +
        times.map(t => f"$t%7.2f").mkString(" "))
    }
    spark.stop()
  }
}
