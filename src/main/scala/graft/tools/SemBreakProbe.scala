package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r16): split a semantic-chain query's wall time into
  * CONSTRUCTION (eager shard-band/hot pins) vs EXECUTION (noop sink).
  * Usage: runMain graft.tools.SemBreakProbe <query> [reps] */
object SemBreakProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    def once(): (Double, Double) = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      graft.operators.Dedup.releaseMaterialized()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }
    once(); once() // warm
    (1 to reps).foreach { i =>
      val (c, e) = once()
      println(f"[$name rep$i] construct=$c%.3f exec=$e%.3f total=${c + e}%.3f")
    }
    spark.stop()
  }
}
