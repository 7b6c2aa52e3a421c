package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: timing of one registered query under different runtime
  * configs, repeated to expose variance.
  * Usage: runMain graft.tools.Probe <query> [sfDir] [reps] */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Testdata parquet timestamps carry isAdjustedToUTC=false; read them as
      // session-TZ (UTC) TIMESTAMP, not TIMESTAMP_NTZ, so timestamp functions
      // (unix_micros, watermarks) keep their pre-Spark-4-inference semantics.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm-up

    for (
      (label, confs) <- Seq(
        "default" -> Map[String, String](),
        "no-broadcast" -> Map("spark.sql.autoBroadcastJoinThreshold" -> "-1"),
        "no-aqe" -> Map("spark.sql.adaptive.enabled" -> "false"),
      )
    ) {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val times = (1 to reps).map(_ => run())
      println(f"[probe] $label%-14s " +
        times.map(t => f"$t%6.2f").mkString(" "))
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
    spark.stop()
  }
}
