package graft.inmet

import org.apache.spark.sql.SparkSession

/** CLI entry point for the full INMET pipeline — the engine's equivalent of
  * the reference's `spark-submit job_parquet.py` + DAG chain. Usage:
  *
  *   runMain graft.inmet.InmetPipelineMain <csvGlob> <stageDir> <analyticDir>
  */
object InmetPipelineMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: InmetPipelineMain <csvGlob> <stageDir> <analyticDir>")
    val Array(inputGlob, stageDir, analyticDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-inmet-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Pipeline.run(spark, inputGlob, stageDir, analyticDir)
    println(s"[inmet] pipeline complete: stage=$stageDir analytic=$analyticDir")
    spark.stop()
  }
}
