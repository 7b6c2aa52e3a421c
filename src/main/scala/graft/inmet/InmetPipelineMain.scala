package graft.inmet

import org.apache.spark.sql.SparkSession

/** CLI entry point for the full INMET pipeline — the engine's equivalent of
  * the reference's `spark-submit job_parquet.py` + DAG chain. Usage:
  *
  *   runMain graft.inmet.InmetPipelineMain <csvGlob> <stageDir> <analyticDir> [--partitioned]
  *
  * `--partitioned` writes the hourly fact in the ano/mes directory-
  * partitioned layout (graft.sources.Layout) — the stage layout a
  * 100 TB deployment would use for partition-pruned time scans.
  */
object InmetPipelineMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || (args.length == 4 && args(3) == "--partitioned"),
      "usage: InmetPipelineMain <csvGlob> <stageDir> <analyticDir> [--partitioned]")
    val Array(inputGlob, stageDir, analyticDir) = args.take(3)
    val partitioned = args.length == 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-inmet-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (partitioned) {
      val st = Pipeline.stage(spark, inputGlob)
      st.cidades.write.mode("overwrite").parquet(s"$stageDir/cidades")
      graft.sources.Layout.previsoesPartitioned(st.previsoes, s"$stageDir/previsoes")
      val stagedPrevisoes = spark.read.parquet(s"$stageDir/previsoes")
        .drop("ano", "mes")
      Ingest.datas(stagedPrevisoes).write.mode("overwrite")
        .parquet(s"$stageDir/datas")
      val staged = Pipeline.Stage(
        cidades = spark.read.parquet(s"$stageDir/cidades"),
        previsoes = stagedPrevisoes,
        datas = spark.read.parquet(s"$stageDir/datas"))
      val an = Pipeline.analytics(staged)
      an.dimCidadeAtributos.write.mode("overwrite")
        .parquet(s"$analyticDir/dim_cidade_atributos")
      an.fatoAggPrevisoesDia.write.mode("overwrite")
        .parquet(s"$analyticDir/fato_agg_previsoes_dia")
      an.cidadeKpisMensal.write.mode("overwrite")
        .parquet(s"$analyticDir/cidade_kpis_mensal")
    } else {
      Pipeline.run(spark, inputGlob, stageDir, analyticDir)
    }
    println(s"[inmet] pipeline complete: stage=$stageDir analytic=$analyticDir" +
      (if (partitioned) " (partitioned previsoes)" else ""))
    spark.stop()
  }
}
