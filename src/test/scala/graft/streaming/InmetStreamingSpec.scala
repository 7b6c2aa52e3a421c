package graft.streaming

import graft.SparkSuite
import graft.inmet.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming INMET ingest must produce exactly the batch stage rows. */
class InmetStreamingSpec extends SparkSuite {

  test("file-stream ingest == batch previsoes, row for row") {
    // copy the three fixtures into a fresh "landing" directory
    val landing = Files.createTempDirectory("inmet_stream")
    Seq("INMET_SE_MG_A507_UBERLANDIA.csv", "INMET_SE_MG_A508_ALMENARA.csv",
      "INMET_SE_MG_A509_MONTEVERDE.csv").foreach { f =>
      Files.copy(Paths.get(resourcePath(s"/inmet/$f")),
        landing.resolve(f), StandardCopyOption.REPLACE_EXISTING)
    }
    val dir = landing.toString
    val q = InmetStreaming.previsoesStream(spark, dir, s"$dir/*.csv")
      .writeStream.outputMode("append")
      .format("memory").queryName("inmet_stream_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("inmet_stream_out")
      val want = Ingest.previsoes(spark, Ingest.readLines(spark, s"$dir/*.csv"))
      assert(got.count() === 13032L)
      // row-for-row equality (same keys, same cleansed measures)
      val key = Seq("wmo", "data_medicao", "precipitacao_mm",
        "pressao_atm_kpa", "temperatura_c", "umidade_porcentagem", "vento_mps")
      val g = got.groupBy(key.map(col): _*).count()
      val w = want.groupBy(key.map(col): _*).count()
      assert(g.except(w).isEmpty && w.except(g).isEmpty,
        "streaming and batch previsoes diverge")
    } finally q.stop()
  }
}
