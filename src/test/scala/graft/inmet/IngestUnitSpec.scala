package graft.inmet

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.sql.Date

/** Unit coverage of the cleansing scalar semantics (SURVEY.md §2.3). */
class IngestUnitSpec extends SparkSuite {
  import spark.implicits._

  test("sanitize reproduces the reference's header names") {
    assert(Ingest.sanitize("PRECIPITAÇÃO TOTAL, HORÁRIO (mm)")
      === "precipitacao_total_horario_mm")
    assert(Ingest.sanitize("PRESSÃO ATMOSFERICA MAX.NA HORA ANT. (AUT) (mB)")
      === "pressao_atmosferica_max_na_hora_ant_aut_mb")
    assert(Ingest.sanitize("TEMPERATURA DO AR - BULBO SECO, HORARIA (°C)")
      === "temperatura_do_ar_bulbo_seco_horaria_c")
    assert(Ingest.sanitize("UMIDADE RELATIVA DO AR, HORARIA (%)")
      === "umidade_relativa_do_ar_horaria")
    assert(Ingest.sanitize("VENTO, VELOCIDADE HORARIA (m/s)")
      === "vento_velocidade_horaria_m_s")
    assert(Ingest.sanitize("Data") === "data")
  }

  test("commaDouble: decimal comma, leading-comma fraction, null tokens") {
    val in = Seq("915,6", ",7", "-48,25555555", "", "None", "nan", " 87 ",
      "abc", "86").toDF("s")
    val out = in.select(Ingest.commaDouble($"s")).as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(915.6), Some(0.7), Some(-48.25555555),
      None, None, None, Some(87.0), None, Some(86.0)))
  }

  test("cleansing scalars behave identically with ANSI mode off") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val nums = Seq(",7", "abc", "915,6").toDF("s")
        .select(Ingest.commaDouble($"s")).as[Option[Double]].collect()
      assert(nums.toSeq === Seq(Some(0.7), None, Some(915.6)))
      val dates = Seq("2025/02/31", "18/12/02").toDF("s")
        .select(Ingest.parseDateFlexible($"s")).as[Option[Date]]
        .collect().map(_.map(_.toString))
      assert(dates.toSeq === Seq(None, Some("2002-12-18")))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("multi-file ingest: 20 generated stations parse in one pass with exact counts") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(resourcePath("/inmet/INMET_SE_MG_A508_ALMENARA.csv"))),
      java.nio.charset.StandardCharsets.UTF_8)
    val dir = java.nio.file.Files.createTempDirectory("inmet_many")
    (0 until 20).foreach { i =>
      val code = f"A7$i%02d"
      val body = src
        .replace("CODIGO (WMO):;A508", s"CODIGO (WMO):;$code")
        .replace("ESTACAO:;ALMENARA", f"ESTACAO:;GEN$i%02d")
      java.nio.file.Files.write(dir.resolve(s"INMET_SE_MG_${code}_GEN$i.csv"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    try {
      val st = Pipeline.stage(spark, dir.toString + "/*.csv")
      assert(st.cidades.count() === 20L)
      assert(st.previsoes.count() === 20L * 4344L)
      assert(st.previsoes.select("wmo").distinct().count() === 20L)
      val an = Pipeline.analytics(st)
      assert(an.fatoAggPrevisoesDia.count() === 20L * 181L)
      assert(an.cidadeKpisMensal.count() === 20L * 6L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("parseDateFlexible: all three INMET formats + coerce-to-null") {
    val in = Seq("2025/01/01", "30/06/2025", "18/12/02", "19/12/2004",
      "2025/02/31", "garbage", "").toDF("s")
    val out = in.select(Ingest.parseDateFlexible($"s"))
      .as[Option[Date]].collect().map(_.map(_.toString))
    assert(out.toSeq === Seq(Some("2025-01-01"), Some("2025-06-30"),
      Some("2002-12-18"), Some("2004-12-19"), None, None, None))
  }
}
