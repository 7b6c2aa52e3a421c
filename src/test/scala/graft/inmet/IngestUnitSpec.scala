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

  test("parseDateFlexible: all three INMET formats + coerce-to-null") {
    val in = Seq("2025/01/01", "30/06/2025", "18/12/02", "19/12/2004",
      "2025/02/31", "garbage", "").toDF("s")
    val out = in.select(Ingest.parseDateFlexible($"s"))
      .as[Option[Date]].collect().map(_.map(_.toString))
    assert(out.toSeq === Seq(Some("2025-01-01"), Some("2025-06-30"),
      Some("2002-12-18"), Some("2004-12-19"), None, None, None))
  }
}
