package graft.inmet

import graft.SparkSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Malformed-input behavior: the ingest must degrade row-by-row (drop what
  * can't be parsed, keep everything else), never crash the job — the only
  * acceptable failure mode for a 100 TB batch over millions of files. */
class RobustnessSpec extends SparkSuite {

  test("garbage lines, truncated rows, and junk dates are dropped row-wise") {
    val dir = Files.createTempDirectory("inmet_bad")
    val good = Paths.get(resourcePath("/inmet/INMET_SE_MG_A507_UBERLANDIA.csv"))
    Files.copy(good, dir.resolve("INMET_SE_MG_A507_UBERLANDIA.csv"))
    val bad =
      """REGIAO:;XX
        |UF:;YY
        |ESTACAO:;BROKEN STATION
        |CODIGO (WMO):;B999
        |LATITUDE:;not-a-number
        |LONGITUDE:;-40,0
        |ALTITUDE:;100,0
        |DATA DE FUNDACAO:;99/99/9999
        |Data;Hora UTC;PRECIPITACAO TOTAL, HORARIO (mm);X;PRESSAO ATMOSFERICA MAX.NA HORA ANT. (AUT) (mB);Y;Z;TEMPERATURA DO AR - BULBO SECO, HORARIA (C);A;B;C;D;E;F;G;UMIDADE RELATIVA DO AR, HORARIA (%);H;I;VENTO, VELOCIDADE HORARIA (m/s)
        |2025/01/01;0000 UTC;1,5;;900;;;20,0;;;;;;;;80;;;2,0
        |total garbage line with no structure at all
        |2025/01/02;0100 UTC;bad;num;bers;;;20,5;;;;;;;;81;;;2,1
        |99/99/9999;0200 UTC;1;;900;;;21;;;;;;;;82;;;2
        |2025/01/03;0300 UTC
        |""".stripMargin
    Files.write(dir.resolve("INMET_XX_YY_B999_BROKEN.csv"),
      bad.getBytes(StandardCharsets.UTF_8))

    val st = Pipeline.stage(spark, dir.toString + "/*.csv")
    // broken station: data_fundacao unparseable -> dropped from cidades
    val cid = st.cidades.collect()
    assert(cid.length === 1 && cid(0).getAs[String]("wmo") === "A507")
    // B999 rows with a valid date survive (bad measures -> null -> 0.0);
    // the junk-date row and the structureless line are dropped
    val b999 = st.previsoes.filter(org.apache.spark.sql.functions
      .col("wmo") === "B999").collect()
    assert(b999.length === 3) // 01-01 full, 01-02 bad numerics, 01-03 truncated
    val byDate = b999.map(r =>
      r.getAs[java.sql.Date]("data_medicao").toString ->
        r.getAs[Double]("precipitacao_mm")).toMap
    assert(byDate("2025-01-01") === 1.5)
    assert(byDate("2025-01-02") === 0.0) // 'bad' -> null -> zero-fill
    assert(byDate("2025-01-03") === 0.0) // truncated row -> missing -> zero-fill
    // the good file is fully intact alongside
    assert(st.previsoes.count() === 4344L + 3L)
  }

  test("a file with conflicting duplicate header lines does not fan out rows") {
    val dir = Files.createTempDirectory("inmet_dup")
    val twoHeaders =
      """REGIAO:;XX
        |UF:;YY
        |ESTACAO:;GLUED
        |CODIGO (WMO):;C111
        |LATITUDE:;-10,0
        |LONGITUDE:;-40,0
        |ALTITUDE:;100,0
        |DATA DE FUNDACAO:;01/01/2020
        |Data;Hora UTC;PRECIPITACAO TOTAL, HORARIO (mm);X;PRESSAO ATMOSFERICA MAX.NA HORA ANT. (AUT) (mB);Y;Z;TEMPERATURA DO AR - BULBO SECO, HORARIA (C);A;B;C;D;E;F;G;UMIDADE RELATIVA DO AR, HORARIA (%);H;I;VENTO, VELOCIDADE HORARIA (m/s)
        |2025/01/01;0000 UTC;1,0;;900;;;20,0;;;;;;;;80;;;2,0
        |Data;Hora UTC;DIFFERENT HEADER SECOND TIME;X;P;Y;Z;T;A;B;C;D;E;F;G;U;H;I;V
        |2025/01/02;0100 UTC;2,0;;901;;;21,0;;;;;;;;81;;;2,1
        |""".stripMargin
    Files.write(dir.resolve("INMET_XX_YY_C111_GLUED.csv"),
      twoHeaders.getBytes(StandardCharsets.UTF_8))
    val st = Pipeline.stage(spark, dir.toString + "/*.csv")
    // 2 data rows in, exactly 2 rows out — no join fan-out from the
    // duplicate header
    assert(st.previsoes.count() === 2L)
  }
}
