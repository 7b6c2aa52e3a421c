package graft.inmet

import graft.SparkSuite

/** The catalog/CTAS path (S8-S10) must land the same results as the
  * DataFrame pipeline, queryable by name through spark.sql. */
class CatalogSpec extends SparkSuite {

  test("runCatalog: stage saveAsTable + SQL CTAS chain lands queryable tables") {
    Pipeline.runCatalog(spark, resourcePath("/inmet") + "/*.csv")
    assert(spark.sql("SELECT count(*) FROM stage.fato_previsoes")
      .collect()(0).getLong(0) === 13032L)
    assert(spark.sql("SELECT count(*) FROM analitic.dim_cidade_atributos")
      .collect()(0).getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM analitic.fato_agg_previsoes_dia")
      .collect()(0).getLong(0) === 543L)
    val kpi = spark.sql(
      """SELECT mensal_temp_media, dias_com_precip
        |FROM analitic.cidade_kpis_mensal
        |WHERE cidade_sk = 'A507-MG-UBERLANDIA' AND ano = 2025 AND mes = 1
        |""".stripMargin).collect()(0)
    assert(approx(kpi.getDouble(0), 24.20322580645162, 1e-9))
    assert(kpi.getLong(1) === 22L)
    // re-run is idempotent (CREATE OR REPLACE semantics)
    Pipeline.runCatalog(spark, resourcePath("/inmet") + "/*.csv")
    assert(spark.sql("SELECT count(*) FROM analitic.cidade_kpis_mensal")
      .collect()(0).getLong(0) === 18L)
  }
}
