package graft.inmet

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The three warehouse (analytic) queries of the reference, re-expressed as
  * Spark DataFrame plans. Source semantics:
  * `pyspark-stack/airflow/dags/sql/create_dim_cidade_atributos.sql`,
  * `create_analitic_fato_agg_previsoes_dia.sql`,
  * `create_analitic_cidade_kpis_mensal.sql` (reference repo). The Snowflake
  * layer disappears: Spark is both processor and warehouse.
  *
  * Scale notes: both dimension joins are broadcast (station dim is tiny —
  * thousands of stations at most; calendar is one row per day). The daily
  * rollup is the only shuffle, keyed on (wmo, data_medicao) — at 100 TB the
  * map-side partial aggregate collapses 24 hourly rows per key before the
  * exchange, so the shuffle is ~1/24th of the input.
  */
object Warehouse {

  /** Surrogate-keyed station dimension
    * (create_dim_cidade_atributos.sql:5-22). */
  def dimCidadeAtributos(cidades: DataFrame): DataFrame = {
    def part(c: String) = trim(upper(coalesce(col(c), lit(""))))
    cidades.select(
      concat(part("wmo"), lit("-"), part("uf"), lit("-"), part("estacao"))
        .as("cidade_sk"),
      col("wmo"), col("uf"), col("estacao"), col("regiao"),
      col("latitude"), col("longitude"), col("altitude"), col("data_fundacao"))
  }

  /** Daily fact rollup (create_analitic_fato_agg_previsoes_dia.sql:4-19):
    * hourly fact x station dim (broadcast), grouped per station-day.
    * AVG/MIN run over the zero-filled measures — NOT null-skipping — which
    * is the reference's semantic keystone (see Ingest.previsoes). */
  def fatoAggPrevisoesDia(previsoes: DataFrame, dimCidade: DataFrame): DataFrame =
    previsoes
      .join(broadcast(dimCidade.select("wmo", "cidade_sk")), Seq("wmo"))
      .groupBy("wmo", "cidade_sk", "data_medicao")
      .agg(
        min("temperatura_c").as("temp_min_c"),
        max("temperatura_c").as("temp_max_c"),
        avg("temperatura_c").as("temp_avg_c"),
        sum("precipitacao_mm").as("precip_total_mm"),
        avg("pressao_atm_kpa").as("pressao_avg_kpa"),
        avg("vento_mps").as("vento_avg_mps"),
        avg("umidade_porcentagem").as("umidade_avg_pct"),
        count(lit(1)).as("registros_horarios"))

  /** Monthly per-city KPIs (create_analitic_cidade_kpis_mensal.sql:5-18).
    * `mensal_temp_media` averages the DAILY averages (avg-of-avgs), not the
    * hourly readings — the two-level aggregation is preserved.
    * `dias_com_precip` is COUNT_IF(precip_total_mm > 0). */
  def cidadeKpisMensal(fatoDia: DataFrame, dimCidade: DataFrame,
                       datas: DataFrame): DataFrame =
    fatoDia.drop("cidade_sk")
      .join(broadcast(dimCidade.select("wmo", "cidade_sk")), Seq("wmo"))
      .join(broadcast(datas.select("data_medicao", "ano", "mes")),
        Seq("data_medicao"))
      .groupBy("cidade_sk", "ano", "mes")
      .agg(
        avg("temp_avg_c").as("mensal_temp_media"),
        max("temp_max_c").as("mensal_temp_max"),
        sum("precip_total_mm").as("mensal_precip_total"),
        count(when(col("precip_total_mm") > 0, 1)).as("dias_com_precip"))

  /** The same three statements as SQL text (COUNT_IF is Spark-native) —
    * parameterized by source table names so they run both over temp views
    * (reference-parity `spark.sql` path) and over catalog tables
    * (`stage.`/`analitic.`-qualified, see Pipeline.runCatalog). */
  def dimCidadeAtributosSqlFor(dimCidades: String): String =
    s"""SELECT
       |  CONCAT(TRIM(UPPER(COALESCE(wmo,''))), '-',
       |         TRIM(UPPER(COALESCE(uf,''))), '-',
       |         TRIM(UPPER(COALESCE(estacao,'')))) AS cidade_sk,
       |  wmo, uf, estacao, regiao, latitude, longitude, altitude, data_fundacao
       |FROM $dimCidades""".stripMargin

  def fatoAggPrevisoesDiaSqlFor(fatoPrevisoes: String,
                                dimCidadeAtributos: String): String =
    s"""SELECT
       |  f.wmo, c.cidade_sk, f.data_medicao,
       |  MIN(f.temperatura_c) AS temp_min_c,
       |  MAX(f.temperatura_c) AS temp_max_c,
       |  AVG(f.temperatura_c) AS temp_avg_c,
       |  SUM(f.precipitacao_mm) AS precip_total_mm,
       |  AVG(f.pressao_atm_kpa) AS pressao_avg_kpa,
       |  AVG(f.vento_mps) AS vento_avg_mps,
       |  AVG(f.umidade_porcentagem) AS umidade_avg_pct,
       |  COUNT(*) AS registros_horarios
       |FROM $fatoPrevisoes f
       |JOIN $dimCidadeAtributos c ON f.wmo = c.wmo
       |GROUP BY f.wmo, c.cidade_sk, f.data_medicao""".stripMargin

  def cidadeKpisMensalSqlFor(fatoAggDia: String, dimCidadeAtributos: String,
                             dimDatas: String): String =
    s"""SELECT
       |  c.cidade_sk, dt.ano, dt.mes,
       |  AVG(d.temp_avg_c) AS mensal_temp_media,
       |  MAX(d.temp_max_c) AS mensal_temp_max,
       |  SUM(d.precip_total_mm) AS mensal_precip_total,
       |  COUNT_IF(d.precip_total_mm > 0) AS dias_com_precip
       |FROM $fatoAggDia d
       |JOIN $dimCidadeAtributos c ON d.wmo = c.wmo
       |JOIN $dimDatas dt ON d.data_medicao = dt.data_medicao
       |GROUP BY c.cidade_sk, dt.ano, dt.mes""".stripMargin

  val dimCidadeAtributosSql: String = dimCidadeAtributosSqlFor("dim_cidades")
  val fatoAggPrevisoesDiaSql: String =
    fatoAggPrevisoesDiaSqlFor("fato_previsoes", "dim_cidade_atributos")
  val cidadeKpisMensalSql: String = cidadeKpisMensalSqlFor(
    "fato_agg_previsoes_dia", "dim_cidade_atributos", "dim_datas")

  /** Runs the CTAS chain via `spark.sql` over temp views, in DAG order
    * (dag_inmet.py:210-220 in the reference). Returns the three results. */
  def runSqlChain(spark: SparkSession, previsoes: DataFrame,
                  cidades: DataFrame, datas: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    previsoes.createOrReplaceTempView("fato_previsoes")
    cidades.createOrReplaceTempView("dim_cidades")
    datas.createOrReplaceTempView("dim_datas")
    val dim = spark.sql(dimCidadeAtributosSql)
    dim.createOrReplaceTempView("dim_cidade_atributos")
    val fatoDia = spark.sql(fatoAggPrevisoesDiaSql)
    fatoDia.createOrReplaceTempView("fato_agg_previsoes_dia")
    val kpis = spark.sql(cidadeKpisMensalSql)
    (dim, fatoDia, kpis)
  }
}
