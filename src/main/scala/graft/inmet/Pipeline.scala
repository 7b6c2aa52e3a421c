package graft.inmet

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sequential end-to-end pipeline replicating the reference DAG's phase
  * order (dag_inmet.py:210-220): ingest CSVs -> stage parquet -> analytic
  * tables. Airflow/HDFS/Snowflake collapse into plain method calls + local
  * FS + the Spark session (SURVEY.md §3 EP2/EP3 — those layers were
  * transport, not semantics).
  *
  * Scale: `previsoes` is written partitioned-by-nothing here (matching the
  * reference's layout contract), but the plan upstream is one distributed
  * scan; for a 100 TB deployment the single knob to add is
  * `.partitionBy("ano","mes")` (or bucketing by wmo) on the stage write —
  * the readers below are layout-agnostic.
  */
object Pipeline {

  final case class Stage(cidades: DataFrame, previsoes: DataFrame,
                         datas: DataFrame)
  final case class Analytics(dimCidadeAtributos: DataFrame,
                             fatoAggPrevisoesDia: DataFrame,
                             cidadeKpisMensal: DataFrame)

  /** Parse every INMET CSV under `inputGlob` into the three stage tables
    * (pure transformation — nothing is written or collected). */
  def stage(spark: SparkSession, inputGlob: String): Stage = {
    val lines = Ingest.readLines(spark, inputGlob)
    val prev = Ingest.previsoes(spark, lines)
    Stage(
      cidades = Ingest.cidades(Ingest.stationHeadersRaw(lines)),
      previsoes = prev,
      datas = Ingest.datas(prev))
  }

  /** Derive the three analytic tables from stage inputs. */
  def analytics(stage: Stage): Analytics = {
    val dim = Warehouse.dimCidadeAtributos(stage.cidades)
    val fatoDia = Warehouse.fatoAggPrevisoesDia(stage.previsoes, dim)
    Analytics(dim, fatoDia,
      Warehouse.cidadeKpisMensal(fatoDia, dim, stage.datas))
  }

  /** Reference-parity catalog run (SURVEY.md §2 S8-S10): stage tables are
    * saved into the session catalog's `stage` schema, then the three
    * analytic tables are built by SQL CTAS into `analitic` — the
    * reference's Snowflake DDL chain replayed on Spark's own catalog
    * (CREATE OR REPLACE TABLE becomes DROP + CREATE ... USING PARQUET AS,
    * the v1-session-catalog equivalent). Requires a writable
    * `spark.sql.warehouse.dir`. */
  def runCatalog(spark: SparkSession, inputGlob: String): Unit = {
    val st = stage(spark, inputGlob)
    spark.sql("CREATE DATABASE IF NOT EXISTS stage")
    spark.sql("CREATE DATABASE IF NOT EXISTS analitic")
    st.cidades.write.mode("overwrite").format("parquet")
      .saveAsTable("stage.dim_cidades")
    st.previsoes.write.mode("overwrite").format("parquet")
      .saveAsTable("stage.fato_previsoes")
    st.datas.write.mode("overwrite").format("parquet")
      .saveAsTable("stage.dim_datas")
    def ctas(table: String, select: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"CREATE TABLE $table USING PARQUET AS $select")
    }
    ctas("analitic.dim_cidade_atributos",
      Warehouse.dimCidadeAtributosSqlFor("stage.dim_cidades"))
    ctas("analitic.fato_agg_previsoes_dia",
      Warehouse.fatoAggPrevisoesDiaSqlFor("stage.fato_previsoes",
        "analitic.dim_cidade_atributos"))
    ctas("analitic.cidade_kpis_mensal",
      Warehouse.cidadeKpisMensalSqlFor("analitic.fato_agg_previsoes_dia",
        "analitic.dim_cidade_atributos", "stage.dim_datas"))
  }

  /** Full run: CSV glob -> stage parquet dir -> analytic parquet dir.
    * Stage tables are re-read from parquet before the warehouse phase (as
    * the reference does via its load step), which also truncates the
    * lineage so the analytic plans scan columnar storage, not raw CSV. */
  def run(spark: SparkSession, inputGlob: String, stageDir: String,
          analyticDir: String): Unit = {
    val st = stage(spark, inputGlob)
    st.cidades.write.mode("overwrite").parquet(s"$stageDir/cidades")
    st.previsoes.write.mode("overwrite").parquet(s"$stageDir/previsoes")
    // derive the calendar from the already-written columnar fact — its
    // min/max agg then reads parquet statistics instead of re-running the
    // whole raw-CSV parse lineage a second time
    val stagedPrevisoes = spark.read.parquet(s"$stageDir/previsoes")
    Ingest.datas(stagedPrevisoes).write.mode("overwrite")
      .parquet(s"$stageDir/datas")

    val staged = Stage(
      cidades = spark.read.parquet(s"$stageDir/cidades"),
      previsoes = stagedPrevisoes,
      datas = spark.read.parquet(s"$stageDir/datas"))
    val an = analytics(staged)
    an.dimCidadeAtributos.write.mode("overwrite")
      .parquet(s"$analyticDir/dim_cidade_atributos")
    an.fatoAggPrevisoesDia.write.mode("overwrite")
      .parquet(s"$analyticDir/fato_agg_previsoes_dia")
    an.cidadeKpisMensal.write.mode("overwrite")
      .parquet(s"$analyticDir/cidade_kpis_mensal")
  }
}
