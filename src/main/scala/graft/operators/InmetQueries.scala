package graft.operators

import graft.QueryDef
import graft.inmet.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's own warehouse queries, registered over the three real
  * INMET fixture CSVs (committed under src/test/resources/inmet). These
  * have no DuckDB oracle — their correctness gate is the golden ScalaTest
  * (InmetGoldenSpec) with independently computed expected values; the
  * driver's rows-only check confirms they execute. */
object InmetQueries {

  private val fixtureGlob = "/root/repo/src/test/resources/inmet/*.csv"

  def inmetDaily(spark: SparkSession, dir: String): DataFrame = {
    val st = Pipeline.stage(spark, fixtureGlob)
    Pipeline.analytics(st).fatoAggPrevisoesDia.orderBy("wmo", "data_medicao")
  }

  def inmetKpis(spark: SparkSession, dir: String): DataFrame = {
    val st = Pipeline.stage(spark, fixtureGlob)
    Pipeline.analytics(st).cidadeKpisMensal.orderBy("cidade_sk", "ano", "mes")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_inmet_daily", inmetDaily, None),
    QueryDef("q_inmet_kpis", inmetKpis, None),
  )
}
