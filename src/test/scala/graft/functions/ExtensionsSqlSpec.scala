package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions must be reachable from plain SQL through
  * `spark.sql.extensions=graft.plans.GraftExtensions` — a session built
  * with the extensions (its own, isolated from the shared suite session)
  * resolves and evaluates them. */
class ExtensionsSqlSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  // getOrCreate would silently return another suite's extension-less
  // session; force a fresh SparkSession (same SparkContext) with the
  // extensions applied, and restore the previous sessions afterwards.
  private var prevDefault: Option[SparkSession] = None
  private var prevActive: Option[SparkSession] = None

  private lazy val spark: SparkSession = {
    prevDefault = SparkSession.getDefaultSession
    prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-sql")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      // Testdata parquet timestamps carry isAdjustedToUTC=false; read them as
      // session-TZ (UTC) TIMESTAMP, not TIMESTAMP_NTZ, so timestamp functions
      // (unix_micros, watermarks) keep their pre-Spark-4-inference semantics.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    super.afterAll()
  }

  test("graft_strip_accents resolves and strips in SQL") {
    val r = spark.sql("SELECT graft_strip_accents('pressão café') AS s")
      .head().getString(0)
    assert(r === "pressao cafe")
  }

  test("graft_vector_dot computes a dot product in SQL") {
    val r = spark.sql(
      "SELECT graft_vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
  }

  test("graft_winnow_fingerprint yields a sketch in SQL, same as Column API") {
    val text = "the quick brown fox jumps over the lazy dog"
    val viaSql = spark.sql(
      s"SELECT graft_winnow_fingerprint('$text', 8, 4) AS fp")
      .head().getSeq[Long](0)
    import spark.implicits._
    val viaColumn = Seq(text).toDF("t")
      .select(WinnowFunctions.winnowFingerprint($"t", 8, 4))
      .head().getSeq[Long](0)
    assert(viaSql.nonEmpty && viaSql === viaColumn)
  }

  test("non-literal k is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_winnow_fingerprint('x', length('ab'), 4)")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
