package graft.operators

import graft.SparkSuite

/** The SQL front-end: star tables as views + plain spark.sql drives the
  * same results as the DataFrame API. */
class SqlFrontEndSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("registerViews: every table queryable via spark.sql") {
    Star.registerViews(spark, dir)
    Star.tableNames.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() === 1L, t)
    }
    // a real query through the SQL surface matches the DataFrame path
    val sqlRows = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val dfRows = Star.table(spark, dir, "lineitem")
      .groupBy("l_returnflag").count()
      .orderBy("l_returnflag")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(sqlRows.sameElements(dfRows))
    // events view carries the normalized micros timestamp
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema("ts")
      .dataType.typeName === "timestamp")
  }
}
