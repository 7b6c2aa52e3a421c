package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Properties of the Count-Min heavy-hitters sketch that the hash oracle
  * (top-20 rows) can't pin by itself. */
class CmsSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("CMS never undercounts and is exact on the uncollided top") {
    val rows = Analytics.heavyHittersCms(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("true_n"),
        s"CMS undercounted ${r.getString(0)}")
    }
    // with 2048 cells over this corpus's vocabulary the heavy tokens'
    // min-row is collision-free — estimates are exact, which is the
    // regime a heavy-hitter query runs in when sized correctly
    assert(rows.count(r =>
      r.getAs[Long]("est_n") == r.getAs[Long]("true_n")) >= 15)
  }

  test("sketch is order/partitioning independent (mergeable cells)") {
    val a = Analytics.heavyHittersCms(spark, dir).collect().map(_.toSeq)
    // same corpus through a different partitioning: cell sums commute
    val shuffled = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val b = Analytics.heavyHittersCms(spark, dir).collect().map(_.toSeq)
      assert(a.toSeq === b.toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", shuffled)
  }
}
