package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSuite {
  import spark.implicits._

  test("exactQuantiles == percentile() builtin on random grouped data") {
    val df = spark.range(50000).select(
      (col("id") % 7).cast("string").as("g"),
      ((col("id") * 1103515245L + 12345L) % 10007L).as("v"))
    val qs = Seq(0.25, 0.5, 0.75)
    val got = Quantiles.exactQuantiles(df, Seq("g"), col("v"), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3))
      .toMap
    val want = df.groupBy("g")
      .agg(expr("percentile(v, array(0.25D, 0.5D, 0.75D))").as("ps"))
      .collect().flatMap { r =>
        val ps = r.getSeq[Double](1)
        qs.zipWithIndex.map { case (q, i) => (r.getString(0), q) -> ps(i) }
      }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(v === want(k), s"quantile $k") }
  }

  test("exactQuantiles: single-value groups and global (no-group) quantiles") {
    val single = Seq(("a", 5L), ("a", 5L), ("b", 9L)).toDF("g", "v")
    val r1 = Quantiles.exactQuantiles(single, Seq("g"), col("v"), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(r1 === Map("a" -> 5.0, "b" -> 9.0))
    val global = Quantiles.exactQuantiles(
      spark.range(101).toDF("v"), Seq.empty, col("v"), Seq(0.5))
      .collect()
    assert(global.length === 1 && global(0).getDouble(2) === 50.0)
  }
}
