package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  test("saltedAgg == direct groupBy on heavily skewed data, any salt count") {
    // 90% of rows share one key — the shape salting exists for
    val skewed = spark.range(20000).select(
      when(col("id") % 10 === 0, concat(lit("k"), col("id") % 7))
        .otherwise(lit("HOT")).as("k"),
      (col("id") % 1000).as("v"))
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("s"), min("v").as("mn"), max("v").as("mx"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    Seq(1, 4, 64).foreach { salts =>
      val salted = Skew.saltedAgg(skewed, Seq("k"), Seq(
        Skew.SaltedSum("v", "s"), Skew.SaltedMin("v", "mn"),
        Skew.SaltedMax("v", "mx"), Skew.SaltedCount("n")), salts)
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(salted === direct, s"salts=$salts diverged")
    }
  }

  test("saltedJoin == plain join on skewed keys, any salt count") {
    val big = spark.range(20000).select(
      when(col("id") % 10 === 0, col("id") % 50).otherwise(lit(7L)).as("k"),
      col("id").as("v"))
    val small = spark.range(50).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("name"))
    val direct = big.join(small, Seq("k"))
      .groupBy("name").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    Seq(1, 16).foreach { salts =>
      val salted = Skew.saltedJoin(big, small, "k", salts)
        .groupBy("name").agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(salted === direct, s"salts=$salts diverged")
    }
  }

  test("salted plan has two aggregation exchanges (spread then merge)") {
    val df = Skew.saltedPricing(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected partial+final aggregates for both stages\n" + p)
  }
}
