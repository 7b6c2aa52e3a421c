package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ExactAggregatorsSpec extends SparkSuite {
  import spark.implicits._

  test("WeightedMean: hand-computed exact rational result") {
    // Σwx = 2*100 + 3*200 + 5*7 = 835; Σw = 10 → 83.5 exactly
    val df = Seq((2L, 100L), (3L, 200L), (5L, 7L)).toDF("w", "x")
    val got = df.agg(
      ExactAggregators.weightedMean(col("w"), col("x")).as("m"))
      .collect()(0).getDouble(0)
    assert(got === 83.5)
  }

  test("WeightedMean: floor quantization at 1e-6, zero-weight group is NaN") {
    // Σwx/Σw = 1/3 → 0.333333 (floored at 1e-6)
    val df = Seq((1L, 1L), (1L, 0L), (1L, 0L)).toDF("w", "x")
    val got = df.agg(ExactAggregators.weightedMean(col("w"), col("x")))
      .collect()(0).getDouble(0)
    assert(got === 0.333333)
    val empty = Seq((0L, 5L)).toDF("w", "x")
    val nan = empty.agg(ExactAggregators.weightedMean(col("w"), col("x")))
      .collect()(0).getDouble(0)
    assert(nan.isNaN)
  }

  test("WeightedMean: partial+final merge across partitions is exact") {
    val df = spark.range(100000).select(
      (col("id") % 7 + 1).as("w"), (col("id") % 1000).as("x"),
      (col("id") % 3).as("g"))
      .repartition(8)
    val got = df.groupBy("g")
      .agg(ExactAggregators.weightedMean(col("w"), col("x")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference computed driver-side with BigInt
    val rows = (0L until 100000L).map(id => (id % 3, id % 7 + 1, id % 1000))
    val want = rows.groupBy(_._1).view.mapValues { g =>
      val w = g.map(_._2).sum
      val wx = g.map(t => t._2 * t._3).sum
      (BigInt(wx) * 1000000 / BigInt(w)).toDouble / 1e6
    }.toMap
    assert(got === want)
  }

  test("weightedAvg query plans with map-side partial aggregation") {
    val p = graft.operators.Analytics
      .weightedAvg(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert("Aggregate".r.findAllIn(p).size >= 2,
      "expected partial+final aggregate stages\n" + p)
  }
}
