package graft.sources

import graft.SparkSuite
import graft.operators.Star
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("bucketed tables join with zero exchanges") {
    Layout.writeBucketed(
      Star.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice"),
      "b_lineitem", "l_orderkey", 8)
    Layout.writeBucketed(
      Star.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice")),
      "b_orders", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      assert(n === Star.table(spark, dir, "lineitem").count())
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "bucketed equi-join must not shuffle\n" + p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partitioned previsoes layout prunes partitions on time-scoped scans") {
    val st = graft.inmet.Pipeline.stage(spark, resourcePath("/inmet") + "/*.csv")
    val path = java.nio.file.Files.createTempDirectory("prev_part").toString
    Layout.previsoesPartitioned(st.previsoes, path)
    val back = spark.read.parquet(path)
    assert(back.count() === 13032L)
    val scoped = back.filter(col("ano") === 2025 && col("mes") === 3)
    val p = scoped.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(ano"), p)
    assert(scoped.count() === 3L * 31L * 24L) // 3 stations x march x hourly
    // pruning actually reduced files read: one month's partitions only
    val scan = scoped.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scan.contains("mes=1"), "unpruned partition in scan\n" + scan)
  }
}
