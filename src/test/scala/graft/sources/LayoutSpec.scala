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

  test("z-ordered layout clusters BOTH keys per file; linear sort only one") {
    import org.apache.spark.sql.DataFrame
    val li = Star.table(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey")
    val Array(pMax, sMax) = li.agg(max("l_partkey"), max("l_suppkey"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray

    // per-file normalized key ranges for a written layout
    def fileRanges(df: DataFrame, n: Int): (Double, Double) = {
      val path = java.nio.file.Files.createTempDirectory("zorder").toString
      df.write.mode("overwrite").parquet(path)
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(
          ((max("l_partkey") - min("l_partkey")).cast("double") / pMax)
            .as("p_span"),
          ((max("l_suppkey") - min("l_suppkey")).cast("double") / sMax)
            .as("s_span"))
        .agg(avg("p_span"), avg("s_span")).collect().head
      (spans.getDouble(0), spans.getDouble(1))
    }

    val z = Layout.zValue(
      Star.idiv(col("l_partkey") * 1024L, lit(pMax + 1)),
      Star.idiv(col("l_suppkey") * 1024L, lit(sMax + 1)), 10)
    val (zp, zs) = fileRanges(
      li.withColumn("__z", z).repartitionByRange(16, col("__z"))
        .sortWithinPartitions("__z").drop("__z"), 16)
    val (lp, ls) = fileRanges(
      li.repartitionByRange(16, col("l_partkey")), 16)

    // linear layout: partkey clusters tightly, suppkey spans ~everything
    assert(lp < 0.2, s"linear partkey span $lp")
    assert(ls > 0.8, s"linear suppkey span $ls")
    // z-order: BOTH dimensions cluster — each file covers a sub-box
    assert(zp < 0.6, s"z partkey span $zp")
    assert(zs < 0.6, s"z suppkey span $zs")
  }

  test("zValue interleaves bits (locality sanity)") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L),
      (1023L, 1023L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 10).as("z"))
      .as[Long].collect()
    assert(out.toSeq === Seq(0L, 1L, 2L, 3L, 12L, (1L << 20) - 1))
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

  test("compaction collapses the fragmented layout to the byte-target file count") {
    val sf = "/root/testdata/sf0.001"
    Layout.compaction(spark, sf).collect() // builds fixture + compacted dir
    val tag = java.lang.Integer.toHexString(sf.hashCode)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    def files(p: String): Array[String] = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(hp).map(_.getPath.getName).filter(_.startsWith("part-"))
    }
    val frag = files(s"$wh/graft_frag_documents_$tag")
    val compact = files(s"$wh/graft_compact_documents_$tag")
    assert(frag.length === 16)
    // 500 docs ≈ a few hundred KB → one 4 MiB-target file
    assert(compact.length === 1, compact.mkString(","))
    // content preserved row-for-row
    val a = spark.read.parquet(s"$wh/graft_frag_documents_$tag").count()
    val b = spark.read.parquet(s"$wh/graft_compact_documents_$tag").count()
    assert(a === b)
  }
}
