package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Invariant tests for the round-2 breadth batch (exact values are gated
  * by the DuckDB oracle; these pin the semantic shape). */
class BreadthSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("fullOuterJoin keeps rows unmatched on either side") {
    val df = Breadth.fullOuterJoin(spark, sf).cache()
    val onlyA = df.filter(col("in_building") === 1 && col("in_high") === 0).count()
    val onlyB = df.filter(col("in_building") === 0 && col("in_high") === 1).count()
    assert(onlyA > 0 && onlyB > 0, "both exclusive sides must be present")
    assert(df.filter(col("bal").isNull).count() === 0)
    df.unpersist()
  }

  test("crossJoin cardinality = |region| x |segments|") {
    assert(Breadth.crossJoin(spark, sf).count() === 25)
  }

  test("existsSubquery: every kept customer has an urgent order, no P order") {
    val kept = Breadth.existsSubquery(spark, sf)
      .select("c_custkey").as[Long](spark.implicits.newLongEncoder).collect().toSet
    val orders = Star.table(spark, sf, "orders")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").as[Long](spark.implicits.newLongEncoder).collect().toSet
    val withP = orders.filter(col("o_orderstatus") === "P")
      .select("o_custkey").as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(kept.nonEmpty)
    assert(kept.subsetOf(urgent))
    assert(kept.intersect(withP).isEmpty)
  }

  test("windowLeadLag: gap_days is null exactly on each customer's first order") {
    val df = Breadth.windowLeadLag(spark, sf).cache()
    val customers = df.select("o_custkey").distinct().count()
    assert(df.filter(col("prev_date").isNull).count() === customers)
    assert(df.filter(col("gap_days") < 0).count() === 0)
    df.unpersist()
  }

  test("ntileRanks: quartiles balanced within 1, pct_rank in [0,1]") {
    val df = Breadth.ntileRanks(spark, sf).cache()
    val sizes = df.groupBy("quartile").count()
      .select("count").as[Long](spark.implicits.newLongEncoder).collect()
    assert(sizes.length === 4 && sizes.max - sizes.min <= 1)
    assert(df.filter(col("pct_rank") < 0 || col("pct_rank") > 1).count() === 0)
    assert(df.filter(col("cume") <= 0 || col("cume") > 1).count() === 0)
    df.unpersist()
  }

  test("firstLastValue: first <= last; second null iff single-line order") {
    val df = Breadth.firstLastValue(spark, sf).cache()
    assert(df.filter(col("first_ship") > col("last_ship")).count() === 0)
    val singles = df.groupBy("l_orderkey").count().filter(col("count") === 1).count()
    assert(df.filter(col("second_ship").isNull)
      .select("l_orderkey").distinct().count() === singles)
    df.unpersist()
  }

  test("unpivot is the exact inverse of the pivot (matches plain group-by)") {
    val long = Breadth.unpivotOrders(spark, sf)
      .filter(col("n") > 0)
      .select(col("o_orderpriority"), col("status"), col("n"))
    val direct = Star.table(spark, sf, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"))
    assert(long.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(long).count() === 0)
  }

  test("groupingSets: grand total row equals table count") {
    val df = Breadth.groupingSets(spark, sf)
    val total = df.filter(col("rflag") === "ALL" && col("lstatus") === "ALL")
      .select("n").as[Long](spark.implicits.newLongEncoder).head()
    assert(total === Star.table(spark, sf, "lineitem").count())
  }

  test("levenshtein pairs are symmetric-free and within threshold") {
    val df = Breadth.levenshteinPairs(spark, sf).cache()
    assert(df.filter(col("id_a") >= col("id_b")).count() === 0)
    assert(df.filter(col("dist") > 14).count() === 0)
    df.unpersist()
  }

  test("regexpExtractAll agrees with the from_json path on sum_k") {
    val viaRegex = Breadth.regexpExtractAll(spark, sf)
      .select("event_type", "sum_k")
    val viaJson = Relational.jsonExtract(spark, sf)
      .select("event_type", "sum_k")
    assert(viaRegex.exceptAll(viaJson).count() === 0)
  }

  test("tfidfTopk: <=3 terms per doc, scores descending within doc") {
    val df = Breadth.tfidfTopk(spark, sf).cache()
    assert(df.groupBy("doc_id").count().filter(col("count") > 3).count() === 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("rnk")
    val bad = df.withColumn("prev", lag(col("score"), 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev"))
    assert(bad.count() === 0)
    df.unpersist()
  }

  test("retention: retained <= dau and rate in [0,1]") {
    val df = Breadth.retention(spark, sf).cache()
    assert(df.filter(col("retained") > col("dau")).count() === 0)
    assert(df.filter(col("retention_rate") < 0 || col("retention_rate") > 1)
      .count() === 0)
    df.unpersist()
  }

  test("funnel: conversions never exceed signups") {
    val df = Breadth.funnel(spark, sf)
    assert(df.filter(col("n_converted") > col("n_signups")).count() === 0)
    assert(df.count() > 0)
  }

  test("statsExact agrees with Spark's built-in var_samp/stddev/corr") {
    val exact = Analytics.statsExact(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(5)))
      .toMap
    val builtin = Star.table(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"),
        Star.cents(col("l_discount")).as("d"))
      .groupBy("l_returnflag")
      .agg(var_samp(col("q")), stddev_samp(col("q")), corr(col("q"), col("d")))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(exact.keySet === builtin.keySet)
    exact.foreach { case (k, (v1, s1, c1)) =>
      val (v2, s2, c2) = builtin(k)
      assert(approx(v1, v2, 1e-9) && approx(s1, s2, 1e-9) && approx(c1, c2, 1e-6),
        s"$k: exact=($v1,$s1,$c1) builtin=($v2,$s2,$c2)")
    }
  }

  test("jsonSource row counts line up with the events table") {
    val r = Breadth.jsonSource(spark, sf).collect().head
    val expected = Star.events(spark, sf).filter(col("props").isNotNull).count()
    assert(r.getLong(0) === expected)
    assert(r.getLong(1) <= r.getLong(0))
  }

  test("streaming time-bucket converges to the batch twin") {
    val streamed = graft.streaming.StreamingQueries.streamTimeBucket(spark, sf)
    val batch = Relational.timeBucket(spark, sf)
      .withColumnRenamed("bucket", "bucket")
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("histogram covers all orders exactly once") {
    val df = Breadth.histogram(spark, sf)
    val n = df.agg(sum("n")).as[Long](spark.implicits.newLongEncoder).head()
    assert(n === Star.table(spark, sf, "orders").count())
  }

  test("rollingMedian: matches a reference median over the trailing window") {
    val rows = Breadth.rollingMedian(spark, sf)
      .select("user_id", "value", "med7").collect()
    assert(rows.nonEmpty)
    val byUser = rows.zipWithIndex.groupBy(_._1.getLong(0))
    byUser.values.foreach { series =>
      val ordered = series.sortBy(_._2).map(_._1)
      ordered.indices.foreach { i =>
        val window = ordered.slice(math.max(0, i - 6), i + 1)
          .map(_.getDouble(1)).sorted
        val n = window.length
        val want =
          if (n % 2 == 1) window(n / 2)
          else (window(n / 2 - 1) + window(n / 2)) / 2.0
        assert(ordered(i).getDouble(2) === want)
      }
    }
  }
}
