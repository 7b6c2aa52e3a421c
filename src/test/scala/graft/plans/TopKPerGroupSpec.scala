package graft.plans

import graft.SparkSuite
import graft.operators.Star
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("custom operator == window row_number reference, any partitioning") {
    val ev = Star.events(spark, dir)
      .select("user_id", "event_id", "value")
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    val want = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    Seq(ev, ev.repartition(17), ev.repartition(1)).foreach { in =>
      val got = TopKPerGroup.topK(in, Seq("user_id"),
        Seq(("value", true), ("event_id", false)), 3)
        .collect().map(_.toSeq).toSet
      assert(got === want)
    }
  }

  test("plan shape: partial heap before the exchange, final after") {
    val ev = Star.events(spark, dir).select("user_id", "event_id", "value")
    val df = TopKPerGroup.topK(ev, Seq("user_id"), Seq(("value", true)), 3)
    df.collect()
    // inspect the finalized (AQE) physical plan: final TopK above the
    // exchange, partial TopK below it (nodes render as
    // "TopKPerGroup [...], k, <partial>")
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("TopKPerGroup \\[".r.findAllIn(p).size === 2, p)
    val idxFinal = p.indexOf("3, false")
    val idxExchange = p.indexOf("Exchange hashpartitioning(user_id")
    val idxPartial = p.indexOf("3, true")
    assert(idxFinal >= 0 && idxExchange >= 0 && idxPartial >= 0, p)
    assert(idxFinal < idxExchange && idxExchange < idxPartial,
      s"expected final above exchange above partial\n$p")
  }

  test("PruneThroughTopK: projection above the operator narrows the scan") {
    val ev = Star.events(spark, dir) // 6 columns incl. props, event_type
    val df = TopKPerGroup.topK(ev, Seq("user_id"), Seq(("value", true)), 3)
      .select("user_id", "value")
    val same = df.collect()
    assert(same.nonEmpty)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("props"), "scan should not read pruned column props\n" + p)
    assert(!p.contains("event_type"),
      "scan should not read pruned column event_type\n" + p)
  }

  test("ties, k larger than group, single-row groups") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0), ("a", 4L, 1.0),
      ("b", 5L, 9.0),
    ).toDF("g", "id", "v")
    val got = TopKPerGroup.topK(df, Seq("g"), Seq(("v", true), ("id", false)), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // ties broken by id ascending: a -> ids 1,2 ; b -> id 5 (k > group size)
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 5L)))
  }
}
