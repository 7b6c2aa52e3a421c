package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest at-or-before match per key, null when none") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (1L, ts("2024-01-01 09:00:00"), "p0"), // before any right row
      (2L, ts("2024-01-01 11:00:00"), "p3"), // key with no right rows
    ).toDF("k", "lts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 200L), // equal-ts: must match p1
      (1L, ts("2024-01-01 11:59:00"), 300L),
    ).toDF("k", "rts", "payload")
    val out = AsOf.asofJoin(left, right, "k", "lts", "rts",
      Seq("payload"))
      .select("name", "payload").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("p0") === None)      // no right row at or before 09:00
    assert(out("p1") === Some(200L)) // equal timestamp matches (>= semantics)
    assert(out("p2") === Some(300L)) // latest of the three
    assert(out("p3") === None)      // key absent from right side
  }

  test("asofJoin plans one shuffle on the key (no nested-loop explosion)") {
    val ev = Star.events(spark, "/root/testdata/sf0.001")
    val p = AsOf.asofPurchaseClick(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
