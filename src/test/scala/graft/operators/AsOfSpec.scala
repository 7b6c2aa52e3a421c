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

  test("asofJoin: payload columns never mix values from different right rows") {
    val left = Seq((1L, ts("2024-01-01 03:00:00"), "p")).toDF("k", "lts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 01:00:00"), Some(5L), Some(10L)),
      (1L, ts("2024-01-01 02:00:00"), None, Some(20L)), // latest; a is null
    ).toDF("k", "rts", "a", "b")
    val r = AsOf.asofJoin(left, right, "k", "lts", "rts", Seq("a", "b"))
      .select("a", "b").collect()(0)
    // correct semantics: the LATEST row atomically -> (null, 20), never (5, 20)
    assert(r.isNullAt(0) && r.getLong(1) === 20L)
  }

  test("asofJoin: equal-timestamp right rows resolve deterministically") {
    val left = Seq((1L, ts("2024-01-01 03:00:00"), "p")).toDF("k", "lts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 02:00:00"), 7L),
      (1L, ts("2024-01-01 02:00:00"), 9L),
    ).toDF("k", "rts", "payload")
    val picks = (1 to 3).map { i =>
      AsOf.asofJoin(left, right.repartition(i), "k", "lts", "rts",
        Seq("payload")).select("payload").collect()(0).getLong(0)
    }
    assert(picks.distinct.size === 1, s"nondeterministic tie: $picks")
    assert(picks.head === 9L) // largest payload struct wins the tie
  }

  test("asofJoin plans one shuffle on the key (no nested-loop explosion)") {
    val ev = Star.events(spark, "/root/testdata/sf0.001")
    val p = AsOf.asofPurchaseClick(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
