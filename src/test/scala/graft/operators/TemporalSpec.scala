package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("scd2: intervals tile each user's timeline without gaps/overlap") {
    val rows = Temporal.scd2(spark, sf)
      .orderBy("user_id", "valid_from").collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { case Array(a, b) =>
      if (a.getLong(0) == b.getLong(0)) {
        // consecutive intervals: a.valid_to == b.valid_from, state changes
        assert(a.getTimestamp(3) === b.getTimestamp(2))
        assert(a.getString(1) !== b.getString(1))
        assert(!a.getBoolean(4))
      } else assert(a.getBoolean(4)) // last interval per user is current
    }
    assert(rows.last.getBoolean(4))
  }

  test("scd2: state count matches run-length encoding of raw stream") {
    val ev = Star.events(spark, sf)
      .orderBy("user_id", "ts", "event_id")
      .select("user_id", "event_type").collect()
    val expected = ev.foldLeft((0, Option.empty[(Long, String)])) {
      case ((n, prev), r) =>
        val cur = (r.getLong(0), r.getString(1))
        if (prev.exists(p => p._1 == cur._1 && p._2 == cur._2)) (n, Some(cur))
        else (n + 1, Some(cur))
    }._1
    assert(Temporal.scd2(spark, sf).count() === expected.toLong)
  }

  test("snapshotDiff: B is a superset snapshot — adds/changes only, verified") {
    val got = Temporal.snapshotDiff(spark, sf).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getString(1) == "added" || r.getString(1) == "changed"))
    // spot-verify one 'changed' row against direct aggregation
    got.find(_.getString(1) == "changed").foreach { r =>
      val ck = r.getLong(0)
      val o = Star.table(spark, sf, "orders").filter(col("o_custkey") === ck)
      val na = o.filter(col("o_orderdate") < "1996-01-01").count()
      val nb = o.filter(col("o_orderdate") < "1997-01-01").count()
      assert(r.getLong(2) === na && r.getLong(3) === nb && na != nb)
    }
  }

  test("gapfillInterp: dense calendar, exact on observed, linear in holes") {
    val rows = Temporal.gapfillInterp(spark, sf).collect()
    // dense hourly calendar: consecutive rows 1h apart
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getTimestamp(0).getTime - a.getTimestamp(0).getTime === 3600000L)
    }
    val holes = rows.count(r => r.isNullAt(1) && !r.isNullAt(2))
    assert(holes > 0, "test series produced no interpolated holes")
    rows.foreach { r =>
      if (!r.isNullAt(1)) assert(r.getDouble(2) === r.getLong(1).toDouble)
    }
    // any interior hole value lies between its observed neighbors
    var lastObs = Option.empty[Double]
    rows.zipWithIndex.foreach { case (r, i) =>
      if (r.isNullAt(1) && !r.isNullAt(2)) {
        val nextObs = rows.drop(i + 1).find(!_.isNullAt(1)).map(_.getLong(1).toDouble)
        (lastObs, nextObs) match {
          case (Some(p), Some(n)) =>
            val v = r.getDouble(2)
            assert(v >= math.min(p, n) - 1e-6 && v <= math.max(p, n) + 1e-6)
          case _ => fail("interpolated value without both neighbors")
        }
      }
      if (!r.isNullAt(1)) lastObs = Some(r.getLong(1).toDouble)
    }
  }
}
