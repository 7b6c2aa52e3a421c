package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.SparkPlan

/** Specs for the TPC-H completion batch (the DuckDB oracle is the value
  * gate; these assert structural invariants and the physical plan shapes
  * each query exists to exercise). */
class TpchFullSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  private def planString(df: org.apache.spark.sql.DataFrame): String =
    plan(df).toString

  test("q2: every returned part carries its region-minimum cost supplier") {
    val rows = TpchFull.tpchQ2(spark, sf).collect()
    assert(rows.nonEmpty)
    // one row per (part, min-cost supplier); acctbal descending
    val bals = rows.map(_.getDouble(0))
    assert(bals.sameElements(bals.sorted(Ordering[Double].reverse)))
  }

  test("q4: EXISTS compiles to a semi join, not an inner join + distinct") {
    val p = planString(TpchFull.tpchQ4(spark, sf))
    assert(p.contains("LeftSemi"), p.linesIterator.take(12).mkString("\n"))
    val counts = TpchFull.tpchQ4(spark, sf).collect()
    assert(counts.map(_.getLong(1)).forall(_ > 0))
  }

  test("q6: all predicates push into the parquet scan") {
    val p = planString(TpchFull.tpchQ6(spark, sf))
    assert(p.contains("PushedFilters") &&
      p.contains("IsNotNull(l_shipdate)"))
    // single-row scalar aggregate
    assert(TpchFull.tpchQ6(spark, sf).count() === 1)
  }

  test("q7: both nation roles broadcast; revenue symmetric pairs present") {
    val p = planString(TpchFull.tpchQ7(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    val pairs = TpchFull.tpchQ7(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_12", "NATION_18"), ("NATION_18", "NATION_12"))))
  }

  test("q8: market share lies in [0,1] and total revenue is positive") {
    val rows = TpchFull.tpchQ8(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("q11: value threshold is scale-free (2x mean) and ordering holds") {
    val rows = TpchFull.tpchQ11(spark, sf).collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getDouble(1))
    assert(vals.sameElements(vals.sorted(Ordering[Double].reverse)))
  }

  test("q13: customers with zero qualifying orders survive the left join") {
    import org.apache.spark.sql.functions.col
    val rows = TpchFull.tpchQ13(spark, sf).collect()
    // the left join must preserve EVERY customer (an inner join drops the
    // zero-order ones): the distribution total equals the customer count,
    // and the 0-bucket matches an independent anti-join count
    val totalCust = rows.map(_.getLong(1)).sum
    assert(totalCust === Star.table(spark, sf, "customer").count())
    val zeroExpected = Star.table(spark, sf, "customer")
      .join(Star.table(spark, sf, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    val zeroBucket = rows.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
    assert(zeroBucket === zeroExpected)
  }

  test("q15: returned suppliers all achieve the same maximal revenue") {
    val rows = TpchFull.tpchQ15(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getDouble(2)).distinct.length === 1)
  }

  test("q16: excluded suppliers never counted") {
    val excluded = Star.table(spark, sf, "supplier")
      .filter(org.apache.spark.sql.functions.col("s_acctbal") < 0)
      .count()
    // structural: the anti join appears in the plan
    val p = planString(TpchFull.tpchQ16(spark, sf))
    assert(excluded == 0 || p.contains("LeftAnti"))
    assert(TpchFull.tpchQ16(spark, sf).collect().forall(_.getLong(3) > 0))
  }

  test("q19: disjunctive residual stays one join (no union of three scans)") {
    val p = planString(TpchFull.tpchQ19(spark, sf))
    assert(!p.contains("Union"))
    assert("BroadcastHashJoin".r.findAllIn(p).size === 1)
  }

  test("q21: semi + anti joins both present; waits positive") {
    val df = TpchFull.tpchQ21(spark, sf)
    val p = planString(df)
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p.take(2000))
    assert(df.collect().forall(_.getLong(1) > 0))
  }
}
