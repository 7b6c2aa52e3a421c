package graft.operators

import graft.SparkSuite

/** Specs for the PageRank operator (the DuckDB chained-CTE oracle is the
  * value gate; these assert the algorithm's structural invariants). */
class GraphSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("pageRank: every node present, teleport floor holds, mass bounded") {
    val rows = Graph.pageRank(spark, sf).collect()
    assert(rows.length === 25)
    val ranks = rows.map(_.getDouble(2))
    // teleport floor: a node with zero inflow still scores 0.15
    assert(ranks.forall(_ >= 0.15 - 1e-9))
    // total mass: at most n (floor division only loses rank, never adds)
    val mass = ranks.sum
    assert(mass <= 25.0 + 1e-9 && mass >= 25.0 * 0.15)
    // presentation order: rank descending with node tiebreak
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) > b.getDouble(2) ||
        (a.getDouble(2) == b.getDouble(2) &&
          a.getString(0) < b.getString(0)))
    }
  }

  test("pageRank: deterministic across runs (exact integer updates)") {
    val a = Graph.pageRank(spark, sf).collect().map(_.toString)
    val b = Graph.pageRank(spark, sf).collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("pageRank: rank correlates with weighted in-degree on this graph") {
    val rows = Graph.pageRank(spark, sf).collect()
    // suppliers concentrate in few nations at sf0.001 — nations with no
    // suppliers (no inbound trade) must sit exactly on the damped floor
    // after the final iteration's teleport + zero inflow
    val floor = rows.map(_.getDouble(2)).min
    assert(floor >= 0.15 - 1e-9 && floor < 0.2)
  }
}
