package graft.operators

import graft.SparkSuite

/** Specs for the round-5 additions: multi-pass sorted-neighborhood
  * blocking and the packed-array k-means centroid update. */
class Round5Spec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("snmMultipass: superset of the single pass, every pair a true >=0.5 pair") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val single = pairs(Dedup.sortedNeighborhood(spark, sf))
    val multi = pairs(Dedup.snmMultipass(spark, sf))
    // the second key only ADDS neighborhoods — pass 1 is run unchanged
    assert(single.keySet.subsetOf(multi.keySet))
    assert(multi.size >= single.size)
    // every multipass pair is a true >=0.5 pair with the same exact score
    val full = pairs(Dedup.ngramJaccard(spark, sf))
    multi.foreach { case (pair, j) =>
      assert(full.get(pair).contains(j), s"pair $pair missing or score drift")
    }
    assert(multi.keys.forall { case (a, b) => a < b })
  }

  test("kmeans: packed-array update shuffles arrays, not exploded (cid, dim) rows") {
    val df = Similarity.kmeans(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // membership counts cover the whole corpus exactly once
    val n = Star.table(spark, sf, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum === n)
    // the plan aggregates through the typed VecSum path (ObjectHashAggregate
    // with the udaf), never a posexplode of the vector relation
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("posexplode"), plan.take(2000))
    assert(plan.contains("vecsum") || plan.contains("VecSum"), plan.take(2000))
  }
}
