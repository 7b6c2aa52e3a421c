package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** AQE runtime skew-join splitting under a deliberately adversarial key
  * distribution — the complement to the manual salting in [[Skew]]:
  * salting is for when the skew is KNOWN ahead of plan time (or the plan
  * needs a required output partitioning AQE can't touch); AQE's
  * skewedJoin rule handles the rest at runtime by splitting oversized
  * shuffle partitions into multiple tasks that each re-read a slice and
  * replicate the matching build side.
  */
class AqeSkewSpec extends SparkSuite {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption.filter(_ != null) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition of a skewed sort-merge join and " +
    "results stay exact") {
    // key 0 carries 100k rows (one hot reducer); keys 1..50 carry 200 each
    val big = spark.range(100000).select(lit(0L).as("k"), col("id").as("v"))
      .union(spark.range(10000).select((col("id") % 50 + 1).as("k"),
        col("id").as("v")))
    val dim = spark.range(51).select(col("id").as("k"),
      concat(lit("name_"), col("id")).as("name"))
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // local-scale thresholds so the 100k-row partition registers as
      // skewed: >2x median and >64KB triggers a split into ~16KB slices
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      // force a shuffle join: broadcast would dodge the skew entirely
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // the downstream groupBy(k) requires hash partitioning, which a
      // skew split breaks — without force, OptimizeSkewedJoin skips any
      // split that would add an exchange. Forcing trades one extra
      // (cheap, post-aggregation-sized) shuffle for unpinning the hot
      // reducer — the right trade when one straggler holds the stage.
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true") {
      // sum(v) keeps the 8-byte value column in the shuffle (k alone is a
      // constant in the hot partition and compresses under any threshold)
      val joined = big.join(dim.hint("shuffle_merge"), Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val rows = joined.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // exactness under splitting: hot key keeps all 100k rows and the
      // exact value sum (a dropped or double-read slice would break both)
      assert(rows(0L)._1 === 100000L)
      assert(rows(0L)._2 === 100000L * 99999L / 2)
      assert((1L to 50L).forall(k => rows(k)._1 === 200L))
      // the final adaptive plan must actually have engaged the skew path
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in plan:\n$plan")
    }
  }

  test("without AQE skew handling the same join still agrees (baseline)") {
    val big = spark.range(20000).select(lit(0L).as("k"), col("id").as("v"))
    val dim = spark.range(1).select(col("id").as("k"), lit("x").as("name"))
    withConfs(
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(big.join(dim, Seq("k")).count() === 20000L)
    }
  }
}
