package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins [[IndexStore.majorRewrite]] — the tombstone-APPLYING compaction
  * (r13 verdict item 2): unlike the minor compactor (which only folds
  * append segments), the major rewrite must make retracted keys
  * physically LEAVE the index, its counts companion, AND its bloom
  * family (blooms are insert-only — rebuild is the only way fpp ever
  * recovers), while at-least-once maintenance replays stay no-ops
  * across the generation boundary and in-flight probes never observe a
  * half-published generation. */
class MajorRewriteSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def rowsDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("doc_id").select(col("doc_id"), (col("doc_id") % 10).as("h"))
  }

  /** Build the canonical fixture: base rows 0-99 bucketed on h, one
    * appended segment (rows 200-219) in lockstep with its counts delta
    * and bloom side. Returns the base table. */
  private def buildFixture(name: String) = {
    val base = IndexStore.cachedBucketTable(
      spark, dir, "documents", name, 4, Seq("h"), Seq("h")) {
      rowsDf(0L until 100L)
    }
    IndexStore.bloomFamilyFor(spark, dir, "documents", name, "doc_id", 4)(
      base)
    IndexStore.appendSegment(spark, dir, "documents", name, "a1") {
      rowsDf(200L until 220L)
    }
    IndexStore.appendCountsSegment(
      spark, dir, "documents", name, "a1", Seq("h")) {
      rowsDf(200L until 220L)
    }
    IndexStore.appendBloomSegment(
      spark, dir, "documents", name, "a1", "doc_id") {
      rowsDf(200L until 220L)
    }
    base
  }

  private def contentOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("tombstones physically leave the index, its populations, and " +
    "its blooms; replays no-op across the generation; re-run is stable") {
    val name = s"mrw${java.util.UUID.randomUUID.toString.take(6)}"
    val base = buildFixture(name)
    val allIds = ((0L until 100L) ++ (200L until 220L)).toSet
    val liveIds = allIds.filter(_ % 2 == 1)
    val deadIds = allIds -- liveIds
    // pre-rewrite: populations include the lane's delta (lockstep sum)
    val prePops = IndexStore.bucketPopulations(
      spark, dir, "documents", name, Seq("h"))(base)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prePops.values.sum === 120L, s"fixture populations: $prePops")

    val gen = IndexStore.majorRewrite(spark, dir, "documents", name, "g2",
      4, Seq("h"), Seq("h"), Seq("doc_id"),
      countsKeyCols = Some(Seq("h")), bloomKeyCol = Some("doc_id"),
      bloomShards = 4) { base } {
      rowsDf(allIds.toSeq.filter(_ % 2 == 0))
    }
    assert(gen === s"${name}_g2")
    assert(IndexStore.servingName(dir, "documents", name) === gen,
      "the alias must serve the rewritten generation")

    // the index: exactly the live rows, no anti-join anywhere
    val served = IndexStore.openTable(spark, dir, "documents", gen)
    assert(contentOf(served) === liveIds,
      "rewritten snapshot must hold base ∪ lane minus tombstones")
    // the populations: rebuilt FROM the reduced content (they shrink —
    // the capped serve stops binding on dead keys with no netting)
    val postPops = IndexStore.bucketPopulations(
      spark, dir, "documents", gen, Seq("h"))(served)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(postPops.values.sum === liveIds.size.toLong,
      s"populations must shrink to the live rows: $postPops")
    assert(postPops.keySet === liveIds.map(_ % 10),
      "empty buckets must vanish from the companion, not read as zero")
    // the blooms: fresh geometry over live keys only — every live key
    // still hits (no false negatives, the correctness bar) and the
    // tombstoned keys overwhelmingly miss (fpp recovery, the point of
    // the rebuild; insert-only bit arrays cannot forget)
    val fam = IndexStore.bloomFamilyFor(
      spark, dir, "documents", gen, "doc_id", 4)(served)
    liveIds.foreach(k => assert(fam.mightContainLong(k),
      s"live key $k missing from the rebuilt bloom (false negative)"))
    val deadHits = deadIds.count(fam.mightContainLong)
    assert(deadHits < deadIds.size / 4,
      s"$deadHits/${deadIds.size} tombstoned keys still hit — the " +
        "family was not rebuilt from the reduced content")

    // at-least-once replays of the folded segment no-op in EVERY lane
    // of the new generation (carried applied markers)
    IndexStore.appendSegment(spark, dir, "documents", gen, "a1") {
      rowsDf(200L until 220L)
    }
    IndexStore.appendCountsSegment(
      spark, dir, "documents", gen, "a1", Seq("h")) {
      rowsDf(200L until 220L)
    }
    IndexStore.appendBloomSegment(
      spark, dir, "documents", gen, "a1", "doc_id") {
      rowsDf(200L until 220L)
    }
    assert(IndexStore.readAppends(spark, dir, "documents", gen).isEmpty,
      "replayed append of a rewrite-folded segment must be a no-op")
    assert(contentOf(IndexStore.openTable(spark, dir, "documents", gen))
      === liveIds, "replays must not change the rewritten content")

    // re-running the whole rewrite is build-once stable
    val gen2 = IndexStore.majorRewrite(spark, dir, "documents", name, "g2",
      4, Seq("h"), Seq("h"), Seq("doc_id"),
      countsKeyCols = Some(Seq("h")), bloomKeyCol = Some("doc_id"),
      bloomShards = 4) { base } {
      rowsDf(allIds.toSeq.filter(_ % 2 == 0))
    }
    assert(gen2 === gen)
    assert(contentOf(IndexStore.openTable(spark, dir, "documents", gen))
      === liveIds, "re-run must re-promote the same generation unchanged")
  }

  test("partitioned major rewrite: content reduced, partition layout " +
    "kept, replays no-op, re-run stable") {
    val name = s"mrwp${java.util.UUID.randomUUID.toString.take(6)}"
    val base = IndexStore.cachedPartitionedTable(
      spark, dir, "documents", name, Seq("h")) {
      rowsDf(0L until 100L)
    }
    IndexStore.appendSegment(spark, dir, "documents", name, "a1") {
      rowsDf(200L until 220L)
    }
    val allIds = ((0L until 100L) ++ (200L until 220L)).toSet
    val liveIds = allIds.filter(_ % 2 == 1)
    val gen = IndexStore.majorRewritePartitioned(spark, dir, "documents",
      name, "g2", Seq("h"), Seq("doc_id"))(base) {
      rowsDf(allIds.toSeq.filter(_ % 2 == 0))
    }
    assert(gen === s"${name}_g2")
    assert(IndexStore.servingName(dir, "documents", name) === gen)
    val served = IndexStore.openTable(spark, dir, "documents", gen)
    assert(contentOf(served) === liveIds,
      "partitioned rewrite must hold base ∪ lane minus tombstones")
    // the generation keeps the partition layout — a partition-value
    // filter must prune to the matching directories
    val pruned = served.filter(org.apache.spark.sql.functions
      .col("h") === 1)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(h"),
      "rewritten generation must keep partition pruning\n" +
        pruned.queryExecution.executedPlan)
    assert(contentOf(pruned) === liveIds.filter(_ % 10 == 1))
    // replays of the folded segment no-op across the generation
    IndexStore.appendSegment(spark, dir, "documents", gen, "a1") {
      rowsDf(200L until 220L)
    }
    assert(IndexStore.readAppends(spark, dir, "documents", gen).isEmpty,
      "replayed append of a rewrite-folded segment must be a no-op")
    // re-run is build-once stable
    val gen2 = IndexStore.majorRewritePartitioned(spark, dir, "documents",
      name, "g2", Seq("h"), Seq("doc_id"))(base) {
      rowsDf(allIds.toSeq.filter(_ % 2 == 0))
    }
    assert(gen2 === gen)
    assert(contentOf(IndexStore.openTable(spark, dir, "documents", gen))
      === liveIds)
  }

  test("a probe racing the major rewrite only ever reads a complete " +
    "generation (old or new, never torn or unpublished)") {
    val name = s"mrwrace${java.util.UUID.randomUUID.toString.take(6)}"
    val base = buildFixture(name)
    // openTable reads the snapshot's BASE table; the old generation's
    // lane rides separately (readAppends), the new generation's is
    // folded into data/ — hence 100 vs 60
    val preCount = 100L
    val postCount = 60L
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val probe = new Thread(() => {
      while (!stop.get()) {
        try {
          val serving = IndexStore.servingName(dir, "documents", name)
          val n = IndexStore.openTable(spark, dir, "documents", serving)
            .count()
          val expected =
            if (serving == name) preCount else postCount
          if (n != expected)
            anomalies.add(s"generation $serving read $n rows")
        } catch {
          case e: Throwable =>
            // the one forbidden outcome: resolving an alias to a
            // generation that is not yet fully published
            anomalies.add(s"probe threw ${e.getMessage}")
        }
      }
    })
    probe.start()
    try {
      IndexStore.majorRewrite(spark, dir, "documents", name, "g2",
        4, Seq("h"), Seq("h"), Seq("doc_id"),
        countsKeyCols = Some(Seq("h")), bloomKeyCol = Some("doc_id"),
        bloomShards = 4) { base } {
        rowsDf(((0L until 100L) ++ (200L until 220L)).filter(_ % 2 == 0))
      }
      // let the probe observe the post-promotion world a few times
      Thread.sleep(300)
    } finally {
      stop.set(true)
      probe.join(30000)
    }
    assert(anomalies.isEmpty, s"racing probe anomalies: " +
      anomalies.toArray.mkString("; "))
    assert(IndexStore.servingName(dir, "documents", name) === s"${name}_g2")
  }

  test("a REAL second JVM runs the major rewrite while this process " +
    "probes: only complete generations observed, companions consistent") {
    // the thread race above shares the JVM-wide IndexStore lock; this
    // drives the whole coordination surface (build-once generation,
    // staged publication, marker carry, alias promote) from a foreign
    // process — the shape a production maintenance job actually has
    val name = s"mrwjvm${java.util.UUID.randomUUID.toString.take(6)}"
    buildFixture(name)
    val (child, log) = graft.ChildJvm.start(
      "graft.tools.LifecycleStressMain",
      Seq("--rewrite", dir, name, "g2"))
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]
    var sawNew = false
    try {
      while (child.isAlive) {
        try {
          val serving = IndexStore.servingName(dir, "documents", name)
          if (serving != name) sawNew = true
          if (sawNew && serving == name)
            anomalies.add("alias regressed to the old generation")
          val n = IndexStore.openTable(spark, dir, "documents", serving)
            .count()
          val expected = if (serving == name) 100L else 60L
          if (n != expected)
            anomalies.add(s"generation $serving read $n rows")
        } catch {
          case e: Throwable => anomalies.add(s"probe threw ${e.getMessage}")
        }
      }
      assert(child.exitValue() === 0,
        s"child rewrite failed; log: ${java.nio.file.Files.readString(log)}")
    } finally if (child.isAlive) child.destroyForcibly()
    assert(anomalies.isEmpty,
      s"cross-JVM anomalies: ${anomalies.toArray.mkString("; ")}")
    val gen = IndexStore.servingName(dir, "documents", name)
    assert(gen === s"${name}_g2", "child's promotion must be visible here")
    // the foreign process's companion rebuilds serve consistently HERE
    val served = IndexStore.openTable(spark, dir, "documents", gen)
    assert(contentOf(served).forall(_ % 2 == 1))
    val pops = IndexStore.bucketPopulations(
      spark, dir, "documents", gen, Seq("h"))(served)
      .collect().map(_.getLong(1)).sum
    assert(pops === 60L, s"populations of the child-built generation: $pops")
    val fam = IndexStore.bloomFamilyFor(
      spark, dir, "documents", gen, "doc_id", 4)(served)
    contentOf(served).foreach(k => assert(fam.mightContainLong(k),
      s"live key $k missing from the child-built bloom family"))
  }
}
