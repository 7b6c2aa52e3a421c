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

  test("an append arriving at a sealed lane REDIRECTS to the new " +
    "generation — it never lands in the dying one") {
    val name = s"mrwredir${java.util.UUID.randomUUID.toString.take(6)}"
    val base = buildFixture(name)
    val gen = IndexStore.majorRewrite(spark, dir, "documents", name, "g2",
      4, Seq("h"), Seq("h"), Seq("doc_id"),
      countsKeyCols = Some(Seq("h")), bloomKeyCol = Some("doc_id"),
      bloomShards = 4) { base } {
      rowsDf(((0L until 100L) ++ (200L until 220L)).filter(_ % 2 == 0))
    }
    // the old lane is now fenced (sealed): a late append must flow to
    // the serving generation
    IndexStore.appendSegment(spark, dir, "documents", name, "late") {
      rowsDf(501L to 509L by 2)
    }
    val newLane = IndexStore.readAppends(spark, dir, "documents", gen)
    assert(newLane.nonEmpty &&
      contentOf(newLane.get) === (501L to 509L by 2).toSet,
      "redirected append must land in the new generation's lane")
    // and nothing landed in the old lane (its dirs would otherwise be
    // nondeterministically folded by a rewrite replay)
    val tag = FixtureCache.sourceTag(dir, "documents")
    val oldSeg = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_idx_${name}_$tag/appends/slate")
    assert(!java.nio.file.Files.exists(oldSeg),
      "a sealed lane must take no new segment dirs")
    // the redirected segment replays as a no-op in the new generation
    IndexStore.appendSegment(spark, dir, "documents", gen, "late") {
      rowsDf(900L to 999L)
    }
    assert(contentOf(IndexStore.readAppends(
      spark, dir, "documents", gen).get) === (501L to 509L by 2).toSet,
      "replay of the redirected segment must no-op")
  }

  test("an append RACING the seal (fence lands mid-publish) re-lands in " +
    "the new generation exactly once; a captured id does not re-land") {
    val name = s"mrwrace2${java.util.UUID.randomUUID.toString.take(6)}"
    IndexStore.cachedBucketTable(
      spark, dir, "documents", name, 4, Seq("h"), Seq("h")) {
      rowsDf(0L until 50L)
    }
    val gen = s"${name}_g2"
    val tag = FixtureCache.sourceTag(dir, "documents")
    val oldAppends = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"),
      s"graft_idx_${name}_$tag/appends")
    val genAppends = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_idx_${gen}_$tag/appends")
    // the in-flight window, simulated exactly: the build closure runs
    // BETWEEN appendSegment's fence pre-check and its publication, so a
    // fence written inside it lands mid-publish. The sealed capture
    // EXCLUDES this segment -> the post-publication recheck must re-land
    // it in the named new generation.
    var fencedMidFlight = false
    IndexStore.appendSegment(spark, dir, "documents", name, "race") {
      IndexStore.writeFence(oldAppends,
        IndexStore.LaneFence("sealed", gen, Set("a0")))
      fencedMidFlight = true
      rowsDf(601L to 609L by 2)
    }
    assert(fencedMidFlight)
    val relanded = IndexStore.readAppends(spark, dir, "documents", gen)
    assert(relanded.nonEmpty &&
      contentOf(relanded.get) === (601L to 609L by 2).toSet,
      "a racing append the capture excluded must re-land in the new " +
        "generation — the r14 behavior silently stranded it")
    // captured-id case: the rewrite folded the segment and carried its
    // marker, so the redirect resolves to the marker and no-ops
    java.nio.file.Files.createDirectories(genAppends)
    java.nio.file.Files.createFile(genAppends.resolve("_applied_folded"))
    IndexStore.writeFence(oldAppends,
      IndexStore.LaneFence("sealed", gen, Set("a0", "folded")))
    IndexStore.appendSegment(spark, dir, "documents", name, "folded") {
      rowsDf(900L to 999L)
    }
    assert(contentOf(IndexStore.readAppends(
      spark, dir, "documents", gen).get) === (601L to 609L by 2).toSet,
      "a captured (folded, marker-carried) id must not re-land")
  }

  test("a crashed rewrite's REPLAY (a real second JVM) reuses the " +
    "PERSISTED capture — an append racing the crash window re-lands " +
    "instead of silently vanishing") {
    // The one silent-loss window left in the r15 fence: rewrite R seals
    // the lane, captures the applied ids, PUBLISHES the fold, then dies
    // before sealing. Segment X was mid-flight across R's capture (its
    // marker landed after). A replay that re-derived the capture from
    // the live markers would now include X, carry X's marker into a
    // generation whose already-published fold EXCLUDED it, and seal an
    // id list that tells X's recheck "folded — don't re-land": X's rows
    // would be in NO serving lineage. The capture persisted in the
    // sealing fence is the ground truth every replay must reuse.
    val name = s"mrwcap${java.util.UUID.randomUUID.toString.take(6)}"
    IndexStore.cachedBucketTable(
      spark, dir, "documents", name, 4, Seq("h"), Seq("h")) {
      rowsDf(0L until 100L)
    }
    val gen = s"${name}_g2"
    val tag = FixtureCache.sourceTag(dir, "documents")
    val oldAppends = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"),
      s"graft_idx_${name}_$tag/appends")
    var child: Process = null
    var childLog: java.nio.file.Path = null
    // X's build closure runs between its fence pre-check and its
    // publication — the crash is staged exactly there: R persisted an
    // EMPTY capture (X's marker has not landed yet), published the fold
    // of exactly that capture, and died before carry/seal/promote. The
    // replay then arrives from a FOREIGN maintenance process that boots
    // (~10 s) while X's publish + marker (~1 s) complete, so its
    // sealLane runs with X's marker live — the exact window where a
    // re-derived capture diverges from the persisted one. X's recheck
    // meanwhile blocks in awaitSealed until the replay seals.
    IndexStore.appendSegment(spark, dir, "documents", name, "x") {
      IndexStore.writeFence(oldAppends,
        IndexStore.LaneFence("sealing", gen, Set.empty, captured = true))
      IndexStore.cachedBucketTable(
        spark, dir, "documents", gen, 4, Seq("h"), Seq("h")) {
        rowsDf((0L until 100L).filter(_ % 2 == 1))
      }
      val started = graft.ChildJvm.start(
        "graft.tools.LifecycleStressMain",
        Seq("--rewrite", dir, name, "g2"))
      child = started._1
      childLog = started._2
      rowsDf(701L to 709L by 2)
    }
    assert(child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      s"replay child timed out; log: " +
        java.nio.file.Files.readString(childLog))
    assert(child.exitValue() === 0, "replay child failed: " +
      java.nio.file.Files.readString(childLog))
    // the replay sealed the PERSISTED capture verbatim — a re-derived
    // one would read {x} here
    val fence = IndexStore.readFence(
      oldAppends.getFileSystem(spark.sparkContext.hadoopConfiguration),
      oldAppends).get
    assert(fence.state === "sealed" && fence.ids.isEmpty,
      s"replay must seal the persisted capture verbatim, got ${fence.ids}")
    assert(IndexStore.servingName(dir, "documents", name) === gen)
    assert(contentOf(IndexStore.openTable(spark, dir, "documents", gen))
      === (0L until 100L).filter(_ % 2 == 1).toSet,
      "the generation serves the persisted capture's fold only")
    // X was excluded from the capture -> not carried -> its own recheck
    // re-landed it in the new generation (the rows a recaptured id list
    // would have silently lost)
    val lane = IndexStore.readAppends(spark, dir, "documents", gen)
    assert(lane.nonEmpty &&
      contentOf(lane.get) === (701L to 709L by 2).toSet,
      "the racing append must re-land in the serving lineage — losing " +
        "it is exactly the bug the persisted capture prevents")
  }

  test("an applied MARKER alone does not settle a fenced lane: a " +
    "marked-but-uncaptured segment's replay re-lands in the new " +
    "generation instead of early-returning into the void") {
    // the appender died between its marker and its own recheck; the
    // sealed capture excludes it. An unconditional marker early-return
    // would leave its rows in the dying generation forever — the sealed
    // id list must arbitrate the marker fast path too.
    val name = s"mrwmark${java.util.UUID.randomUUID.toString.take(6)}"
    IndexStore.cachedBucketTable(
      spark, dir, "documents", name, 4, Seq("h"), Seq("h")) {
      rowsDf(0L until 50L)
    }
    IndexStore.appendSegment(spark, dir, "documents", name, "y1") {
      rowsDf(801L to 809L by 2)
    } // marker now in the old lane
    val gen = s"${name}_g2"
    IndexStore.cachedBucketTable(
      spark, dir, "documents", gen, 4, Seq("h"), Seq("h")) {
      rowsDf((0L until 50L).filter(_ % 2 == 1))
    }
    val tag = FixtureCache.sourceTag(dir, "documents")
    val oldAppends = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"),
      s"graft_idx_${name}_$tag/appends")
    // the rewrite's capture EXCLUDED y1 (it was mid-flight)
    IndexStore.writeFence(oldAppends,
      IndexStore.LaneFence("sealed", gen, Set("other")))
    IndexStore.appendSegment(spark, dir, "documents", name, "y1") {
      rowsDf(801L to 809L by 2)
    }
    val lane = IndexStore.readAppends(spark, dir, "documents", gen)
    assert(lane.nonEmpty &&
      contentOf(lane.get) === (801L to 809L by 2).toSet,
      "the marked-but-uncaptured replay must re-land — the marker " +
        "fast path cannot outrank the sealed capture")
    // and the re-land is itself idempotent
    IndexStore.appendSegment(spark, dir, "documents", name, "y1") {
      rowsDf(900L to 999L)
    }
    assert(contentOf(IndexStore.readAppends(
      spark, dir, "documents", gen).get) === (801L to 809L by 2).toSet)
    // a CAPTURED marker stays a no-op (folded + carried)
    IndexStore.writeFence(oldAppends,
      IndexStore.LaneFence("sealed", gen, Set("other", "y1")))
    IndexStore.appendSegment(spark, dir, "documents", name, "y1") {
      rowsDf(900L to 999L)
    }
    assert(contentOf(IndexStore.readAppends(
      spark, dir, "documents", gen).get) === (801L to 809L by 2).toSet)
  }

  test("an append waiting out a foreign rewrite's seal does NOT hold " +
    "the JVM-global lock — other snapshots keep serving meanwhile") {
    val name = s"mrwwait${java.util.UUID.randomUUID.toString.take(6)}"
    IndexStore.cachedBucketTable(
      spark, dir, "documents", name, 4, Seq("h"), Seq("h")) {
      rowsDf(0L until 20L)
    }
    val other = s"mrwother${java.util.UUID.randomUUID.toString.take(6)}"
    IndexStore.cachedBucketTable(
      spark, dir, "documents", other, 4, Seq("h"), Seq("h")) {
      rowsDf(0L until 20L)
    }
    val gen = s"${name}_g2"
    val tag = FixtureCache.sourceTag(dir, "documents")
    val appends = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"),
      s"graft_idx_${name}_$tag/appends")
    // a foreign rewrite is mid-seal: fence present, not yet sealed
    IndexStore.writeFence(appends,
      IndexStore.LaneFence("sealing", gen, Set.empty, captured = true))
    val waiter = new Thread(() =>
      IndexStore.appendSegment(spark, dir, "documents", name, "w1") {
        rowsDf(951L to 959L by 2)
      })
    waiter.start()
    try {
      Thread.sleep(500) // let the waiter reach its first retry sleep
      assert(waiter.isAlive, "waiter should be blocked on the fence")
      // the old behavior spun INSIDE the JVM-global monitor, so this
      // unrelated serve would block for the rewrite's whole window;
      // lock-free waiting must let it finish promptly
      val t0 = System.currentTimeMillis()
      IndexStore.openTable(spark, dir, "documents", other).count()
      val elapsed = System.currentTimeMillis() - t0
      assert(elapsed < 30000,
        s"unrelated serve took ${elapsed} ms while an append waited " +
          "out a foreign seal — the fence wait is holding the lock")
      assert(waiter.isAlive, "waiter must still be waiting (not sealed)")
    } finally {
      // seal the fence so the waiter redirects and exits
      IndexStore.cachedBucketTable(
        spark, dir, "documents", gen, 4, Seq("h"), Seq("h")) {
        rowsDf(0L until 20L)
      }
      IndexStore.writeFence(appends,
        IndexStore.LaneFence("sealed", gen, Set.empty))
      waiter.join(120000)
    }
    assert(!waiter.isAlive, "waiter never finished after the seal")
    assert(contentOf(IndexStore.readAppends(
      spark, dir, "documents", gen).get) === (951L to 959L by 2).toSet,
      "the waited-out append must re-land in the sealed generation")
  }

  test("segment ids starting with 'c' are rejected — the 'sc' dir " +
    "namespace belongs to minor-compaction outputs the rewrite folds " +
    "unconditionally") {
    val name = s"mrwres${java.util.UUID.randomUUID.toString.take(6)}"
    intercept[IllegalArgumentException] {
      IndexStore.appendSegment(spark, dir, "documents", name, "c1") {
        rowsDf(0L until 5L)
      }
    }
    // ids are comma-joined into the persisted fence capture, which now
    // ARBITRATES every append path — an id the fence cannot round-trip
    // verbatim would parse back as two ids and lose rows in the fold
    intercept[IllegalArgumentException] {
      IndexStore.appendSegment(spark, dir, "documents", name, "a,b") {
        rowsDf(0L until 5L)
      }
    }
  }

  test("a rewrite invoked WITHOUT countsKeyCols on a companion-bearing " +
    "snapshot fails loudly before changing any state") {
    val name = s"mrwguard${java.util.UUID.randomUUID.toString.take(6)}"
    val base = buildFixture(name) // includes a counts companion lane
    val e = intercept[IllegalStateException] {
      IndexStore.majorRewrite(spark, dir, "documents", name, "g2",
        4, Seq("h"), Seq("h"), Seq("doc_id")) { base } {
        rowsDf((0L until 100L).filter(_ % 2 == 0))
      }
    }
    assert(e.getMessage.contains("countsKeyCols"))
    // nothing was sealed: the lane still takes appends normally
    val tag = FixtureCache.sourceTag(dir, "documents")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_idx_${name}_$tag/appends/_FENCE")),
      "the failed contract check must not have fenced the lane")
    IndexStore.appendSegment(spark, dir, "documents", name, "ok1") {
      rowsDf(777L to 779L)
    }
    assert(contentOf(IndexStore.readAppends(
      spark, dir, "documents", name).get)
      .intersect((777L to 779L).toSet) === (777L to 779L).toSet)
  }

  test("a lockstep counts append racing a completed rewrite follows its " +
    "index rows to the new generation — the companion never splits " +
    "across generations") {
    val name = s"mrwcnt${java.util.UUID.randomUUID.toString.take(6)}"
    val base = buildFixture(name)
    val gen = IndexStore.majorRewrite(spark, dir, "documents", name, "g2",
      4, Seq("h"), Seq("h"), Seq("doc_id"),
      countsKeyCols = Some(Seq("h")), bloomKeyCol = Some("doc_id"),
      bloomShards = 4) { base } {
      rowsDf(((0L until 100L) ++ (200L until 220L)).filter(_ % 2 == 0))
    }
    // the maintenance job's lockstep pair arrives AFTER the seal: the
    // index rows redirect; the counts delta must follow them, not land
    // in the dying counts lane (which would trip the phantom guard on
    // every old-generation serve and leave the new companion lagging)
    IndexStore.appendSegment(spark, dir, "documents", name, "z1") {
      rowsDf(421L to 429L by 2)
    }
    IndexStore.appendCountsSegment(
      spark, dir, "documents", name, "z1", Seq("h")) {
      rowsDf(421L to 429L by 2)
    }
    val tag = FixtureCache.sourceTag(dir, "documents")
    val oldCntMarker = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_idx_${IndexStore.countsName(name)}_$tag/appends/_applied_z1")
    assert(!java.nio.file.Files.exists(oldCntMarker),
      "the racing counts delta landed in the dying generation's lane")
    // the NEW generation's populations include the delta through its
    // own lane (base companion ∪ redirected delta)
    val pops = IndexStore.bucketPopulations(
      spark, dir, "documents", gen, Seq("h"))(
      IndexStore.openTable(spark, dir, "documents", gen))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pops.values.sum === 60L + 5L,
      s"new-generation populations must include the redirected " +
        s"lockstep delta: $pops")
    // and the old generation's serve path still passes its lockstep
    // guard (no phantom counts, no permanent lag)
    IndexStore.bucketPopulations(
      spark, dir, "documents", name, Seq("h"))(base).collect()
  }

  test("a SECOND maintenance cycle rewrites the serving generation and " +
    "the alias chain resolves to its fixed point") {
    val name = s"mrwchain${java.util.UUID.randomUUID.toString.take(6)}"
    val base = IndexStore.cachedBucketTable(
      spark, dir, "documents", name, 4, Seq("h"), Seq("h")) {
      rowsDf(0L until 100L)
    }
    val gen1 = IndexStore.majorRewrite(spark, dir, "documents", name, "g2",
      4, Seq("h"), Seq("h"), Seq("doc_id")) { base } {
      rowsDf((0L until 100L).filter(_ % 2 == 0))
    }
    assert(IndexStore.servingName(dir, "documents", name) === gen1)
    // life goes on in the serving generation: an append, more takedown
    IndexStore.appendSegment(spark, dir, "documents", gen1, "b1") {
      rowsDf(301L to 309L by 2)
    }
    // the bootstrap lane is sealed toward g2 forever, so cycle two
    // rewrites the SERVING generation (fold captures b1, marker carried)
    val odds = (0L until 100L).filter(_ % 2 == 1) ++ (301L to 309L by 2)
    val gen2 = IndexStore.majorRewrite(spark, dir, "documents", gen1, "g3",
      4, Seq("h"), Seq("h"), Seq("doc_id")) {
      IndexStore.openTable(spark, dir, "documents", gen1)
    } { rowsDf(odds.filter(_ % 10 == 3)) }
    assert(gen2 === s"${gen1}_g3")
    // the serve path resolves name -> g2 -> g3 (a one-hop resolution
    // would strand serving at g2)
    assert(IndexStore.servingName(dir, "documents", name) === gen2,
      "the alias chain must resolve across both maintenance cycles")
    assert(contentOf(IndexStore.openTable(spark, dir, "documents", gen2))
      === odds.filterNot(_ % 10 == 3).toSet,
      "cycle two folds the serving generation's lane minus its tombstones")
    // the folded segment's marker crossed BOTH generation boundaries
    IndexStore.appendSegment(spark, dir, "documents", gen2, "b1") {
      rowsDf(900L to 999L)
    }
    assert(IndexStore.readAppends(spark, dir, "documents", gen2).isEmpty,
      "replay of a segment folded by cycle two must no-op")
  }

  test("a REAL second JVM streams appends while this process runs the " +
    "major rewrite: every append lands in the serving lineage exactly " +
    "once — folded or re-landed, never lost, never doubled") {
    val name = s"mrwapp${java.util.UUID.randomUUID.toString.take(6)}"
    val base = buildFixture(name)
    val (child, log) = graft.ChildJvm.start(
      "graft.tools.LifecycleStressMain",
      Seq("--append-loop", dir, name, "12"))
    // let a few appends land pre-seal so BOTH fates (captured-fold and
    // redirect/re-land) occur in one run
    Thread.sleep(2000)
    val gen = IndexStore.majorRewrite(spark, dir, "documents", name, "g2",
      4, Seq("h"), Seq("h"), Seq("doc_id"),
      countsKeyCols = Some(Seq("h")), bloomKeyCol = Some("doc_id"),
      bloomShards = 4) { base } {
      rowsDf(((0L until 100L) ++ (200L until 220L)).filter(_ % 2 == 0))
    }
    assert(child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      s"child timed out; log: ${java.nio.file.Files.readString(log)}")
    val logText = java.nio.file.Files.readString(log)
    assert(child.exitValue() === 0, s"child append loop failed: $logText")
    val appendedIds = "APPENDED r\\d+ (\\d+)".r
      .findAllMatchIn(logText).map(_.group(1).toLong).toSeq
    assert(appendedIds.size === 12, s"child landed ${appendedIds.size}/12")
    // audit multiplicity across the SERVING lineage (new gen base ∪ its
    // lane): each child id exactly once — a zero is the silent loss the
    // fence exists to prevent, a two is a fold+re-land double-count
    val baseRows = IndexStore.openTable(spark, dir, "documents", gen)
      .select("doc_id").collect().map(_.getLong(0))
    val laneRows = IndexStore.readAppends(spark, dir, "documents", gen)
      .map(_.select("doc_id").collect().map(_.getLong(0)))
      .getOrElse(Array.empty[Long])
    val multiplicity = (baseRows ++ laneRows)
      .groupBy(identity).map { case (k, v) => k -> v.length }
    appendedIds.foreach { id =>
      assert(multiplicity.getOrElse(id, 0) === 1,
        s"append id $id appears ${multiplicity.getOrElse(id, 0)} times " +
          s"in the serving lineage (fold/re-land accounting broke); " +
          s"log: $logText")
    }
    // fixture content is intact alongside
    ((0L until 100L) ++ (200L until 220L)).filter(_ % 2 == 1).foreach(k =>
      assert(multiplicity.getOrElse(k, 0) === 1, s"fixture row $k lost"))
    // the bloom family heals any re-landed segment's side via the
    // lockstep backfill and must hold every serving key
    val fam = IndexStore.bloomFamilyFor(
      spark, dir, "documents", gen, "doc_id", 4)(
      IndexStore.openTable(spark, dir, "documents", gen))
    (baseRows ++ laneRows).foreach(k => assert(fam.mightContainLong(k),
      s"serving key $k missing from the healed bloom family"))
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
