package graft.operators

import graft.SparkSuite

/** Index lifecycle beyond append: retraction (a takedown must stop
  * blocking arrivals without an index rebuild) and arrival-state
  * compaction (streaming dedup state must not grow one small-file
  * segment per trigger forever). */
class IndexLifecycleSpec extends SparkSuite {

  /** Planted corpus: base doc 5 (in the retraction set: 5 % 10 = 5) and
    * arriving doc 10 are EXACT duplicates (all MinHash bands collide by
    * construction), fillers share nothing. */
  private lazy val plantedDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_retract").toString
    import spark.implicits._
    val dup = (1 to 30).map(i => s"tok$i").mkString(" ")
    def filler(i: Int) = (1 to 12).map(j => s"f${i}x$j").mkString(" ")
    val rows = Seq(
      (5L, dup, "en", "web", dup.length.toLong),
      (10L, dup, "en", "web", dup.length.toLong)) ++
      Seq(1L, 2L, 3L, 4L, 6L, 7L, 9L)
        .map(i => (i, filler(i.toInt), "en", "web", 10L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("a retracted base doc no longer blocks its arriving duplicate") {
    // without retraction: base doc 5 blocks arrival 10 (first-seen-wins)
    val before = Dedup.dedupIncremental(spark, plantedDir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(before(10L) === "drop",
      "planted duplicate must be blocked by its base twin")
    // doc 5 is in the retraction set (doc_id % 10 = 5): the SAME
    // persisted index, probed through the tombstone anti-join, must stop
    // blocking the arrival
    val after = Dedup.dedupIndexRetract(spark, plantedDir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(after(10L) === "keep",
      "retracted doc must no longer block the arrival")
  }

  test("IVF retraction: tombstoned vectors never serve; results change at harness scales") {
    // the tombstone anti-join must remove every vec_id % 10 IN (6, 7)
    // neighbor from the served top-3, and — because removing 20% of the
    // corpus vacates somebody's top-3 — must actually CHANGE the result
    // relative to the untouched snapshot (guards against a retract path
    // that filters nothing and trivially matches its oracle)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val served = Similarity.annIvfServe(spark, dir).collect()
      val after = Similarity.annIvfRetract(spark, dir).collect()
      assert(after.forall { r =>
        val res = r.getLong(1) % 10; res != 6 && res != 7
      }, s"$dir: a tombstoned vector was served")
      assert(!served.sameElements(after),
        s"$dir: retraction changed nothing — tombstones never served")
      assert(after.length === served.length,
        "top-3 per query must stay fully populated from live vectors")
    }
  }

  test("streaming arrival-band state stays within the segment bound; verdicts converge to the batch twin") {
    val dir = "/root/testdata/sf0.001"
    val (res, stateDir) = Dedup.streamDedupIndexRun(spark, dir)
    val rows = res.collect()
    val segs = new java.io.File(stateDir).listFiles()
      .filter(f => f.isDirectory &&
        (f.getName.startsWith("b") || f.getName.startsWith("c")))
    assert(segs.length <= 2,
      s"arrival state must stay <= 2 segments, got " +
        segs.map(_.getName).sorted.mkString(", "))
    assert(segs.exists(_.getName.startsWith("c")),
      "compaction must have run during the 3-trigger replay")
    val twin = Dedup.dedupIncremental(spark, dir).collect()
    assert(rows.toSeq === twin.toSeq)
  }

  test("IVF drift monitor: retrain flag fires on an out-of-distribution shard") {
    // harness corpora are in-distribution (all flags False at every sf —
    // verified by the oracle rows); this planted corpus proves the
    // trigger actually FIRES: shard vectors (vec_id % 10 = 9) are the
    // base vectors scaled 40x, so every arrival's distance to its
    // nearest frozen centroid dwarfs the cell's training-time mean
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift").toString
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 44L).map { i =>
      val scale = if (i % 10 == 9) 40.0f else 1.0f
      val v = Array.fill(8)((rnd.nextFloat() * 2 - 1) * scale)
      (i, v, (i % 3).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    val drift = Similarity.annIvfDrift(spark, tmp).collect()
    assert(drift.exists(_.getBoolean(5)),
      "planted 40x-scaled shard must trip the retrain flag somewhere")
    assert(drift.map(_.getLong(1)).sum === 40L &&
      drift.map(_.getLong(3)).sum === 4L,
      "population counts must partition base (40) and shard (4)")
  }

  test("IVF retrain-and-swap: old snapshot serves until promotion; the swap surfaces the retrained answer") {
    // planted corpus wiring trigger -> executor: shard vectors 19/29/39
    // are 40x-scaled randoms (they fire the drift flag, as in the drift
    // spec); shard vector 9 is base vector 0 scaled 1.05 — same
    // direction, cosine ~ 1.0 with query 0, L2-near its cell — so the
    // RETRAINED index must serve it as q0's top-1 while the frozen
    // generation (base postings only) cannot serve ANY shard vector
    val tmp = java.nio.file.Files.createTempDirectory("graft_retrain").toString
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val baseVecs = Vector.fill(44)(Array.fill(8)(rnd.nextFloat() * 2 - 1))
    val rows = (0L until 44L).map { i =>
      val v =
        if (i == 9L) baseVecs(0).map(_ * 1.05f)
        else if (i % 10 == 9) baseVecs(i.toInt).map(_ * 40.0f)
        else baseVecs(i.toInt)
      (i, v, (i % 3).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    // the trigger fires on this corpus
    assert(Similarity.annIvfDrift(spark, tmp).collect().exists(_.getBoolean(5)),
      "drift monitor must fire before a retrain is justified")
    val alias = s"spec_${java.util.UUID.randomUUID.toString.take(8)}"
    val job = new Similarity.IvfRetrain(spark, tmp, alias)
    def served() = job.serve().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    job.init()
    val old = served()
    assert(old.forall(_._2 % 10 != 9),
      "frozen generation must not serve any shard vector")
    job.rebuild() // snapshot published, alias untouched
    assert(served() === old,
      "a probe during/after rebuild but before promotion must still " +
        "answer from the old snapshot")
    job.promote() // the atomic pointer swap
    val fresh = served()
    assert(fresh !== old, "promotion must surface the retrained index")
    assert(fresh.contains((0L, 9L, 1L)),
      "the planted near-identical shard vector must be q0's retrained top-1")
  }

  test("persisted-index append lane: compaction bounds segments, preserves rows, re-runs idempotent") {
    import graft.sources.IndexStore
    val dir = "/root/testdata/sf0.001"
    // the registered query: 3 appends -> compacted lane, profile stable
    // across re-runs (applied markers survive compaction, so a re-run
    // must NOT re-append rows the compacted segment already holds)
    val first = Dedup.dedupIndexCompact(spark, dir).collect().toSeq
    val segs = IndexStore.appendSegmentDirs(spark, dir, "documents", "mhband")
    assert(segs.size <= 2,
      s"lane must stay <= 2 segments, got ${segs.map(_.getName)}")
    assert(segs.exists(_.getName.startsWith("sc")),
      "compaction must have rewritten the lane")
    val second = Dedup.dedupIndexCompact(spark, dir).collect().toSeq
    assert(second === first, "re-run changed the served profile")
    // raw API on a private lane: N appends -> bound holds, rows preserved
    val name = s"lane${java.util.UUID.randomUUID.toString.take(6)}"
    (0 until 5).foreach { k =>
      IndexStore.appendSegment(spark, dir, "documents", name, s"k$k") {
        spark.range(k * 10L, k * 10L + 10L).toDF("id")
      }
    }
    def ids() = IndexStore.readAppends(spark, dir, "documents", name)
      .get.collect().map(_.getLong(0)).sorted.toSeq
    val before = ids()
    assert(IndexStore.appendSegmentDirs(
      spark, dir, "documents", name).size === 5)
    IndexStore.compactAppends(spark, dir, "documents", name, maxSegments = 2)
    assert(IndexStore.appendSegmentDirs(
      spark, dir, "documents", name).size === 1)
    assert(ids() === before, "compaction lost or duplicated rows")
    // at-least-once re-append after compaction: markers make it a no-op
    (0 until 5).foreach { k =>
      IndexStore.appendSegment(spark, dir, "documents", name, s"k$k") {
        spark.range(k * 10L, k * 10L + 10L).toDF("id")
      }
    }
    assert(ids() === before, "re-applied segment duplicated rows")
  }

  test("scaled-geometry semantic dedup agrees with the exact-twin-gated form") {
    // q_semantic_dedup_scaled's ORACLE is a banded mirror (pins
    // implementation fidelity at the pinned 256x16 cap geometry); THIS
    // is the recall gate: at harness scales its verdicts must equal the
    // corpus-size-driven default form's, whose own oracle is the exact
    // all-pairs twin — chaining the two gates proves both geometries
    // lose no verdict-deciding pair here
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val a = Similarity.semanticDedupIncremental(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val b = Similarity.semanticDedupScaled(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(a === b, s"$dir: scaled geometry changed verdicts")
    }
  }

  test("band geometry doctrine: bits/band scales log2(n), clamped to [8,24]") {
    // pins the sizing function the whole embedding-dedup family now
    // serves through: small harness scales stay at the 8-bit floor, the
    // probe corpora climb — so the saturation regime measured in
    // BASELINE.md r9 (64x8 at 200k vectors) can no longer be configured
    // by default. The clamp was raised 16 -> 24 in r11 after the x1000 probe
    // showed 2M vectors saturating a 16-bit key space (1.56B candidate
    // pairs); bits now track the corpus for three more decades, and the
    // structural fix on clustered corpora is residual banding
    // (semanticResidualBandsOf — see BASELINE.md r11).
    // target population 1 since r11 (4 through r10, 16 before r10 —
    // every probe decade re-measured it DOWN: structured corpora hold
    // bucket populations far above the uniform mean, and bits are free
    // for re-crawl-grade recall)
    assert(Similarity.bandBitsFor(1L) === 8)
    assert(Similarity.bandBitsFor(500L) === 9) // sf0.001 / sf0.01
    assert(Similarity.bandBitsFor(2000L) === 11) // sf0.1
    assert(Similarity.bandBitsFor(20000L) === 15) // x10 probe corpus
    assert(Similarity.bandBitsFor(200000L) === 18) // x100 probe corpus
    assert(Similarity.bandBitsFor(2000000L) === 21) // x1000 probe corpus
    assert(Similarity.bandBitsFor(1L << 40) === 24) // cap
  }

  test("semantic band-index retraction: a tombstoned vector stops blocking its arriving re-crawl") {
    // lifecycle symmetry with the text-side retract spec: tombstoning
    // can only UNBLOCK (drops shrink monotonically), and the modeled
    // residue class (% 10 == 0 — half the re-crawl sources) must flip at
    // least one planted re-crawl from drop to keep at every harness
    // scale (guards against a retract path that filters nothing and
    // trivially matches its oracle)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      def verdicts(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val before = verdicts(Similarity.semanticDedupIncremental(spark, dir))
      val after = verdicts(Similarity.semanticDedupRetract(spark, dir))
      val beforeDrops = before.collect { case (id, "drop") => id }.toSet
      val afterDrops = after.collect { case (id, "drop") => id }.toSet
      assert(afterDrops.subsetOf(beforeDrops),
        s"$dir: retraction must only unblock, never create new drops")
      val flipped = beforeDrops -- afterDrops
      assert(flipped.exists(id =>
        id >= 1000000L && id < 2000000L && (id - 1000000L) % 10 == 0),
        s"$dir: no planted re-crawl of a tombstoned source was unblocked")
    }
  }

  test("bucket-population companion: append deltas stay additive through compaction; re-appends no-op") {
    // the persisted-population lane behind semanticDedupCapped's 64-cap:
    // populations must stay EXACT under the full append/compact
    // lifecycle, including the two specific hazards the design calls
    // out — (a) two different segments contributing IDENTICAL
    // (bucket, cnt) deltas must both count (compactAppends DISTINCTs
    // rows: the seg_id column is what keeps additive deltas distinct),
    // and (b) an at-least-once re-append of an already-applied delta
    // must not double-count (applied markers survive compaction)
    import graft.sources.IndexStore
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val name = s"popidx${java.util.UUID.randomUUID.toString.take(6)}"
    val keys = Seq("band_id", "h")
    // synthetic band index rows: bucket (0,1)x2, (0,2)x1, (1,1)x3
    val baseBands = Seq((0, 1L), (0, 1L), (0, 2L), (1, 1L), (1, 1L), (1, 1L))
      .toDF("band_id", "h")
    def pops(): Map[(Int, Long), Long] =
      IndexStore.bucketPopulations(spark, dir, "documents", name, keys)(
        baseBands)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    // the RAW form (r13 — what the capped serve consumes, restricted
    // and summed post-join) must agree with the summed form at every
    // lifecycle state: sum its legs client-side and compare
    def popsRaw(): Map[(Int, Long), Long] = {
      val (b, extras) = IndexStore.bucketPopulationsRaw(
        spark, dir, "documents", name, keys)(baseBands)
      (b +: extras).flatMap(_.collect())
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    def bothPops(): Map[(Int, Long), Long] = {
      val s = pops()
      assert(popsRaw() === s, "raw legs' sum must equal the summed form")
      s
    }
    assert(bothPops() === Map((0, 1L) -> 2L, (0, 2L) -> 1L, (1, 1L) -> 3L))
    // two appends with IDENTICAL delta content (hazard (a)) — through
    // the REAL two-lane protocol (index rows first, counts delta
    // second): since r13 bucketPopulations REJECTS count segments the
    // index lane never applied (phantom rows would make the cap bind
    // early), so a counts-lane-only append is no longer a legal fixture
    val delta = Seq((0, 1L), (1, 9L)).toDF("band_id", "h")
    IndexStore.appendSegment(spark, dir, "documents", name, "d1")(delta)
    IndexStore.appendCountsSegment(spark, dir, "documents", name, "d1", keys)(
      delta)
    IndexStore.appendSegment(spark, dir, "documents", name, "d2")(delta)
    IndexStore.appendCountsSegment(spark, dir, "documents", name, "d2", keys)(
      delta)
    val truth = Map(
      (0, 1L) -> 4L, (0, 2L) -> 1L, (1, 1L) -> 3L, (1, 9L) -> 2L)
    assert(bothPops() === truth, "append deltas must be additive")
    // compact the counts lane; populations unchanged, bound holds
    IndexStore.compactAppends(
      spark, dir, "documents", IndexStore.countsName(name), maxSegments = 1)
    assert(IndexStore.appendSegmentDirs(
      spark, dir, "documents", IndexStore.countsName(name)).size === 1,
      "compaction must fold the two delta segments into one")
    assert(bothPops() === truth,
      "identical deltas from different segments collapsed during " +
        "compaction — seg_id tagging broken")
    // hazard (b): re-append an applied delta after its rows were folded
    IndexStore.appendCountsSegment(spark, dir, "documents", name, "d1", keys)(
      delta)
    assert(bothPops() === truth, "re-applied delta double-counted")
  }

  test("cross-lane crash: index segment applied, counts delta lost — retry converges") {
    // the append-lane maintenance job appends the SAME segId to two
    // lanes (index rows, then the counts delta). Each lane has its own
    // applied marker, so a crash BETWEEN the two leaves them
    // inconsistent — the design claim is that an at-least-once retry of
    // the whole job converges: the index append no-ops on its marker,
    // the counts append applies. Simulate the crash by doing only the
    // index half, then run the full job twice (retry + a spurious
    // third at-least-once delivery).
    import graft.sources.IndexStore
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val name = s"xlane${java.util.UUID.randomUUID.toString.take(6)}"
    val keys = Seq("band_id", "h")
    val delta = Seq((0, 1L), (0, 1L), (1, 2L)).toDF("band_id", "h")
    val baseBands = Seq((0, 1L), (2, 5L)).toDF("band_id", "h")
    def pops(): Map[(Int, Long), Long] =
      IndexStore.bucketPopulations(spark, dir, "documents", name, keys)(
        baseBands)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    // crash half-way: index lane applied, counts lane never ran. Since
    // r13 the lag window no longer under-counts: bucketPopulations
    // detects the lagging applied marker and counts the segment straight
    // from its still-live index-lane dir — populations are already
    // correct BEFORE the retry (previously they reflected only the base
    // until the counts delta landed, an under-binding window).
    val truth = Map((0, 1L) -> 3L, (1, 2L) -> 1L, (2, 5L) -> 1L)
    IndexStore.appendSegment(spark, dir, "documents", name, "s1")(delta)
    assert(pops() === truth,
      "lagging index segment must be counted from its live dir")
    // at-least-once retry of the FULL job, twice
    (1 to 2).foreach { _ =>
      IndexStore.appendSegment(spark, dir, "documents", name, "s1")(delta)
      IndexStore.appendCountsSegment(
        spark, dir, "documents", name, "s1", keys)(delta)
    }
    assert(pops() === truth,
      "retry must apply the lost counts delta exactly once")
    // and the index lane holds exactly one copy of the segment's rows
    val laneRows = IndexStore.readAppends(spark, dir, "documents", name)
      .get.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    assert(laneRows === Seq((0, 1L), (0, 1L), (1, 2L)),
      "index lane must hold the segment's rows exactly once")
  }

  test("bloom side-file: no false negatives through append, crash " +
    "backfill, and compaction; compacted-away lag fails loudly") {
    // the value-skipping companion behind contaminationServe's
    // prefilter (r12 verdict item 2). The ONE property that must hold
    // is NO FALSE NEGATIVES — a bloom that misses an indexed key makes
    // the exact-membership serve WRONG (not merely low-recall), so the
    // whole lifecycle is gated on membership supersets.
    import graft.functions.BloomFamily
    import graft.sources.IndexStore
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val name = s"blmidx${java.util.UUID.randomUUID.toString.take(6)}"
    def bloom(): BloomFamily =
      IndexStore.bloomFamilyFor(spark, dir, "documents", name, "h", 2) {
        IndexStore.cachedBucketTable(spark, dir, "documents", name, 2,
          Seq("h"), Seq("h")) {
          (0L until 100L).toDF("h")
        }
      }
    def assertMembers(bf: BloomFamily, keys: Range.Inclusive,
        what: String): Unit =
      keys.foreach(k => assert(bf.mightContainLong(k.toLong),
        s"$what: indexed key $k missing from the bloom (false negative)"))
    assertMembers(bloom(), 0 to 99, "base build")
    // lockstep append: index segment + its bloom delta
    IndexStore.appendSegment(spark, dir, "documents", name, "a1") {
      (200L to 210L).toDF("h")
    }
    IndexStore.appendBloomSegment(spark, dir, "documents", name, "a1", "h") {
      (200L to 210L).toDF("h")
    }
    assertMembers(bloom(), 200 to 210, "lockstep append")
    // crash window: index applied, bloom delta lost — the read path
    // backfills from the still-live segment dir (and persists it)
    IndexStore.appendSegment(spark, dir, "documents", name, "a2") {
      (300L to 310L).toDF("h")
    }
    assertMembers(bloom(), 300 to 310, "crash backfill")
    // compaction folds the segment dirs; side-files are keyed by the
    // applied ids (which survive) so nothing is lost
    IndexStore.compactAppends(spark, dir, "documents", name, maxSegments = 1)
    val bf = bloom()
    assertMembers(bf, 0 to 99, "post-compaction")
    assertMembers(bf, 200 to 210, "post-compaction")
    assertMembers(bf, 300 to 310, "post-compaction")
    // a lagging segment whose dir was compacted away before any bloom
    // read can no longer be rebuilt PER SEGMENT (its rows live in an
    // unattributable compacted dir) — but blooms are DERIVED data, so
    // the read path self-heals with a FULL family rebuild over base ∪
    // live lane instead of failing or, worse, silently serving false
    // negatives. The compacted rows must be members afterwards.
    IndexStore.appendSegment(spark, dir, "documents", name, "a3") {
      (400L to 410L).toDF("h")
    }
    IndexStore.appendSegment(spark, dir, "documents", name, "a4") {
      (500L to 510L).toDF("h")
    }
    IndexStore.compactAppends(spark, dir, "documents", name, maxSegments = 1)
    val healed = bloom()
    assertMembers(healed, 400 to 410, "self-heal rebuild")
    assertMembers(healed, 500 to 510, "self-heal rebuild")
    assertMembers(healed, 0 to 99, "self-heal rebuild (base)")
    assertMembers(healed, 200 to 210, "self-heal rebuild (compacted a1)")
  }

  test("streaming SEMANTIC dedup: segment bound holds; verdicts converge to the batch twin") {
    val dir = "/root/testdata/sf0.001"
    val (res, stateDir) = Similarity.streamSemanticDedupRun(spark, dir)
    val rows = res.collect()
    val segs = new java.io.File(stateDir).listFiles()
      .filter(f => f.isDirectory &&
        (f.getName.startsWith("b") || f.getName.startsWith("c")))
    assert(segs.length <= 2,
      s"arrival state must stay <= 2 segments, got " +
        segs.map(_.getName).sorted.mkString(", "))
    assert(segs.exists(_.getName.startsWith("c")),
      "compaction must have run during the 3-trigger replay")
    val twin = Similarity.semanticDedupIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq === twin.toSeq)
    // the replay must exercise BOTH verdicts (planted re-crawls drop,
    // fresh content keeps)
    val vs = rows.map(_.getString(1)).toSet
    assert(vs === Set("drop", "keep"))
  }
}
