package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The recall-gate CHAIN for embedding near-dup (VERDICT r10 item 2):
  * the registered q_dedup_embedding is the exact gate FENCED to a
  * deterministic size-capped sample (constant cost at any corpus size);
  * the full-corpus exact form survives only here, where it certifies
  * the banded production path loses nothing at the production
  * threshold. Chain: sample-exact → banded-production.
  */
class SimilarityGateSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("sampledGateCorpus caps the sample and is deterministic") {
    import spark.implicits._
    // synthetic 5000-vector corpus: k = ceil(5000/2000) = 3
    val big = spark.range(5000).select(
      col("id").as("vec_id"),
      array(lit(1.0f), lit(2.0f)).as("embedding"))
    val s1 = Similarity.sampledGateCorpus(spark, big)
    val n = s1.count()
    assert(n <= 2000, s"gate sample must be size-capped, got $n")
    assert(n == 1667) // ceil-spaced: ids 0,3,...,4998
    val ids = s1.select("vec_id").as[Long].collect().sorted
    assert(ids.forall(_ % 3 == 0), "sample must be the deterministic modulus")
    val s2 = Similarity.sampledGateCorpus(spark, big)
      .select("vec_id").as[Long].collect().sorted
    assert(ids.sameElements(s2), "sample must be run-to-run identical")
  }

  test("gate sample is the identity at oracle scale (n <= cap)") {
    val full = Star.table(spark, dir, "embeddings")
    assert(Similarity.sampledGateCorpus(spark, full).count() == full.count(),
      "tri-scale corpora fit under the cap — the registered query's " +
        "output must be bit-identical to the unfenced form there")
  }

  test("chain: exact pairs on the sampled derived corpus ⊆ banded production") {
    // sample the DERIVED (planted-dup) corpus with the same gate modulus,
    // run the spec-only exact all-pairs form at the production threshold,
    // and require the banded production query to contain every pair —
    // banding must lose NOTHING the exact gate finds.
    val derived = Similarity.lshDerivedCorpus(spark, dir)
    val sampled = Similarity.sampledGateCorpus(spark,
      derived.withColumnRenamed("v", "embedding"))
    val exact = Similarity
      .exactCosinePairs(spark,
        sampled.withColumnRenamed("embedding", "v"), 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "the planted corpus must yield gate pairs")
    val banded = Similarity.embeddingNearDupLsh(spark, dir)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lost = exact -- banded
    assert(lost.isEmpty, s"banded path lost exact-gate pairs: $lost")
  }

  test("capped semantic serve: cap never binds at harness scales, " +
    "verdicts equal the uncapped chain") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val (index, shardBands) = Similarity.semanticServeBands(spark, d)
      val maxPop = index.select("band_id", "h")
        .unionByName(shardBands.select("band_id", "h"))
        .groupBy("band_id", "h").count()
        .agg(max("count")).first().getLong(0)
      assert(maxPop <= 64,
        s"$d: residual-bucket population $maxPop exceeds the cap — the " +
          "capped query would silently diverge from its shared oracle")
      val capped = Similarity.semanticDedupCapped(spark, d).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val plain = Similarity.semanticDedupIncremental(spark, d).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(capped === plain, s"$d: cap changed verdicts at harness scale")
    }
  }

  test("capped retract: verdicts equal the uncapped retract chain at " +
    "harness scales") {
    // the registered q_semantic_dedup_capped_retract shares the retract
    // oracle verbatim on the cap-never-binds argument (population gate
    // above); this pins the equivalence the shared oracle relies on
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val capped = Similarity.semanticDedupCappedRetract(spark, d)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val plain = Similarity.semanticDedupRetract(spark, d)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(capped === plain,
        s"$d: capped retract diverged from the retract chain")
    }
  }

  test("retract un-binds the cap: a bucket hot only through retracted " +
    "rows releases its candidates") {
    // the r12 verdict's watch item: the counts companion is append-only,
    // so a tombstone anti-join that removes index rows WITHOUT the
    // population lookup going net-of-tombstones leaves the 64-cap
    // binding on buckets that are no longer hot — recall-losing exactly
    // when the cap binds. Synthetic band relations where the cap
    // provably BINDS before the retraction and must release after:
    //   bucket (0,100): 60 index + 10 shard = 70 > 64  → hot, suppressed
    //   bucket (0,300): 5 index + 3 shard             → cold, survives
    //   tombstones: 10 of bucket-100's index vectors  → net 50+10 = 60
    import spark.implicits._
    def bands(rows: Seq[(Long, Int, Long)]) =
      rows.toDF("vec_id", "band_id", "h")
    val index = bands(
      (0L until 60L).map(i => (i, 0, 100L)) ++
        (200L until 205L).map(i => (i, 0, 300L)))
    val shard = bands(
      (1000L until 1010L).map(i => (i, 0, 100L)) ++
        (1100L until 1103L).map(i => (i, 0, 300L)))
    // the modeled PERSISTED populations (what the counts companion
    // holds): built from the pre-retraction index, never decremented
    val idxPop = index.groupBy("band_id", "h")
      .agg(count(lit(1)).as("cnt"))
    def pairs(idx: org.apache.spark.sql.DataFrame,
        pop: org.apache.spark.sql.DataFrame) = {
      val hot = Similarity.cappedHotPlanOf(shard, pop)
      Similarity.semanticCandPlan(idx,
        shard.join(hot, Seq("band_id", "h"), "left_anti"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val before = pairs(index, idxPop)
    assert(before.nonEmpty && before.forall { case (a, b) =>
      (200 <= a && a < 205 || a >= 1100) && b >= 1100 },
      s"cap must BIND pre-retraction (only cold-bucket pairs), " +
        s"got ${before.take(5)}")
    // retract 10 of bucket-100's vectors: live index loses their rows,
    // and their band rows are what netPopulationRows subtracts
    val tombBands = bands((0L until 10L).map(i => (i, 0, 100L)))
    val live = index.join(tombBands.select("vec_id"),
      Seq("vec_id"), "left_anti")
    // WITHOUT the net (stale companion): the bucket stays suppressed —
    // the defect the net fixes
    val stale = pairs(live, idxPop)
    assert(stale.forall { case (a, b) => b >= 1100 },
      "stale populations must keep the bucket suppressed " +
        "(the defect this feature closes)")
    // WITH the net: 50 + 10 = 60 <= 64 → the cap releases, and the
    // bucket's candidates (live index × shard, shard-internal) appear
    // tombstone band rows come from the index itself in the serve path;
    // the synthetic rows here ARE index rows of the retracted ids
    val after = pairs(live,
      Similarity.netPopulationRows(idxPop, tombBands, shard))
    val bucket100 = after.filter { case (a, b) =>
      (10 <= a && a < 60 || a >= 1000) && 1000 <= b && b < 1010 }
    assert(bucket100.nonEmpty,
      s"net populations must un-bind the bucket, got ${after.take(5)}")
    assert(after.exists { case (a, _) => 200 <= a && a < 205 },
      "cold-bucket pairs must survive throughout")
    // and no retracted vector may reappear as a candidate
    assert(after.forall { case (a, _) => a >= 10 },
      s"retracted vectors leaked back in: ${after.filter(_._1 < 10)}")
  }

  test("BINDING cap: probe-side-only capping equals the cap-both-sides semantics") {
    // r12 rewired semanticDedupCapped to anti-join ONLY the shard
    // (probe) side, on the argument that a bucket with no shard rows
    // cannot produce a candidate pair — so dropping index rows of hot
    // buckets changes nothing. The harness corpora never bind the cap
    // (test above), so THIS pins the argument where it binds, on
    // synthetic band relations covering every bucket class: index-only
    // hot (70 index rows, untouched by the shard), mixed hot
    // (40 index + 30 shard > 64), shard-only hot (70 shard rows), and
    // a cold mixed bucket (the pairs that must SURVIVE capping).
    import spark.implicits._
    def bands(rows: Seq[(Long, Int, Long)]) =
      rows.toDF("vec_id", "band_id", "h")
    val index = bands(
      (0L until 70L).map(i => (i, 0, 100L)) ++ // index-only hot
        (100L until 140L).map(i => (i, 0, 200L)) ++ // mixed hot (40)
        (200L until 210L).map(i => (i, 0, 300L))) // cold mixed (10)
    val shard = bands(
      (1000L until 1030L).map(i => (i, 0, 200L)) ++ // mixed hot (+30)
        (1100L until 1170L).map(i => (i, 0, 400L)) ++ // shard-only hot
        (1200L until 1205L).map(i => (i, 0, 300L))) // cold mixed (+5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the r11 semantics: hot over index ∪ shard, BOTH sides anti-joined
    val hotBoth = index.select("band_id", "h")
      .unionByName(shard.select("band_id", "h"))
      .groupBy("band_id", "h").count()
      .filter(col("count") > 64).select("band_id", "h")
    val old = pairs(Similarity.semanticCandPlan(
      index.join(hotBoth, Seq("band_id", "h"), "left_anti"),
      shard.join(hotBoth, Seq("band_id", "h"), "left_anti")))
    // the r12 semantics: hot over shard-touched buckets only, PROBE
    // side anti-joined, index untouched
    val shardCnt = shard.groupBy("band_id", "h")
      .agg(count(lit(1)).as("scnt"))
    val idxCnt = index.groupBy("band_id", "h")
      .agg(count(lit(1)).as("cnt"))
    val hotProbe = shardCnt.join(idxCnt, Seq("band_id", "h"), "left")
      .filter(coalesce(col("cnt"), lit(0L)) + col("scnt") > 64)
      .select("band_id", "h")
    val neu = pairs(Similarity.semanticCandPlan(
      index, shard.join(hotProbe, Seq("band_id", "h"), "left_anti")))
    assert(neu === old,
      s"probe-side capping diverged where the cap binds: " +
        s"missing=${(old -- neu).take(5)} extra=${(neu -- old).take(5)}")
    // and the cap actually BOUND: only the cold bucket's pairs survive
    // (10 index × 5 shard cross + shard-internal orderings of the 5)
    assert(neu.nonEmpty && neu.forall { case (a, b) =>
      (200 <= a && a < 210 || 1200 <= a) && b >= 1200 },
      s"expected only cold-bucket pairs, got ${neu.take(5)}")
  }

  test("full-corpus exact form equals the banded path on the derived corpus") {
    // total recall on the UNsampled derived corpus too (feasible at
    // sf0.001 only — this is precisely the form that must never be a
    // registered query): banded == exact at the production threshold.
    val derived = Similarity.lshDerivedCorpus(spark, dir)
    val exact = Similarity.exactCosinePairs(spark, derived, 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Similarity.embeddingNearDupLsh(spark, dir)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == banded,
      s"banded != exact: lost=${exact -- banded} extra=${banded -- exact}")
  }
}
