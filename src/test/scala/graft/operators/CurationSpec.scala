package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("connectedComponents: transitive closure with min-id labels") {
    // components: {1,2,3,9} (chain 1-2, 2-3, 3-9), {5,7}, isolated pair {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 7L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 7L -> 5L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: converges on a long chain (diameter > 2)") {
    val n = 12
    val edges = (0 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges).collect()
    assert(got.length === n + 1)
    assert(got.forall(_.getLong(1) === 0L))
  }

  test("dedupClusters: every near-dup pair lands in one cluster") {
    val pairs = Dedup.ngramJaccard(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    // labels are genuine member ids and each cluster's label is its min
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min === label)
    }
  }

  test("dedupKeep: exactly the canonical member of each capped cluster survives") {
    // dedupKeep ships the DF-capped production chain, so the expected
    // drop set comes from dedupClustersCapped, not the oracle-gate chain
    val clusters = Dedup.dedupClustersCapped(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val keptIds = Dedup.dedupKeep(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val total = Star.table(spark, sf, "documents").count()
    val nonCanonical = clusters.count { case (id, c) => id != c }
    assert(keptIds.size.toLong === total - nonCanonical)
    clusters.foreach { case (id, c) =>
      assert(keptIds.contains(id) === (id == c))
    }
  }

  test("corrMatrix: exact-moment correlation tracks Spark's corr builtin") {
    val got = Analytics.corrMatrix(spark, sf).collect()
    assert(got.nonEmpty)
    val builtin = Star.table(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c1"),
        corr(col("l_discount"), col("l_extendedprice")).as("c2"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    got.foreach { r =>
      val (c1, c2) = builtin(r.getString(0))
      assert(math.abs(r.getDouble(2) - c1) < 1e-6)
      assert(math.abs(r.getDouble(3) - c2) < 1e-6)
      assert(math.abs(r.getDouble(2)) <= 1.0 && math.abs(r.getDouble(3)) <= 1.0)
    }
  }

  test("simhashPairs: banded join finds every exact-duplicate pair (d=0)") {
    // the synthetic corpus carries no exact dups — build one with planted
    // duplicate groups plus unrelated docs
    val d = java.nio.file.Files.createTempDirectory("simdup").toString
    val base = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (1L, base, "en", "s", 0L), (2L, base, "en", "s", 0L),
      (3L, base, "en", "s", 0L),
      (4L, "completely different content about sorting algorithms", "en", "s", 0L),
      (5L, "yet another unrelated corpus entry with many words", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val pairs = Dedup.simhashPairs(spark, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (a <- Seq(1L, 2L, 3L); b <- Seq(1L, 2L, 3L) if a < b)
      assert(pairs.get((a, b)).contains(0L),
        s"exact-dup pair ($a,$b) missing or nonzero distance")
    assert(pairs.values.forall(_ <= 3L), "emitted pair above the d<=3 gate")
  }

  test("simhashPairsCapped: subset of the complete gate, hamming-0 complete") {
    // sf0.1 is where the cap actually prunes (1090 of 2140 pairs kept);
    // the capped output must be a strict subset of the uncapped one with
    // every hamming-0 (signature-equality) pair retained — those come from
    // the band-free self-join and are immune to the bucket cap.
    val big = "/root/testdata/sf0.1"
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val full = Dedup.simhashPairs(spark, big).collect().map(key).toSet
    val capped = Dedup.simhashPairsCapped(spark, big).collect().map(key).toSet
    assert(capped.subsetOf(full), "capped emitted a pair the gate lacks")
    assert(capped.size < full.size, "cap never pruned — corpus too small " +
      "to exercise it, move the spec to a scale where it does")
    val zeros = full.filter(_._3 == 0L)
    assert(zeros.nonEmpty && zeros.subsetOf(capped),
      "capped lost a hamming-0 pair")
  }

  test("bucketedRevenue: the bucketed join itself never shuffles") {
    graft.sources.Layout.bucketedRevenue(spark, sf).collect() // create tables
    val tag = java.lang.Integer.toHexString(sf.hashCode)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table(s"graft_b_lineitem_$tag")
        .join(spark.table(s"graft_b_orders_$tag"),
          col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "bucketed join inputs must not shuffle\n" + p)
      assert(j.count() === Star.table(spark, sf, "lineitem").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("vocabTopk: deterministic top-100 with count-then-word tiebreak") {
    val got = Curation.vocabTopk(spark, sf).collect()
    val vocabSize = Star.table(spark, sf, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .select("w").distinct().count()
    assert(got.length === math.min(100L, vocabSize))
    val counts = got.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)), "not sorted by count desc")
    // within equal counts, words ascend
    got.sliding(2).foreach { case Array(a, b) =>
      if (a.getLong(1) == b.getLong(1))
        assert(a.getString(0) < b.getString(0))
    }
  }

  test("piiScrub: injected emails/urls are counted and redacted") {
    val got = Curation.piiScrub(spark, sf)
    val row = got.filter(col("doc_id") === 3L).collect()(0)
    assert(row.getLong(1) === 1L) // one injected email
    assert(row.getLong(2) === 1L) // one injected url
    // fingerprint of the clean text no longer depends on doc-specific PII:
    // two docs with identical body must scrub to identical fp
    val texts = Star.table(spark, sf, "documents")
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) >= 2).select("ids").collect()
    texts.headOption.foreach { r =>
      val ids = r.getSeq[Long](0)
      val fps = got.filter(col("doc_id").isin(ids: _*))
        .select("clean_fp").distinct().count()
      assert(fps === 1L, "identical bodies scrubbed to different fingerprints")
    }
  }

  test("repetitionSignals: hand-computed fractions on a degenerate doc") {
    // build expectations directly from one real doc
    val doc = Star.table(spark, sf, "documents")
      .filter(col("doc_id") === 0L).select("text").collect()(0).getString(0)
    val w = doc.trim.split("\\s+")
    val bigrams = w.sliding(2).map(_.mkString(" ")).toSeq
    val top = bigrams.groupBy(identity).values.map(_.size).max
    val row = Curation.repetitionSignals(spark, sf)
      .filter(col("doc_id") === 0L).collect()(0)
    assert(row.getLong(1) === w.length.toLong)
    assert(row.getLong(3) === bigrams.length.toLong)
    assert(row.getLong(4) === top.toLong)
    val expectedDup =
      ((w.length - w.distinct.length).toLong * 1000000L / w.length) / 1e6
    assert(row.getDouble(2) === expectedDup)
  }

  test("sampleStratified: deterministic, rate-bounded, en downsampled") {
    val d1 = Curation.sampleStratified(spark, sf).collect()
    val d2 = Curation.sampleStratified(spark, sf).collect()
    assert(d1.map(_.getLong(0)).sameElements(d2.map(_.getLong(0))))
    val total = Star.table(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = d1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // en sampled at ~10%, others ~20% — allow wide tolerance, assert order
    val enRate = sampled.getOrElse("en", 0).toDouble / total("en")
    assert(enRate > 0.02 && enRate < 0.25, s"en rate $enRate")
  }

  test("minmaxScale: values in [0,1], min->0 and max->1 per group") {
    val got = Curation.minmaxScale(spark, sf)
    val stats = got.groupBy("l_partkey")
      .agg(min("price_scaled").as("mn"), max("price_scaled").as("mx"),
        count(lit(1)).as("n"))
      .collect()
    stats.foreach { r =>
      assert(r.getDouble(1) === 0.0)
      val mx = r.getDouble(2)
      assert(mx <= 1.0)
      if (r.getLong(3) > 1 && mx > 0.0)
        assert(mx > 0.99, s"group max $mx not ~1") // ratio6 floors at 1e-6
    }
  }
}
