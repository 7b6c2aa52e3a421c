package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Property coverage for the operators that have no DuckDB oracle
  * (engine-specific hashes / LSH layouts): the guarantees a user relies on
  * are asserted directly. Runs on sf0.001. */
class ExtensionOpsSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("dedup: every high-jaccard pair is recalled by MinHash-LSH") {
    val exact = Dedup.ngramJaccard(spark, dir)
      .filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val lsh = Dedup.minhashLshPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = exact.count(lsh.contains)
    assert(recalled.toDouble / exact.length >= 0.9,
      s"LSH recall too low: $recalled/${exact.length}")
  }

  test("dedup: identical texts produce identical minhash bands") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words entirely here now"))
      .toDF("doc_id", "text")
    val w = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
    val sh = w.select(col("doc_id"), explode(expr(
      "transform(sequence(1, greatest(size(w) - 2, 1)), " +
        "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))"
    )).as("s"))
    val bands = Dedup.withMinhashBands(sh).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(bands(1L) === bands(2L))
    assert(bands(1L) !== bands(3L))
  }

  test("dedup: simhash hamming distance separates near-dups from random pairs") {
    val near = Dedup.ngramJaccard(spark, dir).filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sh = Dedup.simhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val nearDist = near.map { case (a, b) => ham(sh(a), sh(b)) }
    assert(nearDist.forall(_ <= 12),
      s"near-dup simhash distances too large: ${nearDist.toSeq}")
    // random distinct docs should sit near 32 bits apart
    val far = ham(sh(0L), sh(250L))
    assert(far > 12, s"unrelated docs unexpectedly close: $far")
  }

  test("dedup exact: unique canonical ids cover the corpus") {
    val d = Dedup.dedupExact(spark, dir)
    val total = d.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total === Star.table(spark, dir, "documents").count())
  }

  test("similarity: LSH ANN finds mostly the same neighbors as brute force") {
    val bf = Similarity.annBruteforce(spark, dir)
      .filter(col("rnk") <= 3).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val lsh = Similarity.annLsh(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(lsh.nonEmpty, "LSH returned no candidates")
    val recalls = bf.keys.toSeq.map { q =>
      val hit = lsh.getOrElse(q, Set.empty)
      bf(q).count(hit.contains).toDouble / bf(q).size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.5, s"mean LSH recall@3 too low: $mean ($recalls)")
  }

  test("similarity: IVF ANN recalls most brute-force neighbors") {
    val bf = Similarity.annBruteforce(spark, dir)
      .filter(col("rnk") <= 3).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = Similarity.annIvf(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(ivf.nonEmpty, "IVF returned no candidates")
    val recalls = bf.keys.toSeq.map { q =>
      val hit = ivf.getOrElse(q, Set.empty)
      bf(q).count(hit.contains).toDouble / bf(q).size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.5, s"mean IVF recall@3 too low: $mean ($recalls)")
  }

  test("similarity: the int8-code shortlist does not degrade IVF recall") {
    // the quantized serve path searches the same probed cells as plain
    // IVF; its only extra approximation is the code-distance shortlist.
    // With shortlist size 10 >> k=3 and 8-bit codes, the re-ranked top-3
    // must recall at least as much of the IVF result as the quantization
    // error allows — gate at parity-with-IVF minus one neighbor total.
    val ivf = Similarity.annIvf(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val qnt = Similarity.annIvfQuant(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(qnt.nonEmpty, "quantized IVF returned no candidates")
    val missed = ivf.toSeq.map { case (q, want) =>
      (want -- qnt.getOrElse(q, Set.empty)).size
    }.sum
    assert(missed <= 1,
      s"int8 shortlist lost $missed IVF neighbors (allowed: 1)")
  }

  test("similarity: cosine self-similarity sanity via norms") {
    val norms = Similarity.embeddingNorms(spark, dir).collect()
    assert(norms.length === 500)
    norms.foreach { r =>
      assert(r.getLong(1) === 64L)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-3,
        s"embeddings expected ~unit-norm, got ${r.getDouble(2)}")
    }
  }

  test("relational: semi and anti joins partition the customer table") {
    val c = Star.table(spark, dir, "customer").count()
    val semi = Relational.semiJoin(spark, dir).count()
    val anti = Relational.antiJoin(spark, dir).count()
    assert(semi + anti === c)
  }

  test("relational: calendar is dense and gap-free") {
    val cal = Relational.calendar(spark, dir).collect()
    val dates = cal.map(_.getDate(0).toLocalDate)
    assert(dates.length === java.time.temporal.ChronoUnit.DAYS
      .between(dates.head, dates.last) + 1)
    assert(cal.map(_.getDate(0)).distinct.length === cal.length)
  }

  test("entry: flagship query returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("stats sketch: KMV estimate within 10% of exact; stddev consistent") {
    val sk = Analytics.statsSketch(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Star.table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, d) =>
      val est = sk(k).getAs[Double]("approx_parts")
      assert(math.abs(est - d) / d < 0.1,
        s"KMV estimate $est vs exact $d for $k")
      val sd = sk(k).getAs[Double]("price_stddev")
      val v = sk(k).getAs[Double]("price_var")
      assert(approx(sd * sd, v, 1e-9))
    }
  }

  test("builtin approx_count_distinct (HLL++) stays within 10% of exact") {
    val rows = Star.table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("est"),
        countDistinct("l_partkey").as("d"))
      .collect()
    rows.foreach { r =>
      val est = r.getAs[Long]("est"); val d = r.getAs[Long]("d")
      assert(math.abs(est - d).toDouble / d < 0.1, s"HLL++ $est vs $d")
    }
  }
}
