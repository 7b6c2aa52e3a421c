package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Degenerate-input hardening: empty and single-row corpora must flow
  * through the pipelines without exceptions (empty results, not crashes) —
  * the shapes a partition of a 100 TB corpus routinely produces. */
class EdgeCaseSpec extends SparkSuite {
  import spark.implicits._

  /** A star-dir containing documents/embeddings built from given rows. */
  private def corpusDir(
      docs: Seq[(Long, String, String, String, Long)],
      vecs: Seq[(Long, Array[Float], Int)]): String = {
    val d = Files.createTempDirectory("edge").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("connectedComponents: empty edge set yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0L)
  }

  test("empty corpus: dedup/curation/text queries return empty, not errors") {
    val d = corpusDir(Seq.empty, Seq.empty)
    assert(Dedup.dedupExact(spark, d).count() === 0L)
    assert(Dedup.ngramJaccard(spark, d).count() === 0L)
    assert(Dedup.dedupClusters(spark, d).count() === 0L)
    assert(Dedup.dedupKeep(spark, d).count() === 0L)
    assert(Curation.vocabTopk(spark, d).count() === 0L)
    assert(Curation.repetitionSignals(spark, d).count() === 0L)
    assert(Curation.sampleStratified(spark, d).count() === 0L)
    assert(Similarity.knnClassify(spark, d).count() === 0L)
  }

  test("single-doc corpus: no pairs, one cluster-free keeper, sane signals") {
    val d = corpusDir(
      Seq((7L, "alpha beta alpha", "en", "src", 16L)), Seq.empty)
    assert(Dedup.ngramJaccard(spark, d).count() === 0L)
    val kept = Dedup.dedupKeep(spark, d).collect()
    assert(kept.length === 1 && kept(0).getLong(0) === 7L)
    val sig = Curation.repetitionSignals(spark, d).collect()(0)
    assert(sig.getLong(1) === 3L) // n_words
    val vocab = Curation.vocabTopk(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map("alpha" -> 2L, "beta" -> 1L))
  }

  test("whitespace-only and empty-string docs survive the token pipelines") {
    val d = corpusDir(Seq(
      (1L, "", "en", "s", 0L),
      (2L, "   ", "en", "s", 3L),
      (3L, "ok", "en", "s", 2L)), Seq.empty)
    // must not throw; every doc produces a row (empty text tokenizes to
    // one empty-string token under split-on-\s+ of a trimmed string)
    assert(TextAnalysis.textTokens(spark, d).count() === 3L)
    assert(Curation.repetitionSignals(spark, d).count() === 3L)
    assert(Dedup.simhash(spark, d).count() === 3L)
  }
}
