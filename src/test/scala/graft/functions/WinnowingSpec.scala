package graft.functions

import graft.SparkSuite
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class WinnowingSpec extends SparkSuite {
  import spark.implicits._

  private def sk(s: String, k: Int = 8, w: Int = 4): Seq[Long] =
    Winnowing.sketch(UTF8String.fromString(s), k, w).toLongArray().toSeq

  test("sketch is deterministic and identical for identical input") {
    val s = "the quick brown fox jumps over the lazy dog"
    assert(sk(s) === sk(s))
    assert(sk(s).nonEmpty)
  }

  test("sketch of short (< k) input is empty, never throws") {
    assert(sk("short", k = 8) === Seq.empty)
    assert(sk("") === Seq.empty)
  }

  test("near-identical texts share most sketch hashes; unrelated share few") {
    val a = "spark engines aggregate shuffled partitions while scanning columnar parquet files at scale"
    val b = "spark engines aggregate shuffled partitions while scanning columnar parquet files at pace"
    val c = "entirely unrelated words about gardening tulips daffodils watering cans and sunny spring mornings"
    def overlap(x: Seq[Long], y: Seq[Long]) =
      x.toSet.intersect(y.toSet).size.toDouble / math.min(x.size, y.size)
    assert(overlap(sk(a), sk(b)) > 0.7)
    assert(overlap(sk(a), sk(c)) < 0.2)
  }

  test("expression works in DataFrame and SQL form, codegen path included") {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz abcdefghijklmnop"),
      (2L, "abcdefghijklmnopqrstuvwxyz abcdefghijklmnop"),
      (3L, "zyxwvutsrqponmlkjihgfedcba ponmlkjihgfedcba")).toDF("id", "text")
    val viaCol = df.select($"id",
      WinnowFunctions.winnowFingerprint($"text").as("sk")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaCol(1L) === viaCol(2L))
    assert(viaCol(1L) !== viaCol(3L))
    WinnowFunctions.register(spark)
    df.createOrReplaceTempView("winnow_in")
    val viaSql = spark.sql(
      "SELECT id, winnow_fingerprint(text, 8, 4) AS sk FROM winnow_in")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql === viaCol)
  }

  test("SQL registration rejects non-constant k/w with a clear error") {
    WinnowFunctions.register(spark)
    Seq((1L, "some reasonably long sketchable text here")).toDF("id", "text")
      .createOrReplaceTempView("winnow_badargs")
    val e = intercept[Exception] {
      spark.sql("SELECT winnow_fingerprint(text, id, 4) FROM winnow_badargs")
        .collect()
    }
    assert(e.getMessage.contains("constant integer"), e.getMessage)
  }

  test("short documents (< 3 tokens) sketch without crashing under ANSI") {
    val tmp = java.nio.file.Files.createTempDirectory("docs_short").toString
    Seq((1L, "single"), (2L, "two words"), (3L, "three token text"),
      (4L, "three token text"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // ngramJaccard's shingle expression must not throw INVALID_ARRAY_INDEX
    val pairs = graft.operators.Dedup.ngramJaccard(spark, tmp).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((3L, 4L)))
    val sigs = graft.operators.Dedup.minhashSignatures(spark, tmp).collect()
    assert(sigs.length === 4)
  }

  test("null input yields null, not a crash") {
    val df = Seq(Some("a reasonably long string for sketching"), None)
      .toDF("text")
    val out = df.select(WinnowFunctions.winnowFingerprint($"text"))
      .collect()
    assert(out(0).get(0) != null)
    assert(out(1).isNullAt(0))
  }

  test("winnow near-dup pairs recall the high-jaccard fixture pairs") {
    val dir = "/root/testdata/sf0.001"
    val exact = Dedup.ngramJaccard(spark, dir).filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val winnow = Dedup.winnowPairs(spark, dir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val recalled = exact.count(winnow.contains)
    assert(recalled.toDouble / exact.length >= 0.9,
      s"winnow recall too low: $recalled/${exact.length}")
  }
}
