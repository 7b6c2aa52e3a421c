package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins graft_bloom_might_contain (the serve-path bloom prefilter that
  * carries its bit array BY REFERENCE instead of inside a Literal) and
  * the bloomFor merge memo it relies on for reference equality. */
class BloomOpsSpec extends SparkSuite {

  private def bloomBytesOf(keys: Seq[Long]): Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(
      keys.size.toLong, 1L << 16)
    keys.foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("no false negatives; non-members overwhelmingly rejected; " +
    "null in -> null out") {
    import spark.implicits._
    val members = (0L until 500L).map(_ * 7L)
    val bytes = bloomBytesOf(members)
    val probe = (members ++ (100000L until 101000L)).toDF("h")
      .withColumn("hit", BloomOps.mightContainLong(col("h"), bytes))
    val got = probe.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    members.foreach(k => assert(got(k),
      s"member $k rejected — a false negative makes the exact serve WRONG"))
    val fp = (100000L until 101000L).count(got(_))
    assert(fp < 100, s"$fp/1000 false positives at 2^16 bits / 500 items")
    val withNull = Seq(Some(0L), None).toDF("h")
      .select(BloomOps.mightContainLong(col("h"), bytes).as("hit"))
      .collect()
    assert(withNull.exists(_.isNullAt(0)), "null key must yield null")
  }

  test("codegen and interpreted evaluation agree") {
    import org.apache.spark.sql.graftbridge.Bridge
    val bytes = bloomBytesOf(Seq(1L, 2L, 3L))
    val ref = BloomRef(bytes)
    val expr = BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(2L), ref)
    assert(expr.eval(null) === true)
    val miss = BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(999999L), ref)
    // 3 items in 2^16 bits: a false positive here is ~impossible
    assert(miss.eval(null) === false)
    // and through a real (codegen) plan
    import spark.implicits._
    val viaPlan = Seq(2L, 999999L).toDF("h")
      .select(Bridge.column(BloomMightContain(
        Bridge.expression(col("h")), ref)).as("hit"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(viaPlan === Seq(true, false))
  }

  test("blooms build at the family's spec geometry past Spark's " +
    "runtime-filter clamps; an empty delta still merges") {
    // BloomFilterAggregate takes min(given, conf) with conf defaults of
    // 4M items / 2^26 bits. Past 4M index keys the clamped aggregate
    // bloom and the UNclamped empty-delta fallback would disagree on
    // numHashFunctions and the OR-merge would throw
    // IncompatibleMergeException — writeBloomFile pins the confs to the
    // spec values for the build. numHashFunctions is bytes 4-8 of the
    // sketch serialization; for 5M items the spec k is 7, the clamped
    // build's k was 8.
    import graft.sources.IndexStore
    val dir = "/root/testdata/sf0.001"
    val name = s"blmgeo${java.util.UUID.randomUUID.toString.take(6)}"
    def merged(): Array[Byte] =
      IndexStore.bloomFor(spark, dir, "documents", name, "h") {
        IndexStore.cachedBucketTable(spark, dir, "documents", name, 2,
          Seq("h"), Seq("h")) {
          spark.range(5000000L).toDF("h")
        }
      }
    def kOf(bytes: Array[Byte]): Int =
      java.nio.ByteBuffer.wrap(bytes, 4, 4).getInt
    val items = 5000000L
    val bits = (items * 9.585).toLong
    val specK = math.max(1, math.round(bits.toDouble / items * math.log(2)))
    assert(specK === 7L)
    assert(kOf(merged()) === 7,
      "base bloom must carry the spec geometry's hash count (a clamped " +
        "build yields 8)")
    // the crash case: an EMPTY delta's fallback bloom uses the unclamped
    // spec values — with the build also unclamped, the merge succeeds
    import spark.implicits._
    IndexStore.appendSegment(spark, dir, "documents", name, "e1") {
      Seq(9999999L).toDF("h")
    }
    IndexStore.appendBloomSegment(spark, dir, "documents", name, "e1", "h") {
      Seq.empty[Long].toDF("h")
    }
    assert(kOf(merged()) === 7, "post-empty-delta merge must succeed " +
      "and keep the family geometry")
  }

  test("bloomFor memoizes the merged bytes per snapshot and invalidates " +
    "on a new segment bloom") {
    import graft.sources.IndexStore
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val name = s"blmmemo${java.util.UUID.randomUUID.toString.take(6)}"
    def merged(): Array[Byte] =
      IndexStore.bloomFor(spark, dir, "documents", name, "h") {
        IndexStore.cachedBucketTable(spark, dir, "documents", name, 2,
          Seq("h"), Seq("h")) {
          (0L until 50L).toDF("h")
        }
      }
    val a = merged()
    val b = merged()
    assert(a eq b,
      "second bloomFor call must return the memoized array instance — " +
        "reference equality is what keeps BloomRef comparisons O(1)")
    // a lockstep segment bloom changes the side-file listing -> fresh merge
    IndexStore.appendSegment(spark, dir, "documents", name, "m1") {
      (700L to 710L).toDF("h")
    }
    IndexStore.appendBloomSegment(spark, dir, "documents", name, "m1", "h") {
      (700L to 710L).toDF("h")
    }
    val c = merged()
    assert(!(c eq a), "a new segment bloom must invalidate the memo")
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(c))
    (700L to 710L).foreach(k => assert(bf.mightContainLong(k),
      s"post-append merge missing appended key $k"))
  }
}
