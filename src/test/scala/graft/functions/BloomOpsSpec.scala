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

  test("sharded family: codegen, interpreted, and build routing agree; " +
    "no false negatives; null in -> null out") {
    import org.apache.spark.sql.graftbridge.Bridge
    import spark.implicits._
    // build shard blooms BY HAND with BloomFamily.shardOf — the probe
    // (interpreted AND codegen, which inlines the murmur-pmod formula)
    // must route every key to the same shard or members go missing
    val shards = 5
    val members = (0L until 2000L).map(_ * 13L)
    val perShard = Array.fill(shards)(
      org.apache.spark.util.sketch.BloomFilter.create(500L, 1L << 14))
    members.foreach(k =>
      perShard(BloomFamily.shardOf(k, shards)).putLong(k))
    val fam = BloomFamily(shards, perShard.map { bf =>
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    })
    // interpreted
    members.foreach(k => assert(fam.mightContainLong(k),
      s"member $k rejected — a routing mismatch IS a false negative"))
    // through a real (codegen) plan
    val probe = (members ++ (1000000L until 1002000L)).toDF("h")
      .withColumn("hit", BloomOps.familyMightContainLong(col("h"), fam))
    val got = probe.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    members.foreach(k => assert(got(k),
      s"member $k rejected through the codegen plan"))
    val fp = (1000000L until 1002000L).count(got(_))
    assert(fp < 200, s"$fp/2000 false positives at 2^14-bit shards")
    val withNull = Seq(Some(0L), None).toDF("h")
      .select(BloomOps.familyMightContainLong(col("h"), fam).as("hit"))
      .collect()
    assert(withNull.exists(_.isNullAt(0)), "null key must yield null")
  }

  test("bloomFamilyFor sizes per-shard geometry from the spec and " +
    "builds without touching the runtime-filter clamp confs") {
    // the old BloomFilterAggregate build silently clamped (items, bits)
    // to the runtime-row-filter confs and had to pin them per build —
    // a conf window concurrent queries could observe (r13 advice). The
    // sharded build goes through an RDD aggregate: geometry comes from
    // _SPEC alone and the session confs stay untouched throughout.
    import graft.sources.IndexStore
    val dir = "/root/testdata/sf0.001"
    val name = s"blmgeo${java.util.UUID.randomUUID.toString.take(6)}"
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val before = spark.conf.getOption(itemsKey)
    val fam =
      IndexStore.bloomFamilyFor(spark, dir, "documents", name, "h", 4) {
        IndexStore.cachedBucketTable(spark, dir, "documents", name, 4,
          Seq("h"), Seq("h")) {
          spark.range(100000L).toDF("h")
        }
      }
    assert(spark.conf.getOption(itemsKey) === before,
      "family build must not mutate the session's bloom clamp confs")
    assert(fam.shards === 4)
    // per-shard geometry: 100k items / 4 shards = 25k per shard at
    // ~9.585 bits/item; numHashFunctions (bytes 4-8 of the sketch
    // serialization) must be the ~1 % fpp k = 7 in EVERY shard —
    // including any empty one — or merges throw
    def kOf(bytes: Array[Byte]): Int =
      java.nio.ByteBuffer.wrap(bytes, 4, 4).getInt
    (0 until fam.shards).map(fam.bytes.get).foreach(b => assert(
      kOf(b) === 7,
      "every shard must carry the spec geometry's hash count"))
    // an EMPTY delta still merges (empty shards get spec-geometry blooms)
    import spark.implicits._
    IndexStore.appendSegment(spark, dir, "documents", name, "e1") {
      Seq(9999999L).toDF("h")
    }
    IndexStore.appendBloomSegment(spark, dir, "documents", name, "e1", "h") {
      Seq.empty[Long].toDF("h")
    }
    val fam2 =
      IndexStore.bloomFamilyFor(spark, dir, "documents", name, "h", 4) {
        spark.range(100000L).toDF("h")
      }
    (0 until fam2.shards).map(fam2.bytes.get).foreach(b => assert(
      kOf(b) === 7,
      "post-empty-delta merge must keep the family geometry"))
  }

  test("shardOf routes every key into [0, n) and matches the pmod " +
    "reference at every shard count") {
    // build and probe must agree bit-for-bit, and the codegen path
    // inlines this formula — pin it against an independent reference
    val rnd = new scala.util.Random(3)
    val keys = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue) ++
      Seq.fill(2000)(rnd.nextLong())
    Seq(1, 2, 8, 20, 200, 256).foreach { n =>
      keys.foreach { k =>
        val s = BloomFamily.shardOf(k, n)
        assert(s >= 0 && s < n, s"shardOf($k, $n) = $s out of range")
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(k, 42)
        val ref = ((h % n) + n) % n
        assert(s === ref, s"shardOf($k, $n) diverges from pmod reference")
      }
      // balance sanity at n >= 8: no shard may be empty or hold more
      // than 4x its fair share over 2000 uniform keys
      if (n >= 8 && n <= 20) {
        val counts = keys.groupBy(BloomFamily.shardOf(_, n))
          .map(_._2.size)
        assert(counts.size === n, s"empty shards at n=$n")
        assert(counts.max <= 4 * keys.size / n,
          s"shard skew at n=$n: max=${counts.max}")
      }
    }
  }

  test("bloomFamilyFor memoizes the merged family per snapshot and " +
    "invalidates on a new segment side") {
    import graft.sources.IndexStore
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val name = s"blmmemo${java.util.UUID.randomUUID.toString.take(6)}"
    def merged(): BloomFamily =
      IndexStore.bloomFamilyFor(spark, dir, "documents", name, "h", 2) {
        IndexStore.cachedBucketTable(spark, dir, "documents", name, 2,
          Seq("h"), Seq("h")) {
          (0L until 50L).toDF("h")
        }
      }
    val a = merged()
    val b = merged()
    assert(a eq b,
      "second bloomFamilyFor call must return the memoized family " +
        "instance — reference equality is what keeps BloomFamily " +
        "comparisons O(1)")
    // a lockstep segment side changes the shard-file listing -> fresh merge
    IndexStore.appendSegment(spark, dir, "documents", name, "m1") {
      (700L to 710L).toDF("h")
    }
    IndexStore.appendBloomSegment(spark, dir, "documents", name, "m1", "h") {
      (700L to 710L).toDF("h")
    }
    val c = merged()
    assert(!(c eq a), "a new segment side must invalidate the memo")
    (700L to 710L).foreach(k => assert(c.mightContainLong(k),
      s"post-append merge missing appended key $k"))
    (0L until 50L).foreach(k => assert(c.mightContainLong(k),
      s"post-append merge lost base key $k"))
  }
}
