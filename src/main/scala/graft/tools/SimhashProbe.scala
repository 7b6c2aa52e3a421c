package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (scratch): simhash signature concentration and banded-join
  * candidate mass on a documents corpus. Usage: runMain ... [sfDir] */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_star_x10"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sh = graft.operators.Dedup.simhash(spark, sfDir).cache()
    val n = sh.count()
    val sig = sh.groupBy("simhash").count().cache()
    val distinctSigs = sig.count()
    val topSigs = sig.orderBy(desc("count")).limit(10).collect()
      .map(r => r.getLong(1)).mkString(",")
    // exact-equal signature pairs (hamming 0): sum k*(k-1)/2
    val eqPairs = sig.select(sum(col("count") * (col("count") - 1) / 2))
      .first().getDouble(0)
    // band buckets
    val bands = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          shiftright(col("simhash"), 15 * b).bitwiseAND(lit(0x7FFFL))
            .as("bv"))): _*)).as("e"))
      .select(col("e.band_id"), col("e.bv"))
    val bk = bands.groupBy("band_id", "bv").count().cache()
    val buckets = bk.count()
    val candMass = bk.select(sum(col("count") * (col("count") - 1) / 2))
      .first().getDouble(0)
    val topBuckets = bk.orderBy(desc("count")).limit(10).collect()
      .map(r => s"${r.getInt(0)}:${r.getLong(2)}").mkString(",")
    println(s"[simhash-probe] dir=$sfDir n=$n distinct_sigs=$distinctSigs " +
      s"top_sig_counts=$topSigs eq_pairs=$eqPairs " +
      s"buckets=$buckets cand_mass=$candMass top_buckets=$topBuckets")

    // sig-level banded join with the hamming predicate inside the join:
    // how many distinct sig pairs are within d<=3, and how long does the
    // sig-level candidate pass take?
    val t0 = System.nanoTime()
    val sigsOnly = sig.select(col("simhash"))
    val sb = sigsOnly.select(col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          shiftright(col("simhash"), 15 * b).bitwiseAND(lit(0x7FFFL))
            .as("bv"))): _*)).as("e"))
      .select(col("simhash"), col("e.band_id"), col("e.bv"))
    val sigPairs = sb.as("a").join(sb.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.bv") === col("b.bv") &&
          col("a.simhash") < col("b.simhash") &&
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
      .select(col("a.simhash").as("s_a"), col("b.simhash").as("s_b"))
      .distinct()
    val nSigPairs = sigPairs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // doc-pair expansion size = eq_pairs + sum over sig pairs of cnt_a*cnt_b
    val docPairs = sigPairs.join(sig.withColumnRenamed("count", "ca"),
        col("s_a") === col("simhash")).drop("simhash")
      .join(sig.withColumnRenamed("count", "cb"),
        col("s_b") === col("simhash"))
      .select(sum(col("ca") * col("cb"))).first().getLong(0)
    println(f"[simhash-probe2] sig_pairs_d3=$nSigPairs sig_pass=$secs%.1fs " +
      s"cross_doc_pairs=$docPairs total_out=${docPairs + eqPairs.toLong}")
    spark.stop()
  }
}
