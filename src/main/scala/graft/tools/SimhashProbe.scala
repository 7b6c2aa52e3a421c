package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: simhash signature concentration, band-bucket candidate
  * mass, and the sig-level d<=3 pair/output counts on a documents
  * corpus — the measurements behind the BASELINE round-9 simhash case
  * study. Reuses the SHIPPED band/join helpers (Dedup.simhashBands /
  * simhashSigPairs) so the probe measures the production code, not a
  * re-implementation. Usage: runMain ... [sfDir] */
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
    // band buckets at the doc level (the pre-rewrite join's base)
    val bands = graft.operators.Dedup.simhashBands(sh)
      .select("band_id", "bv")
    val bk = bands.groupBy("band_id", "bv").count().cache()
    val buckets = bk.count()
    val candMass = bk.select(sum(col("count") * (col("count") - 1) / 2))
      .first().getDouble(0)
    val topBuckets = bk.orderBy(desc("count")).limit(10).collect()
      .map(r => s"${r.getInt(0)}:${r.getLong(2)}").mkString(",")
    println(s"[simhash-probe] dir=$sfDir n=$n distinct_sigs=$distinctSigs " +
      s"top_sig_counts=$topSigs eq_pairs=$eqPairs " +
      s"buckets=$buckets cand_mass=$candMass top_buckets=$topBuckets")

    // the SHIPPED sig-level banded join: distinct d<=3 sig pairs, timed
    val t0 = System.nanoTime()
    val sigPairs = graft.operators.Dedup.simhashSigPairs(sh).cache()
    val nSigPairs = sigPairs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // doc-pair expansion size = eq_pairs + sum over sig pairs of ca*cb
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
