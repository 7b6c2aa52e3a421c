package graft.tools
import org.apache.spark.sql.SparkSession
/** Candidate-count probe for the semantic serve chain at probe scales:
  * counts the banded candidate pairs WITHOUT the vector-carrying verify
  * join, so band-geometry pathologies are measurable before they fill
  * the disk. Usage: runMain graft.tools.SemCandProbe <sfDir> */
object SemCandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.operators.Similarity.semanticDedupCandPlan(spark, dir)
      .count()
    println(f"[sem-cand] dir=$dir candidates=$n t=${(System.nanoTime()-t0)/1e9}%.1f s")
    // bucket-product breakdown: which (band, bucket) keys produce the
    // candidate mass, split by which side (base index vs shard) is hot
    import org.apache.spark.sql.functions._
    val (idx, shard) = graft.operators.Similarity.semanticServeBands(spark, dir)
    val ic = idx.groupBy("band_id", "h").count()
      .withColumnRenamed("count", "n_idx")
    val sc = shard.groupBy("band_id", "h").count()
      .withColumnRenamed("count", "n_shard")
    val prod = ic.join(sc, Seq("band_id", "h"), "full_outer")
      .na.fill(0L)
      .withColumn("cand_ub",
        (col("n_idx") + col("n_shard")) * col("n_shard"))
    prod.orderBy(desc("cand_ub")).limit(12).collect().foreach { r =>
      println(s"[sem-cand] bucket band=${r.get(0)} h=${r.get(1)} " +
        s"n_idx=${r.get(2)} n_shard=${r.get(3)} cand_ub=${r.get(4)}")
    }
    val tot = prod.agg(sum("cand_ub")).first().getLong(0)
    println(s"[sem-cand] total_cand_ub=$tot")
    val capped = prod.filter(col("n_idx") + col("n_shard") <= 64)
      .agg(sum("cand_ub")).first().getLong(0)
    println(s"[sem-cand] capped64_cand_ub=$capped")
    spark.stop()
  }
}
