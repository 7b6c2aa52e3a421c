package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: embedding-LSH band bucket concentration and candidate mass
  * for the semantic serve path. Usage: runMain ... [sfDir] */
object EmbBandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_star_x10"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // band-bucket histogram of the base corpus at the default serve
    // geometry (64 planes x 8 bands) — candidate mass without running
    // (or index-building for) the join itself
    val base = graft.operators.Star.table(spark, sfDir, "embeddings")
    println(s"[emb-probe] dir=$sfDir n_vecs=${base.count()}")
    val e = base.selectExpr("vec_id",
      "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    for ((nPlanes, nBands, label) <- Seq((64, 8, "default_64x8"),
        (256, 16, "scaled_256x16"))) {
      val bands = e.select(col("vec_id"), posexplode(
          graft.functions.LshFunctions.lshBands(col("v"), nPlanes, nBands)))
        .select(col("pos").as("band_id"), col("col").as("h"))
      val bk = bands.groupBy("band_id", "h").count().cache()
      val nBuckets = bk.count()
      val mass = bk.select(sum(col("count") * (col("count") - 1) / 2))
        .first().getDouble(0)
      val top = bk.orderBy(desc("count")).limit(10).collect()
        .map(r => s"${r.getInt(0)}:${r.getLong(2)}").mkString(",")
      println(s"[emb-probe] $label buckets=$nBuckets cand_mass=$mass " +
        s"top=$top")
      bk.unpersist()
    }
    spark.stop()
  }
}
