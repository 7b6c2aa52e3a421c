package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // extra geometries via args: "planesxbands" pairs after the dir
    val extra = args.drop(1).toSeq.map { g =>
      val Array(p, b) = g.split("x").map(_.toInt)
      (p, b, s"arg_${p}x$b")
    }
    // centering variants: raw signs, global-mean-centered signs, and
    // kmeans-cell RESIDUAL signs (bucket key = cell ++ band bucket) —
    // the clustered-corpus probe behind the residual-banding doctrine
    val gm = e.select(posexplode(col("v")))
      .groupBy("pos").agg(avg("col").as("m")).orderBy("pos")
      .collect().map(_.getDouble(1))
    val gmLit = array(gm.map(lit): _*)
    val withGm = e.withColumn("gm", gmLit)
      .select(col("vec_id"),
        expr("zip_with(v, gm, (a, b) -> a - b)").as("v"))
    // kmeans-residual variant: quantized integer Lloyd (the exactKmeans
    // recipe: codegen vector_dist_sq argmin against literal centroids,
    // VecSum integer update) trained on a 5% sample, assignment over the
    // full corpus; then hash v - centroid(cell) with the cell id in the
    // bucket key. Bucket hotness is what residual banding is supposed to
    // kill on clustered corpora (raw signs of a cluster's vectors all
    // mirror the centroid).
    val kCells = 16
    val off = 100000L
    val q = e.select(col("vec_id"),
      expr("transform(v, x -> CAST(floor(x * 1000) AS BIGINT))").as("varr"))
    val sample = q.filter(col("vec_id") % 20 === 0)
    def bestCid(c: Seq[Seq[Long]]): Column =
      array_min(org.apache.spark.sql.functions.transform(
        array(c.zipWithIndex.map { case (carr, cid) =>
          struct(lit(cid).as("cid"),
            array(carr.map(lit): _*).as("carr")) }: _*),
        cc => struct(
          graft.functions.VectorFunctions
            .vectorDistSq(col("varr"), cc.getField("carr")).as("d"),
          cc.getField("cid").as("cid")))).getField("cid")
    var cents: Seq[Seq[Long]] = sample.filter(col("vec_id") < kCells * 20)
      .orderBy("vec_id").limit(kCells)
      .collect().map(_.getSeq[Long](1).toSeq).toSeq
    for (_ <- 1 to 2) {
      cents = sample
        .select(col("varr"), bestCid(cents).as("cid"))
        .groupBy("cid")
        .agg(graft.functions.ExactAggregators.vecSum(col("varr")).as("sarr"),
          count(lit(1)).as("n"))
        .select(col("cid"),
          expr(s"transform(sarr, s -> CAST(floor(CAST(s + n * $off AS DOUBLE)" +
            s" / CAST(n AS DOUBLE)) AS BIGINT) - $off)").as("carr"))
        .collect().sortBy(_.getInt(0)).map(_.getSeq[Long](1).toSeq).toSeq
    }
    val centArrLit = array(cents.map(a => array(a.map(lit): _*)): _*)
    val residual: DataFrame = q
      .select(col("vec_id"), bestCid(cents).as("cell"), col("varr"))
      .withColumn("cents", centArrLit)
      .select(col("vec_id"), col("cell"),
        expr("zip_with(varr, cents[cell], " +
          "(a, b) -> CAST(a - b AS DOUBLE))").as("v"))
    locally {
      val bands = residual.select(col("cell"), posexplode(
          graft.functions.LshFunctions.lshBands(col("v"), 304, 16)))
        .select(col("cell"), col("pos").as("band_id"), col("col").as("h"))
      val bk = bands.groupBy("cell", "band_id", "h").count().cache()
      val nBuckets = bk.count()
      val mass = bk.select(sum(col("count") * (col("count") - 1) / 2))
        .first().getDouble(0)
      val top = bk.orderBy(desc("count")).limit(10).collect()
        .map(r => s"${r.getInt(1)}:${r.getLong(3)}").mkString(",")
      println(s"[emb-probe] residual_304x16_k$kCells buckets=$nBuckets " +
        s"cand_mass=$mass top=$top")
      bk.unpersist()
    }
    for ((nPlanes, nBands, label, rel) <- Seq(
        (256, 16, "scaled_256x16_raw", e),
        (304, 16, "arg_304x16_raw", e),
        (304, 16, "arg_304x16_centered", withGm)) ++
        extra.map { case (p, b, l) => (p, b, l, e) }) {
      val bands = rel.select(col("vec_id"), posexplode(
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
