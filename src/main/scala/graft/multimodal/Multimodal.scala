package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video travel as opaque
  * `BinaryType` payloads with a typed metadata struct, and per-item
  * processing runs batched per partition — the Scala analog of a Pandas-UDF
  * `mapInPandas` stage.
  *
  * The actual media DECODE IS A STUB (`decodeStub`): the container has no
  * image/audio codecs, so decode produces a deterministic fake derived from
  * the payload bytes. Everything around it — schema, batch shape,
  * partitioning, null-safety, feature-vector plumbing — is real and tested,
  * so swapping in a JNI/foreign decoder changes one function.
  *
  * Scale notes: payloads stay columnar (parquet binary) end-to-end; the
  * per-partition iterator processes items one batch at a time without
  * materializing a partition in memory; repartition before decode spreads
  * large media evenly; feature vectors come back as fixed-width arrays so
  * downstream ANN (graft.operators.Similarity) consumes them directly.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("byte_len", LongType),
      StructField("source", StringType))))))

  /** Wrap a documents table into a media table: payload = utf-8 bytes of
    * `text` (deterministic stand-in for real media bytes). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("format"),
        length(col("text").cast("binary")).cast("long").as("byte_len"),
        col("source").as("source")).as("meta"))

  /** STUB decoder: a real implementation would decode image/audio bytes
    * (e.g. via a JNI codec) and emit pixels/samples. This deterministic
    * fake derives `dim` pseudo-features from the payload bytes so the full
    * pipeline shape is exercised without codecs. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below.
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish seed
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    var j = 0
    while (j < dim) {
      val x = h ^ (j.toLong * 0x9e3779b97f4a7c15L)
      val mixed = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      out(j) = ((mixed >>> 11).toDouble / (1L << 53).toDouble).toFloat
      j += 1
    }
    out
  }

  final case class MediaFeatures(media_id: Long, byte_len: Long,
                                 features: Array[Float])

  /** Batched per-partition decode+featurize — the mapInPandas-shaped stage.
    * Runs on executors, one partition iterator at a time; payload bytes
    * never pass through the driver. */
  def extractFeatures(media: DataFrame, dim: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          MediaFeatures(id, bytes.length.toLong, decodeStub(bytes, dim))
        }
      }
  }

  /** Frame-sampling invariants as an oracle-checked query: per media item,
    * the number of fixed-size frames its payload shards into and the total
    * bytes across frames (which must reassemble to the payload length).
    * The byte math is SQL-expressible (octet_length over the UTF-8 text
    * stand-in), so the multimodal chunking plumbing sits in the DuckDB
    * correctness gate, not just in tests. */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = fromDocuments(
      graft.operators.Star.table(spark, dir, "documents"))
    sampleFrames(media, 256)
      .groupBy("media_id")
      .agg(
        max(col("byte_len")).as("byte_len"),
        count(lit(1)).as("n_frames"),
        sum(length(col("frame_payload")).cast("long")).as("frame_bytes"),
        max(col("frame_idx")).cast("long").as("last_idx"))
      .orderBy("media_id")
  }

  private val mediaFramesSql =
    """SELECT doc_id AS media_id,
      |  CAST(strlen(text) AS BIGINT) AS byte_len,
      |  CAST((strlen(text) + 255) // 256 AS BIGINT) AS n_frames,
      |  CAST(strlen(text) AS BIGINT) AS frame_bytes,
      |  CAST((strlen(text) - 1) // 256 AS BIGINT) AS last_idx
      |FROM documents WHERE strlen(text) > 0
      |ORDER BY media_id""".stripMargin

  /** The batched per-partition featurize stage in the gate (rows-only —
    * the stub features are engine-specific): id, length, and the first
    * pseudo-feature per media item. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = fromDocuments(
      graft.operators.Star.table(spark, dir, "documents"))
    extractFeatures(media, 8).toDF()
      .select(col("media_id"), col("byte_len"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"))
      .orderBy("media_id")
  }

  val defs: Seq[graft.QueryDef] = Seq(
    graft.QueryDef("q_media_frames", mediaFrames, Some(mediaFramesSql)),
    graft.QueryDef("q_media_features", mediaFeatures, None),
  )

  /** Frame-sampling plumbing for variable-length media: explode a payload
    * into fixed-size chunk "frames" with indices (pure column exprs — the
    * chunking pattern used to shard large media across tasks). Zero-byte
    * or null-length media yield zero frames (sequence(0, -1) would flip to
    * a DESCENDING sequence, emitting phantom frames — guarded). */
  def sampleFrames(media: DataFrame, frameBytes: Int): DataFrame =
    media
      .select(col("media_id"), col("meta.byte_len").as("byte_len"),
        posexplode(expr(
          s"CASE WHEN coalesce(meta.byte_len, 0) > 0 THEN " +
            s"transform(sequence(0, CAST((meta.byte_len - 1) DIV $frameBytes AS INT)), " +
            s"i -> substring(payload, i * $frameBytes + 1, $frameBytes)) " +
            s"ELSE CAST(array() AS ARRAY<BINARY>) END")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_payload")
}
