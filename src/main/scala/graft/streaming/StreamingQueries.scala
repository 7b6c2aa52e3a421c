package graft.streaming

import graft.QueryDef
import graft.operators.Star
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming entries in the correctness gate: the streaming
  * plan is executed to completion over the bounded events table (memory
  * sink, complete mode) and its final result is oracle-checked against
  * the SAME DuckDB SQL as the batch twin — proving the incremental plan
  * converges to the batch answer, not just that it runs.
  *
  * Scale note: on a real cluster the identical plan runs unbounded with
  * the 1-hour watermark of [[EventsStreaming.hourlyWindowed]] and a kafka/
  * parquet sink; state stays bounded by watermark horizon x event-type
  * cardinality. Complete-mode memory sink here is only the bounded-replay
  * harness. */
object StreamingQueries {

  /** Hourly tumbling-window counts/sums per event type, computed by the
    * streaming engine (file source -> stateful agg -> memory sink) with
    * the decimal-exact sum the determinism doctrine requires. */
  def streamTimeBucket(spark: SparkSession, dir: String): DataFrame = {
    // the streaming file source wants a directory; scope it to the events
    // table with a glob filter
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.readStream
      .schema(EventsStreaming.eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    val agg = src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Star.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"),
        col("sum_value"))
    val q = agg.writeStream
      .format("memory")
      .queryName("graft_stream_time_bucket")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table("graft_stream_time_bucket")
      .orderBy("bucket", "event_type")
  }

  private val streamTimeBucketSql =
    s"""SELECT date_trunc('hour', ts) AS bucket, event_type,
       |  COUNT(*) AS n, ${Star.Sql.dsum("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Streaming gap-sessionization via the native session_window operator:
    * per-user sessions merge while consecutive events are < 30 min apart —
    * the streaming twin of `Relational.sessionize`, converging to the SAME
    * oracle. Complete-mode bounded replay closes every session; ordinal
    * session ids are assigned by a post-sink window (the sink table is
    * session-grain — tiny — so the unpartitioned-looking window is
    * actually partitioned by user).
    *
    * Scale note: session_window state is merged incrementally per key and
    * evicted by watermark in append-mode deployments; state size is
    * open-sessions x users, never event volume. */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.readStream
      .schema(EventsStreaming.eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    val agg = src
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
    val q = agg.writeStream
      .format("memory")
      .queryName("graft_stream_sessionize")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table("graft_stream_sessionize")
      .select(col("user_id"),
        unix_micros(col("min_ts")).as("session_start_us"),
        col("n_events"),
        (unix_micros(col("max_ts")) - unix_micros(col("min_ts")))
          .as("duration_us"))
      .withColumn("session_id", row_number().over(
        Window.partitionBy("user_id").orderBy("session_start_us")).cast("long"))
      .select("user_id", "session_id", "n_events", "session_start_us",
        "duration_us")
      .orderBy("user_id", "session_id")
  }

  /** Same oracle as the batch sessionizer — identical gap rule. */
  private val streamSessionizeSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN us - lag(us) OVER w > 1800000000
      |              OR lag(us) OVER w IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sess AS (
      |  SELECT user_id, us,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  COUNT(*) AS n_events, MIN(us) AS session_start_us,
      |  MAX(us) - MIN(us) AS duration_us
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Streaming exact dedup: state-store dropDuplicates on the
    * (user_id, event_type) key, append-mode — each key emits exactly once,
    * on first arrival. The output is the KEY SET (not first-arrival
    * payloads, which would depend on scan order), so the bounded replay
    * converges to the batch DISTINCT oracle regardless of parallelism.
    *
    * Scale note: in production the same plan runs
    * dropDuplicatesWithinWatermark so state is evicted at the watermark
    * horizon instead of growing with key cardinality; the bounded replay
    * here has no watermark so the full key set is the (small) state. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.readStream
      .schema(EventsStreaming.eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val deduped = src
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    val q = deduped.writeStream
      .format("memory")
      .queryName("graft_stream_dedup")
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table("graft_stream_dedup")
      .orderBy("user_id", "event_type")
  }

  private val streamDedupSql =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** foreachBatch incremental upsert into a parquet serving table: the
    * INMET fixture CSVs arrive one file per micro-batch; each batch
    * reduces to MERGEABLE per-(station, day) partials (min/max/exact
    * cents sums/count) and upserts them into the running daily table,
    * which the next batch reads back. After the 3-file replay the serving
    * table IS the batch daily rollup — shared oracle with q_inmet_daily.
    *
    * Scale note: this is the production maintenance loop for a serving
    * aggregate — per batch it shuffles only that batch's partials plus
    * the touched state rows, never the history. With a transactional
    * format the re-aggregate becomes MERGE on the touched keys; plain
    * parquet here swaps versioned directories instead (same dataflow). */
  def streamUpsert(spark: SparkSession, dir: String): DataFrame = {
    import graft.inmet.{Ingest, Pipeline, Warehouse}
    val fixtureDir = "/root/repo/src/test/resources/inmet"
    val fixtureGlob = s"$fixtureDir/*.csv"
    val work = java.nio.file.Files.createTempDirectory("graft_upsert")
    val dim = Warehouse
      .dimCidadeAtributos(Pipeline.stage(spark, fixtureGlob).cidades)
      .select("wmo", "cidade_sk")
    val keys = Seq("wmo", "cidade_sk", "data_medicao")
    def partials(df: DataFrame): DataFrame = df
      .join(broadcast(dim), Seq("wmo"))
      .groupBy(keys.map(col): _*)
      .agg(min("temperatura_c").as("temp_min_c"),
        max("temperatura_c").as("temp_max_c"),
        sum(Star.cents(col("temperatura_c"))).as("temp_c"),
        sum(Star.cents(col("precipitacao_mm"))).as("precip_c"),
        sum(Star.cents(col("pressao_atm_kpa"))).as("pressao_c"),
        sum(Star.cents(col("vento_mps"))).as("vento_c"),
        sum(Star.cents(col("umidade_porcentagem"))).as("umid_c"),
        count(lit(1)).as("n"))
    def merge(cur: Option[DataFrame], batch: DataFrame): DataFrame = {
      val both = cur.fold(batch)(_.unionByName(batch))
      both.groupBy(keys.map(col): _*)
        .agg(min("temp_min_c").as("temp_min_c"),
          max("temp_max_c").as("temp_max_c"),
          sum("temp_c").as("temp_c"), sum("precip_c").as("precip_c"),
          sum("pressao_c").as("pressao_c"), sum("vento_c").as("vento_c"),
          sum("umid_c").as("umid_c"), sum("n").as("n"))
    }
    var version = -1
    val src = InmetStreaming.previsoesStream(spark, fixtureDir, fixtureGlob)
    val q = src.writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cur = if (version < 0) None
          else Some(spark.read.parquet(s"$work/v$version"))
        merge(cur, partials(batch))
          .write.mode("overwrite").parquet(s"$work/v${version + 1}")
        version += 1
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val state = spark.read.parquet(s"$work/v$version")
    def avgD(c: String) = col(c).cast("double") / 100.0 / col("n")
    state.select(col("wmo"), col("cidade_sk"), col("data_medicao"),
        col("temp_min_c"), col("temp_max_c"),
        avgD("temp_c").as("temp_avg_c"),
        (col("precip_c").cast("double") / 100.0).as("precip_total_mm"),
        avgD("pressao_c").as("pressao_avg_kpa"),
        avgD("vento_c").as("vento_avg_mps"),
        avgD("umid_c").as("umidade_avg_pct"),
        col("n").as("registros_horarios"))
      .orderBy("wmo", "data_medicao")
  }

  /** Append-mode windowed aggregation under a genuinely ADVANCING
    * watermark: the events table is split once into four chronological
    * files (equal time spans, written sequentially so file order =
    * event-time order); the stream replays them one file per
    * micro-batch, so the 1-hour watermark advances between batches and
    * append mode emits each hourly window exactly once, when the
    * watermark passes its end. Windows still open at end-of-replay are
    * correctly ABSENT — the oracle applies the same cutoff
    * (window end <= ms-floored max event time - 1h, Spark's watermark
    * arithmetic). Complete-mode twins re-aggregate everything each
    * batch; this is the form with bounded state AND bounded output —
    * what actually runs against an unbounded 100 TB/day stream. */
  def streamWindowedAppend(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val ev = Star.events(spark, dir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val base = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"), s"graft_stream_chrono_$tag")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(base, "_READY"))) {
      fs.delete(base, true)
      val Array(lo, hi) = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).collect().head
        .toSeq.map(_.asInstanceOf[Long]).toArray
      val span = (hi - lo) / 4 + 1
      (0 until 4).foreach { k =>
        val part = ev.filter(
          unix_micros(col("ts")) >= lo + k * span &&
            unix_micros(col("ts")) < lo + (k + 1) * span)
        val tmp = new org.apache.hadoop.fs.Path(base, s"_tmp$k")
        part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val f = fs.globStatus(
          new org.apache.hadoop.fs.Path(tmp, "part-*.parquet")).head.getPath
        // sequential rename => strictly increasing mtimes => the file
        // source replays in chronological order (no late data)
        fs.rename(f, new org.apache.hadoop.fs.Path(base, s"q$k.parquet"))
        fs.delete(tmp, true)
      }
      fs.create(new org.apache.hadoop.fs.Path(base, "_READY")).close()
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "q*.parquet")
      .parquet(base.toString)
    val agg = src
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Star.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"),
        col("sum_value"))
    val q = agg.writeStream
      .format("memory")
      .queryName("graft_stream_windowed_append")
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table("graft_stream_windowed_append")
      .orderBy("bucket", "event_type")
  }

  /** Same cutoff arithmetic as Spark's watermark: max event time floored
    * to milliseconds, minus the 1-hour delay; append emitted exactly the
    * windows whose END is at or before it. */
  private val streamWindowedAppendSql =
    """WITH wm AS (
      |  SELECT (epoch_us(MAX(ts)) // 1000) * 1000 - 3600000000 AS wm_us
      |  FROM events)
      |SELECT date_trunc('hour', ts) AS bucket, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events, wm
      |GROUP BY 1, 2, wm_us
      |HAVING epoch_us(date_trunc('hour', MIN(ts)) + INTERVAL 1 HOUR)
      |  <= wm_us
      |ORDER BY 1, 2""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_stream_windowed_append", streamWindowedAppend,
      Some(streamWindowedAppendSql)),
    QueryDef("q_stream_time_bucket", streamTimeBucket, Some(streamTimeBucketSql)),
    QueryDef("q_stream_sessionize", streamSessionize, Some(streamSessionizeSql)),
    QueryDef("q_stream_dedup", streamDedup, Some(streamDedupSql)),
    QueryDef("q_stream_upsert", streamUpsert,
      Some(graft.operators.InmetQueries.inmetDailySql)),
  )
}
