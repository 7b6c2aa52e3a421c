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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_stream_time_bucket", streamTimeBucket, Some(streamTimeBucketSql)),
  )
}
