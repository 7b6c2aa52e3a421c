package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface of the engine: the same event analytics the
  * batch `q_time_bucket` query computes, expressed as an incremental
  * streaming plan, plus a stateful per-user sessionizer.
  *
  * Scale notes: the windowed aggregate is keyed on (window, event_type) —
  * state size is bounded by watermark horizon x type cardinality, not by
  * input volume. The sessionizer keys state by user_id; state is evicted
  * via processing-time timeout, so long-running jobs do not accumulate
  * unbounded state. Both run identically on a cluster sink (kafka/parquet)
  * — the memory sink below is only the test harness.
  */
object EventsStreaming {

  /** Schema of the events stream as stored (micro-precision timestamps —
    * the same shape Star.events yields on the batch table).
    *
    * Layout contract: the streaming file source supports only the
    * TIMESTAMP(MICROS) parquet layout — an explicit TimestampType schema
    * over a TIMESTAMP(NANOS) file throws in the vectorized reader, and a
    * streaming source cannot branch per-file the way batch
    * [[graft.operators.Star.events]] does (the schema is fixed before any
    * file is seen). Legacy NANOS data must be normalized through a batch
    * rewrite first (StreamingSpec's fixture path does exactly that);
    * EventsLayoutSpec pins both batch branches so the rewrite stays
    * available. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Hourly tumbling-window counts/sums per event type with a 1-hour
    * watermark — the streaming twin of `Relational.timeBucket`. */
  def hourlyWindowed(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"),
        col("sum_value"))

  /** Stream-stream interval join: each click joins the same user's
    * purchases landing within [click, click + 30 min]. Both sides carry
    * watermarks, so the join state (buffered unmatched rows) is evicted
    * once event time passes watermark + interval — bounded regardless of
    * stream length; the join itself is keyed on user_id so it shuffles
    * both streams once. */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "1 hour")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("interval 30 minutes"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("c_ts"), col("p_ts"), col("value"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)
  final case class UserSession(user_id: Long, n_events: Long,
                               total_value: Double, last_event_id: Long)

  /** Stateful per-user running session via flatMapGroupsWithState:
    * emits an updated session row per micro-batch per active user.
    *
    * `evictAfter`: optional processing-time TTL for state eviction in
    * long-running deployments (bounds state size). Left off by default —
    * with a TTL set, Spark keeps scheduling timeout batches, so drain-based
    * test harnesses (`processAllAvailable`) would never settle. */
  def userSessions(events: Dataset[Event],
                   evictAfter: Option[String] = None): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (evictAfter.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.iterator
            state.remove()
            out
          } else {
            val prev = state.getOption
              .getOrElse(UserSession(uid, 0L, 0.0, -1L))
            val next = rows.foldLeft(prev) { (s, e) =>
              UserSession(uid, s.n_events + 1, s.total_value + e.value,
                math.max(s.last_event_id, e.event_id))
            }
            state.update(next)
            evictAfter.foreach(state.setTimeoutDuration)
            Iterator(next)
          }
      }
  }
}
