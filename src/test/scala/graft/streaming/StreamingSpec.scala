package graft.streaming

import graft.SparkSuite
import graft.operators.{Relational, Star}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming plans must agree with their batch twins when fed the same
  * data through a file source + memory sink. */
class StreamingSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  lazy val eventsDir: String = {
    val d = Files.createTempDirectory("graft_events").toString
    // copy through the normalizing batch loader so the copy carries the
    // micro-precision ts the stream schema declares
    graft.operators.Star.events(spark, dir).write
      .mode("overwrite").parquet(d)
    d
  }

  test("streaming hourly window == batch date_trunc aggregation") {
    val stream = EventsStreaming.readEvents(spark, eventsDir)
    val q = EventsStreaming.hourlyWindowed(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_out")
        .select(col("bucket"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      val want = Relational.timeBucket(spark, dir)
        .select(col("bucket"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got === want)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops replayed events") {
    // a directory holding the SAME events twice (two files, identical
    // event_ids) — without dedup the counts would double
    val replayDir = Files.createTempDirectory("graft_events_replay").toString
    val raw = Star.events(spark, dir)
    raw.write.mode("overwrite").parquet(replayDir)
    raw.write.mode("append").parquet(replayDir)
    val q = EventsStreaming.readEvents(spark, replayDir)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type").count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = Star.events(spark, dir).groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want) // deduped back to single-copy counts
      // sanity: the input really contained duplicates
      val total = spark.read.parquet(replayDir).count()
      assert(total === 2 * want.values.sum)
    } finally q.stop()
  }

  test("stateful sessionizer accumulates per-user counts") {
    import spark.implicits._
    val stream = EventsStreaming.readEvents(spark, eventsDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[EventsStreaming.Event]
    val q = EventsStreaming.userSessions(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val sessions = spark.table("sessions_out")
        .groupBy("user_id").agg(max("n_events").as("n_events"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Star.events(spark, dir).groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sessions === want)
    } finally q.stop()
  }

  test("stream-stream interval join == batch interval join") {
    val stream = EventsStreaming.readEvents(spark, eventsDir)
    val q = EventsStreaming.clickPurchaseJoin(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_join_out")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ev = Star.events(spark, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"),
          col("event_id").as("cid"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pts"),
          col("event_id").as("pid"))
      val want = clicks.join(purchases,
        col("cu") === col("pu") && col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("interval 30 minutes"))
        .select("cid", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty)
      assert(got === want)
    } finally q.stop()
  }

  test("streaming session_window == batch gap sessionizer, row for row") {
    val got = StreamingQueries.streamSessionize(spark, dir)
      .collect().map(_.toSeq)
    val want = Relational.sessionize(spark, dir)
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("session_start_us"), col("duration_us"))
      .collect().map(_.toSeq)
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("custom sessionizer: purchase closes immediately, gap closes on " +
    "next arrival, state survives micro-batch boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingQueries.{SessEvent, SessClosed}
    val min = 60L * 1000000
    val input = MemoryStream[SessEvent](spark, 1)
    val q = StreamingQueries.customSessionize(input.toDS()).toDF()
      .writeStream.format("memory").queryName("custom_sess_test")
      .outputMode("append").start()
    try {
      // trigger 1: u1 starts a session, converts at +10min (closes), then
      // one more event at +15min (stays open); u2 converts instantly
      input.addData(
        SessEvent(1, 0, "click", 1), SessEvent(1, 10 * min, "purchase", 2),
        SessEvent(1, 15 * min, "view", 3), SessEvent(2, 0, "purchase", 4))
      q.processAllAvailable()
      val afterT1 = spark.table("custom_sess_test").as[SessClosed]
        .collect().toSet
      assert(afterT1 === Set(
        SessClosed(1, 0, 2, 10 * min, "purchase"),
        SessClosed(2, 0, 1, 0, "purchase")))
      // trigger 2: u1's event at +60min arrives in a LATER micro-batch —
      // the open (+15min) session closes as a gap using carried state
      input.addData(SessEvent(1, 60 * min, "click", 5))
      q.processAllAvailable()
      val afterT2 = spark.table("custom_sess_test").as[SessClosed]
        .collect().toSet
      assert(afterT2 === afterT1 +
        SessClosed(1, 15 * min, 1, 0, "gap"))
      // the +60min session is still open: nothing more was emitted
      assert(afterT2.size === 3)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: dups dropped while keyed state " +
    "lives, key re-emits after watermark eviction") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(java.sql.Timestamp, Long)](spark, 1)
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val dd = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("k")
    val q = dd.writeStream.format("memory").queryName("dd_wm_test")
      .outputMode("append").start()
    try {
      // batch 1: key 7 emits once, in-batch duplicate dropped
      input.addData((t(0), 7L), (t(0), 7L))
      q.processAllAvailable()
      assert(spark.table("dd_wm_test").count() === 1)
      // batch 2: watermark still below t0+1h -> duplicate still dropped;
      // the t10 row advances the watermark to ~t9 for the NEXT batch
      input.addData((t(1), 7L), (t(10), 99L))
      q.processAllAvailable()
      assert(spark.table("dd_wm_test").as[(java.sql.Timestamp, Long)]
        .collect().map(_._2).sorted.toSeq === Seq(7L, 99L))
      // batch 3: key 7's state (event time t0/t1) is behind the t9
      // watermark and was evicted -> the same key RE-EMITS
      input.addData((t(11), 7L))
      q.processAllAvailable()
      assert(spark.table("dd_wm_test").as[(java.sql.Timestamp, Long)]
        .collect().map(_._2).sorted.toSeq === Seq(7L, 7L, 99L))
    } finally q.stop()
  }

  test("replayCheckpoint reaps stale orphan dirs, keeps fresh ones") {
    import java.nio.file.{Files, Paths}
    val fresh = Paths.get(StreamingQueries.replayCheckpoint("spec_fresh"))
    val base = fresh.getParent
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2L * 60 * 60 * 1000)
    // orphan: every file under it (root AND children) is 2h old
    val stale = Files.createTempDirectory(base, "graft_ckpt_spec_stale")
    Files.createFile(stale.resolve("offsets"))
    Files.setLastModifiedTime(stale.resolve("offsets"), old)
    Files.setLastModifiedTime(stale, old)
    // live query from another JVM: root mtime stopped advancing long ago
    // (subdirs created once), but a state file deep inside is still being
    // touched every trigger — must NOT be reaped
    val live = Files.createTempDirectory(base, "graft_ckpt_spec_live")
    val state = Files.createDirectories(live.resolve("state").resolve("0"))
    Files.createFile(state.resolve("1.delta"))
    Files.setLastModifiedTime(live, old)
    Files.setLastModifiedTime(live.resolve("state"), old)
    // the sweep runs once per JVM (hygiene, not correctness) — re-arm it
    // so THIS call exercises the reaping logic
    StreamingQueries.ckptSwept.set(false)
    val next = Paths.get(StreamingQueries.replayCheckpoint("spec_next"))
    assert(!Files.exists(stale), "2h-old checkpoint dir must be reaped")
    assert(Files.exists(fresh), "fresh checkpoint dir must survive the sweep")
    assert(Files.exists(live.resolve("state").resolve("0").resolve("1.delta")),
      "old-rooted dir with a freshly-touched state file is a LIVE query " +
        "and must survive the sweep")
    Files.walk(live).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => { Files.deleteIfExists(f); () })
    Files.deleteIfExists(next)
    Files.deleteIfExists(fresh)
  }

  test("streaming dedup against the persisted band index == batch serve " +
    "path, and the replay arrives as 3 chronological shards") {
    val got = graft.operators.Dedup.streamDedupIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    val want = graft.operators.Dedup.dedupIncremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(got === want,
      "streaming arrival verdicts must converge to the batch twin")
    assert(got.nonEmpty && got.map(_._1) === got.map(_._1).sorted)
    // the build-once replay fixture is 3 contiguous doc_id-range files
    val srcF = new java.io.File(s"$dir/documents.parquet")
    val tag = java.lang.Long.toHexString(
      dir.hashCode.toLong << 32 ^ srcF.length() ^ srcF.lastModified())
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_stream_dedupidx_$tag")
    val parts = (1 to 3).map(k => base.resolve(s"q$k.parquet"))
    assert(parts.forall(Files.exists(_)), s"expected 3 shard files in $base")
    // file order == doc_id order (strictly increasing mtimes were set by
    // the sequential rename; verify the ranges don't interleave)
    val ranges = parts.map { p =>
      val ids = spark.read.parquet(p.toString)
        .agg(min("doc_id"), max("doc_id")).collect().head
      (ids.getLong(0), ids.getLong(1))
    }
    assert(ranges.sliding(2).forall {
      case Seq((_, hi), (lo2, _)) => hi < lo2
      case _ => true
    }, s"shard id ranges must be contiguous and ordered: $ranges")
  }
}
