package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-trigger cost breakdown of the streaming replays: attaches a
  * progress listener and prints each trigger's durationMs map
  * (queryPlanning / addBatch / walCommit / stateCommit / ...) for the
  * queries named in SPARK_GRAFT_ONLY — the measurement behind the
  * replay-floor work (r12 verdict item 5: where does ~0.5 s/trigger
  * go?). Diagnostic tool, not part of the engine surface. */
object StreamProgressProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val current = new java.util.concurrent.atomic.AtomicReference[String]("?")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] ${current.get} batch=${p.batchId} " +
          s"rows=${p.numInputRows} durationMs=${p.durationMs} " +
          s"stateOps=${p.stateOperators.length}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => n.startsWith("q_stream") || n == "q_inmet_stream")
      .filter(n => only.forall(_.contains(n)))
      .foreach { n =>
        current.set(n)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] $n TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // full Bench-style hygiene: memory-sink temp views pin whole
        // result sets on the heap past clearCache, and the materialize
        // registry retains plan trees — leaving either in place would
        // tax exactly the per-trigger durations this tool measures
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.startsWith("graft_stream"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        graft.operators.Dedup.releaseMaterialized()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    spark.stop()
  }
}
