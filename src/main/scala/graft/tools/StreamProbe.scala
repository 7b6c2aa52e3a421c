package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool: per-trigger duration breakdown for a streaming gate query.
  * Attaches a StreamingQueryListener and dumps each progress event's
  * durationMs map (addBatch / getBatch / latestOffset / queryPlanning /
  * walCommit / commitOffsets) so replay floors are attributed to the
  * phase that owns them, not guessed.
  * Usage: runMain graft.tools.StreamProbe <query> [sfDir] */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val progress = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Map[String, Long])]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        progress += ((e.progress.batchId, e.progress.numInputRows,
          e.progress.durationMs.asScala.view.mapValues(_.toLong).toMap))
      }
    })

    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save() // warm
    progress.clear()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener drain
    println(f"== $name total ${total}%.2f s, ${progress.size} triggers ==")
    val keys = progress.flatMap(_._3.keys).distinct.sorted
    println(("batch" +: "rows" +: keys).mkString("\t"))
    progress.sortBy(_._1).foreach { case (b, rows, d) =>
      println((b.toString +: rows.toString +:
        keys.map(k => d.getOrElse(k, 0L).toString)).mkString("\t"))
    }
    keys.foreach { k =>
      println(f"sum $k%-16s ${progress.map(_._3.getOrElse(k, 0L)).sum} ms")
    }
    spark.stop()
  }
}
