package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Checkpoint recovery: a stateful streaming query stopped and restarted
  * from its checkpoint must carry BOTH its source offsets and its
  * operator state across the restart — the property that makes a
  * 100 TB/day pipeline survive executor loss and planned redeploys. */
class RecoverySpec extends SparkSuite {

  test("dropDuplicates state and offsets survive a stop/restart") {
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("graft_rec_src").toString
    val ckpt = Files.createTempDirectory("graft_rec_ckpt").toString
    val schema = StructType(Seq(StructField("k", LongType)))
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Long]()

    def writeFile(name: String, keys: Seq[Long]): Unit = {
      import spark.implicits._
      keys.toDF("k").coalesce(1).write.mode("append").parquet(srcDir)
      val _ = name
    }

    def start() = spark.readStream.schema(schema).parquet(srcDir)
      .dropDuplicates("k")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => buf.add(r.getLong(0)))
      }
      .start()

    // run 1: keys 1,2 emit once each (the in-batch duplicate drops)
    writeFile("a", Seq(1L, 2L, 2L))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(buf.toArray.map(_.asInstanceOf[Long]).sorted.toSeq === Seq(1L, 2L))

    // between runs: a new file arrives with a seen key and a new key
    writeFile("b", Seq(2L, 3L))
    buf.clear()

    // run 2, SAME checkpoint: only the new key may emit. Key 2 must be
    // suppressed by RECOVERED state (a state loss would re-emit it), and
    // file "a" must not replay (recovered offsets).
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(buf.toArray.map(_.asInstanceOf[Long]).toSeq === Seq(3L))
  }
}
