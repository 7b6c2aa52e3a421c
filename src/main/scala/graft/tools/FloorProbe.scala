package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query scheduling-floor decomposition (the r12 verdict's standing
  * item: 100+ sub-0.5 s queries summing ~22 % of the bench). For each
  * named query, warm, this measures where the wall time goes:
  *
  *   build  — DataFrame construction + analysis (driver only)
  *   plan   — optimization + physical planning (executedPlan force)
  *   exec   — noop-sink execution (jobs/stages/tasks counted alongside)
  *
  * Run twice with SPARK_GRAFT_CONF toggling a conf (e.g. AQE) to
  * attribute the floor to planning vs task scheduling vs stage count.
  * Diagnostic tool, not part of the engine surface. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => sys.error(s"SPARK_GRAFT_CONF entry '$kv' is not k=v")
        }
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })

    val names = args.toSeq
    // warm-up pass
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[floor] $n WARMUP FAILED: $e") }
    }
    println("[floor] name                        build   plan   exec  " +
      "jobs stages tasks")
    names.foreach { n =>
      try {
      val (b, p, x, j, s, t) = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force optimize + physical plan
        val t2 = System.nanoTime()
        jobs.set(0); stages.set(0); tasks.set(0)
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9,
          jobs.get, stages.get, tasks.get)
      }.minBy(r => r._1 + r._2 + r._3)
      println(f"[floor] $n%-28s $b%6.3f $p%6.3f $x%6.3f  $j%4d $s%5d $t%5d")
      } catch {
        // a typo'd name or one failing query must not kill the probe for
        // the rest of the list (the warm-up already tolerates this)
        case e: Throwable => println(s"[floor] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
