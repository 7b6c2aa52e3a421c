package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: isolate the serial-scan floor of the one-row-group local
  * testdata vs downstream compute. Usage: runMain graft.tools.ScanProbe [sfDir] */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Testdata parquet timestamps carry isAdjustedToUTC=false; read them as
      // session-TZ (UTC) TIMESTAMP, not TIMESTAMP_NTZ, so timestamp functions
      // (unix_micros, watermarks) keep their pre-Spark-4-inference semantics.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    noop(li) // warm
    time("scan 7 cols")(noop(li.select(cols.map(col): _*)))
    time("scan 7 cols (2nd)")(noop(li.select(cols.map(col): _*)))
    time("scan + count-agg only") {
      noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1))))
    }
    time("full aggPricing") {
      noop(graft.operators.Relational.aggPricing(spark, sfDir))
    }
    time("full aggPricing (2nd)") {
      noop(graft.operators.Relational.aggPricing(spark, sfDir))
    }
    spark.stop()
  }
}
