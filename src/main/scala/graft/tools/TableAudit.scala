package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints `query -> input tables` for a set of registered queries by
  * building each DataFrame (lazily) against a scale dir and listing the
  * files its plan would scan. Used to derive the star-only query list for
  * scale-ratio benches (BASELINE.md): a query is star-only iff every input
  * file is one of the generated star tables, so a StarGen corpus scales
  * ALL of its inputs.
  *
  * Usage: TableAudit <sfDir> [name ...]   (default: every query whose
  * defining family is a star-schema family)
  */
object TableAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-table-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted =
      if (args.length > 1) args.drop(1).toSet
      else graft.Registry.all.map(_.name).toSet
    graft.Registry.all.filter(d => wanted(d.name)).sortBy(_.name)
      .foreach { d =>
        val tables =
          try {
            val df = d.fn(spark, sfDir)
            df.inputFiles.map { f =>
              val p = f.stripPrefix("file:")
              // <dir>/<table>.parquet or <dir>/<table>.parquet/part-*
              val seg = p.split("/").dropWhile(!_.endsWith(".parquet"))
              if (seg.nonEmpty) seg.head.stripSuffix(".parquet") else p
            }.distinct.sorted.mkString(",")
          } catch { case e: Throwable => s"ERR ${e.getClass.getSimpleName}" }
        println(s"${d.name}\t$tables")
      }
    spark.stop()
  }
}
