package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators: the knobs that decide whether a 100 TB join
  * or scan shuffles.
  *
  *   - `writeBucketed` / bucketed joins: both fact tables hash-bucketed and
  *     sorted by the join key at write time -> equi-joins on that key run
  *     with NO Exchange (and no sort) at read time. This is how you make
  *     the lineitem-orders join repeatable across hundreds of queries
  *     without paying the shuffle every time.
  *   - `writePartitioned`: directory-partitioned layout (e.g. ano/mes) so
  *     time-scoped scans prune whole partitions before reading a byte.
  */
object Layout {

  /** Save `df` as a bucketed+sorted catalog table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Save `df` directory-partitioned by the given columns (they must be in
    * the schema; readers see them restored from the directory keys). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** INMET previsoes in the partitioned layout: adds derivable (ano, mes)
    * partition keys — the stage layout a 100 TB deployment would use. */
  def previsoesPartitioned(previsoes: DataFrame, path: String): Unit =
    writePartitioned(
      previsoes
        .withColumn("ano", year(col("data_medicao")))
        .withColumn("mes", month(col("data_medicao"))),
      path, Seq("ano", "mes"))
}
