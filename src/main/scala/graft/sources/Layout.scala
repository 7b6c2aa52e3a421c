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

  /** The bucketed layout in the correctness gate: lineitem and orders are
    * written bucketed+sorted on the join key (once per input dataset —
    * table names carry a dataset tag so different scale factors never
    * collide), then joined WITHOUT any exchange or sort and aggregated.
    * This is the pay-the-shuffle-once-at-write-time layout that makes a
    * repeated 100 TB fact-fact join cheap; the oracle is the plain join. */
  def bucketedRevenue(spark: org.apache.spark.sql.SparkSession,
                      dir: String): DataFrame = {
    import graft.operators.Star
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val lt = s"graft_b_lineitem_$tag"
    val ot = s"graft_b_orders_$tag"
    if (!spark.catalog.tableExists(lt)) {
      // a previous session may have left the managed location on disk
      // without this session's catalog knowing the table — clear both
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      Seq(lt, ot).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(wh, t)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
      }
      writeBucketed(Star.table(spark, dir, "lineitem")
        .select(col("l_orderkey"),
          graft.operators.Star.cents(col("l_extendedprice")).as("price_c")),
        lt, "l_orderkey", 16)
      writeBucketed(Star.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority")),
        ot, "o_orderkey", 16)
    }
    spark.table(lt)
      .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg((sum(col("price_c")).cast("double") / 100.0).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  private val bucketedRevenueSql =
    s"""SELECT o_orderpriority,
       |  CAST(SUM(${graft.operators.Star.Sql.cents("l_extendedprice")})
       |    AS DOUBLE) / 100.0 AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Partition pruning in the correctness gate: orders written ONCE into
    * the (ano, mes) directory layout (dataset-tagged path, same idiom as
    * the bucketed tables), then a one-month query reads it back — the
    * scan's PartitionFilters eliminate every other directory before a
    * byte is read (plan-asserted in PlanSpec). This is the layout that
    * turns a 100 TB full-history table into a month-sized scan for
    * time-scoped queries; the oracle is the plain filtered aggregate. */
  def partitionPruned(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Star
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = s"$wh/graft_p_orders_$tag"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      writePartitioned(
        Star.table(spark, dir, "orders")
          .withColumn("ano", year(col("o_orderdate")))
          .withColumn("mes", month(col("o_orderdate"))),
        path, Seq("ano", "mes"))
    }
    spark.read.parquet(path)
      .filter(col("ano") === 1996 && col("mes") === 3)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(Star.cents(col("o_totalprice"))).as("total_c"))
      .orderBy("o_orderpriority")
  }

  private val partitionPrunedSql =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       |  CAST(SUM(${graft.operators.Star.Sql.cents("o_totalprice")})
       |    AS BIGINT) AS total_c
       |FROM orders
       |WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 3
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** ORC as a second columnar format in the gate: lineitem written once
    * to ORC (dataset-tagged path), read back with a pushed-down filter
    * and aggregated — format breadth for estates where ORC is the lake
    * standard. Results are format-independent, so the oracle reads the
    * original parquet. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Star
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = s"$wh/graft_orc_lineitem_$tag"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      Star.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate")
        .write.mode("overwrite").orc(path)
    }
    spark.read.orc(path)
      .filter(col("l_shipdate") >= lit("1996-01-01"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  private val orcRoundtripSql =
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Small-files compaction — the standing operational chore of any
    * 100 TB lake (streaming ingest and over-parallel writes leave
    * thousands of KB-sized files; scans then pay per-file open/footer
    * costs and planners per-file metadata). The op: write-once fixture
    * of the documents table fragmented into 16 shards, then compact by
    * computing the target file count from actual bytes / target size
    * and rewriting through repartition(target). The gate aggregates the
    * compacted table against the original-table oracle (byte-identical
    * content is the contract; the file-count collapse is spec-asserted).
    * On a real lake the same op runs per partition-directory with a
    * manifest swap instead of overwrite. */
  def compaction(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Star
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val fragPath = s"$wh/graft_frag_documents_$tag"
    val compactPath = s"$wh/graft_compact_documents_$tag"
    val hp = new org.apache.hadoop.fs.Path(fragPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(fragPath, "_SUCCESS"))) {
      Star.table(spark, dir, "documents")
        .repartition(16).write.mode("overwrite").parquet(fragPath)
    }
    val dataBytes = fs.listStatus(hp)
      .filter(_.getPath.getName.startsWith("part-")).map(_.getLen).sum
    val targetFileBytes = 4L << 20 // 4 MiB locally; 128 MiB-1 GiB on a lake
    val target = math.max(1L, (dataBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(fragPath)
      .repartition(target)
      .write.mode("overwrite").parquet(compactPath)
    spark.read.parquet(compactPath)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        countDistinct("doc_id").as("n_ids"))
      .orderBy("lang")
  }

  private val compactionSql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  COUNT(DISTINCT doc_id) AS n_ids
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Morton (Z-order) interleave of two bucketized non-negative columns:
    * bit b of `x` lands at position 2b, bit b of `y` at 2b+1. Sorting by
    * the result clusters rows so every contiguous range covers a small
    * BOX in (x, y) space — the layout that lets min/max file statistics
    * prune on BOTH columns, where a linear sort prunes on one. */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             bits: Int): org.apache.spark.sql.Column =
    (0 until bits).map { b =>
      shiftleft(x.bitwiseAND(lit(1L << b)), b)
        .bitwiseOR(shiftleft(y.bitwiseAND(lit(1L << b)), b + 1))
    }.reduce(_.bitwiseOR(_))

  /** Z-ordered lineitem layout on (l_partkey, l_suppkey), written once
    * (range-partitioned + sorted by the 20-bit z-value), then a two-sided
    * box query reads it back. Results are layout-independent — the oracle
    * is the plain filtered aggregate — while the LAYOUT property (every
    * file covers a narrow range of BOTH keys, so file/row-group stats
    * prune a box query on either dimension) is asserted in LayoutSpec.
    * At 100 TB this is the difference between a box query reading ~1/64
    * of the files and reading all of them because the second key is
    * scattered. */
  def zorderScan(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Star
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = s"$wh/graft_z_lineitem_$tag"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      val li = Star.table(spark, dir, "lineitem")
      val Array(pMax, sMax) = li
        .agg(max("l_partkey"), max("l_suppkey")).collect().head
        .toSeq.map(_.asInstanceOf[Long]).toArray
      val z = zValue(
        graft.operators.Star.idiv(col("l_partkey") * 1024L, lit(pMax + 1)),
        graft.operators.Star.idiv(col("l_suppkey") * 1024L, lit(sMax + 1)),
        10)
      li.withColumn("__z", z)
        .repartitionByRange(32, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(path)
    }
    // two-sided box: low 1/8 of each key domain (~1/64 of the data)
    val part = Star.table(spark, dir, "part")
    val supp = Star.table(spark, dir, "supplier")
    val pCut = part.agg(max("p_partkey")).collect().head.getLong(0) / 8
    val sCut = supp.agg(max("s_suppkey")).collect().head.getLong(0) / 8
    spark.read.parquet(path)
      .filter(col("l_partkey") <= pCut && col("l_suppkey") <= sCut)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(graft.operators.Star.cents(col("l_extendedprice")))
          .as("price_c"))
      .orderBy("l_returnflag")
  }

  private val zorderScanSql =
    s"""SELECT l_returnflag, COUNT(*) AS n_items,
       |  CAST(SUM(${graft.operators.Star.Sql.cents("l_extendedprice")})
       |    AS BIGINT) AS price_c
       |FROM lineitem
       |WHERE l_partkey <= (SELECT MAX(p_partkey) // 8 FROM part)
       |  AND l_suppkey <= (SELECT MAX(s_suppkey) // 8 FROM supplier)
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val defs: Seq[graft.QueryDef] = Seq(
    graft.QueryDef("q_zorder_scan", zorderScan, Some(zorderScanSql)),
    graft.QueryDef("q_bucketed_join", bucketedRevenue,
      Some(bucketedRevenueSql)),
    graft.QueryDef("q_partition_pruned", partitionPruned,
      Some(partitionPrunedSql)),
    graft.QueryDef("q_compaction", compaction, Some(compactionSql)),
    graft.QueryDef("q_orc_roundtrip", orcRoundtrip,
      Some(orcRoundtripSql)),
  )
}
