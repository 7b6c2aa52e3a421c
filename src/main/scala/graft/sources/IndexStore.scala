package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Build-once, serve-many persisted index tables.
  *
  * A 100 TB pipeline does not rebuild its dedup band index or ANN
  * postings inside every query — it BUILDS them once per corpus snapshot
  * (a batch job) and SERVES probes against the persisted, bucketed
  * result. This helper is that seam for the incremental-dedup and
  * ANN-serve queries: the first call in a JVM materializes the index as
  * a bucketed table (bucket layout = the probe join's key layout, so the
  * serve-side join reads the index co-located, never re-shuffling or —
  * the real point — re-deriving it from raw text/vectors); every later
  * call returns the catalog table, and the serve query's plan contains a
  * plain parquet scan of the index, not the build lineage.
  *
  * Storage: an EXTERNAL table under java.io.tmpdir, path keyed by the
  * source table's identity (len+mtime — testdata regenerates between
  * rounds) AND the process pid. Bucketing metadata lives in the session
  * catalog (per-JVM), so cross-process reuse of the files is not
  * possible anyway; pid-scoping makes concurrent bench/verify runs
  * race-free by construction. Orphaned dirs from dead JVMs are reaped by
  * an mtime sweep (same policy as the streaming replay checkpoints).
  */
object IndexStore {

  /** Returns the persisted index table named `name`, building it from
    * `build` on first use in this JVM. `bucketCols` must equal the serve
    * join's keys. */
  def cachedBucketTable(
      spark: SparkSession, dir: String, srcTable: String, name: String,
      nBuckets: Int, bucketCols: Seq[String], sortCols: Seq[String])
      (build: => DataFrame): DataFrame =
    cached(spark, dir, srcTable, name) { (w, loc, table) =>
      w.bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
        .sortBy(sortCols.head, sortCols.tail: _*)
        .option("path", loc).saveAsTable(table)
    }(build)

  /** Index table partitioned by `partCols` — one directory per key value
    * (e.g. one IVF cell per partition), so a serve query probing K cells
    * statically prunes to K directories. */
  def cachedPartitionedTable(
      spark: SparkSession, dir: String, srcTable: String, name: String,
      partCols: Seq[String])(build: => DataFrame): DataFrame =
    cached(spark, dir, srcTable, name) { (w, loc, table) =>
      w.partitionBy(partCols: _*).option("path", loc).saveAsTable(table)
    }(build)

  /** Small unclustered index table (e.g. the IVF coarse quantizer's
    * centroids — broadcast at serve time). */
  def cachedTable(
      spark: SparkSession, dir: String, srcTable: String, name: String)
      (build: => DataFrame): DataFrame =
    cached(spark, dir, srcTable, name) { (w, loc, table) =>
      w.option("path", loc).saveAsTable(table)
    }(build)

  private def cached(
      spark: SparkSession, dir: String, srcTable: String, name: String)
      (write: (org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
        String, String) => Unit)
      (build: => DataFrame): DataFrame = synchronized {
    val src = new java.io.File(s"$dir/$srcTable.parquet")
    val tag = java.lang.Long.toHexString(
      dir.hashCode.toLong << 32 ^ src.length() ^ src.lastModified())
    val pid = ProcessHandle.current().pid()
    val table = s"graft_idx_${name}_${tag}_$pid"
    sweepOrphans()
    if (!spark.catalog.tableExists(table)) {
      val loc = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), table).toString
      write(build.write.mode(SaveMode.Overwrite), loc, table)
    }
    spark.table(table)
  }

  /** Reap graft_idx_* dirs whose OWNING JVM IS DEAD (pid parsed from
    * the dir name) and that are older than 30 min. An mtime-only rule
    * would reap LIVE indexes: index files are written once and only
    * read afterwards, so their mtime never advances past the build —
    * a JVM alive longer than the cutoff (a slow full bench) would have
    * its own index swept out from under its still-cached catalog entry.
    * Liveness is the gate; age only keeps a freshly-dead JVM's dir
    * around briefly in case of pid reuse races. */
  private def sweepOrphans(): Unit = {
    import java.nio.file.{Files, Path, Paths}
    val base = Paths.get(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - 30L * 60 * 1000
    val self = ProcessHandle.current().pid()
    def ownerDead(name: String): Boolean = {
      val pid = name.substring(name.lastIndexOf('_') + 1)
      try {
        val p = pid.toLong
        val h = ProcessHandle.of(p)
        p != self && (!h.isPresent || !h.get.isAlive)
      } catch { case _: NumberFormatException => false }
    }
    def newestMtime(p: Path): Long = {
      val walk = Files.walk(p)
      try walk.mapToLong { f =>
        try Files.getLastModifiedTime(f).toMillis
        catch { case _: java.io.IOException => 0L }
      }.max.orElse(Long.MaxValue)
      finally walk.close()
    }
    try {
      val listing = Files.list(base)
      try listing.iterator().forEachRemaining { p =>
        val name = p.getFileName.toString
        if (name.startsWith("graft_idx_") && ownerDead(name) &&
          (try newestMtime(p) < cutoff
           catch { case _: java.io.IOException => false })) {
          try {
            val walk = Files.walk(p)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(f => { Files.deleteIfExists(f); () })
            finally walk.close()
          } catch { case _: java.io.IOException => () }
        }
      } finally listing.close()
    } catch { case _: java.io.IOException => () }
  }
}
