package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Build-once, read-many fixture dirs under java.io.tmpdir — the ONE
  * implementation of the tag + stage + atomic-rename pattern shared by
  * the media fixture cache, the chronological stream-replay fixture, and
  * the stream-dedup shard fixture (previously three hand-rolled copies,
  * each a separate place to fix concurrency bugs).
  *
  * Safety properties:
  *  - the cache key carries the SOURCE table's identity (length + mtime),
  *    not just its path: testdata regenerates between rounds and a
  *    path-keyed fixture would silently serve the previous corpus;
  *  - builders populate a process-unique staging dir and atomically
  *    rename it into place, creating `_READY` last — a complete dir
  *    another process is scanning is never deleted or rewritten;
  *  - a base dir WITHOUT `_READY` is an incomplete leftover of a crashed
  *    builder; no reader trusts it (all readers gate on `_READY`), so it
  *    is deleted and rebuilt instead of being served forever (and
  *    instead of making the rename silently nest the staging dir inside
  *    it, which is what a rename onto an existing dir does on the local
  *    filesystem);
  *  - losing the rename race to a concurrent builder discards the
  *    staging copy and serves the winner's.
  */
object FixtureCache {

  /** Identity tag of `<dir>/<table>.parquet`. */
  def sourceTag(dir: String, table: String): String = {
    val src = new java.io.File(s"$dir/$table.parquet")
    java.lang.Long.toHexString(
      dir.hashCode.toLong << 32 ^ src.length() ^ src.lastModified())
  }

  /** Returns the fixture dir named `<prefix>_<tag>`, building it via
    * `build(stagingDir)` on first use. */
  def buildOnce(spark: SparkSession, prefix: String, dir: String,
                table: String)(build: Path => Unit): Path = synchronized {
    val base = new Path(System.getProperty("java.io.tmpdir"),
      s"${prefix}_${sourceTag(dir, table)}")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ready = new Path(base, "_READY")
    if (!fs.exists(ready)) {
      val stage = new Path(base.getParent,
        s"${base.getName}_stage_${java.util.UUID.randomUUID}")
      build(stage)
      fs.create(new Path(stage, "_READY")).close()
      // re-check after the (slow) build: a concurrent process may have
      // completed meanwhile — keep the winner, discard our copy. Only a
      // still-incomplete base (no _READY) is deleted before the rename.
      if (fs.exists(ready)) fs.delete(stage, true)
      else {
        if (fs.exists(base)) fs.delete(base, true)
        if (!fs.rename(stage, base)) fs.delete(stage, true)
      }
    }
    base
  }
}
