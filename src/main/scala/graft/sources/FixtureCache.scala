package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Build-once, read-many fixture dirs under java.io.tmpdir — the ONE
  * implementation of the tag + stage + atomic-rename pattern shared by
  * the media fixture cache, the chronological stream-replay fixture, the
  * stream-dedup shard fixture, and the persisted serve indexes
  * ([[IndexStore]]) (previously hand-rolled copies, each a separate
  * place to fix concurrency bugs).
  *
  * Safety properties:
  *  - the cache key carries the SOURCE table's identity (length + mtime),
  *    not just its path: testdata regenerates between rounds and a
  *    path-keyed fixture would silently serve the previous corpus;
  *  - builders populate a process-unique staging dir and atomically
  *    rename it into place, creating `_READY` last — a complete dir
  *    another process is scanning is never deleted or rewritten;
  *  - a builder that THROWS deletes its staging dir (no orphaned stage
  *    litter from crashed builds);
  *  - a base dir WITHOUT `_READY` is an incomplete leftover of a crashed
  *    builder; no reader trusts it (all readers gate on `_READY`), so it
  *    is renamed aside to a unique trash name and deleted — never deleted
  *    in place, so a concurrent winner that publishes base between our
  *    checks can at worst lose to the rename-aside (which we re-check
  *    for), not have its files deleted out from under a reader mid-scan;
  *  - losing the rename race to a concurrent builder — detected either
  *    by the pre-rename `_READY` re-checks or by the rename itself
  *    failing (rename onto an existing dir) — discards the staging copy
  *    and serves the winner's.
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
      try build(stage)
      catch { case e: Throwable => fs.delete(stage, true); throw e }
      fs.create(new Path(stage, "_READY")).close()
      // re-check after the (slow) build: a concurrent process may have
      // completed meanwhile — keep the winner, discard our copy.
      if (fs.exists(ready)) fs.delete(stage, true)
      else {
        if (fs.exists(base)) {
          // base exists without _READY = incomplete leftover — unless a
          // concurrent builder published between the checks. Re-check,
          // then move the leftover ASIDE (rename is atomic; a delete-in-
          // place could pull files out from under a winner's reader).
          if (fs.exists(ready)) { fs.delete(stage, true); return base }
          val trash = new Path(base.getParent,
            s"${base.getName}_trash_${java.util.UUID.randomUUID}")
          if (fs.rename(base, trash)) fs.delete(trash, true)
        }
        // final gate: publish only if still unpublished; a failed rename
        // (target dir appeared — local-FS rename would NEST the stage
        // inside it) is a lost race, not an error.
        if (fs.exists(ready) || !fs.rename(stage, base))
          fs.delete(stage, true)
      }
    }
    base
  }

  /** Replay-shard fixture: split `rel` into `n` CONTIGUOUS `idCol`
    * ranges written as q1..qN.parquet with strictly increasing mtimes
    * (sequential rename), so a file-stream source replays the shards in
    * id order — the property the first-seen-wins streaming dedup
    * replays depend on. The ntile window is build-once fixture
    * machinery; production arrivals are already file-granular shards.
    * Shared by the text ([[graft.operators.Dedup.streamDedupIndex]])
    * and semantic streaming dedup paths. */
  def buildReplayShards(spark: SparkSession, prefix: String, dir: String,
      table: String, n: Int)(
      rel: org.apache.spark.sql.DataFrame, idCol: String): Path =
    buildOnce(spark, prefix, dir, table) { stage =>
      val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, ntile}
      val parts = rel
        .withColumn("__b", ntile(n).over(Window.orderBy(idCol)))
      (1 to n).foreach { k =>
        val tmp = new Path(stage, s"_tmp$k")
        parts.filter(col("__b") === k).drop("__b")
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val f = fs.globStatus(new Path(tmp, "part-*.parquet")).head.getPath
        fs.rename(f, new Path(stage, s"q$k.parquet"))
        fs.delete(tmp, true)
      }
    }
}
