package graft.sources

import graft.SparkSuite
import graft.operators.{Dedup, Similarity}

/** Cross-process serve contract of [[IndexStore]]: a persisted index is
  * SELF-DESCRIBING (data + `_META.properties` + `_READY`), so a session
  * whose catalog has never seen it — a fresh JVM — registers and serves
  * it with ZERO rebuild. The "fresh JVM" is simulated exactly: the
  * catalog entry is dropped (a new process starts with an empty catalog)
  * while the published files stay, then the serve query runs again. */
class IndexStoreSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("fresh session serves the bucketed band index from metadata, zero rebuild") {
    val first = Dedup.dedupIncremental(spark, dir).collect()
    val builds0 = IndexStore.buildCount.get()
    IndexStore.forgetInCatalog(spark, dir, "documents", "mhband")
    val again = Dedup.dedupIncremental(spark, dir)
    val rows = again.collect()
    assert(IndexStore.buildCount.get() === builds0,
      "re-registration after catalog loss must not rebuild the index")
    assert(rows.toSeq === first.toSeq)
    // the re-registered serve plan still reads the persisted table, not
    // the sketch lineage
    val lp = Dedup.dedupIncrementalCandPlan(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(lp.contains("graft_idx_mhband"), lp)
  }

  test("fresh session re-registers partitioned IVF postings with partition pruning intact") {
    val first = Similarity.annIvfServe(spark, dir).collect()
    val builds0 = IndexStore.buildCount.get()
    IndexStore.forgetInCatalog(spark, dir, "embeddings", "ivf_post")
    IndexStore.forgetInCatalog(spark, dir, "embeddings", "ivf_cent")
    val df = Similarity.annIvfServe(spark, dir)
    val rows = df.collect()
    assert(IndexStore.buildCount.get() === builds0,
      "re-registration after catalog loss must not rebuild the postings")
    assert(rows.toSeq === first.toSeq)
    // MSCK-recovered partitions still prune: the probed cells appear as
    // a literal partition filter on the postings scan
    val p = df.queryExecution.executedPlan.toString
    val scanLine = p.split("\n").find(_.contains("graft_idx_ivf_post"))
    assert(scanLine.isDefined, p)
    assert(scanLine.get.contains("PartitionFilters: [cid") &&
      scanLine.get.contains(" IN "), scanLine.get)
  }

  test("alias promotion is atomic under concurrent promoters and readers") {
    // the retrain-and-swap's claim: a reader resolving the serving alias
    // mid-swap sees the OLD or the NEW generation name, never a torn or
    // empty value. Hammer one alias from racing promoter threads while
    // readers resolve continuously; every observed value must be one of
    // the complete generation names.
    val alias = s"atom${java.util.UUID.randomUUID.toString.take(6)}"
    val gens = (0 until 4).map(i => s"generation_$i" * 8) // long values
    IndexStore.promote(dir, "documents", alias, gens.head)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (1 to 4).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          val v = IndexStore.resolveAlias(dir, "documents", alias)
          if (!v.exists(gens.contains)) bad.add(v.toString)
        }
      })
    }
    readers.foreach(_.start())
    val writers = (1 to 4).map { w =>
      new Thread(() => (1 to 200).foreach { i =>
        IndexStore.promote(dir, "documents", alias, gens((w + i) % 4))
      })
    }
    writers.foreach(_.start()); writers.foreach(_.join())
    stop.set(true); readers.foreach(_.join())
    assert(bad.isEmpty, s"torn/absent alias reads: ${bad.toArray.toSeq.take(3)}")
    assert(gens.contains(
      IndexStore.resolveAlias(dir, "documents", alias).get))
  }

  test("published index dir is self-describing: data + _META.properties + _READY") {
    Dedup.dedupIncremental(spark, dir).write.format("noop")
      .mode("overwrite").save()
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      IndexStore.tableName(dir, "documents", "mhband"))
    assert(java.nio.file.Files.exists(base.resolve("_READY")))
    assert(java.nio.file.Files.exists(base.resolve("_META.properties")))
    assert(java.nio.file.Files.isDirectory(base.resolve("data")))
    val props = new java.util.Properties
    val in = java.nio.file.Files.newInputStream(
      base.resolve("_META.properties"))
    try props.load(in) finally in.close()
    assert(props.getProperty("kind") === "bucket")
    assert(props.getProperty("bucketCols") === "band_id,h")
    assert(props.getProperty("schema").contains("band_id"))
  }
}
