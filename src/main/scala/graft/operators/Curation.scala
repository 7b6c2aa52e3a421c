package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation operators for LLM training-data pipelines: vocabulary
  * building, PII scrubbing, repetition quality signals (Gopher-style),
  * deterministic stratified sampling, and per-group feature scaling.
  *
  * Scale doctrine: every operator here is a scan → narrow transform →
  * (at most) one keyed shuffle. Sampling is a pure filter (zero shuffle);
  * the vocabulary build is the canonical word-count shape whose map-side
  * partial aggregation collapses the explode before the exchange.
  */
object Curation {

  // ---------------------------------------------------------------- vocab

  /** Corpus vocabulary top-k: the tokenizer-training primitive. Explode
    * words → count → global top 100 with deterministic (count DESC, word)
    * tiebreak. The groupBy runs partial aggregation on the explode side, so
    * the shuffle carries one row per distinct word per partition — at
    * 100 TB the exchange is vocabulary-sized, not corpus-sized; the final
    * top-k is a TakeOrdered over per-partition heaps, never a full sort. */
  def vocabTopk(spark: SparkSession, dir: String): DataFrame =
    Star.fan(spark, Star.table(spark, dir, "documents"))
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(100)

  private val vocabTopkSql =
    """SELECT word, COUNT(*) AS n FROM (
      |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      |  FROM documents) t
      |GROUP BY word ORDER BY n DESC, word LIMIT 100""".stripMargin

  // ------------------------------------------------------------ pii scrub

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlRe = "https?://[^\\s]+"

  /** PII redaction: count + replace emails and URLs with placeholder
    * tokens. The synthetic corpus carries no PII, so each doc is first
    * suffixed with deterministic doc_id-derived contact strings — the scrub
    * then provably matches and rewrites them (the oracle recomputes the
    * same construction). Pure per-row regexp work: no shuffle at any
    * scale; emits a content fingerprint instead of the scrubbed body so
    * the comparison surface stays small. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    // fan: two scrub regexes + two count regexes over ~1 KB texts are
    // per-row compute the single-split scan would otherwise serialize
    Star.fan(spark, Star.table(spark, dir, "documents"))
      .select(col("doc_id"), concat(
        col("text"), lit(" contact user"), col("doc_id"),
        lit("@mail"), col("doc_id") % 7, lit(".example.com via https://host"),
        col("doc_id") % 5, lit(".example/d/"), col("doc_id"),
        lit("?ref=x")).as("raw"))
      .withColumn("clean",
        regexp_replace(regexp_replace(col("raw"), emailRe, "[EMAIL]"),
          urlRe, "[URL]"))
      .select(col("doc_id"),
        regexp_count(col("raw"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("raw"), lit(urlRe)).cast("long").as("n_urls"),
        md5(col("clean")).as("clean_fp"),
        length(col("clean")).cast("long").as("clean_len"))
      .orderBy("doc_id")

  private val piiScrubSql =
    s"""WITH raw AS (
       |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
       |    || '@mail' || CAST(doc_id % 7 AS VARCHAR)
       |    || '.example.com via https://host' || CAST(doc_id % 5 AS VARCHAR)
       |    || '.example/d/' || CAST(doc_id AS VARCHAR) || '?ref=x' AS raw
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(raw, '$emailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(raw, '$urlRe')) AS BIGINT) AS n_urls,
       |  md5(regexp_replace(regexp_replace(raw, '$emailRe', '[EMAIL]', 'g'),
       |    '$urlRe', '[URL]', 'g')) AS clean_fp,
       |  CAST(length(regexp_replace(regexp_replace(raw, '$emailRe', '[EMAIL]',
       |    'g'), '$urlRe', '[URL]', 'g')) AS BIGINT) AS clean_len
       |FROM raw ORDER BY doc_id""".stripMargin

  // --------------------------------------------- repetition (quality) sig

  /** Gopher-style repetition signals per document: duplicate-word fraction
    * and most-frequent-bigram mass. High values flag boilerplate /
    * degenerate text for corpus filtering. Two-level aggregate keyed on
    * doc_id — partial combine absorbs the bigram explode before the
    * exchange, and all fractions use exact integer-rational quantization
    * (Star.ratio6) so results are bit-stable across engines. */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame = {
    val bigramArr =
      "transform(sequence(1, greatest(size(w) - 1, 1)), " +
        "i -> concat_ws(' ', try_element_at(w, i), try_element_at(w, i + 1)))"
    val base = Star.fan(spark, Star.table(spark, dir, "documents"))
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        explode(expr(bigramArr)).as("bg"))
    base.groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("cnt"),
        max("n_words").as("n_words"), max("n_distinct").as("n_distinct"))
      .groupBy("doc_id")
      .agg(max("n_words").as("n_words"),
        sum("cnt").as("n_bigrams"), max("cnt").as("top_bigram_n"),
        max("n_distinct").as("n_distinct"))
      .select(col("doc_id"), col("n_words"),
        Star.ratio6(col("n_words") - col("n_distinct"), col("n_words"))
          .as("dup_word_frac"),
        col("n_bigrams"), col("top_bigram_n"),
        Star.ratio6(col("top_bigram_n"), col("n_bigrams"))
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  private val repetitionSignalsSql =
    s"""WITH words AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
       |    unnest(list_transform(range(greatest(len(w) - 1, 1)),
       |      i -> concat_ws(' ', w[i+1], w[i+2]))) AS bg
       |  FROM words),
       |bgc AS (
       |  SELECT doc_id, bg, COUNT(*) AS cnt,
       |    MAX(n_words) AS n_words, MAX(n_distinct) AS n_distinct
       |  FROM base GROUP BY doc_id, bg),
       |agg AS (
       |  SELECT doc_id, MAX(n_words) AS n_words, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       |    MAX(cnt) AS top_bigram_n, MAX(n_distinct) AS n_distinct
       |  FROM bgc GROUP BY doc_id)
       |SELECT doc_id, n_words,
       |  ${Star.Sql.ratio6("n_words - n_distinct", "n_words")} AS dup_word_frac,
       |  n_bigrams, top_bigram_n,
       |  ${Star.Sql.ratio6("top_bigram_n", "n_bigrams")} AS top_bigram_frac
       |FROM agg ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- stratified sample

  /** Deterministic stratified sampling: per-language rates applied via a
    * multiplicative integer hash of the key — a pure scan-side filter.
    * Zero shuffle, zero RNG state: the same row set falls out on any
    * cluster size or retry (rand()-based sampling is neither reproducible
    * nor oracle-checkable). Rates: en 10%, all other languages 20% —
    * downsampling the majority stratum is the standard corpus-balancing
    * move. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "documents")
      .withColumn("h", (col("doc_id") * lit(2654435761L)) % lit(4294967296L))
      .filter(col("h") % 100 <
        when(col("lang") === "en", 10).otherwise(20))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  private val sampleStratifiedSql =
    """SELECT doc_id, lang FROM documents
      |WHERE ((doc_id * 2654435761) % 4294967296) % 100 <
      |  CASE WHEN lang = 'en' THEN 10 ELSE 20 END
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- minmax scale

  /** Per-group min-max normalization (feature scaling): window min/max
    * over the group key, one shuffle on l_partkey. Exact integer-cents
    * arithmetic with rational quantization keeps the scaled values
    * bit-identical across engines; constant groups map to 0. */
  def minmaxScale(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_partkey")
    val pc = Star.cents(col("l_extendedprice"))
    Star.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1995-07-01"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        pc.as("pc"))
      .withColumn("mn", min("pc").over(w))
      .withColumn("mx", max("pc").over(w))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        when(col("mx") === col("mn"), lit(0.0))
          .otherwise(Star.ratio6(col("pc") - col("mn"), col("mx") - col("mn")))
          .as("price_scaled"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus;
      // partkey + the scaled value make the sort total
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "price_scaled")
  }

  private val minmaxScaleSql =
    s"""WITH t AS (
       |  SELECT l_orderkey, l_linenumber, l_partkey,
       |    ${Star.Sql.cents("l_extendedprice")} AS pc
       |  FROM lineitem WHERE l_shipdate < DATE '1995-07-01'),
       |w AS (
       |  SELECT l_orderkey, l_linenumber, l_partkey, pc,
       |    MIN(pc) OVER (PARTITION BY l_partkey) AS mn,
       |    MAX(pc) OVER (PARTITION BY l_partkey) AS mx
       |  FROM t)
       |SELECT l_orderkey, l_linenumber, l_partkey,
       |  CASE WHEN mx = mn THEN 0.0
       |       ELSE ${Star.Sql.ratio6("pc - mn", "mx - mn")} END AS price_scaled
       |FROM w ORDER BY l_orderkey, l_linenumber, l_partkey, price_scaled"""
      .stripMargin

  /** The capstone curation query — the corpus a training run would
    * actually consume: drop non-canonical near-dup cluster members, keep
    * docs inside the length band, drop boilerplate by top-bigram mass.
    * One pass over documents, repetition signals joined on doc_id.
    * The drop list comes from the DF-capped production cluster chain
    * ([[Dedup.dedupClustersCapped]]), and carries no broadcast hint:
    * it is O(duplicates), corpus-sized at a high dup rate — AQE
    * broadcasts it when it is actually small. */
  def curationKeep(spark: SparkSession, dir: String): DataFrame = {
    val drop = Dedup.dedupClustersCapped(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val rep = repetitionSignals(spark, dir)
      .select("doc_id", "top_bigram_frac")
    Star.table(spark, dir, "documents")
      .join(rep, "doc_id")
      .filter(col("n_chars").between(40, 400) &&
        col("top_bigram_frac") <= 0.5)
      .join(drop, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  private val curationKeepSql =
    """WITH RECURSIVE words AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(greatest(len(w) - 2, 1)),
      |    i -> concat_ws(' ', w[i+1], w[i+2], w[i+3])))) AS s
      |  FROM words),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |heavy AS (
      |  SELECT s FROM sh CROSS JOIN n GROUP BY s, n.n_docs
      |  HAVING COUNT(*) > greatest(n.n_docs // 100, 5)),
      |kept AS (
      |  SELECT sh.doc_id, sh.s FROM sh
      |  WHERE sh.s NOT IN (SELECT s FROM heavy)),
      |cnt AS (SELECT doc_id, COUNT(*) AS c FROM kept GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      |  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |edges AS (
      |  SELECT id_a, id_b FROM pairs
      |  JOIN cnt ca ON ca.doc_id = id_a
      |  JOIN cnt cb ON cb.doc_id = id_b
      |  WHERE (CAST((CAST(shared AS BIGINT) * 1000000)
      |    // CAST(ca.c + cb.c - shared AS BIGINT) AS DOUBLE) / 1000000.0) >= 0.5),
      |und AS (
      |  SELECT id_a AS s, id_b AS d FROM edges
      |  UNION ALL SELECT id_b, id_a FROM edges),
      |reach(id, r) AS (
      |  SELECT s, s FROM (SELECT DISTINCT s FROM und)
      |  UNION
      |  SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.id),
      |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(greatest(len(w) - 1, 1)),
      |    i -> concat_ws(' ', w[i+1], w[i+2]))) AS b
      |  FROM words),
      |bgc AS (SELECT doc_id, b, COUNT(*) AS n FROM bg GROUP BY 1, 2),
      |rep AS (
      |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
      |    MAX(n) AS top_n
      |  FROM bgc GROUP BY doc_id)
      |SELECT d.doc_id, d.lang, d.n_chars
      |FROM documents d JOIN rep ON d.doc_id = rep.doc_id
      |WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)
      |  AND d.n_chars BETWEEN 40 AND 400
      |  AND (CAST(top_n AS BIGINT) * 1000000) // n_bigrams <= 500000
      |ORDER BY d.doc_id""".stripMargin

  /** Sequence packing for training batches: documents are greedily
    * assigned (in stable doc_id order) to fixed-budget packs of 2048
    * tokens — a doc belongs to the pack where its running token count
    * STARTS, so packs can overflow by at most one doc (standard greedy
    * packing). One running-sum window per language shard + one bounded
    * aggregate; at corpus scale the shard key is a hash bucket and every
    * shard packs independently — embarrassingly parallel, which is why
    * the window partitions by the shard key and never runs global. */
  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 2048L
    val d = Star.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    d.withColumn("running", sum("n_tok").over(w))
      .withColumn("pack_id", Star.idiv(col("running") - col("n_tok"),
        lit(budget)))
      .groupBy("lang", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("pack_tokens"),
        Star.ratio6(sum("n_tok"), lit(budget)).as("fill_ratio"))
      .orderBy("lang", "pack_id")
  }

  private val seqPackSql =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
       |      AS n_tok
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, lang, n_tok,
       |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
       |  FROM d)
       |SELECT lang,
       |  CAST(${Star.Sql.idiv("running - n_tok", "2048")} AS BIGINT)
       |    AS pack_id,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
       |  ${Star.Sql.ratio6("SUM(n_tok)", "2048")} AS fill_ratio
       |FROM r GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_seq_pack", seqPack, Some(seqPackSql)),
    QueryDef("q_curation_keep", curationKeep, Some(curationKeepSql)),
    QueryDef("q_vocab_topk", vocabTopk, Some(vocabTopkSql)),
    QueryDef("q_pii_scrub", piiScrub, Some(piiScrubSql)),
    QueryDef("q_rep_signals", repetitionSignals, Some(repetitionSignalsSql)),
    QueryDef("q_sample_stratified", sampleStratified,
      Some(sampleStratifiedSql)),
    QueryDef("q_minmax_scale", minmaxScale, Some(minmaxScaleSql)),
  )
}
