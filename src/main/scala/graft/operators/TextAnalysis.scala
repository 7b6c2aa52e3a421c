package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Text-analysis operators for LLM training-data pipelines, over the
  * `documents` table. All per-document metrics are pure codegen'd column
  * expressions (no UDFs), so they run inside WholeStageCodegen and scale
  * linearly with the scan — the shape you want for a 100 TB corpus pass.
  * Each query has an exact DuckDB oracle (same arithmetic, same regexes).
  */
object TextAnalysis {

  /** Occurrences of `marker` in `c` via length arithmetic — identical
    * semantics in Spark and DuckDB (replace-all). */
  private def occurrences(c: Column, marker: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(marker), "")))
      / marker.length).cast("long")

  private def occSql(c: String, marker: String): String = {
    val escaped = marker.replace("'", "''")
    s"CAST((length($c) - length(replace($c, '$escaped', ''))) / ${marker.length} AS BIGINT)"
  }

  /** Token statistics per document (whitespace tokenization). */
  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = Star.table(spark, dir, "documents")
    val tokens = split(trim(col("text")), "\\s+")
    d.select(
      col("doc_id"),
      size(tokens).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_text"),
      Star.ratio6(length(regexp_replace(col("text"), "\\s+", "")),
        size(tokens)).as("avg_token_len"))
      .orderBy("doc_id")
  }

  private val textTokensSql =
    s"""SELECT doc_id,
       |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars_text,
       |  ${Star.Sql.ratio6("length(regexp_replace(text, '\\s+', '', 'g'))",
            "len(regexp_split_to_array(trim(text), '\\s+'))")} AS avg_token_len
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: stopword density, punctuation, length — combined into
    * a deterministic score (the ratios a corpus-filtering pass gates on). */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val d = Star.table(spark, dir, "documents")
    val padded = concat(lit(" "), col("text"), lit(" "))
    val tokens = split(trim(col("text")), "\\s+")
    val nTokens = size(tokens).cast("double")
    val stopHits = (occurrences(padded, " the ") + occurrences(padded, " a ") +
      occurrences(padded, " and ")).cast("double")
    val punct = (length(col("text")) -
      length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("long")
    d.select(
      col("doc_id"),
      stopHits.cast("long").as("stop_hits"),
      punct.as("n_punct"),
      Star.ratio6(stopHits, nTokens).as("stop_ratio"),
      round(least(lit(1.0), nTokens / lit(50.0)) * lit(0.5)
        + least(lit(1.0), stopHits / lit(5.0)) * lit(0.5), 6).as("quality_score"))
      .orderBy("doc_id")
  }

  private val textQualitySql = {
    val stop = s"(${occSql("p", " the ")} + ${occSql("p", " a ")} + ${occSql("p", " and ")})"
    s"""WITH t AS (
       |  SELECT doc_id, text, CONCAT(' ', text, ' ') AS p,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tokens
       |  FROM documents)
       |SELECT doc_id,
       |  CAST($stop AS BIGINT) AS stop_hits,
       |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
       |  ${Star.Sql.ratio6(stop, "n_tokens")} AS stop_ratio,
       |  round(least(1.0, n_tokens / 50.0) * 0.5
       |        + least(1.0, CAST($stop AS DOUBLE) / 5.0) * 0.5, 6) AS quality_score
       |FROM t ORDER BY doc_id""".stripMargin
  }

  /** N-gram-marker language ID heuristic, evaluated against the labeled
    * `lang` column (confusion counts). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = Star.table(spark, dir, "documents")
    val p = concat(lit(" "), col("text"), lit(" "))
    val en = occurrences(p, " the ") + occurrences(p, " a ")
    val predicted = when(en > 0, lit("en")).otherwise(lit("other"))
    d.select(col("lang"), predicted.as("predicted"))
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  private val langIdSql = {
    val en = s"(${occSql("p", " the ")} + ${occSql("p", " a ")})"
    s"""WITH t AS (SELECT lang, CONCAT(' ', text, ' ') AS p FROM documents),
       |c AS (SELECT lang,
       |        CASE WHEN $en > 0 THEN 'en' ELSE 'other' END AS predicted
       |      FROM t)
       |SELECT lang, predicted, COUNT(*) AS n FROM c
       |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
  }

  /** Canonical-form document fingerprint (md5 of normalized text). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "documents")
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("fp"),
        col("n_chars"))
      .orderBy("doc_id")

  private val textFingerprintSql =
    """SELECT doc_id, md5(lower(trim(text))) AS fp, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Multimodal plumbing: opaque binary payload column + typed metadata —
    * the schema/partition shape for image/audio columns. The payload here is
    * the utf-8 encoding of `text` (deterministic stand-in for real media
    * bytes; see graft.multimodal for the decode stubs). */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val d = Star.table(spark, dir, "documents")
    val payload = col("text").cast("binary")
    d.select(
      col("doc_id"),
      length(payload).cast("long").as("byte_len"),
      md5(payload).as("payload_md5"),
      col("source"))
      .orderBy("doc_id")
  }

  private val binaryMetaSql =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  md5(text) AS payload_md5, source
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus text normalization (accent-strip via the custom StripAccents
    * expression, lowercase, whitespace collapse) with before/after
    * fingerprints. Oracle: DuckDB's native strip_accents. */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextNormalize
    Star.table(spark, dir, "documents")
      .select(
        col("doc_id"),
        md5(col("text")).as("fp_raw"),
        md5(TextNormalize.normalize(col("text"))).as("fp_normalized"),
        length(TextNormalize.normalize(col("text"))).cast("long")
          .as("n_chars_normalized"))
      .orderBy("doc_id")
  }

  private val textNormalizeSql =
    """SELECT doc_id, md5(text) AS fp_raw,
      |  md5(trim(regexp_replace(lower(strip_accents(text)), '\s+', ' ', 'g')))
      |    AS fp_normalized,
      |  CAST(length(trim(regexp_replace(lower(strip_accents(text)), '\s+', ' ', 'g')))
      |    AS BIGINT) AS n_chars_normalized
      |FROM documents ORDER BY doc_id""".stripMargin

  /** GPT-2-style BPE-ish pre-tokenization count: contractions, letter
    * runs, digit runs, punctuation runs, whitespace — the regex both
    * engines (Java regex / RE2) interpret identically. The closer proxy
    * for LLM token budgeting than whitespace splitting. */
  private val bpePattern =
    "'(?:s|d|m|t|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  def bpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = Star.table(spark, dir, "documents")
    val ws = size(split(trim(col("text")), "\\s+")).cast("long")
    val bpe = regexp_count(col("text"), lit(bpePattern)).cast("long")
    d.select(col("doc_id"), ws.as("n_ws_tokens"), bpe.as("n_bpe_tokens"),
      Star.ratio6(bpe, ws).as("bpe_per_ws"))
      .orderBy("doc_id")
  }

  private val bpeTokensSql = {
    val sqlPat = bpePattern.replace("\\", "\\").replace("'", "''")
    s"""SELECT doc_id,
       |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
       |    AS n_ws_tokens,
       |  CAST(len(regexp_extract_all(text, '$sqlPat')) AS BIGINT)
       |    AS n_bpe_tokens,
       |  ${Star.Sql.ratio6(s"len(regexp_extract_all(text, '$sqlPat'))",
            "len(regexp_split_to_array(trim(text), '\\s+'))")} AS bpe_per_ws
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Per-document Shannon entropy of the token distribution (bits/token)
    * — the information-density signal corpus filters use to drop
    * degenerate text. Double summation order is engine-arbitrary, so each
    * term -(c/n)·log2(c/n) is rounded to a 9-decimal DECIMAL first and
    * the terms are summed EXACTLY (order-independent) — the determinism
    * doctrine applied to a transcendental. */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.expressions.Window
    // one exchange total: the doc_id fan serves the tf group-by, both
    // per-doc windows, and the final aggregate. The earlier aggregate+join
    // formulation computed the tokenize+explode+tf lineage twice (Catalyst
    // shares no subplans) and shuffled the join — window-on-co-partitioned
    // is the same trick the shingle pipeline uses.
    val tok = Star.table(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("t"))
    val w = Window.partitionBy("doc_id")
    val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .withColumn("n", sum("c").over(w))
      .withColumn("n_distinct", count(lit(1)).over(w))
    tf
      .withColumn("term", round(
        -(col("c").cast("double") / col("n").cast("double")) *
          log2(col("c").cast("double") / col("n").cast("double")), 9)
        .cast(DecimalType(28, 9)))
      .groupBy("doc_id")
      .agg(max(col("n")).cast("long").as("n_tokens"),
        max(col("n_distinct")).as("n_distinct"),
        sum(col("term")).cast("double").as("entropy_bits"))
      .orderBy("doc_id")
  }

  private val tokenEntropySql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      |  FROM documents),
      |tf AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      |n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
      |        COUNT(*) AS n_distinct FROM tf GROUP BY 1),
      |terms AS (
      |  SELECT tf.doc_id, n.n, n.n_distinct,
      |    CAST(round(-(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE))
      |      * log2(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)), 9)
      |      AS DECIMAL(28,9)) AS term
      |  FROM tf JOIN n ON tf.doc_id = n.doc_id)
      |SELECT doc_id, MAX(n) AS n_tokens, MAX(n_distinct) AS n_distinct,
      |  CAST(SUM(term) AS DOUBLE) AS entropy_bits
      |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Corpus-level bigram collocations: top adjacent word pairs with their
    * directional association strengths p(b|a), p(a|b) in exact 1e-6
    * rationals (the integer-safe stand-in for PMI — same ranking, no
    * cross-engine log/overflow hazards). Two corpus passes (unigram and
    * bigram counts) that each reduce map-side to vocabulary cardinality;
    * the count joins broadcast the (tiny) unigram side, so nothing large
    * ever shuffles — the shape that holds when the corpus is 100 TB but
    * the vocabulary is millions. */
  def bigramColloc(spark: SparkSession, dir: String): DataFrame = {
    val words = Star.table(spark, dir, "documents")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
    val uni = words.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    val bigrams =
      "transform(sequence(1, size(w) - 1), " +
        "i -> concat_ws(' ', try_element_at(w, i), try_element_at(w, i + 1)))"
    val bi = words.select(explode(expr(bigrams)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n_ab"))
    bi
      .join(broadcast(uni.select(col("t").as("ta"), col("n").as("n_a"))),
        split(col("bigram"), " ").getItem(0) === col("ta"))
      .join(broadcast(uni.select(col("t").as("tb"), col("n").as("n_b"))),
        split(col("bigram"), " ").getItem(1) === col("tb"))
      .select(col("bigram"), col("n_ab"), col("n_a"), col("n_b"),
        Star.ratio6(col("n_ab"), col("n_a")).as("p_b_given_a"),
        Star.ratio6(col("n_ab"), col("n_b")).as("p_a_given_b"))
      .orderBy(col("n_ab").desc, col("bigram"))
      .limit(50)
  }

  private val bigramCollocSql =
    """WITH words AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
      |  FROM documents
      |  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2),
      |uni AS (
      |  SELECT unnest(w) AS t FROM words),
      |ucnt AS (SELECT t, COUNT(*) AS n FROM uni GROUP BY t),
      |bi AS (
      |  SELECT unnest(list_transform(range(len(w) - 1),
      |    i -> concat_ws(' ', w[i+1], w[i+2]))) AS bigram
      |  FROM words),
      |bcnt AS (SELECT bigram, COUNT(*) AS n_ab FROM bi GROUP BY bigram)
      |SELECT bigram, n_ab, ua.n AS n_a, ub.n AS n_b,
      |  (CAST((CAST(n_ab AS BIGINT) * 1000000)
      |    // CAST(ua.n AS BIGINT) AS DOUBLE) / 1000000.0) AS p_b_given_a,
      |  (CAST((CAST(n_ab AS BIGINT) * 1000000)
      |    // CAST(ub.n AS BIGINT) AS DOUBLE) / 1000000.0) AS p_a_given_b
      |FROM bcnt
      |JOIN ucnt ua ON string_split(bigram, ' ')[1] = ua.t
      |JOIN ucnt ub ON string_split(bigram, ' ')[2] = ub.t
      |ORDER BY n_ab DESC, bigram LIMIT 50""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_bigram_colloc", bigramColloc, Some(bigramCollocSql)),
    QueryDef("q_token_entropy", tokenEntropy, Some(tokenEntropySql)),
    QueryDef("q_bpe_tokens", bpeTokens, Some(bpeTokensSql)),
    QueryDef("q_text_normalize", textNormalize, Some(textNormalizeSql)),
    QueryDef("q_text_tokens", textTokens, Some(textTokensSql)),
    QueryDef("q_text_quality", textQuality, Some(textQualitySql)),
    QueryDef("q_lang_id", langId, Some(langIdSql)),
    QueryDef("q_text_fingerprint", textFingerprint, Some(textFingerprintSql)),
    QueryDef("q_binary_meta", binaryMeta, Some(binaryMetaSql)),
  )
}
