package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextNormalizeSpec extends SparkSuite {
  import spark.implicits._

  test("strip_accents removes diacritics, keeps base letters") {
    val in = Seq("São Paulo", "PRECIPITAÇÃO TOTAL, HORÁRIO", "über café",
      "plain ascii", "").toDF("s")
    val out = in.select(TextNormalize.stripAccents($"s")).as[String].collect()
    assert(out.toSeq === Seq("Sao Paulo", "PRECIPITACAO TOTAL, HORARIO",
      "uber cafe", "plain ascii", ""))
  }

  test("strip_accents agrees with DuckDB semantics on mixed unicode") {
    // values cross-checked against DuckDB strip_accents; the last three
    // pin CANONICAL (NFD) semantics — compatibility characters (NBSP,
    // ligatures, superscripts) must pass through unchanged, as in DuckDB.
    // NFKD would fold them and silently break oracle bit-parity.
    val cases = Map(
      "naïve résumé" -> "naive resume",
      "Mënchengladbach" -> "Menchengladbach",
      "ÀÉÎÕÜ àéîõü" -> "AEIOU aeiou",
      "a b" -> "a b",
      "ﬁle" -> "ﬁle",
      "x²" -> "x²")
    val got = cases.keys.toSeq.toDF("s")
      .select($"s", TextNormalize.stripAccents($"s")).as[(String, String)]
      .collect().toMap
    cases.foreach { case (k, v) => assert(got(k) === v, k) }
  }

  test("normalize pipeline: accents, case, whitespace") {
    val got = Seq("  HÉLLO   Wörld\t\tagain ").toDF("s")
      .select(TextNormalize.normalize($"s")).as[String].collect()(0)
    assert(got === "hello world again")
  }

  test("SQL registration + null safety") {
    TextNormalize.register(spark)
    val out = spark.sql("SELECT strip_accents('café'), strip_accents(NULL)")
      .collect()(0)
    assert(out.getString(0) === "cafe")
    assert(out.isNullAt(1))
  }
}
