package graft.inmet

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Property-based coverage of the cleansing scalars (SURVEY.md §5.4):
  * decimal-comma round-trips, date-parser totality across the three INMET
  * formats, calendar density. ScalaCheck generators drive the cases; each
  * property is evaluated in one Spark pass (generate inputs -> single
  * DataFrame -> assert on results). */
class IngestPropertySpec extends SparkSuite {
  import spark.implicits._

  test("commaDouble round-trips any 0-4 decimal numeral written with a comma") {
    val gen = for {
      sign <- Gen.oneOf("", "-")
      whole <- Gen.choose(0L, 999999L)
      decimals <- Gen.choose(0, 4)
      frac <- Gen.listOfN(decimals, Gen.choose(0, 9))
    } yield {
      val s = if (decimals == 0) s"$sign$whole"
      else s"$sign$whole,${frac.mkString}"
      val expected = s.replace(',', '.').toDouble
      (s, expected)
    }
    val cases = Gen.listOfN(300, gen).sample.get
    val got = cases.map(_._1).toDF("s")
      .select(Ingest.commaDouble($"s")).as[Option[Double]].collect()
    cases.map(_._2).zip(got).foreach { case (want, gotV) =>
      assert(gotV.contains(want), s"expected $want got $gotV")
    }
  }

  test("parseDateFlexible is total: every generated date parses in all three formats") {
    val dates = Gen.listOfN(200, Gen.choose(0L, 20000L)).sample.get
      .map(LocalDate.ofEpochDay)
    val rows = dates.flatMap { d =>
      Seq(
        d.format(DateTimeFormatter.ofPattern("yyyy/MM/dd")) -> d,
        d.format(DateTimeFormatter.ofPattern("dd/MM/yyyy")) -> d,
      ) ++ (if (d.getYear >= 2000 && d.getYear < 2080)
        // dd/MM/yy resolves 2-digit years into [2000, 2080) in both
        // the engine and pandas' dayfirst heuristic for this data
        Seq(d.format(DateTimeFormatter.ofPattern("dd/MM/yy")) -> d)
      else Seq.empty)
    }
    val got = rows.map(_._1).toDF("s")
      .select(Ingest.parseDateFlexible($"s")).as[Option[java.sql.Date]]
      .collect()
    rows.zip(got).foreach { case ((s, want), gotV) =>
      assert(gotV.map(_.toLocalDate).contains(want), s"'$s' -> $gotV != $want")
    }
  }

  test("parseDateFlexible never throws on arbitrary junk (coerce-to-null)") {
    val junk = Gen.listOfN(300,
      Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr,
        Gen.const("99/99/9999"), Gen.const("0000/00/00"),
        Gen.const("2025/13/40"), Gen.const("///"), Gen.const("12/34")))
      .sample.get
    // must evaluate without exception under ANSI defaults; result is
    // null-or-valid for every row
    val out = junk.toDF("s")
      .select(Ingest.parseDateFlexible($"s")).as[Option[java.sql.Date]]
      .collect()
    assert(out.length === junk.length)
  }

  test("calendar density: sequence covers every day exactly once for random ranges") {
    val ranges = Gen.listOfN(30, for {
      a <- Gen.choose(10000L, 21000L)
      len <- Gen.choose(0L, 500L)
    } yield (a, a + len)).sample.get
    val df = ranges.toDF("a", "b")
      .select(
        col("a"), col("b"),
        explode(sequence(
          to_date(from_unixtime(col("a") * 86400)),
          to_date(from_unixtime(col("b") * 86400)))).as("d"))
    val counts = df.groupBy("a", "b").agg(
      count(lit(1)).as("n"),
      countDistinct(col("d")).as("nd"))
      .collect()
    counts.foreach { r =>
      val want = r.getLong(1) - r.getLong(0) + 1
      assert(r.getLong(2) === want)
      assert(r.getLong(3) === want)
    }
  }
}
