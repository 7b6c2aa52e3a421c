package graft.sources

import graft.SparkSuite
import graft.operators.Star
import org.apache.spark.sql.functions._
import java.nio.file.{Files => JFiles}

class SourcesSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  test("listFiles enumerates the fixture CSVs via the Hadoop FS API") {
    val files = Files.listFiles(spark, resourcePath("/inmet"), ".csv")
    assert(files.length === 3)
    assert(files.forall(_.endsWith(".csv")))
    assert(Files.listFiles(spark, "/nonexistent-dir-xyz") === Seq.empty)
  }

  test("skipLines drops exactly the metadata block of one INMET file") {
    val f = resourcePath("/inmet/INMET_SE_MG_A507_UBERLANDIA.csv")
    val body = Files.skipLines(spark, f, 8)
    assert(body.count() === 4345L) // header + 4344 data rows
    assert(body.first().startsWith("Data;"))
  }

  test("round-trips through json, orc, and csv sources preserve data") {
    val src = Star.table(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    val base = JFiles.createTempDirectory("fmt").toString
    def key(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("c_custkey").collect()
        .map(r => (r.getLong(0), r.getString(1),
          math.round(r.getDouble(2) * 100))).toSeq
    val want = key(src)

    src.write.mode("overwrite").json(s"$base/j")
    assert(key(spark.read.schema(src.schema).json(s"$base/j")) === want)

    src.write.mode("overwrite").orc(s"$base/o")
    assert(key(spark.read.orc(s"$base/o")) === want)

    src.write.mode("overwrite").option("header", "true").csv(s"$base/c")
    assert(key(spark.read.option("header", "true").schema(src.schema)
      .csv(s"$base/c")) === want)
  }
}
