package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins BOTH historical on-disk layouts of the `events` table so neither
  * branch of [[Star.events]] bit-rots when testdata regenerates:
  *
  *  - TIMESTAMP(NANOS, isAdjustedToUTC=false) — what the driver shipped
  *    through round 5; Spark's vectorized reader can't decode it as a
  *    timestamp, so the loader reads raw int64 nanos
  *    (legacy.parquet.nanosAsLong) and truncates to micros, and
  *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) — the round-6+ layout,
  *    read natively as session-TZ TIMESTAMP under the loader's own
  *    inferTimestampNTZ=false pin.
  *
  * Testdata only carries one layout at a time, so the spec WRITES a tiny
  * copy of each annotation via the parquet Group API (the writer below is
  * the only way to produce a NANOS annotation on the JVM — Spark itself
  * can't write it) and asserts the loader yields identical micro-precision
  * rows from both. */
class EventsLayoutSpec extends SparkSuite {

  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.hadoop.util.HadoopOutputFile
  import org.apache.parquet.schema.LogicalTypeAnnotation
  import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
  import org.apache.parquet.schema.Types

  // micros chosen to exercise sub-millisecond precision and a value whose
  // nanos representation does not round-trip through doubles exactly
  private val rows = Seq(
    1L -> 1735689600000001L, // 2025-01-01 00:00:00.000001 UTC
    2L -> 1735693199999999L,
    3L -> 1735696800123456L)

  private def writeEvents(dir: java.nio.file.Path, unit: TimeUnit,
      scale: Long): Unit = {
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, unit))
      .named("ts")
      .named("events")
    val conf = spark.sparkContext.hadoopConfiguration
    val out = HadoopOutputFile.fromPath(
      new org.apache.hadoop.fs.Path(dir.resolve("events.parquet").toString),
      conf)
    val writer = ExampleParquetWriter.builder(out).withType(schema)
      .withConf(conf).build()
    val factory = new SimpleGroupFactory(schema)
    rows.foreach { case (id, us) =>
      val g = factory.newGroup()
      g.add("event_id", id)
      g.add("ts", us * scale)
      writer.write(g)
    }
    writer.close()
  }

  test("NANOS and MICROS events layouts load to identical micro-precision rows") {
    val nanosDir = java.nio.file.Files.createTempDirectory("graft_ev_nanos")
    val microsDir = java.nio.file.Files.createTempDirectory("graft_ev_micros")
    writeEvents(nanosDir, TimeUnit.NANOS, 1000L)
    writeEvents(microsDir, TimeUnit.MICROS, 1L)

    def load(dir: java.nio.file.Path): Seq[(Long, Long)] =
      Star.events(spark, dir.toString)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

    val nanos = load(nanosDir)
    val micros = load(microsDir)
    assert(nanos === rows.sorted, "NANOS branch must truncate to exact micros")
    assert(micros === rows.sorted, "MICROS branch must read exact micros")
    assert(nanos === micros)
    // and the loaded column is a session-TZ TIMESTAMP (not NTZ) on both
    Seq(nanosDir, microsDir).foreach { d =>
      assert(Star.events(spark, d.toString).schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
    }
  }

  test("NTZ arm: a footer-inferred NTZ ts reinterprets as the same UTC instant") {
    // simulate a caller session that read the footer BEFORE any pin: build
    // an NTZ frame directly and run it through the same conversion the
    // loader's TimestampNTZType arm applies
    import spark.implicits._
    val ntz = rows.toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    assert(ntz.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    val back = ntz
      .withColumn("ts", to_utc_timestamp(col("ts"), "UTC"))
    assert(back.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val got = back.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === rows.sorted)
  }
}
