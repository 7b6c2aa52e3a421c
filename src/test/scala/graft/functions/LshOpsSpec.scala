package graft.functions

import graft.SparkSuite
import graft.operators.{Similarity, Star}
import org.apache.spark.sql.functions._

/** Locks the codegen'd LshBands expression to the materialized
  * plane-table derivation it replaced. */
class LshOpsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("weight() matches the SQL xxhash64 plane derivation element-wise") {
    val fromSql = Similarity.planes(spark, 64)
      .orderBy("plane", "pos").collect()
      .map(r => (r.getInt(0).toLong * 64 + r.getInt(1), r.getDouble(2)))
    fromSql.foreach { case (id, w) =>
      assert(LshOps.weight(id) === w, s"weight mismatch at id $id")
    }
  }

  test("expression band keys equal the dataflow formulation on the corpus") {
    // the pre-round-4 dataflow form, inlined as the reference
    val e = Star.table(spark, sf, "embeddings")
      .select(col("vec_id"),
        posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))")))
      .withColumnRenamed("col", "x")
    val nb = Similarity.numPlanes / Similarity.numBands
    val reference = e
      .join(broadcast(Similarity.planes(spark, 64)), Seq("pos"))
      .groupBy("vec_id", "plane")
      .agg(sum(col("x") * col("weight")).as("proj"))
      .select(col("vec_id"), col("plane"),
        when(col("proj") > 0, 1L).otherwise(0L).as("bit"))
      .groupBy(col("vec_id"), (col("plane") / nb).cast("int").as("band_id"))
      .agg(sum(col("bit") * expr(
        s"CAST(shiftleft(1, CAST(plane % $nb AS INT)) AS BIGINT)"))
        .as("band_bucket"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = Similarity.lshBands(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.size === reference.size)
    // sign tests may only diverge if an aggregate-ordered projection sum
    // lands exactly on a rounding boundary — assert full equality and
    // surface any such case explicitly
    val diffs = reference.collect {
      case (k, v) if got(k) != v => (k, v, got(k))
    }
    assert(diffs.isEmpty, s"band mismatches: ${diffs.take(5)}")
  }
}
