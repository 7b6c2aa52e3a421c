package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — the temporal operator Spark lacks
  * natively. Composed from built-ins per the extension preference order
  * (compose > custom plan): both sides union into one stream tagged by
  * side, one shuffle partitions by key, an in-partition sort by
  * (timestamp, side) puts each right row before the left rows it may
  * match, and `last(..., ignoreNulls)` carries the right payload forward.
  *
  * Scale: exactly one shuffle on the join key + one in-partition sort —
  * the same cost profile as a sort-merge join, with no range-explosion
  * (contrast an inequality join, which Spark plans as a broadcast nested
  * loop). Skewed keys can be salted upstream if a single key's timeline
  * exceeds a partition. */
object AsOf {

  /** Left rows matched with the latest right row whose `rightTs <= leftTs`
    * for the same `key`. Output: all `left` columns + `rightPayload`
    * columns (null when no prior right row exists — left-join semantics).
    * Payload columns must not collide with left column names.
    *
    * The right payload is carried as ONE struct, so the matched columns
    * always come from the same right row — carrying columns independently
    * with last(ignoreNulls) would stitch values from different rows when
    * a payload field is null (row tearing). Right rows tied on timestamp
    * are resolved deterministically by the largest payload struct. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val lAligned = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .select(
        (col(key) +: col("__ts") +: col("__side") +:
          leftCols.filterNot(_ == key).map(col)) :+
          lit(null).cast(payloadType).as("__payload"): _*)
    val rAligned = right
      .withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
      .select(
        (col(key) +: col("__ts") +: col("__side") +:
          leftCols.filterNot(_ == key).map(c => lit(null).cast(
            left.schema(c).dataType).as(c))) :+
          struct(rightPayload.map(col): _*).as("__payload"): _*)
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn("__payload",
        last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"__payload.$c").as(c)): _*)
  }

  /** Registered instance: for every purchase event, the latest click by
    * the same user at-or-before the purchase, with the exact wait in
    * microseconds (integer — bit-portable). Oracle: DuckDB's native
    * ASOF LEFT JOIN. */
  def asofPurchaseClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Star.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    asofJoin(purchases, clicks, "user_id", "ts", "click_ts",
      Seq("click_id", "click_ts"))
      .select(col("user_id"), col("event_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("wait_us"))
      .orderBy("user_id", "event_id")
  }

  private val asofPurchaseClickSql =
    """WITH p AS (SELECT user_id, event_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |cl AS (SELECT user_id, event_id AS click_id, ts AS click_ts
      |       FROM events WHERE event_type = 'click')
      |SELECT p.user_id, p.event_id, cl.click_id,
      |  epoch_us(p.ts) - epoch_us(cl.click_ts) AS wait_us
      |FROM p ASOF LEFT JOIN cl
      |  ON p.user_id = cl.user_id AND p.ts >= cl.click_ts
      |ORDER BY p.user_id, p.event_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_asof_join", asofPurchaseClick, Some(asofPurchaseClickSql)),
  )
}
