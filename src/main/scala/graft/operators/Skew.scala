package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators.
  *
  * At 100 TB a single hot group key (one station, one brand, one language)
  * can pin an entire aggregation on one reducer. `saltedAgg` is the
  * standard fix: stage 1 aggregates on (key, salt) so a hot key spreads
  * over `salts` reducers; stage 2 merges the partials. Only decomposable
  * aggregates participate (sum/min/max/count — count merges by sum), which
  * keeps both stages exact. Joins don't need this: AQE's skew-join
  * splitting (`spark.sql.adaptive.skewJoin.enabled`, default on) already
  * re-plans hot partitions at runtime.
  */
object Skew {

  sealed trait Agg { def col: String; def alias: String }
  final case class SaltedSum(col: String, alias: String) extends Agg
  final case class SaltedMin(col: String, alias: String) extends Agg
  final case class SaltedMax(col: String, alias: String) extends Agg
  final case class SaltedCount(alias: String) extends Agg { val col = "" }

  /** Exact two-stage salted aggregation. The salt is derived from
    * `monotonically_increasing_id` (cheap, no RNG state); any row->salt
    * assignment yields identical results because every participating
    * aggregate is commutative-associative. */
  def saltedAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Agg],
                salts: Int = 64): DataFrame = {
    require(salts >= 1)
    val partialAggs: Seq[Column] = aggs.map {
      case SaltedSum(c, a) => sum(col(c)).as(a)
      case SaltedMin(c, a) => min(col(c)).as(a)
      case SaltedMax(c, a) => max(col(c)).as(a)
      case SaltedCount(a) => count(lit(1)).as(a)
    }
    val mergeAggs: Seq[Column] = aggs.map {
      case SaltedSum(_, a) => sum(col(a)).as(a)
      case SaltedMin(_, a) => min(col(a)).as(a)
      case SaltedMax(_, a) => max(col(a)).as(a)
      case SaltedCount(a) => sum(col(a)).as(a) // counts merge by sum
    }
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** The salted plan must produce byte-identical results to the direct
    * group-by, so its oracle is simply the unsalted SQL. Aggregates are in
    * the exact cents domain (long sums) so two-stage merging is lossless. */
  def saltedPricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Star.table(spark, dir, "lineitem")
      .withColumn("price_c", Star.cents(col("l_extendedprice")))
      .withColumn("qty_c", Star.cents(col("l_quantity")))
    saltedAgg(li, Seq("l_returnflag"), Seq(
      SaltedSum("price_c", "sum_price_c"),
      SaltedSum("qty_c", "sum_qty_c"),
      SaltedMin("price_c", "min_price_c"),
      SaltedMax("price_c", "max_price_c"),
      SaltedCount("n")), salts = 16)
      .select(col("l_returnflag"),
        (col("sum_price_c").cast("double") / 100.0).as("sum_price"),
        (col("sum_qty_c").cast("double") / 100.0).as("sum_qty"),
        (col("min_price_c").cast("double") / 100.0).as("min_price"),
        (col("max_price_c").cast("double") / 100.0).as("max_price"),
        col("n"))
      .orderBy("l_returnflag")
  }

  private val saltedPricingSql =
    s"""SELECT l_returnflag,
       |  CAST(SUM(${Star.Sql.cents("l_extendedprice")}) AS DOUBLE) / 100.0 AS sum_price,
       |  CAST(SUM(${Star.Sql.cents("l_quantity")}) AS DOUBLE) / 100.0 AS sum_qty,
       |  CAST(MIN(${Star.Sql.cents("l_extendedprice")}) AS DOUBLE) / 100.0 AS min_price,
       |  CAST(MAX(${Star.Sql.cents("l_extendedprice")}) AS DOUBLE) / 100.0 AS max_price,
       |  COUNT(*) AS n
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_salted_agg", saltedPricing, Some(saltedPricingSql)),
  )
}
