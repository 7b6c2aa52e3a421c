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

  /** Exact salted equi-join: the big side gets a random-but-deterministic
    * salt, the small side is replicated across all `salts` values, and the
    * join keys on (key, salt) — so one hot key spreads over `salts`
    * reducers instead of pinning one. The replicate-small/salt-big form is
    * the manual fix for skewed SHUFFLE joins whose build side is too big
    * to broadcast; results are identical to the unsalted join for any
    * row->salt assignment. (AQE's skew-join split covers most cases at
    * runtime; the explicit form is for engines/paths where it can't, e.g.
    * under a required output partitioning.) */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts >= 1)
    val b = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Brand revenue via the salted join path; oracle = the plain join. */
  def saltedBrandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Star.table(spark, dir, "lineitem")
      .select(col("l_partkey").as("p_partkey"),
        Star.cents(col("l_extendedprice")).as("price_c"))
    val part = Star.table(spark, dir, "part").select("p_partkey", "p_brand")
    saltedJoin(li, part, "p_partkey")
      .groupBy("p_brand")
      .agg(sum(col("price_c")).as("revenue_c"), count(lit(1)).as("n"))
      .orderBy("p_brand")
  }

  private val saltedBrandRevenueSql =
    s"""SELECT p_brand,
       |  CAST(SUM(${Star.Sql.cents("l_extendedprice")}) AS BIGINT)
       |    AS revenue_c,
       |  COUNT(*) AS n
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_salted_agg", saltedPricing, Some(saltedPricingSql)),
    QueryDef("q_salted_join", saltedBrandRevenue, Some(saltedBrandRevenueSql)),
  )
}
