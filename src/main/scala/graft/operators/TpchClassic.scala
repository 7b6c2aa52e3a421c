package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic TPC-H-shaped analytics (Q3/Q5/Q10 adapted to the harness star
  * schema — it carries o_orderpriority instead of o_shippriority and
  * 1995-2001 dates). All revenue math runs in the exact integer cents
  * domain (`price_c * (100 - disc_c)`, see Star), so results are
  * bit-identical across engines and partitionings.
  *
  * Plan shapes (asserted in spirit by PlanSpec's broadcast tests): the
  * nation/region dims broadcast; customer⋈orders⋈lineitem are the real
  * shuffles, keyed so AQE can coalesce/skew-split; aggregates run
  * partial→final with map-side combine.
  */
object TpchClassic {

  private def revC = // exact cents x basis points: price_c * (100 - disc_c)
    (Star.cents(col("l_extendedprice")) *
      (lit(100L) - Star.cents(col("l_discount"))))

  private val revCSql =
    s"${Star.Sql.cents("l_extendedprice")} * (100 - ${Star.Sql.cents("l_discount")})"

  /** Q3 shape — shipping-priority: top-10 undelivered orders by revenue
    * for one customer segment at a date cutoff. */
  def tpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "1997-01-01"
    val c = Star.table(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Star.table(spark, dir, "orders")
      .filter(col("o_orderdate") < lit(cutoff))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Star.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit(cutoff))
      .select(col("l_orderkey"), revC.as("rev_c"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg((sum(col("rev_c")).cast("double") / 1e4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val tpchQ3Sql =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  CAST(SUM($revCSql) AS DOUBLE) / 1e4 AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < DATE '1997-01-01'
       |  AND l_shipdate > TIMESTAMP '1997-01-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q5 shape — local-supplier volume: revenue per nation within one
    * region where the supplying and ordering nations match. */
  def tpchQ5(spark: SparkSession, dir: String): DataFrame = {
    val region = Star.table(spark, dir, "region")
      .filter(col("r_name") === "ASIA")
    val nation = Star.table(spark, dir, "nation")
    val c = Star.table(spark, dir, "customer")
    val o = Star.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val l = Star.table(spark, dir, "lineitem")
    val s = Star.table(spark, dir, "supplier")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg((sum(revC).cast("double") / 1e4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val tpchQ5Sql =
    s"""SELECT n_name,
       |  CAST(SUM($revCSql) AS DOUBLE) / 1e4 AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |  AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= DATE '1996-01-01'
       |  AND o_orderdate < DATE '1997-01-01'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Q10 shape — returned-item reporting: top-20 customers by lost
    * revenue on returned lineitems in one quarter. */
  def tpchQ10(spark: SparkSession, dir: String): DataFrame = {
    val o = Star.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
    val l = Star.table(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
    val c = Star.table(spark, dir, "customer")
    val n = Star.table(spark, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
      .agg((sum(revC).cast("double") / 1e4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val tpchQ10Sql =
    s"""SELECT c_custkey, c_name, n_name, c_mktsegment,
       |  CAST(SUM($revCSql) AS DOUBLE) / 1e4 AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= DATE '1996-01-01'
       |  AND o_orderdate < DATE '1996-04-01'
       |GROUP BY c_custkey, c_name, n_name, c_mktsegment
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_tpch_q3", tpchQ3, Some(tpchQ3Sql)),
    QueryDef("q_tpch_q5", tpchQ5, Some(tpchQ5Sql)),
    QueryDef("q_tpch_q10", tpchQ10, Some(tpchQ10Sql)),
  )
}
