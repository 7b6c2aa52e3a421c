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

  /** Q17 shape — small-quantity-order revenue: for one brand's parts,
    * revenue of lineitems whose quantity is below 20% of that part's
    * average, scaled to a yearly figure. The correlated scalar subquery
    * (per-part avg) decorrelates into a per-part aggregate joined back;
    * the brand filter broadcasts into BOTH the fact scan and the
    * aggregate, so only that brand's lineitems are ever aggregated.
    * The avg comparison runs exact: qty < 0.2 * (sum/cnt) as
    * qty_c * 5 * cnt < sum_qty_c in integer cents. */
  def tpchQ17(spark: SparkSession, dir: String): DataFrame = {
    val parts = Star.table(spark, dir, "part")
      .filter(col("p_brand") === "Brand#23").select("p_partkey")
    val li = Star.table(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        Star.cents(col("l_quantity")).as("qty_c"),
        Star.cents(col("l_extendedprice")).as("price_c"))
    val perPart = li.groupBy("l_partkey")
      .agg(sum("qty_c").as("sum_qty_c"), count(lit(1)).as("cnt"))
    li.join(perPart, "l_partkey")
      .filter(col("qty_c") * 5L * col("cnt") < col("sum_qty_c"))
      .agg((coalesce(sum("price_c"), lit(0L)).cast("double") / 700.0)
        .as("avg_yearly"))
  }

  private val tpchQ17Sql =
    s"""WITH li AS (
       |  SELECT l_partkey,
       |    ${Star.Sql.cents("l_quantity")} AS qty_c,
       |    ${Star.Sql.cents("l_extendedprice")} AS price_c
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_brand = 'Brand#23'),
       |per_part AS (
       |  SELECT l_partkey, CAST(SUM(qty_c) AS BIGINT) AS sum_qty_c,
       |    COUNT(*) AS cnt
       |  FROM li GROUP BY l_partkey)
       |SELECT CAST(COALESCE(SUM(price_c), 0) AS DOUBLE) / 700.0
       |  AS avg_yearly
       |FROM li JOIN per_part USING (l_partkey)
       |WHERE qty_c * 5 * cnt < sum_qty_c""".stripMargin

  /** Q18 shape — large-volume customers: orders whose total quantity
    * exceeds 300, with their customer. The HAVING subquery is just a
    * pre-aggregation of the fact on its join key — one shuffle serves
    * both the filter and the final per-order sum. */
  def tpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val li = Star.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), Star.cents(col("l_quantity")).as("qty_c"))
    val bigOrders = li.groupBy("l_orderkey")
      .agg(sum("qty_c").as("sum_qty_c"))
      .filter(col("sum_qty_c") > 300L * 100L)
    val o = Star.table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val c = Star.table(spark, dir, "customer").select("c_custkey", "c_name")
    bigOrders
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        Star.cents(col("o_totalprice")).as("total_c"),
        (col("sum_qty_c").cast("double") / 100.0).as("sum_qty"))
      .orderBy(col("total_c").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  private val tpchQ18Sql =
    s"""WITH big AS (
       |  SELECT l_orderkey,
       |    CAST(SUM(${Star.Sql.cents("l_quantity")}) AS BIGINT) AS sum_qty_c
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING CAST(SUM(${Star.Sql.cents("l_quantity")}) AS BIGINT) > 30000)
       |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       |  ${Star.Sql.cents("o_totalprice")} AS total_c,
       |  CAST(sum_qty_c AS DOUBLE) / 100.0 AS sum_qty
       |FROM big
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY total_c DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin

  /** Q22 shape — prospective customers: per nation, customers with
    * above-average (positive) balance and no orders. The scalar avg
    * broadcasts; the no-orders test is a left-anti join against the
    * orders key set (at scale: the anti side aggregates to distinct
    * custkeys first, shrinking the shuffle to key cardinality). The
    * avg comparison is exact: bal_c * cnt > sum_c in integer cents. */
  def tpchQ22(spark: SparkSession, dir: String): DataFrame = {
    val cust = Star.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        Star.cents(col("c_acctbal")).as("bal_c"))
    val stats = cust.filter(col("bal_c") > 0)
      .agg(sum("bal_c").as("sum_c"), count(lit(1)).as("cnt"))
    val orderCust = Star.table(spark, dir, "orders")
      .select("o_custkey").distinct()
    cust.crossJoin(broadcast(stats))
      .filter(col("bal_c") * col("cnt") > col("sum_c"))
      .join(orderCust, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"),
        (sum("bal_c").cast("double") / 100.0).as("total_bal"))
      .orderBy("c_nationkey")
  }

  private val tpchQ22Sql =
    s"""WITH cust AS (
       |  SELECT c_custkey, c_nationkey,
       |    ${Star.Sql.cents("c_acctbal")} AS bal_c
       |  FROM customer),
       |stats AS (
       |  SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_c, COUNT(*) AS cnt
       |  FROM cust WHERE bal_c > 0)
       |SELECT c_nationkey, COUNT(*) AS n_cust,
       |  CAST(CAST(SUM(bal_c) AS BIGINT) AS DOUBLE) / 100.0 AS total_bal
       |FROM cust CROSS JOIN stats
       |WHERE bal_c * cnt > sum_c
       |  AND c_custkey NOT IN (SELECT o_custkey FROM orders)
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_tpch_q3", tpchQ3, Some(tpchQ3Sql)),
    QueryDef("q_tpch_q5", tpchQ5, Some(tpchQ5Sql)),
    QueryDef("q_tpch_q10", tpchQ10, Some(tpchQ10Sql)),
    QueryDef("q_tpch_q17", tpchQ17, Some(tpchQ17Sql)),
    QueryDef("q_tpch_q18", tpchQ18, Some(tpchQ18Sql)),
    QueryDef("q_tpch_q22", tpchQ22, Some(tpchQ22Sql)),
  )
}
