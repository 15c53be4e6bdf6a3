package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import Exact.{dsum, oDsum}

/** Multi-way-join showcase queries in classic TPC-H shapes (Q3/Q5/Q10),
  * adapted to the testdata's value ranges. These exercise join ordering,
  * mixed broadcast/shuffle strategies, selective predicates on several
  * tables at once, and top-k on computed aggregates — the plans that
  * actually matter at warehouse scale.
  */
object TpchShapes {

  // ---------------------------------------------------------------- q46 (TPC-H Q3 shape)
  /** Revenue of BUILDING-segment orders shipped after the cutoff: 3-way
    * join with per-table pushed filters, top-10 by computed revenue. */
  private def q46(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > to_timestamp(lit("1997-01-01")))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderkey", "o_orderdate")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q46Oracle =
    s"""SELECT o_orderkey, o_orderdate, ${oDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1997-01-01'
       |  AND EXISTS (SELECT 1 FROM customer
       |              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
       |GROUP BY o_orderkey, o_orderdate
       |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q47 (TPC-H Q5 shape)
  /** Revenue by nation where supplier and customer share the nation —
    * 6-table join with three broadcast dims and a co-nation predicate. */
  private def q47(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region").filter(col("r_name") === "ASIA").select("r_regionkey")
    val nation = Tables(spark, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val ord = Tables(spark, dir, "orders")
      .filter(year(col("o_orderdate")) === 1996).select("o_orderkey", "o_custkey")
    val li = Tables(spark, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val supp = Tables(spark, dir, "supplier").select("s_suppkey", "s_nationkey")

    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"), "left_semi")
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q47Oracle =
    s"""SELECT n_name, ${oDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |WHERE EXTRACT(year FROM o_orderdate) = 1996
       |  AND EXISTS (SELECT 1 FROM region WHERE r_regionkey = n_regionkey AND r_name = 'ASIA')
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q48 (TPC-H Q10 shape)
  /** Top 20 customers by returned-item revenue in a half-year window. */
  private def q48(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R").select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-07-01")))
      .select("o_orderkey", "o_custkey")
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val nation = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q48Oracle =
    s"""SELECT c_custkey, c_name, n_name, c_acctbal,
       |  ${oDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS revenue
       |FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
       |GROUP BY c_custkey, c_name, n_name, c_acctbal
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Analytic rank family: ntile / percent_rank / cume_dist (exact
    * rationals — cross-engine deterministic with a total tie-break). */
  private def q49(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables(spark, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .join(Tables(spark, dir, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("o_totalprice") > 450000.0)
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first(col("o_orderkey")).over(w).as("cheapest_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
      .orderBy("c_mktsegment", "o_totalprice", "o_orderkey")
  }

  private val q49Oracle =
    """SELECT c_mktsegment, o_orderkey, o_totalprice,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  first_value(o_orderkey) OVER w AS cheapest_key,
      |  nth_value(o_orderkey, 2) OVER w AS second_key
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_totalprice > CAST(450000 AS DOUBLE)
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY c_mktsegment, o_totalprice, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q54
  /** Left outer join: every customer, with counts over a filtered order
    * set — unmatched customers keep a 0 count (COUNT of a null column). */
  private def q54(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    val big = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > lit(480000.0)).select("o_custkey", "o_orderkey")
    cust.join(big, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_mktsegment")
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        count(col("o_orderkey")).as("n_big_orders"),
        countDistinct(when(col("o_orderkey").isNull, col("c_custkey"))).as("n_without_big"))
      .orderBy("c_mktsegment")
  }

  private val q54Oracle =
    """SELECT c_mktsegment,
      |  COUNT(DISTINCT c_custkey) AS n_customers,
      |  COUNT(o_orderkey) AS n_big_orders,
      |  COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_without_big
      |FROM customer LEFT OUTER JOIN
      |  (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > CAST(480000 AS DOUBLE)) o
      |  ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q55
  /** Full outer join: event-active users vs the customer base — matched,
    * left-only and right-only cardinalities in one pass. */
  private def q55(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables(spark, dir, "events").select(col("user_id")).distinct()
    val cust = Tables(spark, dir, "customer").select("c_custkey")
    users.join(cust, col("user_id") === col("c_custkey"), "full_outer")
      .agg(
        count(when(col("user_id").isNotNull && col("c_custkey").isNotNull, 1)).as("n_matched"),
        count(when(col("c_custkey").isNull, 1)).as("n_users_only"),
        count(when(col("user_id").isNull, 1)).as("n_customers_only"))
  }

  private val q55Oracle =
    """SELECT
      |  COUNT(CASE WHEN user_id IS NOT NULL AND c_custkey IS NOT NULL THEN 1 END) AS n_matched,
      |  COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS n_users_only,
      |  COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS n_customers_only
      |FROM (SELECT DISTINCT user_id FROM events) u
      |FULL OUTER JOIN customer ON user_id = c_custkey""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q46_tpch_q3_shape", q46, Some(q46Oracle)),
    GraftQuery("q47_tpch_q5_shape", q47, Some(q47Oracle)),
    GraftQuery("q48_tpch_q10_shape", q48, Some(q48Oracle)),
    GraftQuery("q49_window_ranks", q49, Some(q49Oracle)),
    GraftQuery("q54_left_outer_join", q54, Some(q54Oracle)),
    GraftQuery("q55_full_outer_join", q55, Some(q55Oracle)))
}
