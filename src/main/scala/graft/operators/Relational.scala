package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.{GraftQuery, Tables}

/** Deterministic exact aggregation helpers.
  *
  * Double-precision SUMs are order-dependent, and Spark's partial/final
  * aggregation order differs from DuckDB's — so a raw `sum(double)` is not
  * reproducible bit-for-bit by the oracle. Casting each row to
  * DECIMAL(30,6) first makes the addition exact and order-independent; the
  * final cast back to double is then a single well-defined conversion both
  * engines agree on.
  */
object Exact {
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast(DoubleType)

  /** Oracle-side rendering of [[dsum]]. The decimal→double step routes
    * through VARCHAR: DuckDB's direct `CAST(DECIMAL AS DOUBLE)`
    * double-rounds once `value × 10^scale` exceeds 2^53 (int → double,
    * then ÷10^scale — measured 1-ulp drift on sf0.1 power sums), while
    * its string→double is correctly rounded, matching Spark's
    * `BigDecimal.doubleValue`. Below 2^53 the two paths are identical,
    * so this is strictly more correct at every scale factor. */
  def oDsum(e: String): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)"

  /** Variant with explicit scale — still keep per-row `value × 10^scale`
    * representable in DECIMAL(30); the group sum may exceed 2^53 freely
    * now that the conversion is correctly rounded on both engines. */
  def dsumS(c: Column, scale: Int): Column = sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  def oDsumS(e: String, scale: Int): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(30,$scale))) AS VARCHAR) AS DOUBLE)"
}

/** Relational operator coverage (SURVEY.md §2.2): scans, filters, joins of
  * every flavor, hash/rollup/cube aggregation, windows, set ops, scalar
  * function families, distinct/approx-distinct, range join, and the
  * UDAF surface. Each query reads only the columns it needs (column pruning
  * reaches the parquet scan) and broadcasts genuinely-small dimension sides.
  */
object Relational {
  import Exact._

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1 shape: multi-function hash aggregate over lineitem.
    * At scale: partial aggregation map-side, 6 groups — shuffle is tiny. */
  private def q01(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02")))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q01Oracle =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${oDsum("l_quantity")} AS sum_qty,
       |  ${oDsum("l_extendedprice")} AS sum_base_price,
       |  ${oDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS sum_disc_price,
       |  ${oDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) * (CAST(1 AS DOUBLE) + l_tax)")} AS sum_charge,
       |  ${oDsum("l_quantity")} / COUNT(*) AS avg_qty,
       |  ${oDsum("l_extendedprice")} / COUNT(*) AS avg_price,
       |  ${oDsum("l_discount")} / COUNT(*) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Predicate scan: filter + projection, both pushed to the parquet scan. */
  private def q02(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07) &&
          col("l_quantity") < lit(24.0))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  private val q02Oracle =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
      |  AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Broadcast hash join: fact × small dimension. `broadcast(part)` keeps
    * the big side shuffle-free — the only movement is the final 25-group agg. */
  private def q03(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    val part = Tables(spark, dir, "part").select("p_partkey", "p_brand")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  private val q03Oracle =
    s"""SELECT p_brand,
       |  ${oDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Shuffle (sort-merge/shuffled-hash — left to Catalyst+AQE) join of two
    * mid-size tables on the natural key. */
  private def q04(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders").select("o_custkey", "o_orderstatus", "o_totalprice")
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    orders.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("c_mktsegment", "o_orderstatus")
  }

  private val q04Oracle =
    s"""SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n_orders,
       |  ${oDsum("o_totalprice")} AS sum_price
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment, o_orderstatus
       |ORDER BY c_mktsegment, o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q05
  /** Left-semi join (EXISTS): customers holding at least one big order. */
  private def q05(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > lit(400000.0)).select("o_custkey")
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    val nation = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
    cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy("n_name")
  }

  private val q05Oracle =
    s"""SELECT n_name, COUNT(*) AS n_customers, ${oDsum("c_acctbal")} AS sum_acctbal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > CAST(400000 AS DOUBLE))
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Left-anti join (NOT EXISTS): customers with no order above the bar. */
  private def q06(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > lit(450000.0)).select("o_custkey")
    Tables(spark, dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy("c_mktsegment")
  }

  private val q06Oracle =
    s"""SELECT c_mktsegment, COUNT(*) AS n_customers, ${oDsum("c_acctbal")} AS sum_acctbal
       |FROM customer
       |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > CAST(450000 AS DOUBLE))
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Top-k per group via row_number window; deterministic tie-break. */
  private def q07(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    graft.api.Ops.topKPerGroup(
        orders.join(cust, col("o_custkey") === col("c_custkey")),
        partCols = Seq("c_mktsegment"),
        order = Seq(col("o_totalprice").desc, col("o_orderkey")), k = 3)
      .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
      .orderBy("c_mktsegment", "rn")
  }

  private val q07Oracle =
    """SELECT c_mktsegment, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey) t
      |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Running/lag/lead window frame. Quantities are whole numbers, so the
    * cumulative double sum is exact and order-determined by the frame. */
  private def q08(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_suppkey") < 10)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    li.withColumn("running_qty", sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
      .withColumn("next_qty", lead(col("l_quantity"), 1).over(w))
      .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
  }

  private val q08Oracle =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
      |  SUM(l_quantity) OVER w AS running_qty,
      |  lag(l_quantity, 1) OVER w AS prev_qty,
      |  lead(l_quantity, 1) OVER w AS next_qty
      |FROM lineitem WHERE l_suppkey < 10
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS UNBOUNDED PRECEDING)
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q09
  /** ROLLUP hierarchy totals; grouping nulls coalesced to a sentinel so
    * null-ordering differences between engines can't bite. */
  private def q09(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n_rows"))
      .orderBy("returnflag", "linestatus")

  private val q09Oracle =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, COALESCE(l_linestatus, 'ALL') AS linestatus,
       |  sum_qty, n_rows
       |FROM (
       |  SELECT l_returnflag, l_linestatus, ${oDsum("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
       |  FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)) t
       |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q10
  /** CUBE over two order dimensions. */
  private def q10(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").select("o_orderpriority", "o_orderstatus", "o_totalprice")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("sum_price"))
      .orderBy("priority", "status")

  private val q10Oracle =
    s"""SELECT COALESCE(o_orderpriority, 'ALL') AS priority, COALESCE(o_orderstatus, 'ALL') AS status,
       |  n_orders, sum_price
       |FROM (
       |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders, ${oDsum("o_totalprice")} AS sum_price
       |  FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)) t
       |ORDER BY priority, status""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Set operators: INTERSECT / EXCEPT with set semantics. */
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    def custOfYear(yr: Int): DataFrame =
      Tables(spark, dir, "orders")
        .filter(year(col("o_orderdate")) === yr)
        .select("o_custkey").distinct()
    custOfYear(1995).intersect(custOfYear(1996)).except(custOfYear(2000))
      .orderBy("o_custkey")
  }

  private val q11Oracle =
    """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995),
      |     y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996),
      |     y00 AS (SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 2000)
      |SELECT o_custkey FROM (
      |  (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
      |  EXCEPT SELECT o_custkey FROM y00) t
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q12
  /** String function family: regexp_extract, lower, substring, length. */
  private def q12(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part").select("p_type", "p_brand", "p_name", "p_size")
      .groupBy(regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_word"))
      .agg(
        count(lit(1)).as("n_parts"),
        min(lower(col("p_brand"))).as("min_brand"),
        max(substring(col("p_name"), 1, 5)).as("max_name5"),
        sum(length(col("p_name"))).as("sum_name_len"),
        min(col("p_size")).as("min_size"))
      .orderBy("type_word")

  private val q12Oracle =
    """SELECT regexp_extract(p_type, '^(\w+)', 1) AS type_word,
      |  COUNT(*) AS n_parts,
      |  MIN(lower(p_brand)) AS min_brand,
      |  MAX(substring(p_name, 1, 5)) AS max_name5,
      |  CAST(SUM(length(p_name)) AS BIGINT) AS sum_name_len,
      |  MIN(p_size) AS min_size
      |FROM part GROUP BY 1 ORDER BY type_word""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Date/time functions: year/month buckets. */
  private def q13(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").select("o_orderdate", "o_totalprice")
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("yr", "mo")

  private val q13Oracle =
    s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
       |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
       |  COUNT(*) AS n_orders, ${oDsum("o_totalprice")} AS sum_price
       |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin

  // ---------------------------------------------------------------- q14
  /** JSON extraction from the events.props string column. */
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").select(
      col("event_type"),
      get_json_object(col("props"), "$.k").cast("int").as("k"),
      col("value"))
    ev.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"),
        dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  private val q14Oracle =
    s"""SELECT event_type, COUNT(*) AS n_events,
       |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS DOUBLE) / COUNT(*) AS avg_k,
       |  ${oDsum("value")} AS sum_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Array/higher-order functions over ArrayType(FloatType) embeddings:
    * ordered-fold L2 norm, size, element access. */
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps
    Tables(spark, dir, "embeddings").select(
      col("vec_id"),
      VectorOps.norm(col("embedding")).as("l2_norm"),
      size(col("embedding")).as("dim"),
      element_at(col("embedding"), 1).cast("double").as("first_val"))
      .orderBy("vec_id")
  }

  private val q15Oracle =
    """SELECT vec_id,
      |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm,
      |  CAST(len(embedding) AS INTEGER) AS dim,
      |  CAST(embedding[1] AS DOUBLE) AS first_val
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Exact distinct aggregation (expand + two-phase under the hood). */
  private def q16(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem").select("l_returnflag", "l_partkey", "l_suppkey")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  private val q16Oracle =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts,
      |  COUNT(DISTINCT l_suppkey) AS nd_supps, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Approximate distinct (HyperLogLog++). Sketch internals differ across
    * engines, so no SQL oracle — driver does the rows-only check. */
  private def q17(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem").select("l_returnflag", "l_partkey")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_nd_parts"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q18
  /** Range (theta) join against a small banding dimension — broadcast
    * nested-loop on a 4-row side, so still cheap at any scale. */
  private def q18(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("p1_low", 0.0, 100000.0),
      ("p2_mid", 100000.0, 250000.0),
      ("p3_high", 250000.0, 400000.0),
      ("p4_top", 400000.0, 600000.0)).toDF("band", "lo", "hi")
    Tables(spark, dir, "orders").select("o_totalprice")
      .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("band")
  }

  private val q18Oracle =
    s"""SELECT band, COUNT(*) AS n_orders, ${oDsum("o_totalprice")} AS sum_price
       |FROM orders JOIN (VALUES
       |  ('p1_low', CAST(0 AS DOUBLE), CAST(100000 AS DOUBLE)),
       |  ('p2_mid', CAST(100000 AS DOUBLE), CAST(250000 AS DOUBLE)),
       |  ('p3_high', CAST(250000 AS DOUBLE), CAST(400000 AS DOUBLE)),
       |  ('p4_top', CAST(400000 AS DOUBLE), CAST(600000 AS DOUBLE))) b(band, lo, hi)
       |  ON o_totalprice >= lo AND o_totalprice < hi
       |GROUP BY band ORDER BY band""".stripMargin

  // ---------------------------------------------------------------- q24 (UDAF)
  /** Typed Aggregator (the generalized `MapReducer.reduce` surface,
    * reference src/map_reduce.rs:6): exact weighted average via scaled-long
    * sums — order-independent, so partial/final merge order can't change
    * the answer. */
  private def q24(spark: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(WeightedAvgAgg)
    Tables(spark, dir, "lineitem").select("l_returnflag", "l_extendedprice", "l_quantity")
      .groupBy("l_returnflag")
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  private val q24Oracle =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * l_quantity * 10000) AS BIGINT)) AS DOUBLE)
      |    / CAST(SUM(CAST(ROUND(l_quantity * 10000) AS BIGINT)) AS DOUBLE) AS wavg_price,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q01_pricing_summary", q01, Some(q01Oracle)),
    GraftQuery("q02_filter_project", q02, Some(q02Oracle)),
    GraftQuery("q03_join_broadcast", q03, Some(q03Oracle)),
    GraftQuery("q04_join_shuffle", q04, Some(q04Oracle)),
    GraftQuery("q05_join_semi", q05, Some(q05Oracle)),
    GraftQuery("q06_join_anti", q06, Some(q06Oracle)),
    GraftQuery("q07_window_topk", q07, Some(q07Oracle)),
    GraftQuery("q08_window_running", q08, Some(q08Oracle)),
    GraftQuery("q09_rollup_agg", q09, Some(q09Oracle)),
    GraftQuery("q10_cube_agg", q10, Some(q10Oracle)),
    GraftQuery("q11_set_ops", q11, Some(q11Oracle)),
    GraftQuery("q12_string_funcs", q12, Some(q12Oracle)),
    GraftQuery("q13_date_funcs", q13, Some(q13Oracle)),
    GraftQuery("q14_json_funcs", q14, Some(q14Oracle)),
    GraftQuery("q15_array_funcs", q15, Some(q15Oracle)),
    GraftQuery("q16_distinct_agg", q16, Some(q16Oracle)),
    GraftQuery("q17_approx_distinct", q17, None),
    GraftQuery("q18_range_join", q18, Some(q18Oracle)),
    GraftQuery("q24_weighted_avg_udaf", q24, Some(q24Oracle)))
}

/** Exact weighted average over (value, weight) rows. Accumulates
  * `round(value*weight*1e4)` and `round(weight*1e4)` as longs — exact
  * integer sums, so the aggregation is associative/commutative and the
  * result is independent of partition order (SURVEY.md §5 property #3).
  */
object WeightedAvgAgg extends Aggregator[(Double, Double), (Long, Long), Double] {
  def zero: (Long, Long) = (0L, 0L)
  def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
    (b._1 + math.round(a._1 * a._2 * 10000.0), b._2 + math.round(a._2 * 10000.0))
  def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) = (a._1 + b._1, a._2 + b._2)
  def finish(r: (Long, Long)): Double = r._1.toDouble / r._2.toDouble
  def bufferEncoder: org.apache.spark.sql.Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  def outputEncoder: org.apache.spark.sql.Encoder[Double] = Encoders.scalaDouble
}
