package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.{GraftQuery, Scratch, Tables}

/** Round-2 operator widening: unpivot/melt, conditional aggregation,
  * interval RANGE window frames, first/last/nth window values, skew-salted
  * joins, higher-order array functions, regexp extraction, three-valued
  * null logic, histogram bucketing, date-spine generators, and SQL LATERAL
  * joins. The reference has none of these (SURVEY.md §2.2 — its only
  * operators are scan/map/group/reduce over string KV pairs,
  * src/map_reduce.rs:4-7); they complete the generalized analytics surface
  * the north star mandates, each as a declarative plan Catalyst can
  * optimize end-to-end.
  */
object Extended {
  import Exact._

  // ---------------------------------------------------------------- q56
  /** Unpivot/melt: wide metric columns to long (id, metric, val) form —
    * narrow projection feeds the scan, generator output is codegen'd. */
  private def q56(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "metric", "val")
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
      // `val` joins the sort key — rows that still tie are fully identical.
      .orderBy("l_orderkey", "l_linenumber", "metric", "val")

  private val q56Oracle =
    """SELECT l_orderkey, l_linenumber, metric, val
      |FROM (UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
      |               FROM lineitem WHERE l_orderkey < 100)
      |      ON l_quantity, l_discount, l_tax INTO NAME metric VALUE val)
      |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin

  // ---------------------------------------------------------------- q57
  /** Conditional aggregation: filtered counts/sums/maxima in one pass over
    * the fact table (one scan, one shuffle — never one scan per condition). */
  private def q57(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").select("o_orderpriority", "o_orderstatus", "o_totalprice")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        dsum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0))).as("sum_price_finished"),
        max(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("max_open_price"))
      .orderBy("o_orderpriority")

  private val q57Oracle =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
       |  ${oDsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE CAST(0 AS DOUBLE) END")} AS sum_price_finished,
       |  MAX(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS max_open_price
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q58
  /** RANGE window frame over event time: trailing-30-day revenue per
    * priority class. Interval-bounded RANGE frames are order-value based
    * (peers share a frame), so the result is deterministic without a
    * row-level tie-break inside the frame; the decimal-cast sum keeps the
    * addition order-independent (Exact.dsum rationale). */
  private def q58(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .filter(year(col("o_orderdate")) === 1995)
      .select("o_orderpriority", "o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("trail30d_price",
        expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (" +
          "PARTITION BY o_orderpriority ORDER BY o_orderdate " +
          "RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)"))
      .orderBy("o_orderpriority", "o_orderdate", "o_orderkey")

  private val q58Oracle =
    """SELECT o_orderpriority, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
      |    PARTITION BY o_orderpriority ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail30d_price
      |FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
      |ORDER BY o_orderpriority, o_orderdate, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q59
  /** first_value / last_value / nth_value over the full-partition frame
    * (explicit UNBOUNDED FOLLOWING — the default frame would make
    * last_value degenerate to the current row). */
  private def q59(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, dir, "customer").select("c_mktsegment", "c_custkey", "c_acctbal")
      .withColumn("top_bal", first(col("c_acctbal")).over(w))
      .withColumn("bottom_bal", last(col("c_acctbal")).over(w))
      .withColumn("second_bal", nth_value(col("c_acctbal"), 2).over(w))
      .orderBy(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey"))
  }

  private val q59Oracle =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  first_value(c_acctbal) OVER w AS top_bal,
      |  last_value(c_acctbal) OVER w AS bottom_bal,
      |  nth_value(c_acctbal, 2) OVER w AS second_bal
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY c_mktsegment, c_acctbal DESC, c_custkey""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Skew-salted equi-join, oracled against the plain join: salting must be
    * invisible in the result. At 100 TB this is the fallback when one hot
    * key overwhelms a reducer and AQE skew-split can't help (e.g. the dim
    * side is already broadcast-ineligible); see [[graft.api.Ops.saltedJoin]]. */
  private def q60(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_suppkey").as("suppkey"), col("l_quantity"))
    val sup = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    graft.api.Ops.saltedJoin(li, sup, "suppkey", salts = 8)
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("s_name")
  }

  private val q60Oracle =
    s"""SELECT s_name, COUNT(*) AS n_items, ${oDsum("l_quantity")} AS sum_qty
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_name ORDER BY s_name""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Higher-order array functions (filter / aggregate-fold / array_max)
    * over the embedding vectors. The fold is a strict left-to-right double
    * accumulation — the exact semantics DuckDB's list_sum reproduces
    * (VectorOpsSpec pins this equivalence for the codegen'd twins). */
  private def q61(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings").select(
      col("vec_id"),
      size(filter(col("embedding"), x => x > lit(0f))).as("n_pos"),
      aggregate(col("embedding"), lit(0.0), (acc, x) => acc + abs(x.cast("double"))).as("l1_norm"),
      array_max(col("embedding")).cast("double").as("max_val"))
      .orderBy("vec_id")

  private val q61Oracle =
    """SELECT vec_id,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
      |  list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS l1_norm,
      |  CAST(list_max(embedding) AS DOUBLE) AS max_val
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q62
  /** regexp_extract_all as a generator-ish scalar: per-row match counts
    * aggregated per event type (numeric literals mined from JSON props). */
  private def q62(spark: SparkSession, dir: String): DataFrame = {
    val nNums = size(regexp_extract_all(col("props"), lit("\\d+"), lit(0)))
    Tables(spark, dir, "events").select(col("event_type"), nNums.as("nn"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("nn")).as("n_nums"),
        max(col("nn")).as("max_nums"))
      .orderBy("event_type")
  }

  private val q62Oracle =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(len(regexp_extract_all(props, '\d+'))) AS BIGINT) AS n_nums,
      |  CAST(MAX(len(regexp_extract_all(props, '\d+'))) AS INTEGER) AS max_nums
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Three-valued null logic: NULLIF-derived nulls, null-safe equality
    * (<=> / IS NOT DISTINCT FROM), COALESCE sentinels, and the
    * COUNT(*) vs COUNT(col) distinction. */
  private def q63(spark: SparkSession, dir: String): DataFrame = {
    val rf = expr("nullif(l_returnflag, 'N')")
    val ls = expr("nullif(l_linestatus, 'O')")
    Tables(spark, dir, "lineitem").select(rf.as("rf"), ls.as("ls"))
      .select(
        coalesce(col("rf"), lit("<null>")).as("rf_coalesced"),
        (col("rf") <=> col("ls")).as("ns_eq"),
        col("rf"))
      .groupBy("rf_coalesced", "ns_eq")
      .agg(count(lit(1)).as("n_rows"), count(col("rf")).as("n_nonnull"))
      .orderBy("rf_coalesced", "ns_eq")
  }

  private val q63Oracle =
    """SELECT COALESCE(NULLIF(l_returnflag, 'N'), '<null>') AS rf_coalesced,
      |  (NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULLIF(l_linestatus, 'O')) AS ns_eq,
      |  COUNT(*) AS n_rows,
      |  COUNT(NULLIF(l_returnflag, 'N')) AS n_nonnull
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Fixed-width histogram bucketing: integer bucket keys from floor
    * division — a single hash agg, no windowing, scales linearly. */
  private def q64(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").select("o_totalprice")
      .select(floor(col("o_totalprice") / 50000.0).as("bucket"), col("o_totalprice"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("bucket")

  private val q64Oracle =
    s"""SELECT CAST(FLOOR(o_totalprice / CAST(50000 AS DOUBLE)) AS BIGINT) AS bucket,
       |  COUNT(*) AS n_orders, MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
       |  ${oDsum("o_totalprice")} AS sum_price
       |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q65
  /** Date-spine generator: sequence() + explode turns each order into its
    * 3-month activity window, then a calendar aggregation — the standard
    * "expand to a time spine" ETL shape, fully codegen'd (no UDF). */
  private def q65(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").select("o_orderdate")
      // date_trunc yields instant-typed TIMESTAMP; results must stay NTZ
      // (naive, like the parquet inputs) or the arrow schema diverges from
      // the oracle's — session TZ is UTC so the cast is value-preserving.
      .select(explode(expr(
        "sequence(date_trunc('MONTH', o_orderdate), " +
          "date_trunc('MONTH', o_orderdate) + interval '2' month, interval '1' month)")).as("mo0"))
      .select(col("mo0").cast("timestamp_ntz").as("mo"))
      .groupBy("mo")
      .agg(count(lit(1)).as("n_active_orders"))
      .orderBy("mo")

  private val q65Oracle =
    """SELECT mo, COUNT(*) AS n_active_orders FROM (
      |  SELECT unnest(generate_series(date_trunc('month', o_orderdate),
      |                                date_trunc('month', o_orderdate) + INTERVAL 2 MONTH,
      |                                INTERVAL 1 MONTH)) AS mo
      |  FROM orders) t
      |GROUP BY mo ORDER BY mo""".stripMargin

  // ---------------------------------------------------------------- q66
  /** SQL LATERAL (correlated table subquery): top-2 customers per nation.
    * Catalyst decorrelates this into a ranked window join — same plan
    * family as q07, but exercised through the SQL surface. */
  private def q66(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "nation").createOrReplaceTempView("graft_nation")
    Tables(spark, dir, "customer").createOrReplaceTempView("graft_customer")
    spark.sql(
      """SELECT n_name, c_custkey, c_acctbal
        |FROM graft_nation,
        |  LATERAL (SELECT c_custkey, c_acctbal FROM graft_customer
        |           WHERE c_nationkey = n_nationkey
        |           ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top_c
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)
  }

  private val q66Oracle =
    """SELECT n_name, c_custkey, c_acctbal
      |FROM nation,
      |  LATERAL (SELECT c_custkey, c_acctbal FROM customer
      |           WHERE c_nationkey = n_nationkey
      |           ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top_c
      |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin

  // ---------------------------------------------------------------- q67
  /** Linear-regression aggregates (the regr_slope / regr_intercept /
    * regr_r2 family) from exact decimal power sums — same determinism
    * rationale as q37: the built-in streaming moments are
    * summation-order-dependent, the closed-form over exact sums is not.
    * One hash aggregate; the formulas are post-agg projections. */
  private def q67(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    Tables(spark, dir, "lineitem").select("l_returnflag", "l_quantity", "l_extendedprice")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(x).as("sx"), dsumS(x * x, 2).as("sxx"),
        dsum(y).as("sy"), dsumS(y * y, 2).as("syy"),
        dsumS(x * y, 2).as("sxy"))
      .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dy", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("slope", when(col("dx") =!= 0,
        (col("n") * col("sxy") - col("sx") * col("sy")) / col("dx")))
      .select(
        col("l_returnflag"), col("n"), col("slope"),
        ((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"),
        when(col("dx") =!= 0 && col("dy") =!= 0,
          (col("n") * col("sxy") - col("sx") * col("sy")) * (col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("dx") * col("dy"))).as("r2"))
      .orderBy("l_returnflag")
  }

  private val q67Oracle =
    s"""WITH s AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    ${oDsum("l_quantity")} AS sx, ${oDsumS("l_quantity * l_quantity", 2)} AS sxx,
       |    ${oDsum("l_extendedprice")} AS sy, ${oDsumS("l_extendedprice * l_extendedprice", 2)} AS syy,
       |    ${oDsumS("l_quantity * l_extendedprice", 2)} AS sxy
       |  FROM lineitem GROUP BY l_returnflag),
       |d AS (
       |  SELECT *, n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy,
       |    CASE WHEN n * sxx - sx * sx <> 0
       |         THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope
       |  FROM s)
       |SELECT l_returnflag, n, slope,
       |  (sy - slope * sx) / n AS intercept,
       |  CASE WHEN dx <> 0 AND dy <> 0
       |       THEN (n * sxy - sx * sy) * (n * sxy - sx * sy) / (dx * dy) END AS r2
       |FROM d ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q68
  /** Boolean and bitwise aggregate family: bool_and/bool_or short-circuit
    * predicates and bit_and/bit_or/bit_xor over the key domain. */
  private def q68(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").select("o_orderpriority", "o_orderkey", "o_totalprice")
      .groupBy("o_orderpriority")
      .agg(
        bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
        bool_or(col("o_totalprice") > 500000.0).as("any_over_500k"),
        bit_and(col("o_orderkey")).as("band"),
        bit_or(col("o_orderkey")).as("bor"),
        bit_xor(col("o_orderkey")).as("bxor"))
      .orderBy("o_orderpriority")

  private val q68Oracle =
    """SELECT o_orderpriority,
      |  bool_and(o_totalprice > CAST(1000 AS DOUBLE)) AS all_over_1k,
      |  bool_or(o_totalprice > CAST(500000 AS DOUBLE)) AS any_over_500k,
      |  bit_and(o_orderkey) AS band,
      |  bit_or(o_orderkey) AS bor,
      |  bit_xor(o_orderkey) AS bxor
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q69
  /** Date-part function family: quarter, ISO weekday, day-of-year,
    * month-end, date arithmetic, day differences. (Spark's weekday() is
    * Monday=0; DuckDB's isodow is Monday=1 — aligned by +1.) */
  private def q69(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .filter(col("o_orderkey") < 50)
      .select(
        col("o_orderkey"), col("o_orderdate"),
        quarter(col("o_orderdate")).as("qtr"),
        (weekday(col("o_orderdate")) + 1).as("iso_dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus_30d"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"))
      .orderBy("o_orderkey")

  private val q69Oracle =
    """SELECT o_orderkey, o_orderdate,
      |  CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
      |  CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
      |  CAST(EXTRACT(doy FROM o_orderdate) AS INTEGER) AS doy,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(o_orderdate AS DATE) + 30 AS plus_30d,
      |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98
      |FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q70
  /** String function breadth: padding, character translation, edit
    * distance (levenshtein), left/right slices, repeat, reverse. */
  private def q70(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .filter(col("p_partkey") < 50)
      .select(
        col("p_partkey"), col("p_name"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        translate(col("p_brand"), "#", "-").as("translated"),
        levenshtein(col("p_name"), lit("standard anodized tin")).as("lev"),
        expr("left(p_name, 4)").as("l4"),
        expr("right(p_name, 4)").as("r4"),
        repeat(lit("ab"), 3).as("rep"),
        reverse(col("p_brand")).as("rev"))
      .orderBy("p_partkey")

  private val q70Oracle =
    """SELECT p_partkey, p_name,
      |  lpad(p_brand, 12, '*') AS padded,
      |  translate(p_brand, '#', '-') AS translated,
      |  CAST(levenshtein(p_name, 'standard anodized tin') AS INTEGER) AS lev,
      |  left(p_name, 4) AS l4, right(p_name, 4) AS r4,
      |  repeat('ab', 3) AS rep, reverse(p_brand) AS rev
      |FROM part WHERE p_partkey < 50 ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q71
  /** Array function breadth over embeddings: sort, slice, flatten,
    * membership, argmax position, reverse. (Spark slice(col, start, len)
    * vs DuckDB's inclusive [a:b] — lengths aligned on both sides.)
    *
    * The two float-array results (sorted5, rev3) are posexploded to
    * (pos, val) scalar rows for the harness compare: the driver's pandas
    * sort crashes on ndarray-typed columns (r2 `err` row), and
    * stringifying floats would couple the check to two engines'
    * float-formatting quirks — exploded scalars reuse the proven numeric
    * compare path instead. */
  private def q71(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .filter(col("vec_id") < 20)
      .select(
        col("vec_id"),
        sort_array(slice(col("embedding"), 1, 5)).as("sorted5"),
        size(flatten(array(slice(col("embedding"), 1, 2), slice(col("embedding"), 3, 2)))).as("flat_len"),
        array_contains(col("embedding"), lit(0.0f)).as("has_zero"),
        expr("array_position(embedding, array_max(embedding))").as("argmax_pos"),
        reverse(slice(col("embedding"), 1, 3)).as("rev3"))
      .select(col("vec_id"), col("flat_len"), col("has_zero"), col("argmax_pos"),
        posexplode(concat(col("sorted5"), col("rev3"))).as(Seq("pos", "val")))
      .orderBy("vec_id", "pos")

  private val q71Oracle =
    """WITH t AS (
      |  SELECT vec_id,
      |    list_sort(embedding[1:5]) AS sorted5,
      |    CAST(len(flatten([embedding[1:2], embedding[3:4]])) AS INTEGER) AS flat_len,
      |    list_contains(embedding, 0.0) AS has_zero,
      |    CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax_pos,
      |    list_reverse(embedding[1:3]) AS rev3
      |  FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id, flat_len, has_zero, argmax_pos,
      |        list_concat(sorted5, rev3) AS comb FROM t)
      |SELECT vec_id, flat_len, has_zero, argmax_pos,
      |  unnest(list_transform(range(len(comb)), x -> CAST(x AS INTEGER))) AS pos,
      |  unnest(comb) AS val
      |FROM c ORDER BY vec_id, pos""".stripMargin

  // ---------------------------------------------------------------- q72
  /** Multiset set-operators: INTERSECT ALL / EXCEPT ALL (multiplicity
    * semantics — a different plan family from q11's set-semantics ops). */
  private def q72(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val a = li.filter(col("l_quantity") > 45.0).select(col("l_suppkey").as("k"))
    val b = li.filter(col("l_discount") > 0.08).select(col("l_suppkey").as("k"))
    a.intersectAll(b).union(a.exceptAll(b))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k")
  }

  private val q72Oracle =
    """WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45),
      |     b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_discount > CAST(0.08 AS DOUBLE))
      |SELECT k, COUNT(*) AS n FROM (
      |  SELECT k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) t1
      |  UNION ALL
      |  SELECT k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) t2) u
      |GROUP BY k ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q73
  /** NOT IN with a nullable subquery — the null-aware anti join. Unlike
    * NOT EXISTS (q06), one NULL in the subquery legally empties the
    * result, so Spark must plan a null-aware (not plain) anti join. */
  private def q73(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("graft_orders")
    Tables(spark, dir, "customer").createOrReplaceTempView("graft_customer")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM graft_orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM graft_customer WHERE c_acctbal < -900)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  private val q73Oracle =
    """SELECT o_orderpriority, COUNT(*) AS n
      |FROM orders
      |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < -900)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q74
  /** Recursive CTE (Spark 4's WITH RECURSIVE): iterative computation
    * expressed in pure SQL — factorials as the closed, deterministic
    * fixture. */
  private def q74(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      """WITH RECURSIVE r(n, fact) AS (
        |  SELECT 1, CAST(1 AS BIGINT)
        |  UNION ALL
        |  SELECT n + 1, fact * (n + 1) FROM r WHERE n < 12
        |)
        |SELECT n, fact FROM r ORDER BY n""".stripMargin)

  private val q74Oracle =
    """WITH RECURSIVE r(n, fact) AS (
      |  SELECT 1, CAST(1 AS BIGINT)
      |  UNION ALL
      |  SELECT n + 1, fact * (n + 1) FROM r WHERE n < 12
      |)
      |SELECT n, fact FROM r ORDER BY n""".stripMargin

  // ---------------------------------------------------------------- q75
  /** Error-safe function surface: try_divide / try_cast return NULL where
    * ANSI mode would throw — the "quarantine bad rows, don't kill the
    * 100 TB job" idiom. (The oracle expresses the same semantics with
    * guards, since DuckDB divides doubles IEEE-style.) */
  private def q75(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(l_orderkey, l_linenumber - 1)").as("per_prior_line"),
        expr("try_cast(l_returnflag AS INT)").as("flag_as_int"),
        expr("try_cast(CAST(l_linenumber AS STRING) AS INT)").as("roundtrip_int"))
      .orderBy("l_orderkey", "l_linenumber", "per_prior_line")

  private val q75Oracle =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_linenumber - 1 = 0 THEN NULL
      |       ELSE CAST(l_orderkey AS DOUBLE) / (l_linenumber - 1) END AS per_prior_line,
      |  TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
      |  TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS roundtrip_int
      |FROM lineitem WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber, per_prior_line""".stripMargin

  // ---------------------------------------------------------------- gr78
  /** PageRank over the supplier→part fulfillment graph (high-quantity
    * lineitems as edges): top-20 parts by rank. The oracle unrolls the 6
    * fixed iterations as chained CTEs (no recursion needed for a fixed
    * depth); ranks are rounded to 9 decimals on BOTH sides so
    * partial-agg summation order (a few ulps at 1e-17 on ranks ~1e-1)
    * can't flap the hash, and the sort key is the rounded rank. */
  private def gr78(spark: SparkSession, dir: String): DataFrame = {
    // suppkey and partkey share the integer key space — offset the part
    // side so the two node domains are disjoint (otherwise "part 7" and
    // "supplier 7" alias into one node and rank flows along paths that
    // don't exist in the fulfillment graph)
    val edges = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 48.0)
      .select(col("l_suppkey").as("src"), (col("l_partkey") + 10000000L).as("dst"))
    // 6 iterations: top-20 ordering on this shallow bipartite graph is
    // stable well before that; per-iteration cost is fixed shuffle
    // overhead, so iterations are the direct bench dial
    graft.api.Ops.pageRank(edges, "src", "dst", iterations = 6)
      .filter(col("id") >= 10000000L) // part nodes only
      .select((col("id") - 10000000L).as("id"), round(col("rank"), 9).as("rank"))
      .orderBy(col("rank").desc, col("id")).limit(20)
  }

  private val gr78Oracle = {
    val iters = (1 to 6).map { k =>
      val prev = s"r${k - 1}"
      s"""r$k AS (
         |  SELECT n.id, 0.15::DOUBLE + 0.85::DOUBLE * COALESCE(s.c, 0::DOUBLE) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT w.dst, SUM($prev.rank * w.w) AS c
         |    FROM w JOIN $prev ON w.src = $prev.id GROUP BY w.dst) s
         |  ON n.id = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT DISTINCT l_suppkey AS src, l_partkey + 10000000 AS dst
       |  FROM lineitem WHERE l_quantity >= 48),
       |nodes AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
       |w AS (SELECT src, dst, 1.0::DOUBLE / (COUNT(*) OVER (PARTITION BY src)) AS w FROM edges),
       |r0 AS (SELECT id, 1.0::DOUBLE AS rank FROM nodes),
       |$iters
       |SELECT CAST(id - 10000000 AS BIGINT) AS id, round(rank, 9) AS rank
       |FROM r6 WHERE id >= 10000000 ORDER BY rank DESC, id LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------- q79
  /** Bloom-filter membership: a distributed sketch build over lineitem's
    * supplier keys (`df.stat.bloomFilter` — treeAggregate of per-partition
    * blooms), shipped to executors as a broadcast variable and probed per
    * row. The small-footprint semi-join prefilter shape: at 100 TB the
    * sketch replaces shuffling the probe side against the full key set.
    * Engine-only (sketch bits are Spark-internal), but deterministic: no
    * false negatives by construction; the spec bounds the fp rate. */
  private def q79(spark: SparkSession, dir: String): DataFrame = {
    val bf = Tables(spark, dir, "lineitem").stat.bloomFilter("l_suppkey", 100000L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf { k: Long => bfB.value.mightContainLong(k) }
    // ground truth is membership in the INSERTED set (lineitem suppliers),
    // not "is a supplier" — a supplier with no lineitems was never added
    val inserted = Tables(spark, dir, "lineitem").select(col("l_suppkey")).distinct()
    val sup = Tables(spark, dir, "supplier").select(col("s_suppkey"))
    sup.join(inserted, col("s_suppkey") === col("l_suppkey"), "left")
      .select(col("s_suppkey").as("probe_key"), col("l_suppkey").isNotNull.cast("int").as("should_exist"))
      .unionByName(sup.select((col("s_suppkey") + 10000000L).as("probe_key"), lit(0).as("should_exist")))
      .select(col("probe_key"), col("should_exist"),
        mightContain(col("probe_key")).cast("int").as("bloom_says"))
      .orderBy("probe_key", "should_exist")
  }

  // ---------------------------------------------------------------- q80
  /** SCD-2 merge/upsert, declaratively: a dimension plus a deterministic
    * update batch produce closed-out old versions, new current versions
    * (updates + inserts), and untouched rows — the MERGE INTO pattern as a
    * join/anti-join union that Catalyst plans as ordinary shuffles. At
    * scale this is the same plan a Delta/Iceberg merge lowers to. */
  private def q80(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"))
    val upd = Tables(spark, dir, "customer")
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("k"), (col("c_acctbal") + 100.0).as("bal"), col("c_mktsegment").as("seg"))
      .unionByName(
        Tables(spark, dir, "customer")
          .filter(col("c_custkey") % 11 === 0)
          .select((col("c_custkey") + 1000000L).as("k"), lit(50.0).as("bal"), lit("NEW").as("seg")))
    val closed = dim.join(upd.select("k"), Seq("k"), "left_semi")
      .select(col("k"), col("bal"), col("seg"), lit(0).as("is_current"), lit("closed").as("action"))
    val fresh = upd.join(dim.select(col("k"), lit(1).as("_in_dim")), Seq("k"), "left")
      .select(col("k"), col("bal"), col("seg"), lit(1).as("is_current"),
        when(col("_in_dim").isNull, "inserted").otherwise("updated").as("action"))
    val untouched = dim.join(upd.select("k"), Seq("k"), "left_anti")
      .select(col("k"), col("bal"), col("seg"), lit(1).as("is_current"), lit("unchanged").as("action"))
    closed.unionByName(fresh).unionByName(untouched)
      .orderBy("k", "is_current", "action")
  }

  private val q80Oracle =
    """WITH dim AS (
      |  SELECT c_custkey AS k, c_acctbal AS bal, c_mktsegment AS seg FROM customer),
      |upd AS (
      |  SELECT c_custkey AS k, c_acctbal + 100 AS bal, c_mktsegment AS seg
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000 AS k, CAST(50 AS DOUBLE) AS bal, 'NEW' AS seg
      |  FROM customer WHERE c_custkey % 11 = 0),
      |merged AS (
      |  SELECT d.k, d.bal, d.seg, 0 AS is_current, 'closed' AS action
      |  FROM dim d JOIN upd u ON d.k = u.k
      |  UNION ALL
      |  SELECT u.k, u.bal, u.seg, 1 AS is_current,
      |    CASE WHEN d.k IS NULL THEN 'inserted' ELSE 'updated' END AS action
      |  FROM upd u LEFT JOIN dim d ON d.k = u.k
      |  UNION ALL
      |  SELECT d.k, d.bal, d.seg, 1 AS is_current, 'unchanged' AS action
      |  FROM dim d WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.k = d.k))
      |SELECT k, bal, seg, CAST(is_current AS INTEGER) AS is_current, action FROM merged
      |ORDER BY k, is_current, action""".stripMargin

  // ---------------------------------------------------------------- q81
  /** Argmin/argmax aggregates (min_by / max_by): which order carries the
    * extreme quantity per flag. Raw min_by/max_by tie-breaking is
    * engine-arbitrary, so the ordering key is a composite scalar
    * (quantity·1e8 + orderkey — exact in double up to 2^53) that makes the
    * winner unique. */
  private def q81(spark: SparkSession, dir: String): DataFrame = {
    val ordKey = col("l_quantity") * 100000000.0 + col("l_orderkey")
    Tables(spark, dir, "lineitem").select("l_returnflag", "l_orderkey", "l_quantity")
      .groupBy("l_returnflag")
      .agg(
        max_by(col("l_orderkey"), ordKey).as("max_qty_order"),
        min_by(col("l_orderkey"), ordKey).as("min_qty_order"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_quantity")).as("min_qty"))
      .orderBy("l_returnflag")
  }

  private val q81Oracle =
    """SELECT l_returnflag,
      |  arg_max(l_orderkey, l_quantity * CAST(100000000 AS DOUBLE) + l_orderkey) AS max_qty_order,
      |  arg_min(l_orderkey, l_quantity * CAST(100000000 AS DOUBLE) + l_orderkey) AS min_qty_order,
      |  MAX(l_quantity) AS max_qty, MIN(l_quantity) AS min_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q82
  /** Stratified sampling (df.stat.sampleBy): per-stratum Bernoulli
    * fractions under one seed — the class-balancing downsample step of a
    * training-data pipeline (e.g. cap the dominant language/source).
    * Per-stratum fractions are applied as PORTABLE salted-hash thresholds
    * (md5 prefix < per-flag hex cut: 0.1→0x19999999, 0.5→0x80000000,
    * 0.9→0xE6666666) rather than `sampleBy`'s engine-private RNG, so the
    * exact sampled row set reproduces on any engine and the DuckDB oracle
    * hash-matches. Same plan shape as sampleBy: one scan, a per-row
    * predicate, then the counting agg — no shuffle before the agg. */
  private def q82(spark: SparkSession, dir: String): DataFrame = {
    val cut = when(col("l_returnflag") === "A", lit("19999999"))
      .when(col("l_returnflag") === "N", lit("80000000"))
      .otherwise(lit("e6666666"))
    Tables(spark, dir, "lineitem").select("l_returnflag", "l_orderkey", "l_linenumber")
      .filter(substring(md5(concat_ws(":", lit("s42"), col("l_orderkey"), col("l_linenumber"))), 1, 8) < cut)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_sampled"))
      .orderBy("l_returnflag")
  }

  private val q82Oracle =
    """SELECT l_returnflag, COUNT(*) AS n_sampled FROM lineitem
      |WHERE substr(md5(concat_ws(':', 's42', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))), 1, 8)
      |      < CASE l_returnflag WHEN 'A' THEN '19999999' WHEN 'N' THEN '80000000' ELSE 'e6666666' END
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q83
  /** CSV-string parsing (from_csv): schema-driven extraction from embedded
    * delimited strings — the "semi-structured column" twin of q14's JSON
    * path. The CSV line is built then re-parsed on each engine, so only
    * the parsed (lossless round-trip) values are compared. */
  private def q83(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("status", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("price", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("priority", org.apache.spark.sql.types.StringType)))
    Tables(spark, dir, "orders")
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        concat_ws(",", col("o_orderstatus"), col("o_totalprice").cast("string"), col("o_orderpriority")).as("line"))
      .select(col("o_orderkey"), from_csv(col("line"), schema, Map.empty[String, String]).as("c"))
      .select(col("o_orderkey"), col("c.status").as("status"), col("c.price").as("price"),
        col("c.priority").as("priority"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- q94
  /** ORC interchange: write a pruned lineitem slice to ORC, read it back,
    * and aggregate — Spark's second native columnar source/sink beside
    * parquet (same DataSource scan machinery: column pruning + predicate
    * pushdown reach the ORC reader just as they do parquet's). The write
    * and the read are both partition-parallel; the slice round-trips
    * losslessly (long/string/double are exact in ORC), so the oracle
    * computes the identical aggregate straight from the parquet source.
    * Output lands under target/ (build scratch), never in testdata. */
  private def q94(spark: SparkSession, dir: String): DataFrame = {
    val out = Scratch.dir(spark, "q94_lineitem_orc")
    Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 10000)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .filter(col("l_linenumber") <= 4)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(DecimalType(30, 6))).cast(DoubleType).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  private val q94Oracle =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey < 10000 AND l_linenumber <= 4
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q95
  /** Hive-style partitioned layout + partition PRUNING — the first-order
    * 100 TB lever: a write partitioned on a coarse key (here order year)
    * turns every later filter on that key into directory-listing pruning.
    * The read-back plan must show the year predicate as a PartitionFilter
    * (pinned in PlanSpec): the 1995 query lists ONE directory and never
    * opens the other years' files — at scale, that is the difference
    * between scanning 100 TB and scanning one partition. Partition count
    * stays bounded (one per year), so no small-file explosion; within a
    * partition, file splits parallelize as usual. */
  private def q95(spark: SparkSession, dir: String): DataFrame = {
    val out = Scratch.dir(spark, "q95_orders_by_year")
    Tables(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    spark.read.parquet(out)
      .filter(col("o_year") === 1995)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(30, 6))).cast(DoubleType).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  private val q95Oracle =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
      |FROM orders WHERE year(o_orderdate) = 1995
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q98
  /** DYNAMIC partition pruning: the fact side is partitioned by day, but
    * the query's day set is only known through a join — the dim is
    * filtered on an attribute (week number), not the join key, so static
    * pruning can't fire. Spark's DPP turns the broadcast dim into a
    * runtime IN-filter on the fact's partition column
    * (`dynamicpruningexpression` inside PartitionFilters — pinned in
    * PlanSpec): the scan lists 7 of 30 day directories instead of all.
    * At 100 TB this is the star-schema workhorse — date-dim filters
    * prune the fact scan without the pipeline author ever writing a
    * partition predicate. */
  private def q98(spark: SparkSession, dir: String): DataFrame = {
    val out = Scratch.dir(spark, "q98_events_by_day")
    Tables(spark, dir, "events")
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    val fact = spark.read.parquet(out)
    val dim = spark.range(0, 30)
      .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("id").cast("int")).as("d"),
        (col("id") / 7 + 1).cast("int").as("wk"))
      .filter(col("wk") === 2)
    fact.join(broadcast(dim), col("event_date") === col("d"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  private val q98Oracle =
    s"""SELECT event_type, COUNT(*) AS n_events, ${oDsum("value")} AS sum_value
       |FROM events
       |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q96
  /** JSON-lines interchange: write a slice as JSONL, read it back with an
    * EXPLICIT schema (schema inference is a full extra pass over the data
    * — never acceptable at scale), aggregate. Long and string fields
    * round-trip losslessly through JSON text; the oracle computes the
    * same aggregate from the parquet source. JSONL is the lingua franca
    * of text-corpus distribution, so the engine must both emit and
    * ingest it without a schema-inference scan. */
  private def q96(spark: SparkSession, dir: String): DataFrame = {
    val out = Scratch.dir(spark, "q96_documents_jsonl")
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select("doc_id", "lang", "source", "n_chars")
      .write.mode("overwrite").json(out)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    spark.read.schema(schema).json(out)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang", "source")
  }

  private val q96Oracle =
    """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE doc_id % 7 = 0
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  private val q83Oracle =
    """WITH src AS (
      |  SELECT o_orderkey,
      |    o_orderstatus || ',' || CAST(o_totalprice AS VARCHAR) || ',' || o_orderpriority AS line
      |  FROM orders WHERE o_orderkey < 100)
      |SELECT o_orderkey,
      |  string_split(line, ',')[1] AS status,
      |  CAST(string_split(line, ',')[2] AS DOUBLE) AS price,
      |  string_split(line, ',')[3] AS priority
      |FROM src ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q84
  /** Sorted-distinct collection aggregate: the deterministic form of
    * collect_set (raw set order is engine/partition-arbitrary — the sort
    * makes it comparable). The sorted set is emitted as a ','-joined
    * string: the driver's pandas compare crashes sorting array-typed
    * columns (r2 `err` row), and a delimited string of the sorted
    * elements carries the identical information. */
  private def q84(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").select("o_orderpriority", "o_orderstatus")
      .groupBy("o_orderpriority")
      .agg(
        concat_ws(",", sort_array(collect_set(col("o_orderstatus")))).as("statuses"),
        countDistinct(col("o_orderstatus")).cast("int").as("n_statuses"))
      .orderBy("o_orderpriority")

  private val q84Oracle =
    """SELECT o_orderpriority,
      |  coalesce(array_to_string(list_sort(list_distinct(list(o_orderstatus))), ','), '') AS statuses,
      |  CAST(COUNT(DISTINCT o_orderstatus) AS INTEGER) AS n_statuses
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q85
  /** SQL hint surface: the BROADCAST(c) hint forces the dimension side to
    * broadcast regardless of size estimates — the escape hatch when stats
    * mislead the planner at scale (PlanSpec pins that the hint is
    * honored). DuckDB reads the hint as a plain comment, so the oracle is
    * the identical statement. */
  private def q85(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("graft_orders")
    Tables(spark, dir, "customer").createOrReplaceTempView("graft_customer")
    spark.sql(
      // Spark-side dsum spelled inline: Spark's own decimal→double is
      // correctly rounded, and `VARCHAR` without a length (the oracle
      // macro's DuckDB-side conversion fix) does not parse here
      s"""SELECT /*+ BROADCAST(c) */ c.c_mktsegment, COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
         |FROM graft_orders o JOIN graft_customer c ON o.o_custkey = c.c_custkey
         |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)
  }

  private val q85Oracle =
    s"""SELECT /*+ BROADCAST(c) */ c.c_mktsegment, COUNT(*) AS n_orders,
       |  ${oDsum("o.o_totalprice")} AS sum_price
       |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q86
  /** Windowed distinct count. Spark forbids DISTINCT aggregates in window
    * frames, so the idiomatic workaround is size(collect_set() OVER w) —
    * worth pinning against an engine (DuckDB) that supports the construct
    * natively. Whole-partition frame; rows sharing all projected columns
    * are fully identical, so the sort is hash-stable. */
  private def q86(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
    Tables(spark, dir, "lineitem")
      .filter(col("l_suppkey") < 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        size(collect_set(col("l_partkey")).over(w)).as("nd_parts_supp"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  private val q86Oracle =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(COUNT(DISTINCT l_partkey) OVER (PARTITION BY l_suppkey) AS INTEGER) AS nd_parts_supp
      |FROM lineitem WHERE l_suppkey < 5
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q89
  /** Z-order layout clustering ([[graft.api.Ops.zorderValue]]): assign the
    * distinct (partkey, suppkey) pairs to 16 "files" by equal-width ranges
    * of their Morton value, and report each file's bounding rectangle. The
    * point of the query is the OUTPUT SHAPE: every file covers a narrow
    * box in BOTH dimensions (a 1-D sort would give tight partkey ranges
    * but full-width suppkey ranges), which is what makes file-level
    * min/max pruning work on either filter column at 100 TB. Equal-width
    * range assignment is one agg + a map-side projection — no global sort,
    * no window; production writers use `repartitionByRange(zval)` for
    * equal-SIZE files (same rectangles, balanced row counts). */
  private def q89(spark: SparkSession, dir: String): DataFrame = {
    // the z-valued distinct feeds the max agg AND the bucket projection —
    // materialize once (no CSE across DataFrame reuse)
    val ps = Tables(spark, dir, "lineitem")
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
      .withColumn("zval", graft.api.Ops.zorderValue(col("p"), col("s")))
      .localCheckpoint(true)
    val zmax = ps.agg(max(col("zval")).as("_zmax"))
    ps.crossJoin(broadcast(zmax))
      .withColumn("file_id", expr("(zval * 16) div (_zmax + 1)"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("p").as("p_min"), max("p").as("p_max"),
        min("s").as("s_min"), max("s").as("s_max"))
      .orderBy("file_id")
  }

  private val q89Oracle = {
    val zExpr = (0 until 16).map(i =>
      s"((p >> $i) & 1) * ${1L << (2 * i)} + ((s >> $i) & 1) * ${1L << (2 * i + 1)}")
      .mkString(" + ")
    s"""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
       |z AS (SELECT p, s, $zExpr AS zval FROM ps)
       |SELECT CAST((zval * 16) // ((SELECT MAX(zval) FROM z) + 1) AS BIGINT) AS file_id,
       |  COUNT(*) AS n_rows,
       |  MIN(p) AS p_min, MAX(p) AS p_max, MIN(s) AS s_min, MAX(s) AS s_max
       |FROM z GROUP BY 1 ORDER BY file_id""".stripMargin
  }

  // ---------------------------------------------------------------- q92
  /** Per-row file provenance via the hidden `_metadata` struct on file
    * sources — how a 100 TB pipeline answers "which input file did this
    * training document come from" without writing a path column into the
    * data: the scan exposes file path/name/size per row for free, and
    * grouping by it gives the per-input-file audit manifest (row counts
    * joined with distinct-id counts proves no file contributed duplicate
    * ids). The oracle reproduces the same manifest from the table name —
    * the testdata table is a single parquet file, which the query itself
    * verifies (n_files = 1). */
  private def q92(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("_metadata.file_name").as("file_name"))
    d.groupBy("file_name")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("doc_id")).as("n_ids"))
      .orderBy("file_name")
  }

  private val q92Oracle =
    """SELECT 'documents.parquet' AS file_name,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_ids
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- q91
  /** Spark 4 string collations: GROUP BY under `UTF8_LCASE` merges case
    * variants at the TYPE level — the hash agg and its shuffle key use the
    * collation directly, so no second normalized column flows through the
    * plan and every predicate/join on the column inherits the semantics
    * (vs sprinkling lower() per expression, the pre-collation idiom).
    * The query builds a deterministic mixed-case segment (upper for even
    * custkeys, lower for odd), groups it case-insensitively, and proves
    * the merge by counting raw case forms per group. Aggregates that must
    * stay case-SENSITIVE (min / count distinct of the raw form) collate
    * back to UTF8_BINARY — under LCASE the two case variants are EQUAL,
    * which would make min() pick an arbitrary representative. */
  private def q91(spark: SparkSession, dir: String): DataFrame = {
    val cased = when(col("c_custkey") % 2 === 0, upper(col("c_mktsegment")))
      .otherwise(lower(col("c_mktsegment")))
    // Pre-aggregate by the RAW (binary) form first — a codegen'd hash agg
    // over the corpus — so the collated agg runs on the tiny distinct-form
    // table: collation-aware comparisons never touch corpus-sized data
    // (the same partial-agg shape Spark itself uses for count distinct).
    val byRaw = Tables(spark, dir, "customer")
      .select(col("c_custkey"), cased.as("seg"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("_n"), sum(col("c_custkey")).as("_s"))
    byRaw
      .groupBy(collate(col("seg"), "UTF8_LCASE").as("seg_ci"))
      .agg(
        lower(min(collate(col("seg"), "UTF8_BINARY"))).as("segment"),
        count(lit(1)).as("n_forms"),
        sum(col("_n")).as("n_cust"),
        sum(col("_s")).as("sum_key"))
      .select(collate(col("segment"), "UTF8_BINARY").as("segment"),
        col("n_forms"), col("n_cust"), col("sum_key"))
      .orderBy("segment")
  }

  private val q91Oracle =
    """WITH c AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
      |         ELSE lower(c_mktsegment) END AS seg
      |  FROM customer)
      |SELECT lower(min(seg)) AS segment,
      |  CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_forms,
      |  CAST(COUNT(*) AS BIGINT) AS n_cust,
      |  CAST(SUM(c_custkey) AS BIGINT) AS sum_key
      |FROM c GROUP BY lower(seg) ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------- q90
  /** Spark 4 VariantType: `parse_json` once into the binary variant
    * encoding, then typed `variant_get` path extraction — the
    * semi-structured column type that replaces repeated string re-parsing
    * (q14's get_json_object re-tokenizes the JSON text per extraction; a
    * variant column parses ONCE at ingest and every downstream extraction
    * is a cheap binary traversal, the difference that matters when a
    * 100 TB events table is queried by many consumers). Aggregates over
    * the extracted value prove the typed path end-to-end; the oracle
    * computes the same numbers from DuckDB's JSON extraction. */
  private def q90(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").select(
      col("event_type"),
      parse_json(col("props")).as("v"))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "int").as("k"),
        // a missing path is null, not an error (try-semantics of the type)
        variant_get(col("v"), "$.missing", "int").as("miss"))
    ev.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(col("miss")).as("n_missing_path"))
      .orderBy("event_type")
  }

  private val q90Oracle =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
      |  CAST(COUNT(CAST(json_extract_string(props, '$.missing') AS INTEGER)) AS BIGINT) AS n_missing_path
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q56_unpivot", q56, Some(q56Oracle)),
    GraftQuery("q57_conditional_agg", q57, Some(q57Oracle)),
    GraftQuery("q58_window_range_interval", q58, Some(q58Oracle)),
    GraftQuery("q59_first_last_nth", q59, Some(q59Oracle)),
    GraftQuery("q60_salted_join", q60, Some(q60Oracle)),
    GraftQuery("q61_hof_arrays", q61, Some(q61Oracle)),
    GraftQuery("q62_regexp_extract_all", q62, Some(q62Oracle)),
    GraftQuery("q63_null_semantics", q63, Some(q63Oracle)),
    GraftQuery("q64_histogram", q64, Some(q64Oracle)),
    GraftQuery("q65_date_spine", q65, Some(q65Oracle)),
    GraftQuery("q66_lateral_topk", q66, Some(q66Oracle)),
    GraftQuery("q67_regr_agg", q67, Some(q67Oracle)),
    GraftQuery("q68_bool_bit_agg", q68, Some(q68Oracle)),
    GraftQuery("q69_date_parts", q69, Some(q69Oracle)),
    GraftQuery("q70_string_breadth", q70, Some(q70Oracle)),
    GraftQuery("q71_array_breadth", q71, Some(q71Oracle)),
    GraftQuery("q72_set_ops_all", q72, Some(q72Oracle)),
    GraftQuery("q73_not_in_null_aware", q73, Some(q73Oracle)),
    GraftQuery("q74_recursive_cte", q74, Some(q74Oracle)),
    GraftQuery("q75_try_funcs", q75, Some(q75Oracle)),
    GraftQuery("gr78_pagerank", gr78, Some(gr78Oracle)),
    GraftQuery("q79_bloom_membership", q79, None),
    GraftQuery("q80_scd2_merge", q80, Some(q80Oracle)),
    GraftQuery("q81_min_by_max_by", q81, Some(q81Oracle)),
    GraftQuery("q82_stratified_sample", q82, Some(q82Oracle)),
    GraftQuery("q83_from_csv", q83, Some(q83Oracle)),
    GraftQuery("q94_orc_interchange", q94, Some(q94Oracle)),
    GraftQuery("q95_partitioned_layout", q95, Some(q95Oracle)),
    GraftQuery("q96_jsonl_interchange", q96, Some(q96Oracle)),
    GraftQuery("q98_dynamic_pruning", q98, Some(q98Oracle)),
    GraftQuery("q84_collect_sorted", q84, Some(q84Oracle)),
    GraftQuery("q85_sql_hints", q85, Some(q85Oracle)),
    GraftQuery("q86_window_distinct", q86, Some(q86Oracle)),
    GraftQuery("q89_zorder_layout", q89, Some(q89Oracle)),
    GraftQuery("q90_variant_json", q90, Some(q90Oracle)),
    GraftQuery("q91_collated_group", q91, Some(q91Oracle)),
    GraftQuery("q92_file_provenance", q92, Some(q92Oracle)))
}
