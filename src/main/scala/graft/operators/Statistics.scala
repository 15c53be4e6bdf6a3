package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{GraftQuery, Tables}
import Exact.{dsum, dsumS, oDsum, oDsumS}

/** Statistical / shaping operators: moment-based stats (exact via decimal
  * power sums, so reproducible cross-engine in any aggregation order),
  * percentile, ordered string aggregation, pivot, generator (posexplode),
  * and seeded sampling.
  */
object Statistics {

  // ---------------------------------------------------------------- q37
  /** Variance / stddev / correlation computed from exact decimal power
    * sums with the textbook formulas applied in double at the end —
    * deterministic where the built-in streaming moments are
    * summation-order-dependent. */
  private def q37(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").select("l_returnflag", "l_quantity", "l_extendedprice")
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    li.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(x).as("sx"), dsumS(x * x, 2).as("sxx"),
        dsum(y).as("sy"), dsumS(y * y, 2).as("syy"),
        dsumS(x * y, 2).as("sxy"))
      .select(
        col("l_returnflag"),
        col("n"),
        // n > 1 guard: a single-row group would divide by zero (ANSI throw)
        when(col("n") > 1,
          (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("var_qty"),
        when(col("n") > 1,
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))).as("stddev_qty"),
        when(col("n") > 1,
          (col("sxy") - col("sx") * col("sy") / col("n")) /
            (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) * sqrt(col("syy") - col("sy") * col("sy") / col("n"))))
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  private val q37Oracle =
    s"""WITH s AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    ${oDsum("l_quantity")} AS sx, ${oDsumS("l_quantity * l_quantity", 2)} AS sxx,
       |    ${oDsum("l_extendedprice")} AS sy, ${oDsumS("l_extendedprice * l_extendedprice", 2)} AS syy,
       |    ${oDsumS("l_quantity * l_extendedprice", 2)} AS sxy
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, n,
       |  CASE WHEN n > 1 THEN (sxx - sx * sx / n) / (n - 1) END AS var_qty,
       |  CASE WHEN n > 1 THEN sqrt((sxx - sx * sx / n) / (n - 1)) END AS stddev_qty,
       |  CASE WHEN n > 1 THEN (sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) END AS corr_qty_price
       |FROM s ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Exact percentiles (sort + linear interpolation — same definition as
    * DuckDB's quantile_cont). */
  private def q38(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem").select("l_returnflag", "l_quantity")
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  private val q38Oracle =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Approximate (GK-sketch) percentiles — the mergeable scale path next
    * to q38's exact sort-based percentile, as q17 (HLL) is to q16. At
    * accuracy >= group size the sketch degenerates to the exact discrete
    * percentile, which DuckDB's quantile_disc reproduces — so unlike most
    * sketches this one is oracle-checkable at test scale while remaining
    * a genuine approx operator at 100 TB (drop the accuracy, keep the
    * plan). */
  private def q77(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem").select("l_returnflag", "l_quantity")
      .groupBy("l_returnflag")
      .agg(
        approx_percentile(col("l_quantity"), lit(0.5), lit(1000000)).as("median_qty"),
        approx_percentile(col("l_quantity"), lit(0.9), lit(1000000)).as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  private val q77Oracle =
    """SELECT l_returnflag,
      |  quantile_disc(l_quantity, 0.5) AS median_qty,
      |  quantile_disc(l_quantity, 0.9) AS p90_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Ordered string aggregation: nations per region as a sorted CSV. */
  private def q39(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation").select("n_regionkey", "n_name")
    val region = Tables(spark, dir, "region").select("r_regionkey", "r_name")
    nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy("r_name")
  }

  private val q39Oracle =
    """SELECT r_name,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  COUNT(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ---------------------------------------------------------------- q41
  /** Pivot: order counts per priority × status (fixed pivot columns). */
  private def q41(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").select("o_orderpriority", "o_orderstatus")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L)
      .orderBy("o_orderpriority")

  private val q41Oracle =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q42
  /** posexplode generator over an array slice. */
  private def q42(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 3)))
      .select(col("vec_id"), col("pos"), col("col").cast("double").as("val"))
      .orderBy("vec_id", "pos")

  private val q42Oracle =
    """SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos, CAST(embedding[i] AS DOUBLE) AS val
      |FROM embeddings, (SELECT unnest(range(1, 4)) AS i) r
      |WHERE vec_id < 10
      |ORDER BY vec_id, pos""".stripMargin

  // ---------------------------------------------------------------- q44
  /** SQL surface: the same engine through `spark.sql` with graft's native
    * functions registered in the FunctionRegistry (codegen'd in SQL too). */
  private def q44(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    Tables(spark, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
    spark.sql(
      """SELECT vec_id,
        |  graft_dot(embedding, embedding) AS self_dot,
        |  sqrt(graft_normsq(embedding)) AS l2,
        |  graft_cosine(embedding, embedding) AS self_cos
        |FROM graft_embeddings
        |ORDER BY vec_id""".stripMargin)
  }

  private val q44Oracle =
    """SELECT vec_id,
      |  list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS self_dot,
      |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2,
      |  list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS self_cos
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q43
  /** Seeded Bernoulli sampling, expressed as a PORTABLE salted-hash
    * threshold (first 8 hex chars of md5(salt:key) < 0x1999999A ≈ 10%)
    * instead of `Dataset.sample`'s engine-private RNG stream. Same
    * statistical contract (uniform, deterministic under the salt/seed,
    * embarrassingly parallel, no shuffle), but any engine reproduces the
    * exact row set — so the DuckDB oracle hash-matches. Lexicographic
    * compare of fixed-width lowercase hex equals numeric compare.
    * (`Dataset.sample(fraction, seed)` remains available to library users;
    * it is the same plan shape with a non-portable RNG.) */
  private def q43(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").select("o_orderkey", "o_totalprice")
      .filter(substring(md5(concat(lit("s42:"), col("o_orderkey").cast("string"))), 1, 8) < "19999999")
      .orderBy("o_orderkey")

  private val q43Oracle =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE substr(md5('s42:' || CAST(o_orderkey AS VARCHAR)), 1, 8) < '19999999'
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q93
  /** Per-group uniform k-sample, deterministic and portable: rank rows
    * within each group by a salted hash (a fixed random permutation of
    * the group) and keep the first k — the distributed, re-runnable form
    * of per-stratum reservoir sampling. Spark plans the `row_number <= k`
    * filter as WindowGroupLimit: a per-partition top-k heap pushed below
    * the shuffle, so no group is ever fully sorted or materialized —
    * safe under a group with a billion rows (contrast orderBy(rand)
    * per group, which is a full sort AND non-reproducible). */
  private def q93(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("status"))
      .orderBy(md5(concat(lit("s42:"), col("o_orderkey").cast("string"))), col("o_orderkey"))
    Tables(spark, dir, "orders")
      .select(col("o_orderstatus").as("status"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .orderBy("status", "rn")
  }

  private val q93Oracle =
    """SELECT status, o_orderkey, rn FROM (
      |  SELECT o_orderstatus AS status, o_orderkey,
      |    CAST(row_number() OVER (
      |      PARTITION BY o_orderstatus
      |      ORDER BY md5('s42:' || CAST(o_orderkey AS VARCHAR)), o_orderkey) AS INTEGER) AS rn
      |  FROM orders) t
      |WHERE rn <= 20 ORDER BY status, rn""".stripMargin

  // ---------------------------------------------------------------- q45
  /** Explicit GROUPING SETS (finer than rollup/cube) via the SQL entry. */
  private def q45(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n_rows
        |FROM graft_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  private val q45Oracle =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
      |       COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Map-typed column functions: parse the JSON props into map<string,int>,
    * then map_keys / element access. */
  private def q53(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
    val m = from_json(col("props"), MapType(StringType, IntegerType))
    // try_element_at: absent key/index yields null (matching the oracle)
    // instead of ANSI-mode MAP_KEY_DOES_NOT_EXIST / INVALID_ARRAY_INDEX.
    Tables(spark, dir, "events").select(col("event_id"), col("props"))
      .select(
        col("event_id"),
        try_element_at(map_keys(m), lit(1)).as("first_key"),
        try_element_at(m, lit("k")).as("k_val"),
        size(m).as("n_keys"))
      .orderBy("event_id")
  }

  private val q53Oracle =
    """SELECT event_id,
      |  json_keys(props)[1] AS first_key,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
      |  CAST(len(json_keys(props)) AS INTEGER) AS n_keys
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Correlated scalar subquery (Catalyst decorrelates to a join) —
    * integer-only comparisons so cross-engine equality is exact. */
  private def q51(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "part").createOrReplaceTempView("graft_part")
    spark.sql(
      """SELECT p_partkey, p_type, p_size
        |FROM graft_part p
        |WHERE p_size > (SELECT MIN(p2.p_size) + 3 FROM graft_part p2 WHERE p2.p_type = p.p_type)
        |ORDER BY p_partkey""".stripMargin)
  }

  private val q51Oracle =
    """SELECT p_partkey, p_type, p_size
      |FROM part p
      |WHERE p_size > (SELECT MIN(p2.p_size) + 3 FROM part p2 WHERE p2.p_type = p.p_type)
      |ORDER BY p_partkey""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q37_stats_agg", q37, Some(q37Oracle)),
    GraftQuery("q38_percentile", q38, Some(q38Oracle)),
    GraftQuery("q77_approx_percentile", q77, Some(q77Oracle)),
    GraftQuery("q39_string_agg", q39, Some(q39Oracle)),
    GraftQuery("q41_pivot", q41, Some(q41Oracle)),
    GraftQuery("q42_posexplode", q42, Some(q42Oracle)),
    GraftQuery("q43_sample_seeded", q43, Some(q43Oracle)),
    GraftQuery("q93_group_sample", q93, Some(q93Oracle)),
    GraftQuery("q44_sql_surface", q44, Some(q44Oracle)),
    GraftQuery("q45_grouping_sets", q45, Some(q45Oracle)),
    GraftQuery("q51_correlated_subquery", q51, Some(q51Oracle)),
    GraftQuery("q53_map_funcs", q53, Some(q53Oracle)))
}
