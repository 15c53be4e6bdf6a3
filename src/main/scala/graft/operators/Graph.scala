package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Graph analytics over relational edge lists. PageRank lives in
  * [[graft.api.Ops.pageRank]] (query gr78); this file adds triangle
  * counting — the standard clustering-coefficient / community-density
  * primitive.
  */
object Graph {

  /** Per-node triangle counts over an undirected simple graph, by degree
    * orientation ("compact-forward": Latapy, "Main-memory triangle
    * computations for very large (sparse (power-law)) graphs", TCS 2008;
    * the MapReduce formulation is Suri & Vassilvitskii, "Counting
    * triangles and the curse of the last reducer", WWW 2011).
    *
    * Each undirected edge is oriented from its lower-(degree, id) endpoint
    * to the higher one. Every node's OUT-degree under this orientation is
    * O(√m), so the wedge self-join below generates O(m^{3/2}) candidate
    * wedges in total — the arboricity bound — instead of Σ deg² on the raw
    * adjacency, which is exactly the "curse of the last reducer" (one hub
    * node's deg² dominating the job) this orientation exists to kill.
    * Every triangle is counted exactly once: at its lowest-(degree, id)
    * apex, with the closing edge necessarily oriented w1 → w2.
    *
    * Three shuffles total (degree agg, wedge join on src, closure join on
    * the wedge endpoints) — all equi-joins, no theta join anywhere. */
  def triangleCounts(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e = edges
      .select(least(col(uCol), col(vCol)).as("u"), greatest(col(uCol), col(vCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val uFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    // The oriented adjacency feeds BOTH wedge-join sides and the closure
    // probe — materialize it once (localCheckpoint: blocks released when
    // unreferenced) instead of re-running dedup + degree joins three times
    // (Spark does not common-subexpression-eliminate self-join subtrees).
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint(true)
    val x = oriented.select(col("src"), col("dst").as("w1"), col("ddst").as("dw1"))
    val y = oriented.select(col("src"), col("dst").as("w2"), col("ddst").as("dw2"))
    val wedges = x.join(y, "src")
      .filter(struct(col("dw1"), col("w1")) < struct(col("dw2"), col("w2")))
    val tri = wedges
      .join(oriented.select(col("src").as("w1"), col("dst").as("w2")), Seq("w1", "w2"))
      .select(col("src").as("a"), col("w1").as("b"), col("w2").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  // ---------------------------------------------------------------- gr79
  /** Triangle census of the supplier co-supply graph (suppliers joined by
    * sharing a high-quantity part): top-20 suppliers by triangle
    * membership. The bipartite projection (part → supplier-pair) is
    * [[coOccurrenceEdges]] with the part as the basket, so it inherits the
    * `maxItemsPerBasket` guard against a ubiquitous part's deg² blow-up;
    * the cap stays off here because the quantity filter already bounds
    * suppliers-per-part at TPC-H fan-outs and the oracle needs exact
    * projection semantics. The oracle counts the same triangles with the
    * naive 3-way join — same result, any counting order. */
  private def gr79(spark: SparkSession, dir: String): DataFrame = {
    val edges = coOccurrenceEdges(
        Tables(spark, dir, "lineitem").filter(col("l_quantity") >= 48.0),
        "l_partkey", "l_suppkey")
      .select(col("p1").as("u"), col("p2").as("v"))
    triangleCounts(edges, "u", "v")
      .select(col("node").as("supplier"), col("n_triangles"))
      .orderBy(col("n_triangles").desc, col("supplier"))
      .limit(20)
  }

  private val gr79Oracle =
    """WITH ps AS (
      |  SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      |  FROM lineitem WHERE l_quantity >= 48),
      |e AS (
      |  SELECT a.s AS u, b.s AS v
      |  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
      |  GROUP BY 1, 2),
      |t AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM e e1
      |  JOIN e e2 ON e2.u = e1.v
      |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |nodes AS (
      |  SELECT a AS supplier FROM t
      |  UNION ALL SELECT b FROM t
      |  UNION ALL SELECT c FROM t)
      |SELECT supplier, CAST(COUNT(*) AS BIGINT) AS n_triangles
      |FROM nodes GROUP BY 1
      |ORDER BY n_triangles DESC, supplier LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- gr80
  /** Weighted co-occurrence graph construction — the basket/recommender
    * primitive (and the graph-build step feeding gr78/gr79/dd30): parts
    * co-purchased in the same order become an edge weighted by the number
    * of shared orders; weight >= 2 keeps the non-noise edges.
    *
    * Scale shape: the pair generation is an equi-join keyed on the basket
    * id, so its cost is Σ basket_size² — ONE mega-basket's size² lands on
    * one reducer (the "curse of the last reducer" the triangle count's
    * degree orientation kills on its side of the pipeline). `maxItemsPerBasket`
    * is the production guard: a deterministic per-basket hash top-k
    * (row_number over (hash(item), item) — Spark plans it as
    * WindowGroupLimit, the q93 idiom, so per-basket state during the rank
    * is k rows, never the full basket) bounds every basket to k items and
    * the whole join to Σ min(size, k)² BEFORE any pair is generated.
    * Hash-ordered, not "first k by id", so the kept sample is unbiased
    * w.r.t. item-id assignment and stable across runs/partitionings.
    * `None` keeps exact semantics for naturally-bounded baskets (TPC-H
    * orders cap at 7 lines). The weight agg is hash-keyed on the pair. */
  def coOccurrenceEdges(items: DataFrame, basketCol: String, itemCol: String,
      minWeight: Long = 1L, maxItemsPerBasket: Option[Int] = None): DataFrame = {
    val o0 = items.select(col(basketCol).as("_bk"), col(itemCol).as("_it")).distinct()
    val o = maxItemsPerBasket match {
      case Some(k) =>
        require(k >= 2, s"maxItemsPerBasket must be >= 2 to emit any pair, got $k")
        val w = Window.partitionBy("_bk").orderBy(xxhash64(col("_it")), col("_it"))
        o0.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= k).drop("_rn")
      case None => o0
    }
    o.as("a").join(o.as("b"),
        col("a._bk") === col("b._bk") && col("a._it") < col("b._it"))
      .groupBy(col("a._it").as("p1"), col("b._it").as("p2"))
      .agg(count(lit(1)).as("weight"))
      .filter(col("weight") >= minWeight)
  }

  private def gr80(spark: SparkSession, dir: String): DataFrame =
    coOccurrenceEdges(Tables(spark, dir, "lineitem"), "l_orderkey", "l_partkey",
        minWeight = 2L)
      .orderBy("p1", "p2")

  private val gr80Oracle =
    """WITH o AS (
      |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
      |pr AS (
      |  SELECT a.it AS p1, b.it AS p2, CAST(COUNT(*) AS BIGINT) AS weight
      |  FROM o a JOIN o b ON a.bk = b.bk AND a.it < b.it
      |  GROUP BY 1, 2)
      |SELECT p1, p2, weight FROM pr WHERE weight >= 2
      |ORDER BY p1, p2""".stripMargin

  /** Multi-source BFS: min-hop distance from any seed node, capped at
    * `maxHops`, over an UNDIRECTED edge list — the reachability /
    * neighborhood-expansion primitive (e.g. "everything within k hops of
    * a flagged document" in a contamination sweep).
    *
    * Bulk-synchronous frontier expansion (the Pregel shape): each round
    * is ONE equi-join of the current frontier against the edge list plus
    * one anti-join against the visited set — no theta joins, no driver-
    * side iteration over nodes. Only the frontier (which at high hop
    * counts is a small fraction of the graph) flows between rounds; the
    * symmetrized edge list is a checkpointed loop invariant. First visit
    * wins = min distance, so no re-agg over the visited set is needed.
    *
    * Per-round shuffle accounting (measured, not assumed — checkpointed
    * rings come back as `LogicalRDD`s whose origin-plan size ESTIMATES
    * are join-inflated, so without hints the static planner picks
    * sort-merge joins and shuffle-WRITES the whole edge list every round;
    * AQE flips them to broadcast at runtime but only after the map-side
    * writes are paid): the frontier and visited sides carry explicit
    * broadcast hints whenever their EXACT row counts — free metadata,
    * the rings are eagerly checkpointed — are under `broadcastMaxRows`.
    * A broadcast-frontier round then runs: in-memory edge scan → BHJ →
    * ring dedup (the round's single exchange, candidate mass) → BHJ
    * anti — the edge list is never sorted, shuffled, or re-partitioned.
    * Past the row bound (web-scale frontiers), the hints drop off and
    * the round degrades gracefully to the partitioned SMJ path, where
    * the dedup agg's output partitioning already feeds the anti join's
    * left side with no extra exchange.
    *
    * distinct() stays BEFORE the anti join: the Aggregate blocks
    * Catalyst's PushDownLeftSemiAntiJoin from pushing the anti join
    * below the edge join — pushed down, it would anti-join the ENTIRE
    * edge list against `visited` every round instead of just the ring.
    *
    * The loop also exits as soon as a ring comes back empty (the same
    * free count): all later rings are provably empty, so remaining hops
    * would each pay a full no-op round.
    */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int,
      broadcastMaxRows: Long = 1000000L): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var visited = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0))
      .localCheckpoint()
    var visitedRows = visited.count() // counts in-memory blocks, no recompute
    var frontier = visited
    var frontierRows = visitedRows
    var h = 1
    while (h <= maxHops && frontierRows > 0) {
      val next = bfsRound(frontier, visited, e, h,
        frontierRows, visitedRows, broadcastMaxRows)
        .localCheckpoint()
      val n = next.count()
      // `visited` is only ever a UNION of already-checkpointed rings, so
      // re-deriving it is free — checkpointing it too would materialize
      // the whole visited set once per round for nothing.
      visited = visited.unionByName(next)
      visitedRows += n
      frontier = next
      frontierRows = n
      h += 1
    }
    visited
  }

  /** ONE BFS expansion round — exposed so the plan spec pins the round's
    * physical shape (broadcast joins, single candidate-mass exchange, no
    * edge-list shuffle) against the REAL dataflow, not a test copy.
    * left_anti keeps only FIRST visits: the frontier shrinks to the
    * newly-discovered ring, and `visited` stays one row per node. */
  private[graft] def bfsRound(frontier: DataFrame, visited: DataFrame, e: DataFrame,
      h: Int, frontierRows: Long, visitedRows: Long, broadcastMaxRows: Long): DataFrame = {
    val fr = if (frontierRows <= broadcastMaxRows) broadcast(frontier) else frontier
    val vis = if (visitedRows <= broadcastMaxRows) broadcast(visited) else visited
    fr.join(e, col("node") === col("src"))
      .select(col("dst").as("node")).distinct()
      .join(vis, Seq("node"), "left_anti")
      .withColumn("dist", lit(h))
  }

  // ---------------------------------------------------------------- gr81
  /** 3-hop BFS over the co-purchase graph (gr80's edges, weight >= 2),
    * seeded at the largest parts (p_size = 50): which parts are reachable
    * through chains of strong co-purchase affinity, and how close. The
    * DuckDB oracle replays the same expansion as a recursive CTE and
    * takes MIN(dist) per node — bounded recursion, identical ring sets. */
  private def gr81(spark: SparkSession, dir: String): DataFrame = {
    val edges = coOccurrenceEdges(Tables(spark, dir, "lineitem"), "l_orderkey", "l_partkey",
      minWeight = 2L)
    val seeds = Tables(spark, dir, "part").filter(col("p_size") === 50)
    bfsDistances(edges, "p1", "p2", seeds, "p_partkey", maxHops = 3)
      .select(col("node").as("part"), col("dist"))
      .orderBy("part")
  }

  private val gr81Oracle =
    """WITH RECURSIVE o AS (
      |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
      |pe AS (
      |  SELECT a.it AS p1, b.it AS p2
      |  FROM o a JOIN o b ON a.bk = b.bk AND a.it < b.it
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (
      |  SELECT p1 AS src, p2 AS dst FROM pe
      |  UNION SELECT p2, p1 FROM pe),
      |bfs(node, dist) AS (
      |  SELECT DISTINCT p_partkey, 0 FROM part WHERE p_size = 50
      |  UNION
      |  SELECT e.dst, bfs.dist + 1
      |  FROM bfs JOIN e ON e.src = bfs.node
      |  WHERE bfs.dist < 3)
      |SELECT node AS part, CAST(MIN(dist) AS INTEGER) AS dist
      |FROM bfs GROUP BY node ORDER BY part""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("gr79_triangle_count", gr79, Some(gr79Oracle)),
    GraftQuery("gr80_copurchase_graph", gr80, Some(gr80Oracle)),
    GraftQuery("gr81_bfs_distances", gr81, Some(gr81Oracle)))
}
