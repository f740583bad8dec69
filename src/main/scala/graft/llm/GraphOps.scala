package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over fixture-derived graphs. Connected components
  * (near-dup cluster resolution) lives in [[DedupVariants]]; this module
  * holds the rank-propagation family used for corpus quality weighting
  * (PageRank-style importance over a link/interaction graph).
  */
object GraphOps {

  /** ONE power-iteration step of PageRank on the bipartite user→item
    * interaction graph (users link to the event types they touched):
    * every user splits its rank mass equally across its out-edges, items
    * sum incoming mass, damped at 0.85 with a uniform teleport term.
    *
    * Determinism/scale contract: rank mass is INTEGER micro-units
    * (1e6 per user, `div`-split across out-degree), so partial sums
    * commute — the result is identical under any partition schedule and
    * any engine, which floats cannot promise. The step is one edge join
    * + one aggregate, both keyed shuffles — exactly the shape each
    * iteration of a full distributed PageRank runs at 100 TB (iterate
    * the step; the dangling/remainder mass stays bounded by the integer
    * floor and is standardly re-injected via the teleport term).
    */
  def pagerankStep(spark: SparkSession, dir: String): DataFrame = {
    // the distinct edge frame feeds three branches (main join, degrees,
    // n_items) and Spark shares no subplans across them — checkpoint it
    // once so the events scan + distinct shuffle run once, not three
    // times (the same lesson pagerankIter3's loop documents)
    val edges = Tables(spark, dir, "events")
      .select("user_id", "event_type").distinct()
      .localCheckpoint()
    val deg = edges.groupBy("user_id").agg(count(lit(1)).as("deg"))
    val nItems = edges.agg(countDistinct("event_type").as("n_items"))
    edges.join(deg, "user_id")
      .withColumn("units", expr("1000000L div deg"))
      .groupBy("event_type")
      .agg(sum("units").as("in_units"),
        count(lit(1)).as("n_contributors"))
      .crossJoin(broadcast(nItems))
      .withColumn("rank_units",
        expr("(1000000L * 15) div (100 * n_items)") +
          expr("(in_units * 85) div 100"))
      .select("event_type", "n_contributors", "in_units", "rank_units")
      .orderBy("event_type")
  }

  /** THREE chained PageRank power-iterations on the event-type
    * transition graph (edge src→dst with weight = how often dst follows
    * src in a user's stream; order is by event_id, which FIXTURES.md
    * documents as the event-time order — engine-identical without
    * timestamp comparisons). Rank mass stays in integer micro-units
    * ([[pagerankStep]]'s contract), so all three iterations are
    * bit-stable under any schedule.
    *
    * The loop body calls `localCheckpoint()` after each step — the
    * iterative-algorithm scale pattern: without it, iteration k's plan
    * contains k copies of the whole upstream DAG (re-executed per
    * action, and eventually overwhelming the optimizer); the checkpoint
    * truncates lineage so each step plans against materialized ranks,
    * which is how a 50-iteration PageRank stays plannable at 100 TB.
    * (At cluster scale prefer `checkpoint()` to HDFS for fault
    * tolerance; localCheckpoint trades re-computability for speed.)
    */
  def pagerankIter3(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val ev = Tables(spark, dir, "events")
      .select("user_id", "event_id", "event_type")
    val edges = ev.withColumn("src", lag("event_type", 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    val wout = edges.groupBy("src").agg(sum("w").as("wout"))
    // loop-INVARIANT frames materialize once: without this each
    // iteration re-runs the lag-window edge derivation (measured 3.8 s →
    // 2.3 s for 3 iterations at sf0.1)
    val ew = edges.join(wout, "src").localCheckpoint()
    val nodes = ev.select(col("event_type").as("node")).distinct()
      .localCheckpoint()
    val nNodes = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.withColumn("rank_units", lit(1000000L))
    for (_ <- 1 to 3) {
      val contrib = ew.join(ranks, col("src") === col("node"))
        .withColumn("units", expr("(rank_units * w) div wout"))
        .groupBy(col("dst").as("node"))
        .agg(sum("units").as("in_units"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nNodes))
        .select(col("node"),
          (expr("(1000000L * 15) div (100 * n_nodes)") +
            expr("(coalesce(in_units, 0L) * 85) div 100")).as("rank_units"))
        .localCheckpoint()
    }
    ranks.orderBy("node")
  }

  /** Co-occurrence projection of the order→part bipartite graph: parts
    * are linked when they appear in the same order, weight = number of
    * shared orders, kept at weight >= 2 (the noise floor that makes the
    * projected graph sparse: 115k raw pair-types → 3.4k edges at
    * sf0.01). The market-basket / item-item graph every recommender and
    * graph-analytics pipeline builds first.
    *
    * Scale shape: per-order pair generation is the classic basket
    * blow-up — Σ per-basket C(k,2) — bounded here by TPC-H's ≤7 lines
    * per order; at 100 TB the same bound comes from capping or sampling
    * oversized baskets BEFORE pair expansion (a skew guard, not a
    * semantic change for bounded-basket data). Plan: ONE order-keyed
    * aggregate (collect_set subsumes the per-order distinct) whose
    * partial/final split dedups map-side, then pair expansion as a
    * codegen'd HOF over the sorted basket — each unordered pair emitted
    * exactly once, entirely map-side — then one pair-keyed aggregate.
    * Two narrow-key shuffles total; the self-join formulation (an
    * orderkey join of the table against itself, 2× the exchanges and
    * 6M joined rows at sf0.1) measured 6.8 s vs 1.4 s for this shape.
    */
  def coorder(spark: SparkSession, dir: String): DataFrame =
    coorderEdges(spark, dir).orderBy("p1", "p2")

  /** [[coorder]] WITHOUT the presentation sort — shared with
    * [[triangles]], whose localCheckpoint would otherwise materialize a
    * useless global range-shuffle of the edge table. */
  private def coorderEdges(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), " +
          "y -> struct(x AS p1, y AS p2))))")).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)

  /** Per-node triangle counts over the [[coorder]] graph — the
    * degree-ordered node-iterator (Schank–Wagner): every undirected
    * edge is oriented from its lower-(degree, id) endpoint to the
    * higher, wedges are generated only at each edge pair's common LOWER
    * endpoint, and a wedge closes iff its two outer endpoints are an
    * edge. Orientation bounds wedge volume by Σ min-endpoint-degree² ≈
    * O(m^1.5) — the literature bound that keeps triangle counting
    * feasible when a hub node would otherwise generate degree² wedges
    * (a 10^6-degree hub yields 10^12 unordered wedges; oriented, a hub
    * is almost always the wedge DESTINATION, never the center).
    *
    * The oracle restates the id-ordered formulation (p1<p2 twice-joined)
    * — the triangle SET is orientation-independent; only the candidate
    * volume differs, which is exactly the point: same answer, survivable
    * plan. Each triangle is found once, then exploded to its three
    * corners for the per-node aggregate. All joins are narrow-key
    * shuffles; the orientation degree join is a broadcast (node-count
    * sized).
    */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val e = coorderEdges(spark, dir).select("p1", "p2").localCheckpoint()
    val deg = e.select(col("p1").as("node"))
      .union(e.select(col("p2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient each edge low(deg,id) → high(deg,id)
    val oriented = e
      .join(broadcast(deg).withColumnRenamed("node", "p1")
        .withColumnRenamed("deg", "d1"), "p1")
      .join(broadcast(deg).withColumnRenamed("node", "p2")
        .withColumnRenamed("deg", "d2"), "p2")
      .select(
        when(struct(col("d1"), col("p1")) < struct(col("d2"), col("p2")),
          col("p1")).otherwise(col("p2")).as("src"),
        when(struct(col("d1"), col("p1")) < struct(col("d2"), col("p2")),
          col("p2")).otherwise(col("p1")).as("dst"))
    // wedges at the common low-order endpoint; closure via the canonical
    // (id-ordered) edge set so each triangle appears exactly once
    val w1 = oriented.select(col("src"), col("dst").as("a"))
    val w2 = oriented.select(col("src"), col("dst").as("b"))
    val tri = w1.join(w2, Seq("src"))
      .filter(col("a") < col("b"))
      .join(e, col("a") === col("p1") && col("b") === col("p2"))
      .select(col("src"), col("a"), col("b"))
    tri.select(explode(array(col("src"), col("a"), col("b"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("node"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank_iter3" -> pagerankIter3,
    "graph_pagerank_step" -> pagerankStep,
    "graph_coorder" -> coorder,
    "graph_triangles" -> triangles
  )

  def oracle: Map[String, String] = {
    // one unrolled iteration k: nodes LEFT JOIN the weighted in-mass of
    // r{k-1}, teleport + damp in the same integer arithmetic as Spark
    def step(prev: String): String =
      "(SELECT n.node, CAST((1000000 * 15) // (100 * " +
        "(SELECT n_nodes FROM nn)) + (coalesce(s.in_units, 0) * 85) // 100 " +
        "AS BIGINT) AS rank_units FROM nodes n LEFT JOIN (" +
        "SELECT dst AS node, sum((r.rank_units * w) // wout) AS in_units " +
        s"FROM ew JOIN $prev r ON ew.src = r.node GROUP BY dst) s " +
        "ON n.node = s.node)"
    Map(
    "graph_pagerank_iter3" ->
      ("WITH seq AS (SELECT user_id, event_type, lag(event_type) OVER (" +
        "PARTITION BY user_id ORDER BY event_id) AS src FROM events), " +
        "edges AS (SELECT src, event_type AS dst, count(*) AS w " +
        "FROM seq WHERE src IS NOT NULL GROUP BY 1, 2), " +
        "wout AS (SELECT src, sum(w) AS wout FROM edges GROUP BY 1), " +
        "ew AS (SELECT e.src, e.dst, e.w, o.wout FROM edges e " +
        "JOIN wout o USING (src)), " +
        "nodes AS (SELECT DISTINCT event_type AS node FROM events), " +
        "nn AS (SELECT count(*) AS n_nodes FROM nodes), " +
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_units FROM nodes), " +
        s"r1 AS ${step("r0")}, r2 AS ${step("r1")}, r3 AS ${step("r2")} " +
        "SELECT node, rank_units FROM r3 ORDER BY node"),
    "graph_pagerank_step" ->
      ("WITH e AS (SELECT DISTINCT user_id, event_type FROM events), " +
        "d AS (SELECT user_id, count(*) AS deg FROM e GROUP BY 1), " +
        "n AS (SELECT count(DISTINCT event_type) AS n_items FROM e), " +
        "agg AS (SELECT event_type, sum(1000000 // deg) AS in_units, " +
        "count(*) AS n_contributors " +
        "FROM e JOIN d USING (user_id) GROUP BY 1) " +
        "SELECT event_type, n_contributors, CAST(in_units AS BIGINT) " +
        "AS in_units, " +
        "CAST((1000000 * 15) // (100 * n_items) + (in_units * 85) // 100 " +
        "AS BIGINT) AS rank_units " +
        "FROM agg CROSS JOIN n ORDER BY event_type"),
    "graph_coorder" ->
      ("WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS w " +
        "FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING count(*) >= 2) " +
        "SELECT p1, p2, w FROM e ORDER BY p1, p2"),
    // id-ordered triangle enumeration — orientation-independent result,
    // so it matches the Spark side's degree-ordered plan exactly
    "graph_triangles" ->
      ("WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2 " +
        "FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "tri AS (SELECT e1.p1 AS x, e1.p2 AS y, e2.p2 AS z " +
        "FROM e e1 JOIN e e2 ON e1.p2 = e2.p1 " +
        "JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2) " +
        "SELECT node, count(*) AS n_triangles " +
        "FROM (SELECT unnest([x, y, z]) AS node FROM tri) " +
        "GROUP BY node ORDER BY n_triangles DESC, node")
    )
  }
}
