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
    val edges = Tables(spark, dir, "events")
      .select("user_id", "event_type").distinct()
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank_step" -> pagerankStep
  )

  def oracle: Map[String, String] = Map(
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
        "FROM agg CROSS JOIN n ORDER BY event_type")
  )
}
