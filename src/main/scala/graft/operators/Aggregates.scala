package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SURVEY.md §2.4 — aggregation operators.
  *
  * Scale notes (100 TB): every query here is a single hash-aggregate over
  * a parquet scan — Catalyst plans partial (map-side) + final aggregation
  * around one Exchange on the grouping keys, which is the optimal shape on
  * a cluster. Determinism: double aggregates are rounded (sums→2, avgs→4)
  * in BOTH the Spark query and the DuckDB oracle (SURVEY.md §5.3), and
  * every oracle-able query ends in a total order.
  */
object Aggregates {

  /** TPC-H Q1 pricing-summary shape — the flagship query.
    * scan → filter (pushed to parquet) → project → partial agg → exchange
    * → final agg → sort. 6 output rows at every sf.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        Det.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Det.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_hash_group" -> pricingSummary
  )

  def oracle: Map[String, String] = Map(
    "agg_hash_group" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "round(sum(l_quantity),2) AS sum_qty, " +
        "round(sum(l_extendedprice),2) AS sum_base_price, " +
        Det.moneySumSql("l_extendedprice*(1-l_discount)") + " AS sum_disc_price, " +
        Det.moneySumSql("l_extendedprice*(1-l_discount)*(1+l_tax)") + " AS sum_charge, " +
        "round(avg(l_quantity),4) AS avg_qty, " +
        "round(avg(l_extendedprice),4) AS avg_price, " +
        "round(avg(l_discount),4) AS avg_disc, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus")
  )
}
