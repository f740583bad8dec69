package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.2 — projections, filters, predicates.
  *
  * All predicates here are Catalyst-pushable (simple comparisons, IN,
  * BETWEEN, LIKE) — at 100 TB these reach the parquet reader as row-group
  * / page-level skips, so the scan cost is proportional to selectivity,
  * not table size.
  */
object Filters {

  def filterPred(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(
        (col("l_quantity").between(10, 30) && col("l_returnflag").isin("A", "R")) ||
          (col("l_discount") > 0.08 && col("l_linestatus") === "O"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_linestatus")
      .orderBy("l_orderkey", "l_linenumber")

  def projectExpr(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("charge"),
        (col("l_quantity") > 25).as("is_bulk"))
      .orderBy("l_orderkey", "l_linenumber")

  def filterLike(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .filter(col("p_name").like("%gear%") ||
        (col("p_type").like("PROMO%") && col("p_brand").rlike("^Brand#1[0-9]$")))
      .select("p_partkey", "p_name", "p_brand", "p_type")
      .orderBy("p_partkey")

  /** Three-valued logic: corpus has no stored nulls (FIXTURES.md), so
    * nulls are synthesized with nullif and consumed with IS NULL/coalesce.
    */
  def filterNull(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        expr("nullif(o_orderstatus, 'P')").as("status_nullable"),
        coalesce(expr("nullif(o_orderstatus, 'P')"), lit("was_p"))
          .as("status_filled"),
        col("o_totalprice"))
      .filter(col("status_nullable").isNull || col("o_totalprice") > 150000)
      .orderBy("o_orderkey")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_pred" -> filterPred,
    "project_expr" -> projectExpr,
    "filter_like" -> filterLike,
    "filter_null" -> filterNull
  )

  def oracle: Map[String, String] = Map(
    "filter_pred" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus " +
        "FROM lineitem " +
        "WHERE (l_quantity BETWEEN 10 AND 30 AND l_returnflag IN ('A','R')) " +
        "OR (l_discount > 0.08 AND l_linestatus = 'O') " +
        "ORDER BY l_orderkey, l_linenumber"),
    "project_expr" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "l_extendedprice*(1-l_discount) AS revenue, " +
        "l_extendedprice*(1-l_discount)*(1+l_tax) AS charge, " +
        "l_quantity > 25 AS is_bulk " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "filter_like" ->
      ("SELECT p_partkey, p_name, p_brand, p_type FROM part " +
        "WHERE p_name LIKE '%gear%' " +
        "OR (p_type LIKE 'PROMO%' AND regexp_matches(p_brand, '^Brand#1[0-9]$')) " +
        "ORDER BY p_partkey"),
    "filter_null" ->
      ("SELECT o_orderkey, nullif(o_orderstatus,'P') AS status_nullable, " +
        "coalesce(nullif(o_orderstatus,'P'),'was_p') AS status_filled, o_totalprice " +
        "FROM orders " +
        "WHERE nullif(o_orderstatus,'P') IS NULL OR o_totalprice > 150000 " +
        "ORDER BY o_orderkey")
  )
}
