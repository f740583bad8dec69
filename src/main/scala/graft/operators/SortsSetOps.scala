package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.6 — sorts, limits, top-k, set operations.
  *
  * Scale notes: `limit_topk` plans as `TakeOrderedAndProject` (per-
  * partition top-k, then a k-row merge on the driver — no global sort).
  * Set ops are key-only projections so the dedup shuffle carries narrow
  * rows.
  */
object SortsSetOps {

  def sortMulti(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .select(col("c_custkey"),
        expr("nullif(c_mktsegment, 'BUILDING')").as("seg"),
        col("c_acctbal"))
      .orderBy(col("seg").asc_nulls_first, col("c_acctbal").desc, col("c_custkey"))

  def limitTopK(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Pagination: page 3 of the price-ordered orders (OFFSET 20 LIMIT
    * 10). Spark 4's `offset` plans with the limit as a single
    * CollectLimit(30)-then-drop — the skipped rows still flow to the
    * driver stage, so deep pagination (OFFSET 1e9) is an anti-pattern at
    * scale; keyset pagination (WHERE price < last_seen) is the 100 TB
    * form. This key pins the shallow-page semantics.
    */
  def limitOffset(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(20)
      .limit(10)

  def union(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val a = o.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderstatus")
    val b = o.filter(col("o_totalprice") > 200000)
      .select("o_orderkey", "o_orderstatus")
    a.union(b).distinct().orderBy("o_orderkey", "o_orderstatus")
  }

  def intersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    val y97 = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
    y96.intersect(y97).orderBy("o_custkey")
  }

  def except(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    val y97 = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
    y96.except(y97).orderBy("o_custkey")
  }

  /** BAG-semantics set ops: `intersectAll`/`exceptAll` preserve
    * duplicate multiplicity (a customer with 3 orders in '96 and 2 in
    * '97 intersects twice) — Spark plans both as a count-compare
    * aggregate + generate, one shuffle on the full row, no join. The
    * multiplicity IS the signal for workloads like "per-key overlap
    * volume", which the DISTINCT forms destroy. */
  def intersectAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    val y97 = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
    y96.intersectAll(y97).orderBy("o_custkey")
  }

  def exceptAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    val y97 = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
    y96.exceptAll(y97).orderBy("o_custkey")
  }

  def distinctRows(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** `unionByName(allowMissingColumns = true)`: schema-drift-tolerant
    * union — columns align by NAME (positional union silently pairs
    * mismatched columns), and columns absent on one side null-fill. The
    * batch-append shape when historical batches gained columns over
    * time (the read-side dual of scan_schema_evolution).
    */
  def unionByName(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val oldBatch = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"))
    val newBatch = c.filter(col("c_custkey") % 2 =!= 0)
      .select(col("c_name"), col("c_custkey"), col("c_mktsegment"))
    oldBatch.unionByName(newBatch, allowMissingColumns = true)
      .orderBy("c_custkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "setop_union_by_name" -> unionByName,
    "sort_multi" -> sortMulti,
    "limit_topk" -> limitTopK,
    "limit_offset" -> limitOffset,
    "setop_union" -> union,
    "setop_intersect" -> intersect,
    "setop_except" -> except,
    "setop_intersect_all" -> intersectAll,
    "setop_except_all" -> exceptAll,
    "distinct_rows" -> distinctRows
  )

  def oracle: Map[String, String] = Map(
    "setop_union_by_name" ->
      ("SELECT c_custkey, c_name, NULL AS c_mktsegment FROM customer " +
        "WHERE c_custkey % 2 = 0 " +
        "UNION ALL SELECT c_custkey, c_name, c_mktsegment FROM customer " +
        "WHERE c_custkey % 2 <> 0 ORDER BY c_custkey"),
    "sort_multi" ->
      ("SELECT c_custkey, nullif(c_mktsegment,'BUILDING') AS seg, c_acctbal " +
        "FROM customer ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey"),
    "limit_topk" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
    "limit_offset" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20"),
    "setop_union" ->
      ("SELECT DISTINCT * FROM (" +
        "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT' " +
        "UNION ALL " +
        "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 200000) " +
        "ORDER BY o_orderkey, o_orderstatus"),
    "setop_intersect" ->
      ("SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 " +
        "INTERSECT " +
        "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997 " +
        "ORDER BY o_custkey"),
    "setop_intersect_all" ->
      ("SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 " +
        "INTERSECT ALL " +
        "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997 " +
        "ORDER BY o_custkey"),
    "setop_except_all" ->
      ("SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 " +
        "EXCEPT ALL " +
        "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997 " +
        "ORDER BY o_custkey"),
    "setop_except" ->
      ("SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 " +
        "EXCEPT " +
        "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997 " +
        "ORDER BY o_custkey"),
    "distinct_rows" ->
      ("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem " +
        "ORDER BY l_returnflag, l_linestatus")
  )
}
