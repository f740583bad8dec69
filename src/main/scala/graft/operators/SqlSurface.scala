package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The SQL front door: canonical benchmark statements submitted as TEXT
  * through `spark.sql` over registered views — proving the engine's SQL
  * surface (parser → analyzer → same Catalyst plans the DataFrame API
  * gets) end to end with the same §5.3 exactness discipline. Revenue
  * sums go through the integer-micro grid inside the SQL itself, so the
  * statement is engine-portable verbatim.
  */
object SqlSurface {

  private def view(spark: SparkSession, dir: String, t: String): String = {
    val v = t + "_v"
    Tables(spark, dir, t).createOrReplaceTempView(v)
    v
  }

  /** TPC-H Q5 (local supplier volume): six-table star join, region/date
    * selective filters, revenue per nation. Catalyst broadcast-joins the
    * dims and leaves one exchange for the aggregate — the same plan the
    * hand-built DataFrame chain gets (asserted in Round3cSpec: no
    * cartesian, ≥3 broadcasts).
    */
  def tpchQ5(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(view(spark, dir, _))
    spark.sql(
      "SELECT n_name, " +
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e6, 0) " +
        "AS BIGINT)) AS DOUBLE) / 1e6 AS revenue, " +
        "count(*) AS n_items " +
        "FROM customer_v JOIN orders_v ON c_custkey = o_custkey " +
        "JOIN lineitem_v ON l_orderkey = o_orderkey " +
        "JOIN supplier_v ON l_suppkey = s_suppkey " +
        "AND c_nationkey = s_nationkey " +
        "JOIN nation_v ON s_nationkey = n_nationkey " +
        "JOIN region_v ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_tpch_q5" -> tpchQ5
  )

  def oracle: Map[String, String] = Map(
    "sql_tpch_q5" ->
      ("SELECT n_name, " +
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e6) " +
        "AS BIGINT)) AS DOUBLE) / 1e6 AS revenue, " +
        "count(*) AS n_items " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "AND c_nationkey = s_nationkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name")
  )
}
