package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

case class TOrder(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
case class TCustomer(c_custkey: Long, c_name: String)
case class TCustSpend(c_custkey: Long, n_orders: Long, spend_cents: Long)

/** SURVEY §2.10 — the typed Dataset[T] surface: case-class Encoders,
  * typed filter, groupByKey + a custom typed [[Aggregator]] consumed as
  * a TypedColumn, and joinWith producing a Dataset of pairs.
  *
  * Scale note (deliberate contrast with every other key): typed lambdas
  * deserialize the full object per row and are OPAQUE to Catalyst — no
  * predicate pushdown through `filter(o => …)`, no codegen across the
  * lambda. This key exists to cover (and document the cost of) the API;
  * hot paths in this engine stay on the Column API, where the identical
  * logic keeps pushdown and WholeStageCodegen.
  */
object TypedOps {

  /** Exact-cents spend: integer accumulation, order-independent. */
  private val sumCents: Aggregator[TOrder, Long, Long] =
    new Aggregator[TOrder, Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, o: TOrder): Long =
        b + math.round(o.o_totalprice * 100)
      override def merge(a: Long, b: Long): Long = a + b
      override def finish(r: Long): Long = r
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  private val countOrders: Aggregator[TOrder, Long, Long] =
    new Aggregator[TOrder, Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, o: TOrder): Long = b + 1
      override def merge(a: Long, b: Long): Long = a + b
      override def finish(r: Long): Long = r
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  def typedOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice").as[TOrder]
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_name").as[TCustomer]
    val perCust = orders
      .filter(o => o.o_totalprice > 100000.0)
      .groupByKey(_.o_custkey)
      .agg(countOrders.toColumn.name("n_orders"),
        sumCents.toColumn.name("spend_cents"))
      .map { case (k, n, c) => TCustSpend(k, n, c) }
    perCust
      .joinWith(cust, perCust("c_custkey") === cust("c_custkey"), "inner")
      .map { case (s, c) => (c.c_custkey, c.c_name, s.n_orders, s.spend_cents) }
      .toDF("c_custkey", "c_name", "n_orders", "spend_cents")
      .orderBy("c_custkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_dataset_ops" -> typedOps
  )

  def oracle: Map[String, String] = Map(
    "typed_dataset_ops" ->
      ("SELECT c_custkey, c_name, count(*) AS n_orders, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "WHERE o_totalprice > 100000.0 " +
        "GROUP BY 1, 2 ORDER BY c_custkey")
  )
}
