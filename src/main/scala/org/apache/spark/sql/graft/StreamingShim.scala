package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** The ONE compile-time door into Spark's `private[sql]` surface that
  * the GVT streaming source needs — isolated here so the rest of the
  * engine stays on public APIs. Living under `org.apache.spark.sql` to
  * reach package-private members is the established pattern for
  * table-format streaming sources (Delta Lake ships its whole source
  * under `org.apache.spark.sql.delta` for exactly this reason): a v1
  * [[org.apache.spark.sql.execution.streaming.Source]]'s `getBatch`
  * must return a DataFrame whose plan is flagged `isStreaming = true`
  * (MicroBatchExecution asserts it), and the only constructor for such
  * a frame is `SparkSession.internalCreateDataFrame`.
  */
object StreamingShim {

  /** Re-plan `df` as a streaming micro-batch frame.
    *
    * `toRdd` executes the batch plan distributed with whole-stage
    * codegen intact; the `.copy()` is load-bearing, not defensive:
    * codegen'd scans emit ONE reused UnsafeRow per partition whose
    * backing buffer is overwritten row to row, and the LogicalRDD this
    * wraps hands those references straight to downstream operators that
    * may buffer them (stream aggregation hash maps copy keys, but
    * sorts/limits keep references). A production implementation would
    * instead build a streaming `LogicalRelation` over the batch's file
    * list (zero-copy, what FileStreamSource does); at micro-batch
    * volume the per-row copy is noise and the conservative choice.
    */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema, isStreaming = true)
  }
}

/** Second door into `private[sql]` for the SQL DML lowering
  * ([[graft.sources.RewriteGvtDml]]): wrapping a resolved catalyst
  * Expression into a user-facing Column, and executing a captured
  * LogicalPlan (a MERGE's source side) as a DataFrame. Both are
  * one-line delegations to `org.apache.spark.sql.classic` internals —
  * same isolation rationale as [[StreamingShim]]. */
object DmlShim {
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
