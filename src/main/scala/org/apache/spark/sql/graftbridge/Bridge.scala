package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway graft needs: wrap a custom LogicalPlan
  * into a DataFrame (`Dataset.ofRows` — the same entry point Spark's own
  * DataFrameReader uses). Lives under `org.apache.spark.sql` solely for
  * that access; everything else in graft stays on public API.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a raw Catalyst Expression as a user-facing Column (the same
    * doorway `functions.expr` ends at) — for exercising custom
    * expressions like `Top2Keyed` through the DataFrame API in tests.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The inverse doorway: the Catalyst Expression behind a Column. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
