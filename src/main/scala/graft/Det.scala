package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine float-determinism helpers (SURVEY.md §5.3, refined).
  *
  * The fixtures' money columns are decimal-quantized (2-decimal prices,
  * 2-decimal rates), so products like `price*(1-disc)*(1+tax)` are exact
  * 6-decimal values — frequently landing ON a 2-decimal rounding midpoint
  * (e.g. 6126.645). `round(x, 2)` then diverges between engines: Spark
  * rounds the double via BigDecimal HALF_UP while DuckDB computes
  * `round(x*100)/100`, and the two can fall on opposite sides of the
  * midpoint. Measured failure: lineitem sf0.01 o3002 line4 → 6126.64 vs
  * 6126.65.
  *
  * Rules that ARE exact across engines:
  *  - per-row products of stored columns: identical IEEE op sequence →
  *    bit-identical doubles; output RAW, never rounded;
  *  - sums of stored 2-decimal columns: true value is on the cent grid,
  *    accumulated fp noise ≪ 0.005, so round(sum, 2) is safe;
  *  - sums of products: snap each row to its exact 1e-6 grid point as a
  *    long (the row double is within ulps of the grid, so the snap is
  *    deterministic), sum exactly as integers, rescale once — see
  *    [[Det.moneySum]]. The matching DuckDB SQL is
  *    `CAST(sum(CAST(round(expr*1e6) AS BIGINT)) AS DOUBLE)/1e6`.
  *
  * This also makes results independent of Spark's partition-order
  * summation — a 100 TB requirement, since a 1000-executor sum must not
  * change answer with scheduling.
  */
object Det {

  /** Exact, order-independent sum of a ≤6-decimal money expression. */
  def moneySum(e: Column): Column =
    (sum(round(e * lit(1e6), 0).cast("long")) / lit(1e6)).cast("double")

  /** DuckDB-side rendering of [[moneySum]]. */
  def moneySumSql(expr: String): String =
    s"CAST(sum(CAST(round(($expr)*1e6) AS BIGINT)) AS DOUBLE)/1e6"

  /** Spark-SQL-side rendering of [[moneySum]] (the one dialect split:
    * Spark's `round` needs the explicit 0 scale). ALL three renderings
    * of the micro-grid contract live in this object — change the grid
    * here or nowhere. */
  def moneySumSparkSql(expr: String): String =
    s"CAST(sum(CAST(round(($expr) * 1e6, 0) AS BIGINT)) AS DOUBLE) / 1e6"
}
