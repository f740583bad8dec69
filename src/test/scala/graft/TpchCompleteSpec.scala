package graft

/** Plan-shape guards for the round-7 TPC-H completion (TpchComplete):
  * the oracle already proves VALUES; these tests pin the physical-plan
  * properties that make the queries scale — the things a refactor could
  * silently lose while staying value-correct at fixture size.
  */
class TpchCompleteSpec extends GraftSuite {

  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, sf001)
      .queryExecution.executedPlan.toString

  /** Formatted mode includes the scan metadata (PushedFilters/
    * ReadSchema) that the plain toString elides.
    */
  private def formatted(key: String): String =
    SparkEntry.queries(key)(spark, sf001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q1: one data shuffle — partial+final aggregate; the only other " +
      "exchange is the 6-row ORDER BY") {
    val p = plan("sql_tpch_q1")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly 1 hash exchange, plan:\n$p")
    // the final sort's exchange moves 6 aggregated rows, never lineitem
    assert("Exchange rangepartitioning".r.findAllIn(p).size <= 1)
  }

  test("q19x: bracket predicates reach both scans; part side broadcasts") {
    val p = formatted("sql_tpch_q19x")
    assert(p.contains("BroadcastHashJoin"), "part dim must broadcast")
    // the per-side residuals of the OR-of-brackets must be pushed INTO
    // the parquet readers, not evaluated post-join
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)"),
      s"lineitem quantity residual not pushed:\n$p")
    assert(p.contains("EqualTo(p_brand,Brand#2)"),
      s"part brand residual not pushed:\n$p")
  }

  test("q21x: RewriteExistsOther collapses both EXISTS branches into " +
      "aggregations — no semi/anti join, no third fact shuffle") {
    // r7 graded the EXISTS form weak (2.3x DuckDB + 12 GB spill at fact
    // x100: each branch re-shuffled the fact). With the rule installed
    // (graft.Sessions + the TpchComplete runner itself), the EXISTS
    // becomes min/max-per-key and the NOT EXISTS becomes the Top2Keyed
    // leader/best-other aggregate.
    val p = plan("sql_tpch_q21x")
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"),
      s"EXISTS pair must plan through RewriteExistsOther:\n$p")
    assert(p.contains("top2_keyed_max"),
      s"NOT EXISTS branch must use the Top2Keyed aggregate:\n$p")
    assert(p.contains("minOther") && p.contains("maxOther"),
      s"EXISTS branch must use the min/max-other aggregate:\n$p")
  }

  test("q2x: correlated scalar subquery decorrelates to an aggregate join") {
    // Catalyst must rewrite the per-part max-acctbal subquery into a
    // max aggregate joined on the correlation key — a per-row subquery
    // execution would show as a ScalarSubquery in the physical plan
    val p = plan("sql_tpch_q2x")
    assert(!p.contains("ScalarSubquery"),
      s"correlated subquery not decorrelated:\n$p")
    assert(p.contains("HashAggregate"), "expected the decorrelated max agg")
  }

  test("q21r equals q21x and scans the fact table exactly once") {
    val rewrite = SparkEntry.queries("sql_tpch_q21r")(spark, sf001)
    val original = SparkEntry.queries("sql_tpch_q21x")(spark, sf001)
    assert(rewrite.exceptAll(original).count() == 0 &&
      original.exceptAll(rewrite).count() == 0,
      "rewrite diverges from the EXISTS form")
    val p = rewrite.queryExecution.executedPlan.toString
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"rewrite must scan lineitem exactly once (q21x scans it 3x):\n$p")
  }

  test("q11x and q16x stay non-vacuous at fixture scale") {
    // the q22x lesson: a threshold query that returns 0 rows passes its
    // oracle vacuously; q11x's mean cut was chosen over a fixed
    // fraction precisely because the fraction went empty at sf0.1
    assert(SparkEntry.queries("sql_tpch_q11x")(spark, sf001).count() > 0)
    assert(SparkEntry.queries("sql_tpch_q16x")(spark, sf001).count() > 0)
  }
}
