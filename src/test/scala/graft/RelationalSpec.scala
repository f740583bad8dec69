package graft

import org.apache.spark.sql.functions._

/** Semantic checks for §2.1–2.3/§2.6 beyond the DuckDB oracle: join
  * cardinalities, set-op algebra, physical-plan shape (broadcast, top-k,
  * pushdown).
  */
class RelationalSpec extends GraftSuite {

  test("scan_pruned plan prunes columns at the parquet reader") {
    val plan = operators.Scans.scanPruned(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(plan.contains("l_orderkey") && plan.contains("l_quantity"))
    assert(!plan.contains("l_extendedprice"), "pruned column still read")
  }

  test("filter_pred pushes predicates into the scan") {
    val plan = operators.Filters.filterPred(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), "no pushed filters in scan")
  }

  test("join_broadcast plans broadcast joins for all three dims") {
    val plan = operators.Joins.broadcastDims(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan.take(500))
  }

  test("limit_topk plans TakeOrderedAndProject (no global sort)") {
    val plan = operators.SortsSetOps.limitTopK(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("bucketed join plans an exchange-free sort-merge join") {
    val df = operators.Joins.bucketed(spark, sf0001)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"), plan.take(400))
    assert("Bucketed: true".r.findAllIn(plan).size >= 2, "scans not bucketed")
    // no shuffle between the join and the bucketed scans: the only
    // hash exchange in the final plan is the one above the aggregation
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning"),
      "bucketed sides were reshuffled")
  }

  test("round-3 operators plan their intended physical shapes") {
    // banded range join: hash/merge equi-join, never a nested loop
    val banded = operators.Joins.rangeBanded(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!banded.contains("BroadcastNestedLoopJoin")
      && !banded.contains("CartesianProduct"), banded)
    // bitmap distinct: two aggregation levels, no expand-based distinct
    val bm = operators.Aggregates.bitmapDistinct(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(bm.contains("bitmap_construct_agg")
      && !bm.contains("Expand"), bm)
    // selective skew salting: hot/cold union, broadcast routing set
    val salted = operators.Joins.skewSalted(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(salted.contains("Union") && salted.contains("BroadcastHashJoin"),
      salted)
    // DSv2 source appears as a BatchScan
    val fw = sources.Sources.fixedWidthDsv2(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(fw.contains("BatchScan"), fw)
  }

  test("semi + anti partition the customer table") {
    val semi = operators.Joins.semi(spark, sf0001).count()
    val anti = operators.Joins.anti(spark, sf0001).count()
    val all = Tables(spark, sf0001, "customer").count()
    assert(semi <= all && anti <= all)
    // anti = customers with no 'P' order; semi = with >=1 'F' order.
    val withP = Tables(spark, sf0001, "orders")
      .filter(col("o_orderstatus") === "P")
      .select("o_custkey").distinct().count()
    assert(anti == all - withP)
  }

  test("full outer covers both key spaces") {
    val df = operators.Joins.fullOuter(spark, sf0001)
    val nOrd = Tables(spark, sf0001, "orders").select("o_custkey").distinct().count()
    val nEv = Tables(spark, sf0001, "events").select("user_id").distinct().count()
    val union = df.count()
    assert(union >= math.max(nOrd, nEv) && union <= nOrd + nEv)
    assert(df.filter(col("id").isNull).count() == 0)
  }

  test("asof: every matched signup precedes (or equals) its purchase") {
    val bad = operators.Joins.asof(spark, sf0001)
      .filter(col("signup_ts_us") > col("ts_us")).count()
    assert(bad == 0)
  }

  test("setop algebra: intersect + except partition the 1996 keys") {
    val i = operators.SortsSetOps.intersect(spark, sf0001).count()
    val e = operators.SortsSetOps.except(spark, sf0001).count()
    val y96 = Tables(spark, sf0001, "orders")
      .filter(year(col("o_orderdate")) === 1996).select("o_custkey").distinct().count()
    assert(i + e == y96)
  }

  test("csv roundtrip preserves nation exactly") {
    val back = operators.Scans.csvRoundtrip(spark, sf0001)
    val orig = Tables(spark, sf0001, "nation")
    assert(back.count() == 25)
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
  }
}
