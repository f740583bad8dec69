package graft

import org.apache.spark.sql.functions._

/** Round-16 optimization regressions: the stage-once fixture memos and
  * the data-derived explode width must never change what a key computes
  * — in particular not when ONE JVM runs the same key over SEVERAL
  * fixture dirs (the exact case the per-dir memo keys/table names
  * exist for: a stale memo pointing one dir's query at another dir's
  * staged fixture would corrupt results silently while every
  * single-dir gate stays green).
  */
class Round16OptSpec extends GraftSuite {

  test("plan_cbo_stats: per-dir stage-once memo never cross-contaminates dirs") {
    def run(dir: String) = operators.SqlSurface.cboStats(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def direct(dir: String) = Tables(spark, dir, "orders")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val a1 = run(sf0001)   // stages + analyzes sf0.001
    val b1 = run(sf001)    // stages + analyzes sf0.01 under ITS OWN name
    val a2 = run(sf0001)   // memo hit — must still answer from sf0.001
    assert(a1 == direct(sf0001), "cbo answer != direct aggregate (sf0.001)")
    assert(b1 == direct(sf001), "cbo answer != direct aggregate (sf0.01)")
    assert(a1 == a2, "memo-hit rerun changed the answer")
    assert(a1 != b1, "two SFs cannot share counts — memo cross-contamination")
  }

  test("join_bucketed: per-dir stage-once memo never cross-contaminates dirs") {
    def run(dir: String) = operators.Joins.bucketed(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def direct(dir: String) = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val a1 = run(sf0001)
    val b1 = run(sf001)
    val a2 = run(sf0001)   // memo hit
    assert(a1 == direct(sf0001))
    assert(b1 == direct(sf001))
    assert(a1 == a2, "memo-hit rerun changed the answer")
    assert(a1 != b1, "two SFs cannot share counts — memo cross-contamination")
  }

  test("Staging.once: builds exactly once per key, per-key isolation") {
    var n1 = 0; var n2 = 0
    Staging.once("r16opt-test-key-1") { n1 += 1 }
    Staging.once("r16opt-test-key-1") { n1 += 1 }
    Staging.once("r16opt-test-key-2") { n2 += 1 }
    assert(n1 == 1 && n2 == 1)
  }

  test("explodeWidth: data-derived, floored at 4, capped at session width") {
    val cap = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val w0001 = Tables.explodeWidth(spark, sf0001, "documents")
    val w001 = Tables.explodeWidth(spark, sf001, "documents")
    assert(w0001 >= 4 && w0001 <= cap)
    assert(w001 >= 4 && w001 <= cap)
    assert(w0001 <= w001, "width must be monotone in table bytes")
    // a missing table degrades to the floor, never throws — the width
    // is a layout hint, not a correctness input
    assert(Tables.explodeWidth(spark, "/nonexistent", "documents") == 4)
  }

  test("substringSpans: derived width and session width agree row-for-row") {
    val docs = Tables(spark, sf0001, "documents")
    val derived = llm.DedupVariants.substringSpans(docs,
        width = Some(Tables.explodeWidth(spark, sf0001, "documents")))
      .collect().map(_.toSeq).toSeq
    val session = llm.DedupVariants.substringSpans(docs)
      .collect().map(_.toSeq).toSeq
    assert(derived == session, "partition width changed span results")
  }
}
