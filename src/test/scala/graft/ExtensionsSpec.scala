package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions wiring: the extended session must expose cosine_sim
  * through the catalog and fold self-similarity via the injected
  * optimizer rule.
  */
class ExtensionsSpec extends AnyFunSuite {

  private def withExtendedSession[T](f: SparkSession => T): T = {
    // warm the shared context first so we extend, not replace, it
    val base = SparkTestBase.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new plans.GraftExtensions)
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("injected function resolves through the catalog") {
    withExtendedSession { s =>
      val one = s.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      assert(math.abs(one.head.getDouble(0) - 1.0) < 1e-12)
    }
  }

  test("V2 catalog function resolves through SQL and matches the builtin form") {
    val spark = SparkTestBase.spark
    val sf0001 = SparkTestBase.sf0001
    spark.conf.set("spark.sql.catalog.graftfns",
      "graft.functions.GraftFunctionCatalog")
    Tables(spark, sf0001, "events").createOrReplaceTempView("ev_fncat_spec")
    val viaCatalog = spark.sql(
      "SELECT event_id, graftfns.default.hamming64(event_id, user_id) AS hd " +
        "FROM ev_fncat_spec")
    val viaBuiltins = Tables(spark, sf0001, "events")
      .selectExpr("event_id", "CAST(bit_count(event_id ^ user_id) AS BIGINT) AS hd")
    assert(viaCatalog.exceptAll(viaBuiltins).count() === 0)
    assert(viaBuiltins.exceptAll(viaCatalog).count() === 0)
    // the magic method binds as an Invoke (codegen path), not the
    // row-boxing produceResult fallback
    val plan = viaCatalog.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("invoke"), plan)
    // a wrong namespace or name fails as a clean analysis error (the
    // catalog throws NoSuchFunctionException, not NoSuchElementException)
    val e1 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graftfns.bogus_ns.hamming64(1, 2)").collect())
    assert(e1.getMessage.toLowerCase.contains("hamming64"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graftfns.default.haming64(1, 2)").collect())
    assert(e2.getMessage.toLowerCase.contains("haming64"))
  }

  test("self-cosine folds to a literal in the optimized plan") {
    withExtendedSession { s =>
      val df = Tables(s, SparkTestBase.sf0001, "embeddings")
        .selectExpr("cosine_sim(embedding, embedding) AS c")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cosinesimilarity"),
        s"rule did not fire: $optimized")
      assert(df.filter("abs(c - 1.0) > 1e-12").count() == 0)
    }
  }
}
