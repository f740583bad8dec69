package graft

import org.apache.spark.sql.functions._

/** Graph operators: co-occurrence projection + degree-ordered triangle
  * counting (round 5). The load-bearing assertion is orientation
  * independence: the degree-ordered plan must produce exactly the
  * id-ordered enumeration's result — same triangles, cheaper wedges.
  */
class GraphSpec extends GraftSuite {

  test("coorder: canonical pair keys, weight floor holds") {
    val e = llm.GraphOps.coorder(spark, sf0001)
    assert(e.filter(col("p1") >= col("p2")).count() === 0)
    assert(e.filter(col("w") < 2).count() === 0)
    assert(e.count() > 0)
  }

  test("triangles: degree-ordered result equals id-ordered enumeration") {
    // id-ordered brute enumeration (the oracle formulation) in Spark
    val e = llm.GraphOps.coorder(spark, sf0001).select("p1", "p2")
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.p2") === col("e2.p1"))
      .join(e.as("e3"),
        col("e3.p1") === col("e1.p1") && col("e3.p2") === col("e2.p2"))
      .select(col("e1.p1").as("x"), col("e1.p2").as("y"), col("e2.p2").as("z"))
    val expected = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    val actual = llm.GraphOps.triangles(spark, sf0001)
    assert(actual.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(actual).count() === 0)
    // fixture has real triangles to count
    assert(actual.agg(sum("n_triangles")).head.getLong(0) % 3 === 0)
    assert(actual.count() > 0)
  }

  test("triangles: no cartesian product in the physical plan") {
    val plan = llm.GraphOps.triangles(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
