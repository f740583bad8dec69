package graft

import org.apache.spark.sql.functions._

/** Wave-11 operators: plan-shape and invariant assertions beyond the
  * oracle hash checks.
  */
class Wave11Spec extends GraftSuite {

  test("cbo stats: analyzed rowCount reaches the optimizer") {
    operators.SqlSurface.cboStats(spark, sf0001).collect()
    // stats visibility needs CBO on — assert through an isolated child
    // session (the same mechanism the operator uses); the catalog table
    // and its ANALYZE stats are shared, the conf is not
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    // plan.stats reads the THREAD-ACTIVE session's conf (Dataset
    // actions set it themselves; this direct access must too)
    org.apache.spark.sql.classic.SparkSession.setActiveSession(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    val stats =
      try s.table("graft_cbo_orders_" +
          java.lang.Integer.toHexString(sf0001.hashCode))
        .queryExecution.optimizedPlan.stats
      finally org.apache.spark.sql.classic.SparkSession.setActiveSession(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    assert(stats.rowCount.contains(BigInt(1500)), stats.toString)
    // column-level stats exist for the analyzed columns
    assert(stats.attributeStats.nonEmpty, stats.toString)
    // and the operator must NOT have leaked CBO into the caller's
    // session — the r8 review's cross-key contamination finding
    assert(spark.conf.get("spark.sql.cbo.enabled") == "false",
      "cboStats leaked spark.sql.cbo.enabled into the shared session")
  }

  test("pagerank iterations: localCheckpoint truncates lineage") {
    val ranks = llm.GraphOps.pagerankIter3(spark, sf0001)
    // after 3 checkpointed iterations the plan scans materialized RDDs —
    // the upstream event scan must NOT appear 3× in the final plan
    val plan = ranks.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("Scan ExistingRDD"),
      plan)
    assert(!plan.contains("events.parquet"), plan)
    // teleport floor: every node keeps at least the teleport mass
    val mins = ranks.agg(min("rank_units")).head.getLong(0)
    assert(mins >= (1000000L * 15) / (100 * 5), s"min rank $mins")
  }

  test("bigram LM: conditional probabilities normalize per history") {
    val w = split(col("text"), " ")
    val pairs = Tables(spark, sf0001, "documents")
      .select(explode(arrays_zip(
        slice(w, lit(1), size(w) - 1),
        slice(w, lit(2), size(w) - 1))).as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
    val byW1 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .groupBy("w1").agg(sum("c12").as("c1"))
    // Σ_w2 P(w2|w1) = Σ c12/c1 = 1 exactly when summed as integers first
    val bad = byW1.filter(col("c1") <= 0).count()
    assert(bad == 0)
  }

  test("recursive CTE: seed at hop 0, frontier grows monotonically") {
    val reach = operators.SqlSurface.recursiveCte(spark, sf0001).collect()
    assert(reach.exists(r => r.getLong(0) == 0L && r.getInt(1) == 0))
    // min-hop per node is positive beyond the seed and ≤ depth bound
    assert(reach.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 3))
  }

  test("transformWithState batch fold equals the shuffle aggregate") {
    val tws = streaming.EventOps.transformWithStateBatch(spark, sf0001)
    val agg = Tables(spark, sf0001, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0)
          .as("sum_value"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .orderBy("user_id")
    assert(tws.collect().toSeq == agg.collect().toSeq)
  }

  test("AQE splits the skewed join partition and keeps the result exact") {
    val c = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // default 1MB floor would clamp the 16KB split target back up
      c.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4KB")
      // the downstream aggregate reuses the join's hash partitioning, so
      // by default AQE declines the split (it would cost an extra
      // shuffle); force opts in — the split + re-exchange is the right
      // trade exactly when one straggler partition dominates the stage
      c.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val df = operators.Joins.skewAqe(spark, sf001)
      val rows = df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(4000))
      // identical rows with and without the skew rewrite
      c.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plain = operators.Joins.skewAqe(spark, sf001).collect()
      assert(rows.toSeq == plain.toSeq)
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _))
    }
  }

  test("sql pivot equals the DataFrame pivot") {
    val sqlForm = operators.SqlSurface.sqlPivot(spark, sf0001)
    val dfForm = Tables(spark, sf0001, "lineitem")
      .groupBy("l_returnflag").pivot("l_linestatus", Seq("O", "F"))
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    // same cell values modulo column naming
    assert(sqlForm.collect().map(_.toSeq).toSeq ==
      dfForm.collect().map(_.toSeq).toSeq)
  }
}
