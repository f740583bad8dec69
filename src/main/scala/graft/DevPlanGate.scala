package graft

/** Dev probe: does [[plans.RewriteExistsOther]]'s stats gate plant the
  * pre-aggregation exchange for a given data dir? The gate calibration
  * (128 MiB of ESTIMATED branch bytes — note Catalyst's size-only
  * estimator scales relation bytes by the projected column-width ratio)
  * is plan-checked here rather than assumed: round-8 found the original
  * 1 GiB default silently declining on the fact-×100 replica because
  * the 2-of-11-column subquery projection shrank the estimate to
  * ~300 MB.
  *
  * Usage: runMain graft.DevPlanGate <dir> [key]
  */
object DevPlanGate {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val key = args.lift(1).getOrElse("sql_tpch_q21x")
    val spark = Sessions.localFor("32", dir, "ERROR")
    val df = SparkEntry.queries(key)(spark, dir)
    val planted = df.queryExecution.optimizedPlan.toString
      .contains("RepartitionByExpression")
    println(s"[plan-gate] dir=$dir key=$key repartitionPlanted=$planted")
    // per-table scan counts in the EXECUTED plan (subqueries + reuse
    // included) — the evidence line for scan-dedup rewrites
    df.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.ReusedSubqueryExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: ReusedExchangeExec | _: ReusedSubqueryExec => Seq(p)
      case _ =>
        p +: (p.children ++ p.subqueries).flatMap(walk)
    }
    val scans = walk(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.getName).mkString(",") }
      .groupBy(identity).view.mapValues(_.size).toMap
    val reused = walk(df.queryExecution.executedPlan)
      .count { case _: ReusedExchangeExec | _: ReusedSubqueryExec => true
               case _ => false }
    println(s"[plan-gate] scans=$scans reusedNodes=$reused")
    if (sys.env.contains("SPARK_GRAFT_DUMP_PLAN")) {
      println("[plan-gate] ===== optimized =====")
      println(df.queryExecution.optimizedPlan.treeString)
    }
    spark.stop()
  }
}
