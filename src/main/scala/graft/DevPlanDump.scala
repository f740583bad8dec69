package graft


/** Dev probe: print the formatted physical plan for the named keys. */
object DevPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    // honor the bench's core-count env so dumped plans carry the same
    // partition counts the bench session plans with (default stays 4)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "ERROR")
    val (flags, keys) = args.tail.partition(_.startsWith("--"))
    val logical = flags.contains("--logical")
    for (k <- keys) {
      println(s"===== $k =====")
      val df = SparkEntry.queries(k)(spark, dir)
      if (logical) println(df.queryExecution.optimizedPlan.treeString)
      else df.explain("formatted")
    }
    spark.stop()
  }
}
