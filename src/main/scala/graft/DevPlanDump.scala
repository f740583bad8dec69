package graft


/** Dev probe: print the formatted physical plan for the named keys. */
object DevPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Sessions.local("4", "ERROR")
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
