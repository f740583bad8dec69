package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: print the formatted physical plan for the named keys. */
object DevPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- args.tail) {
      println(s"===== $k =====")
      SparkEntry.queries(k)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
