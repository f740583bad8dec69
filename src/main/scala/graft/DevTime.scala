package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time a subset of queries (args) at SPARK_GRAFT_SF_DIR.
  * Usage: sbt "runMain graft.DevTime llm_dedup_ngram_jaccard ..."
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count() // warm-up
    val names = if (args.nonEmpty) args.toSeq else Seq("llm_dedup_ngram_jaccard")
    for (rep <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[devtime] rep$rep $n rows=$c ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
