package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (not part of the declared surface): runs the LLM hot-path
  * operators on the 10×/100× replica dirs staged by
  * tools/stage_scale_replicas.py, printing wall time (min of 2 warm reps,
  * the BASELINE.md protocol) AND the candidate-pair volume each blocked
  * join generated — the r4 verdict asked for the blocking bounds as
  * MEASUREMENTS, not design arguments.
  *
  * Candidate counts restate each operator's internal candidate stream
  * (PPJoin prefix-postings join for jaccard/survivor; LSH band-bucket
  * join for near) with the same expressions the operators use.
  */
object DevScaleLlm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CosineSimilarity.register(spark)

    def time2(f: () => Long): (Double, Long) = {
      var rows = 0L
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); rows = f(); (System.nanoTime() - t0) / 1e9
      }
      (times.min, rows)
    }

    def candJaccard(dir: String): Long = {
      val tau = 0.6
      val sets = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          array_distinct(llm.Dedup.hashedShingles(col("text"))).as("shs"))
      val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val prefix = sets
        .select(col("doc_id"), size(col("shs")).as("sz"),
          explode(slice(array_sort(col("shs")), lit(1),
            (size(col("shs"))
              - ceil(size(col("shs")) * lit(tau)) + lit(1)).cast("int")))
            .as("sh"))
        .repartition(nPart, col("sh"))
      prefix.select(col("sh"), col("doc_id").as("id_a"), col("sz").as("sz_a"))
        .join(prefix.select(col("sh"), col("doc_id").as("id_b"),
          col("sz").as("sz_b")).hint("shuffle_hash"), Seq("sh"))
        .filter(col("id_a") < col("id_b") &&
          col("sz_b") * lit(1.0) >= col("sz_a") * lit(tau) &&
          col("sz_a") * lit(1.0) >= col("sz_b") * lit(tau))
        .count()
    }

    def candNear(dir: String): Long = {
      val sigs = llm.Dedup.minhashSignatures(spark, Tables(spark, dir, "documents"))
      val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => xxhash64(slice(col("sig"), b * 4 + 1, lit(4)), b))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
        .join(banded.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
          Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .count()
    }

    val dirs = args.toSeq match {
      case Nil => Seq("/root/testdata/sf0.1", "/tmp/scale/x10", "/tmp/scale/x100")
      case ds => ds
    }
    val keys = Seq("llm_dedup_ngram_jaccard", "llm_dedup_near",
      "llm_dedup_survivor", "llm_knn_join")
    for (dir <- dirs) {
      for (key <- keys) {
        val (sec, rows) = time2(() => SparkEntry.queries(key)(spark, dir).count())
        println(f"SCALE $dir $key time=$sec%.3f rows=$rows")
      }
      println(s"SCALE $dir cand_jaccard=${candJaccard(dir)}")
      println(s"SCALE $dir cand_near=${candNear(dir)}")
    }
    spark.stop()
  }
}
