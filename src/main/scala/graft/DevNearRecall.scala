package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not part of the declared surface): measures LSH banding
  * recall for llm_dedup_near against the EXACT jaccard>=0.5 pair set, per
  * scale factor. Deterministic (xxhash64 seeds fixed), so "0 missed" here
  * is a stable property of the fixture, not a lucky draw — the evidence
  * needed before making llm_dedup_near oracle-able (r4 verdict item 7).
  */
object DevNearRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val sets = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          array_distinct(llm.Dedup.hashedShingles(col("text"))).as("shs"))
        .localCheckpoint()
      // exact truth: all-pairs shingle equi-join (small corpus, dev only)
      val post = sets.select(col("doc_id"), explode(col("shs")).as("sh"))
      val truth = post.select(col("sh"), col("doc_id").as("id_a"))
        .join(post.select(col("sh"), col("doc_id").as("id_b")), Seq("sh"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
        .join(sets.select(col("doc_id").as("id_a"), size(col("shs")).as("sz_a")), "id_a")
        .join(sets.select(col("doc_id").as("id_b"), size(col("shs")).as("sz_b")), "id_b")
        .filter(col("inter").cast("double")
          / (col("sz_a") + col("sz_b") - col("inter")) >= 0.5)
        .select("id_a", "id_b")
      // LSH banding candidates (same banding as Dedup.dedupNear)
      val sigs = llm.Dedup.minhashSignatures(spark, Tables(spark, dir, "documents"))
      val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => xxhash64(slice(col("sig"), b * 4 + 1, lit(4)), b))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val cand = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
        .join(banded.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
          Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      val nTruth = truth.count()
      val missed = truth.except(cand).count()
      println(s"RECALL $sf: truth=$nTruth missed=$missed")
    }
    spark.stop()
  }
}
