package graft

/** Regression tests for llm.Pipeline edge cases that the fixture corpus
  * cannot reach (all fixture docs have ≥10 words, all doc_ids are small).
  */
class PipelineSpec extends GraftSuite {

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("contamination survives docs shorter than the 8-gram window") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dir = writeDocs(Seq(
      (1L, "tiny doc", "en", "src0", 8L), // 2 words -> zero 8-grams, must not throw
      (2L, "one two three four five six seven", "en", "src1", 33L), // exactly 7
      (3L, shared, "en", "src0", 60L),
      (4L, shared, "en", "src1", 60L)))
    val out = llm.Pipeline.contamination(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(4L),
      s"only the train doc sharing 8-grams should be flagged, got ${out.toSeq}")
    assert(out.head.getLong(2) == 3L) // 3 distinct shared 8-grams in a 10-word doc
  }

  test("shard assignment is overflow-free for 64-bit doc ids") {
    val dir = writeDocs(Seq(
      (Long.MaxValue, "a b c", "en", "src1", 5L),
      (Long.MaxValue - 1, "d e f", "en", "src1", 5L),
      (8360000001L, "g h i", "en", "src1", 5L), // above the old wrap point
      (7L, "j k l", "en", "src1", 5L)))
    val shards = llm.Pipeline.shardAssign(spark, dir)
      .collect().map(_.getLong(0))
    assert(shards.forall(s => s >= 0 && s < 8), s"shard out of range: ${shards.toSeq}")
  }
}
