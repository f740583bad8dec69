package graft

import org.apache.spark.sql.functions._

/** Property test for the config-gated PPJoin prefix ordering
  * (`spark.graft.ppjoin.dfOrdered`, r7 verdict #4): under EITHER global
  * order — raw hash (default) or (document-frequency, hash) — the
  * candidate set must be a superset of the brute-force truth at τ, and
  * the end-to-end jaccard join must return identical rows. This is what
  * makes the flag a safe one-flip switch when vocabulary skew arrives.
  */
class NgramPrefixOrderSpec extends GraftSuite {

  private val tau = 0.5

  private def withFlag[A](v: Boolean)(body: => A): A = {
    spark.conf.set("spark.graft.ppjoin.dfOrdered", v.toString)
    try body finally spark.conf.unset("spark.graft.ppjoin.dfOrdered")
  }

  /** brute-force truth: all pairs with trigram-jaccard ≥ τ */
  private lazy val truth: Set[(Long, Long)] = {
    val sets = Tables(spark, sf0001, "documents")
      .select(col("doc_id"),
        array_distinct(llm.Dedup.hashedShingles(col("text"))).as("shs"))
    val a = sets.select(col("doc_id").as("id_a"), col("shs").as("sa"))
    val b = sets.select(col("doc_id").as("id_b"), col("shs").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("inter") * 1.0 >=
        (size(col("sa")) + size(col("sb")) - col("inter")) * tau)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def candidates(dfOrdered: Boolean): Set[(Long, Long)] =
    withFlag(dfOrdered) {
      llm.DedupVariants.ngramCandidates(spark, sf0001, tau)._1
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

  test("hash-ordered prefixes: candidates ⊇ brute-force truth") {
    val cand = candidates(dfOrdered = false)
    assert(truth.nonEmpty, "vacuous corpus — no true pairs at τ=0.5")
    val missed = truth -- cand
    assert(missed.isEmpty, s"prefix filter missed true pairs: $missed")
  }

  test("df-ordered prefixes: candidates ⊇ brute-force truth, and the " +
      "end-to-end jaccard join is flag-independent") {
    val cand = candidates(dfOrdered = true)
    val missed = truth -- cand
    assert(missed.isEmpty, s"df-ordered prefix missed true pairs: $missed")
    val default = llm.DedupVariants.ngramJaccard(spark, sf0001)
      .collect().map(_.toString).sorted
    val flipped = withFlag(true) {
      llm.DedupVariants.ngramJaccard(spark, sf0001)
        .collect().map(_.toString).sorted
    }
    assert(default.sameElements(flipped),
      "jaccard results differ between prefix orderings")
  }

  private def withMode[A](v: String)(body: => A): A = {
    spark.conf.set("spark.graft.ppjoin.dfOrdered", v)
    try body finally spark.conf.unset("spark.graft.ppjoin.dfOrdered")
  }

  test("auto gate: off on the fixture, flips on a skewed corpus and " +
      "drops candidate volume, recall intact") {
    llm.DedupVariants.clearAutoGateMemo()
    def cand(dir: String): Set[(Long, Long)] =
      llm.DedupVariants.ngramCandidates(spark, dir, tau)._1
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // fixture corpus: hottest shingle df share ≤ ~0.02 — the gate must
    // stay OFF (auto ≡ hash-ordered candidates)
    assert(withMode("auto")(cand(sf0001)) == candidates(dfOrdered = false),
      "auto flipped df ordering on the un-skewed fixture")
    // skewed synthetic corpus: every doc opens with the same 4-word
    // boilerplate (two shingles with df share 1.0 — three orders of
    // magnitude beyond the fixture), unique tails, plus one genuine
    // duplicate pair for a nonempty truth set
    import spark.implicits._
    val dir = Staging.tempDir("skew_corpus")
    val docs = (0 until 80).map { i =>
      (i.toLong, "alpha beta gamma delta " +
        (0 until 8).map(j => s"u${i}w$j").mkString(" "))
    } :+ (100L, "alpha beta gamma delta same same2 same3 same4 " +
      "same5 same6 same7 same8") :+
      (101L, "alpha beta gamma delta same same2 same3 same4 " +
        "same5 same6 same7 same8")
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val truthSkew: Set[(Long, Long)] = {
      val sets = Tables(spark, dir, "documents")
        .select(col("doc_id"),
          array_distinct(llm.Dedup.hashedShingles(col("text"))).as("shs"))
      val a = sets.select(col("doc_id").as("id_a"), col("shs").as("sa"))
      val b = sets.select(col("doc_id").as("id_b"), col("shs").as("sb"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
        .filter(col("inter") * 1.0 >=
          (size(col("sa")) + size(col("sb")) - col("inter")) * tau)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(truthSkew.nonEmpty, "skew corpus lost its duplicate pair")
    val candHash = withMode("false")(cand(dir))
    val candAuto = withMode("auto")(cand(dir))
    val candDf = withMode("true")(cand(dir))
    assert(candAuto == candDf,
      "auto did NOT flip to df ordering on the skewed corpus")
    assert(candAuto.size * 2 < candHash.size,
      s"df ordering did not drop candidate volume: " +
        s"auto=${candAuto.size} hash=${candHash.size}")
    assert((truthSkew -- candAuto).isEmpty,
      s"df-ordered candidates missed true pairs: ${truthSkew -- candAuto}")
  }
}
