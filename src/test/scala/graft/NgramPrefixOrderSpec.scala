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
}
