package graft


/** Dev probe (not part of the declared surface): the Spark side of the
  * round-5 LLM-hot-path scaling experiment (r4 verdict item 2 — "extend
  * the 100× scaling experiment beyond relational shapes").
  *
  * For each corpus replica dir (1×/10×/100× of sf0.1 documents +
  * embeddings, staged shingle-disjoint by tools/stage_scale_replicas.py
  * so pair growth measures the OPERATOR, not an artificial clique), this
  * runs the four hot-path keys end-to-end (min of 2 warm reps, the
  * BASELINE.md protocol) and counts the candidate pairs each blocking
  * stage actually generated — via the operators' own extracted candidate
  * stages (ngramCandidates / nearCandidates / knnCandidates), so the
  * measurement cannot drift from the shipped plans.
  *
  * knn is measured in three codebook regimes: nCent=10 (the declared
  * key's fixture codebook — cell size grows linearly with the corpus,
  * the known fixed-k IVF failure mode); nCent=10·√scale (the per-query
  * latency rule, total candidates ∝ N^1.5 when the query set scales
  * with the corpus); and nCent=10·scale (constant cell size — the
  * regime that keeps TOTAL candidate volume linear for a full knn
  * JOIN, which is what a 100 TB self-join needs).
  *
  * Output: one "SPARK <dir> <key> time=<s> rows=<n>" line per key and
  * one "CAND <dir> <stage> pairs=<n>" line per candidate stage.
  * Pass -Dgraft.scale.candOnly=true to skip the SPARK timing section.
  */
object DevScaleLlm {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/scale/x10", "/tmp/scale/x100")
    // width sized to the LARGEST dir probed (the x100 replica)
    val spark = Sessions.localFor("32",
      dirs.maxBy(d => graft.plans.Tuning.widthFor(d, 1)), "ERROR")
    val keys = Seq("llm_dedup_ngram_jaccard", "llm_dedup_near",
      "llm_dedup_survivor", "llm_knn_join")
    // scale-proportional codebook for the scaled-k knn regime: the
    // replica dirs encode their scale in the name; sf0.1 is 1×
    def scaleOf(d: String): Int =
      if (d.endsWith("x100")) 100 else if (d.endsWith("x10")) 10 else 1
    val candOnly = sys.props.get("graft.scale.candOnly").contains("true")
    for (d <- dirs) {
      for (k <- keys if !candOnly) {
        val fn = SparkEntry.queries(k)
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = fn(spark, d).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val best = times.minBy(_._1)
        println(f"SPARK $d $k time=${best._1}%.3f rows=${best._2}")
      }
      val (ngramCand, _) = llm.DedupVariants.ngramCandidates(spark, d)
      println(s"CAND $d ngram_prefix_pairs pairs=${ngramCand.count()}")
      // since r7 llm_dedup_near routes through the PPJoin stage at
      // τ=0.5 (exact recall) — measure THAT stage's volume too; the
      // lower τ means longer prefixes, so linearity must be re-shown,
      // not inherited from the τ=0.6 row
      val (nearExact, _) = llm.DedupVariants.ngramCandidates(spark, d, 0.5)
      println(s"CAND $d near_prefix_pairs_tau05 pairs=${nearExact.count()}")
      val (nearCand, _) = llm.Dedup.nearCandidates(spark, d)
      println(s"CAND $d lsh_band_pairs pairs=${nearCand.count()}")
      val fixedK = llm.CorpusOps.knnCandidates(spark, d, nCent = 10)
      println(s"CAND $d knn_fixed_k10 pairs=${fixedK.count()}")
      val scaledCent = 10 * math.sqrt(scaleOf(d).toDouble).round.toInt
      val scaled = llm.CorpusOps.knnCandidates(spark, d, scaledCent)
      println(s"CAND $d knn_scaled_k$scaledCent pairs=${scaled.count()}")
      val linCent = 10 * scaleOf(d)
      val linear = llm.CorpusOps.knnCandidates(spark, d, linCent)
      println(s"CAND $d knn_linear_k$linCent pairs=${linear.count()}")
      // the SHIPPED data-derived codebook (llm_knn_join_scaled:
      // k = max(10, N/600), constant cell size)
      val shipped = llm.CorpusOps.scaledKnnCandidates(spark, d)
      println(s"CAND $d knn_shipped_scaled pairs=${shipped.count()}")
    }
    spark.stop()
  }
}
