package graft

import org.apache.spark.sql.functions._

class CorpusOpsSpec extends GraftSuite {

  test("hll sketch-merge estimate tracks the exact distinct count") {
    val row = operators.Aggregates.sketchMerge(spark, sf001).collect().head
    val est = row.getAs[Long]("est_total").toDouble
    val exact = Tables(spark, sf001, "events")
      .agg(countDistinct("user_id")).collect().head.getLong(0).toDouble
    assert(math.abs(est - exact) / exact < 0.05,
      s"HLL estimate $est vs exact $exact drifted >5%")
  }

  test("sequence packing is exhaustive and bins respect the budget") {
    val docs = Tables(spark, sf001, "documents")
    val bins = llm.CorpusOps.packSequences(spark, sf001).collect()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val maxDocTokens = docs
      .select(max(size(split(col("text"), " ")))).collect().head.getInt(0)
    // chunking bound: a bin closes within one doc of crossing the budget
    assert(bins.forall(_.getAs[Long]("bin_tokens") <= 1024L + maxDocTokens))
    // bins are dense per lang: 0..max with no gaps
    bins.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("bin")).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1L)
    }
  }

  test("per-label centroid matches a direct average") {
    val cents = llm.CorpusOps.embedCentroid(spark, sf001)
    val nLabels = Tables(spark, sf001, "embeddings")
      .select("label").distinct().count()
    assert(cents.count() == nLabels * 64)
    val c0 = cents.filter(col("label") === 0 && col("dim") === 1)
      .collect().head.getAs[Double]("centroid")
    val direct = Tables(spark, sf001, "embeddings")
      .filter(col("label") === 0)
      .select(avg(element_at(col("embedding"), 1).cast("double")))
      .collect().head.getDouble(0)
    assert(math.abs(c0 - direct) < 1e-9, s"snap-sum centroid $c0 vs $direct")
  }

  test("scaled knn join: fixture output identical to the pinned codebook") {
    // k = max(10, N/600) floors at the fixture codebook by design, so
    // the scale-aware operator must be bit-identical here; it diverges
    // only where the data outgrows the fixed codebook (measured linear
    // vs quadratic candidate growth in the round-5 scaling experiment)
    val pinned = llm.CorpusOps.knnJoin(spark, sf001)
    val scaled = llm.CorpusOps.knnJoinScaled(spark, sf001)
    assert(scaled.exceptAll(pinned).count() === 0)
    assert(pinned.exceptAll(scaled).count() === 0)
    assert(scaled.count() > 0)
  }

  test("PQ/ADC ranks the probe first and overlaps brute force") {
    val pq = llm.CorpusOps.annPq(spark, sf001).collect()
    assert(pq.length == 10)
    // the probe's subvectors sit in the codebook, so ADC reconstructs
    // it exactly: top hit is the probe at its own (unit) inner product
    assert(pq.head.getAs[Long]("vec_id") == 0L &&
      pq.head.getAs[Double]("sim") == 1.0)
    val sims = pq.map(_.getAs[Double]("sim")).toSeq
    assert(sims == sims.sorted.reverse, "PQ results not sorted by score")
    // the exact re-rank over the ADC top-50 shortlist recovers most of
    // the true top-10 even through the coarse 8-code quantizer
    val brute = llm.Similarity.simCosine(spark, sf001).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val overlap = pq.map(_.getAs[Long]("vec_id")).count(brute.contains)
    assert(overlap >= 7, s"PQ recall@10 too low: $overlap/10 vs brute force")
  }

  test("IVFPQ retrieval: no self-matches, ≤3 per query, strong overlap with exact-scored IVF") {
    val pq = llm.CorpusOps.knnJoinIvfPq(spark, sf001).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nbr")))
    assert(pq.forall { case (q, n) => q != n }, "self-match leaked")
    val perQ = pq.groupBy(_._1).view.mapValues(_.length)
    assert(perQ.values.forall(_ <= 3))
    // quality vs the exact-scored IVF over the SAME cells: exact top-3
    // ids are brittle when sims are nearly tied (quantization noise
    // reorders hair-thin gaps), so assert the standard ANN quality
    // measure instead — the re-ranked top-3 must hold most of the
    // exact top-3's similarity mass (measured 0.885 on this fixture)
    val pqSims = llm.CorpusOps.knnJoinIvfPq(spark, sf001).collect()
      .map(r => r.getAs[Double]("sim")).sum
    val ivfSims = llm.CorpusOps.knnJoin(spark, sf001).collect()
      .map(r => r.getAs[Double]("sim")).sum
    assert(pqSims >= 0.8 * ivfSims,
      s"IVFPQ quality too low: $pqSims vs exact $ivfSims")
  }

  test("scaled IVFPQ: fixture output identical to the pinned codebook") {
    // same floor contract as the scaled knn join: k = max(10, N/600)
    // resolves to the fixture's 10-cell codebook at every test SF, so
    // the composed production stack (scaled IVF cells × PQ/ADC scoring
    // × exact re-rank) must be bit-identical to llm_knn_join_ivfpq
    // here; divergence begins exactly where the data outgrows the
    // pinned codebook (the 10×/100× replica rows in BASELINE.md)
    val pinned = llm.CorpusOps.knnJoinIvfPq(spark, sf001)
    val scaled = llm.CorpusOps.knnJoinIvfPqScaled(spark, sf001)
    assert(scaled.exceptAll(pinned).count() === 0)
    assert(pinned.exceptAll(scaled).count() === 0)
    assert(scaled.count() > 0)
  }

  test("IVF rerank returns the probe first and overlaps brute force") {
    val ivf = llm.CorpusOps.annIvf(spark, sf001).collect()
    assert(ivf.head.getAs[Long]("vec_id") == 0L && ivf.head.getAs[Double]("sim") == 1.0)
    val sims = ivf.map(_.getAs[Double]("sim")).toSeq
    assert(sims == sims.sorted.reverse, "IVF results not sorted by sim")
    val brute = llm.Similarity.simCosine(spark, sf001).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val overlap = ivf.map(_.getAs[Long]("vec_id")).count(brute.contains)
    assert(overlap >= 5, s"IVF recall@10 too low: $overlap/10 vs brute force")
  }
}
