package graft

import org.apache.spark.sql.functions._

/** Property checks for §2.9/§2.10 (SURVEY.md §5.2-5.3): dedup
  * idempotency, MinHash collision guarantees on the 8 real duplicates at
  * sf0.1, cosine bounds.
  */
class LlmSpec extends GraftSuite {
  private val sf01 = "/root/testdata/sf0.1"

  test("exact dedup is idempotent and removes the 8 sf0.1 duplicates") {
    val docs = Tables(spark, sf01, "documents")
    val total = docs.count()
    val distinctTexts = docs.select("text").distinct().count()
    val deduped = llm.Dedup.dedupExact(spark, sf01)
    assert(total - distinctTexts == 8, s"expected 8 dups, got ${total - distinctTexts}")
    assert(deduped.count() == distinctTexts)
    // survivors are unique by text -> dedup(dedup(x)) == dedup(x)
    assert(deduped.count() ==
      deduped.dropDuplicates("doc_id").count())
  }

  test("paragraph dedup: every chunk elects ONE winner; internal dups lose to the first occurrence") {
    val out = llm.Dedup.dedupParagraph(spark, sf01).cache()
    val docs = Tables(spark, sf01, "documents")
    assert(out.count() == docs.count(), "every document must report")
    assert(out.filter(col("n_kept") > col("n_chunks")).count() == 0)
    // independent recomputation of the invariant: total kept chunks ==
    // number of DISTINCT chunks corpus-wide (each elects exactly one)
    val chunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(posexplode(expr(
        "transform(sequence(0, (size(words) + 7) div 8 - 1), " +
          "i -> concat_ws(' ', slice(words, i * 8 + 1, 8)))")))
      .toDF("pos", "chunk")
    val distinctChunks = chunks.select("chunk").distinct().count()
    val totalKept = out.agg(sum("n_kept")).head.getLong(0)
    assert(totalKept == distinctChunks,
      s"kept $totalKept != $distinctChunks distinct chunks")
    // sub-document granularity is real: some doc keeps only PART of
    // itself (document-level dedup can't produce that state)
    assert(out.filter(col("n_kept") < col("n_chunks") &&
      col("n_kept") > 0).count() > 0, "no partially-deduped document")
  }

  test("paragraph dedup: NULL/empty texts excluded, winner is true (doc_id,pos) order") {
    // Spark's sequence(0,-1) on an empty word list fabricates [0,-1]
    // null chunks where DuckDB's range() yields zero rows (r10 advice);
    // both are filtered before chunking now. Winner election is
    // min(struct(doc_id,pos)) — no encoded-key arithmetic to overflow.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-par-").toString
    Seq(
      (1L, "a b c d e f g h i j k l m n o p"), // chunks (a..h)(i..p)
      (2L, null.asInstanceOf[String]),
      (3L, ""),
      (4L, "a b c d e f g h") // dup of doc 1's first chunk — loses
    ).toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val out = llm.Dedup.dedupParagraph(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 2L), (4L, 1L, 0L)),
      s"got ${out.toSeq}: NULL/empty docs must vanish, doc 4 loses to (1,0)")
  }

  test("exact duplicates have identical minhash signatures") {
    val sigs = llm.Dedup.minhashQuery(spark, sf01)
    val docs = Tables(spark, sf01, "documents").select("doc_id", "text")
    val joined = sigs.join(docs, "doc_id")
    val sigsPerText = joined.groupBy("text")
      .agg(countDistinct("signature").as("n_sigs"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val bad = sigsPerText.filter(col("n_sigs") =!= 1).count()
    assert(bad == 0, "duplicate texts produced differing signatures")
    assert(sigsPerText.count() > 0, "no duplicate groups found at sf0.1")
  }

  test("distributed minhash equals the per-row HOF definition") {
    val hof = Tables(spark, sf0001, "documents")
      .select(col("doc_id"),
        concat_ws(",", transform(llm.Dedup.minhashSignature(col("text")),
          _.cast("string"))).as("signature"))
    val dist = llm.Dedup.minhashQuery(spark, sf0001)
    assert(dist.exceptAll(hof).count() == 0 && hof.exceptAll(dist).count() == 0,
      "explode+agg minhash diverges from HOF definition")
  }

  test("near-dup pairs include every exact-duplicate pair") {
    val docs = Tables(spark, sf01, "documents").select("doc_id", "text")
    val a = docs.select(col("doc_id").as("id_a"), col("text"))
    val b = docs.select(col("doc_id").as("id_b"), col("text"))
    val dupPairs = a.join(b, "text").filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val candidates = llm.Dedup.dedupNear(spark, sf01).select("id_a", "id_b")
    val missed = dupPairs.exceptAll(candidates).count()
    assert(missed == 0, s"$missed exact-dup pairs missed")
    assert(dupPairs.count() > 0)
  }

  test("near-dup candidates exist even at sf0.01 (no exact dups there)") {
    assert(llm.Dedup.dedupNear(spark, sf001).count() > 0)
  }

  test("LSH near-dup output is a subset of the exact-recall output, " +
      "with 100% recall on this fixture") {
    // subset: both paths verify with the same true jaccard, so LSH can
    // only MISS pairs, never add them; equality holds here because this
    // fixture's true pairs all sit at j >= 0.8 where banding catch
    // probability is 0.9998 (measured 100% by DevNearRecall)
    val exact = llm.Dedup.dedupNear(spark, sf01)
    val lsh = llm.Dedup.dedupNearLsh(spark, sf01)
    assert(lsh.exceptAll(exact).count() == 0,
      "LSH emitted a pair the exact-recall path did not")
    assert(exact.exceptAll(lsh).count() == 0,
      "LSH missed a true pair on a fixture where recall is measured 100%")
    assert(exact.count() > 0)
  }

  test("cosine is bounded and self-similarity is 1") {
    val e = Tables(spark, sf0001, "embeddings")
    val sims = e.select(
      llm.Similarity.cosine(col("embedding"), col("embedding")).as("self"))
    val offSelf = sims.filter(abs(col("self") - 1.0) > 1e-9).count()
    assert(offSelf == 0)
    val top = llm.Similarity.simCosine(spark, sf0001).collect()
    assert(top.head.getLong(0) == 0L && math.abs(top.head.getDouble(1) - 1.0) < 1e-9,
      "probe must be its own nearest neighbour")
    assert(top.forall(r => r.getDouble(1) <= 1.0 + 1e-9 && r.getDouble(1) >= -1.0 - 1e-9))
  }

  test("tfidf returns exactly top-5 per language") {
    val rows = llm.TextOps.tfidf(spark, sf001)
      .groupBy("lang").agg(count(lit(1)).as("n"), max("rnk").as("mx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n") <= 5 && r.getAs[Long]("mx") <= 5))
  }

  test("multimodal decode byte length equals n_chars for ASCII corpus") {
    val dec = llm.Multimodal.multimodalDecode(spark, sf0001)
    val docs = Tables(spark, sf0001, "documents").select("doc_id", "n_chars")
    val bad = dec.join(docs, "doc_id")
      .filter(col("n_bytes") =!= col("n_chars")).count()
    assert(bad == 0)
  }

  test("geomean lies between min and max") {
    val rows = functions.Extensions.udafGeomean(spark, sf0001).collect()
    val bounds = Tables(spark, sf0001, "orders")
      .groupBy("o_orderpriority")
      .agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (mn, mx) = bounds(r.getString(0))
      val g = r.getDouble(1)
      assert(g >= mn && g <= mx, s"${r.getString(0)}: $g outside [$mn,$mx]")
    }
  }
}
