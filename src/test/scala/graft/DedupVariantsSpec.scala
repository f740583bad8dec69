package graft

import org.apache.spark.sql.functions._

/** Properties for SimHash, n-gram Jaccard, embedding dedup, and ANN. */
class DedupVariantsSpec extends GraftSuite {
  private val sf01 = "/root/testdata/sf0.1"

  test("exact duplicates share identical simhashes (sf0.1)") {
    val docs = Tables(spark, sf01, "documents")
    val sims = llm.DedupVariants.simhashes(spark, docs)
    val joined = sims.join(docs.select("doc_id", "text"), "doc_id")
    val bad = joined.groupBy("text")
      .agg(countDistinct("simhash").as("k"), count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("k") =!= 1).count()
    assert(bad == 0)
  }

  test("simhash pair search finds every exact-dup pair with hamming 0") {
    val docs = Tables(spark, sf01, "documents").select("doc_id", "text")
    val a = docs.select(col("doc_id").as("id_a"), col("text"))
    val b = docs.select(col("doc_id").as("id_b"), col("text"))
    val dupPairs = a.join(b, "text").filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val found = llm.DedupVariants.simhashPairs(spark, sf01)
    val missed = dupPairs.exceptAll(found.select("id_a", "id_b")).count()
    assert(missed == 0)
    val zeroHam = found.filter(col("hamming") === 0)
      .select("id_a", "id_b")
    assert(dupPairs.exceptAll(zeroHam).count() == 0)
  }

  test("ngram jaccard reports 1.0 exactly for exact-dup pairs") {
    val docs = Tables(spark, sf01, "documents").select("doc_id", "text")
    val a = docs.select(col("doc_id").as("id_a"), col("text"))
    val b = docs.select(col("doc_id").as("id_b"), col("text"))
    val dupPairs = a.join(b, "text").filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val ones = llm.DedupVariants.ngramJaccard(spark, sf01)
      .filter(col("jaccard") === 1.0).select("id_a", "id_b")
    assert(dupPairs.exceptAll(ones).count() == 0)
  }

  test("embed dedup survivors have no prior near-neighbour") {
    val survivors = llm.DedupVariants.embedDedup(spark, sf001)
    val all = Tables(spark, sf001, "embeddings").count()
    val n = survivors.count()
    assert(n > 0 && n <= all)
    // dedup is idempotent: survivors of survivors = survivors (spot via count stability)
    assert(survivors.select("vec_id").distinct().count() == n)
  }

  test("ANN: probe tops its own results and candidates share its bucket") {
    val res = llm.AnnLsh.annTopK(spark, sf0001).collect()
    assert(res.nonEmpty)
    assert(res.head.getLong(0) == 0L && math.abs(res.head.getDouble(1) - 1.0) < 1e-9)
    val bk = llm.AnnLsh.buckets(spark, sf0001)
    val probeBucket = bk.filter(col("vec_id") === 0).head.getLong(1)
    val ids = res.map(_.getLong(0)).toSet
    val inBucket = bk.filter(col("bucket") === probeBucket)
      .collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(inBucket))
    // bucket-local sims must equal brute-force sims for the same ids
    val bruteMap = Tables(spark, sf0001, "embeddings")
      .crossJoin(broadcast(Tables(spark, sf0001, "embeddings")
        .filter(col("vec_id") === 0).select(col("embedding").as("probe"))))
      .select(col("vec_id"),
        round(llm.Similarity.cosine(col("embedding"), col("probe")), 4).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    res.foreach(r => assert(math.abs(bruteMap(r.getLong(0)) - r.getDouble(1)) < 1e-9))
  }

  test("token counts: subword >= whitespace tokens, both positive") {
    val bad = llm.TextQuality.tokenCount(spark, sf0001)
      .filter(col("subword_tokens") < col("ws_tokens") || col("ws_tokens") <= 0)
      .count()
    assert(bad == 0)
  }

  test("quality score bounded in [0,1]") {
    val bad = llm.TextQuality.qualityScore(spark, sf0001)
      .filter(col("quality") < 0 || col("quality") > 1).count()
    assert(bad == 0)
  }

  test("fingerprints: equal texts get equal hashes, prefix differs from full") {
    val fp = llm.TextQuality.fingerprint(spark, sf01)
    val docs = Tables(spark, sf01, "documents").select("doc_id", "text")
    val bad = fp.join(docs, "doc_id").groupBy("text")
      .agg(countDistinct("doc_hash").as("k"), count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("k") =!= 1).count()
    assert(bad == 0)
  }

  test("substring dedup: planted cross-doc span found, disjoint corpus clean") {
    import spark.implicits._
    // 12-word span planted in docs 1 and 2 at different offsets; docs 3/4
    // share no 8-word window with anything (distinct word vocabularies)
    val span = (1 to 12).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $span delta epsilon"),
      (2L, s"$span zeta eta theta iota kappa lambda"),
      (3L, (1 to 20).map(i => s"only3w$i").mkString(" ")),
      (4L, (1 to 20).map(i => s"only4w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = llm.DedupVariants.substringSpans(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a planted 12-word span yields 12-8+1 = 5 shared 8-word windows
    assert(out(1L)._2 == 5, s"doc1 dup_spans = ${out(1L)._2}, want 5")
    assert(out(2L)._2 == 5, s"doc2 dup_spans = ${out(2L)._2}, want 5")
    assert(out(3L) == (13L, 0L) && out(4L) == (13L, 0L),
      "disjoint docs must report zero duplicated windows")
    // total windows: doc1 has 3+12+2=17 words -> 10 windows
    assert(out(1L)._1 == 10)
  }

  test("substring dedup: identical corpora mark every window duplicated") {
    import spark.implicits._
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val bad = llm.DedupVariants.substringSpans(docs)
      .filter(col("dup_ratio") =!= 1.0 || col("n_spans") =!= 23).count()
    assert(bad == 0)
  }
}
