package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Additional near-dup families: SimHash, exact n-gram Jaccard, and
  * embedding-cosine dedup — complementing MinHash+LSH in [[Dedup]].
  *
  * Scale notes (100 TB):
  *  - SimHash is explode → codegen'd hash → one 64-column hash-aggregate
  *    per doc (no interpreted lambdas on the hot path), then 16-bit-chunk
  *    blocking for the pair search — hamming check only inside blocks;
  *  - n-gram Jaccard is the inverted-index (shingle-posting) join:
  *    intersection counts come from one equi-join on the shingle, so the
  *    quadratic step is bounded per posting list, never global;
  *  - embedding dedup reuses label blocking; survivors via left_anti.
  */
object DedupVariants {

  private val M = 64

  /** SimHash per doc: bit i = sign of Σ_words (bit_i(xxhash64(word)) ? +1 : -1). */
  def simhashes(spark: SparkSession, docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("word"))
      .withColumn("h", xxhash64(col("word")))
    val bitSums = (0 until M).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val agg = words.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until M).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sh.as("simhash"))
  }

  /** SimHash near-dup pairs: block on any equal 16-bit chunk, keep
    * hamming distance <= 12 (no oracle — xxhash64; properties in
    * LlmSpec).
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sims = simhashes(spark, Tables(spark, dir, "documents"))
    val chunked = sims.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("simhash"), j * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= 12)
      .orderBy("id_a", "id_b")
  }

  /** Exact 3-gram Jaccard via the shingle inverted index; pairs with
    * jaccard >= 0.6. Exact integer counts → the division is identical
    * across engines (oracle-verified).
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(Dedup.shingles(col("text")))).as("sh"))
      .repartition(col("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.select(col("sh"), col("doc_id").as("id_a"))
    val b = sh.select(col("sh"), col("doc_id").as("id_b"))
    val inter = a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes).withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("sz", "sz_a"), Seq("id_a"))
      .join(broadcast(sizes).withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("sz", "sz_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double")
          / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.6)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Embedding-cosine dedup: drop any vector that has a lower-id
    * neighbour with cosine >= 0.35 in the same label block; survivors
    * returned. Blocked self-join + left_anti — no global pairwise pass.
    */
  def embedDedup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val e = Tables(spark, dir, "embeddings")
    val a = e.select(col("label"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = e.select(col("label"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    val drops = a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(expr("cosine_sim(emb_a, emb_b)"), 6) >= 0.35)
      .select(col("id_b").as("vec_id")).distinct()
    Tables(spark, dir, "embeddings")
      .join(drops, Seq("vec_id"), "left_anti")
      .select("vec_id", "label")
      .orderBy("vec_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_dedup_simhash" -> simhashPairs,
    "llm_dedup_ngram_jaccard" -> ngramJaccard,
    "llm_dedup_embed" -> embedDedup
  )

  // range(1, n-2+1) — full trigrams only; docs under 3 words yield an
  // empty list, matching Dedup.shingles' greatest(n-2, 0) slice bound
  // (range(1, x) is empty for x < 1 in DuckDB).
  private val shingleSql =
    "list_transform(range(1, len(string_split(text, ' ')) - 1), " +
      "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] " +
      "|| ' ' || string_split(text, ' ')[i+2])"

  def oracle: Map[String, String] = Map(
    "llm_dedup_ngram_jaccard" ->
      (s"WITH sh AS (SELECT doc_id, unnest(list_distinct($shingleSql)) AS sh FROM documents), " +
        "sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1), " +
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter " +
        "FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT id_a, id_b, CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard " +
        "FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b " +
        "WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.6 " +
        "ORDER BY id_a, id_b"),
    "llm_dedup_embed" ->
      ("WITH e AS (SELECT vec_id, label, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings), " +
        "drops AS (SELECT DISTINCT b.vec_id FROM e a JOIN e b " +
        "ON a.label = b.label AND a.vec_id < b.vec_id " +
        "WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.35) " +
        "SELECT vec_id, label FROM embeddings " +
        "WHERE vec_id NOT IN (SELECT vec_id FROM drops) ORDER BY vec_id")
  )
}
