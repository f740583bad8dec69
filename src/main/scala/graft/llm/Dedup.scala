package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.9 — document deduplication.
  *
  * Exact dedup: deterministic survivor (min doc_id per text) via one
  * window pass — at 100 TB this is a single shuffle on a text hash;
  * substituting `xxhash64(text)` for the raw text as the partition key
  * keeps shuffle rows narrow (applied here).
  *
  * Near-dup: MinHash+LSH, all per-row HOF expressions (codegen'd, no
  * UDFs): 3-word shingles → 16 minhash permutations via xxhash64(shingle,
  * seed) → 4 bands × 4 rows → candidate pairs from band-bucket joins.
  * At 100 TB the band explode+groupBy is the standard LSH shuffle; the
  * quadratic step runs only within a bucket.
  */
object Dedup {

  private def words(c: Column): Column = split(c, " ")

  /** 3-word shingles of the text as strings. */
  def shingles(text: Column): Column = {
    val w = words(text)
    transform(
      sequence(lit(1), greatest(size(w) - lit(2), lit(1))),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
        element_at(w, i + 2)))
  }

  /** 16-permutation MinHash signature: sig[i] = min over shingles of
    * xxhash64(shingle, i).
    */
  def minhashSignature(text: Column, perms: Int = 16): Column =
    transform(sequence(lit(0), lit(perms - 1)),
      i => array_min(transform(shingles(text), s => xxhash64(s, i))))

  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col("text")), col("text"))
      .orderBy("doc_id")
    Tables(spark, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Per-doc MinHash signatures (golden-file unit test; xxhash64 has no
    * DuckDB twin, so no oracle).
    */
  def minhashQuery(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), minhashSignature(col("text")).as("signature"))
      .orderBy("doc_id")

  /** LSH candidate pairs: docs sharing any of 4 bands (4 rows each),
    * scored by signature agreement (est. jaccard), kept at est >= 0.5.
    */
  def dedupNear(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), minhashSignature(col("text")).as("sig"))
    val banded = docs.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => xxhash64(slice(col("sig"), b * 4 + 1, lit(4)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast("double") / 16.0)
          .as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("id_a", "id_b")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_dedup_exact" -> dedupExact,
    "llm_minhash_signature" -> minhashQuery,
    "llm_dedup_near" -> dedupNear
  )

  def oracle: Map[String, String] = Map(
    "llm_dedup_exact" ->
      ("SELECT doc_id, lang, source, n_chars FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn " +
        "FROM documents) WHERE rn = 1 ORDER BY doc_id")
  )
}
