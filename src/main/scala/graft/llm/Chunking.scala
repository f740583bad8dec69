package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data document chunking + language-model quality scoring —
  * SURVEY.md §2.9 extensions.
  *
  * Scale notes (100 TB):
  *  - chunking is pure map-side (explode of a per-row sequence; no
  *    shuffle at all) — the output is written partition-parallel;
  *  - cross-entropy builds the unigram LM with ONE word aggregate; the
  *    LM table is vocab-sized (dimension-scale) and broadcast back onto
  *    the token stream, so the corpus shuffles once on doc_id for the
  *    per-doc sum. At extreme vocab (>~100M terms) swap the broadcast
  *    for a shuffle hash join on word — the plan shape stays two
  *    exchanges total.
  */
object Chunking {

  private val ChunkLen = 64
  private val Stride = 48 // overlap = ChunkLen - Stride = 16 tokens

  /** Overlapping token-window chunks (len 64, stride 48): every token is
    * covered by at least one chunk, consecutive chunks share 16 tokens,
    * and chunk ids are derivable from the start offset — the standard
    * context-window shaping step before tokenization. Start offsets stop
    * at `size - overlap` so a trailing remainder shorter than the overlap
    * never produces a chunk that adds no new tokens.
    */
  def chunkSplit(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), w.as("w"),
        explode(sequence(lit(1),
          greatest(size(w) - lit(ChunkLen - Stride), lit(1)),
          lit(Stride))).as("s"))
      .select(col("doc_id"),
        expr(s"CAST((s - 1) DIV $Stride AS BIGINT)").as("chunk_id"),
        size(slice(col("w"), col("s"), lit(ChunkLen))).cast("long")
          .as("n_tokens"),
        array_join(slice(col("w"), col("s"), lit(ChunkLen)), " ")
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Per-document cross-entropy under the corpus unigram LM:
    * H(doc) = -(1/n) Σ_tokens ln p(word), p(word) = ct(word)/N. The
    * canonical "surprise" quality score (low = templated/repetitive,
    * high = rare-token-heavy). Determinism across engines: each token's
    * ln() is snapped to a 1e-6 grid as an INTEGER before the per-doc sum,
    * so the sum is order-independent and the only float ops (one ln, one
    * final division) run on identical inputs in both engines — the same
    * integer-snap pattern as Det.moneySum / llm_embed_centroid.
    */
  def crossEntropy(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val lm = words.groupBy("word").agg(count(lit(1)).as("ct"))
    val total = lm.agg(sum("ct").as("n_total"))
    words
      .join(broadcast(lm), "word")
      .crossJoin(broadcast(total))
      .withColumn("q",
        round(log(col("ct").cast("double") / col("n_total").cast("double"))
          * lit(1e6), 0).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("q").as("sq"))
      .select(col("doc_id"), col("n_tokens"),
        (-col("sq").cast("double")
          / (col("n_tokens") * lit(1000000L)).cast("double"))
          .as("cross_entropy"))
      .orderBy("doc_id")
  }

  /** Within-doc unigram entropy H = -Σ p·ln p over the document's OWN
    * word distribution — the diversity/repetition signal dual to
    * [[crossEntropy]] (which scores against the corpus LM). Low entropy
    * = repetitive doc. Same micro-unit grid as crossEntropy: ln is
    * snapped to integer micro-nats BEFORE the sum, so the aggregate is
    * an exact integer in both engines and the final division is one
    * double op on identical operands. Two doc-keyed hash aggregates +
    * one partitioned window for the total — no global shuffle.
    */
  def wordEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ct = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("c"))
    ct
      .withColumn("n", sum("c").over(Window.partitionBy("doc_id")))
      .withColumn("lq",
        round(log(col("c").cast("double") / col("n").cast("double"))
          * lit(1e6), 0).cast("long"))
      .groupBy("doc_id")
      .agg(max("n").as("n_tokens"), sum(col("c") * col("lq")).as("sq"))
      .select(col("doc_id"), col("n_tokens"),
        (-col("sq").cast("double")
          / (col("n_tokens") * lit(1000000L)).cast("double"))
          .as("word_entropy"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_chunk_split" -> chunkSplit,
    "llm_word_entropy" -> wordEntropy,
    "llm_cross_entropy" -> crossEntropy
  )

  def oracle: Map[String, String] = Map(
    "llm_word_entropy" ->
      ("WITH wds AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word " +
        "FROM documents), " +
        "ct AS (SELECT doc_id, word, count(*) AS c FROM wds GROUP BY 1, 2), " +
        "tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM ct GROUP BY 1), " +
        "q AS (SELECT ct.doc_id AS doc_id, c, " +
        "CAST(round(ln(CAST(c AS DOUBLE) / n) * 1e6) AS BIGINT) AS lq " +
        "FROM ct JOIN tot ON ct.doc_id = tot.doc_id) " +
        "SELECT q.doc_id AS doc_id, max(tot.n) AS n_tokens, " +
        "CAST(-sum(c * lq) AS DOUBLE) / (max(tot.n) * 1000000) AS word_entropy " +
        "FROM q JOIN tot ON q.doc_id = tot.doc_id GROUP BY 1 ORDER BY doc_id"),
    "llm_chunk_split" ->
      (s"WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        s"st AS (SELECT doc_id, w, unnest(range(1, " +
        s"greatest(len(w) - ${ChunkLen - Stride}, 1) + 1, $Stride)) AS s FROM d) " +
        s"SELECT doc_id, CAST((s - 1) // $Stride AS BIGINT) AS chunk_id, " +
        s"CAST(len(list_slice(w, s, s + ${ChunkLen - 1})) AS BIGINT) AS n_tokens, " +
        s"array_to_string(list_slice(w, s, s + ${ChunkLen - 1}), ' ') AS chunk_text " +
        "FROM st ORDER BY doc_id, chunk_id"),
    "llm_cross_entropy" ->
      ("WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word " +
        "FROM documents), " +
        "lm AS (SELECT word, count(*) AS ct FROM w GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n_total FROM lm), " +
        "q AS (SELECT doc_id, CAST(round(ln(CAST(ct AS DOUBLE) / n_total) " +
        "* 1e6) AS BIGINT) AS q FROM w JOIN lm USING (word) CROSS JOIN tot) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "-CAST(sum(q) AS DOUBLE) / (count(*) * 1000000) AS cross_entropy " +
        "FROM q GROUP BY doc_id ORDER BY doc_id")
  )
}
