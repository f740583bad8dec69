package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data text pipeline: language ID, quality scoring, token
  * counting, document fingerprinting.
  *
  * Scale notes (100 TB): quality/token/fingerprint are pure per-row
  * expressions (no shuffle at all — they pipeline inside the scan's
  * WholeStageCodegen where possible). Language ID builds per-lang
  * profiles with one aggregation and broadcasts them (profiles are
  * dimension-sized by construction: 10 terms × n_languages).
  */
object TextQuality {

  private val stopwords = Seq("the", "a", "big", "small")

  /** N-gram-profile language ID: per-lang top-10 word profile (by term
    * frequency, ties by word), documents scored by distinct-word overlap
    * with each profile, argmax with deterministic tie-break on lang.
    * The fixture vocabulary is shared across langs, so ACCURACY is
    * meaningless — the mechanism (profile build → broadcast → score →
    * argmax) is what this operator demonstrates and verifies.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val words = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("word"))
    val profRank = Window.partitionBy("plang")
      .orderBy(col("tf").desc, col("word"))
    val profiles = words
      .groupBy(col("lang").as("plang"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("rnk", row_number().over(profRank))
      .filter(col("rnk") <= 10)
      .select("plang", "word")
    val docWords = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(split(col("text"), " "))).as("word"))
    val scored = docWords.join(broadcast(profiles), Seq("word"))
      .groupBy("doc_id", "lang", "plang")
      .agg(count(lit(1)).as("score"))
    val best = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("plang"))
    scored.withColumn("r", row_number().over(best))
      .filter(col("r") === 1)
      .select(col("doc_id"), col("lang").as("actual"),
        col("plang").as("predicted"), col("score"))
      .orderBy("doc_id")
  }

  /** Heuristic quality score: stopword ratio + length saturation —
    * exact arithmetic, identical across engines.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    val stopArr = array(stopwords.map(lit): _*)
    val nTok = size(w).cast("double")
    val stopRatio =
      size(filter(w, x => array_contains(stopArr, x))).cast("double") / nTok
    val lenScore = least(col("n_chars").cast("double") / 500.0, lit(1.0))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(w).cast("long").as("n_tokens"),
        stopRatio.as("stopword_ratio"),
        lenScore.as("len_score"),
        (lit(0.5) * (lit(1.0) - stopRatio) + lit(0.5) * lenScore)
          .as("quality"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens + a BPE-ish subword estimate
    * (ceil(len/4) pieces per word) — exact integer arithmetic.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(w).cast("long").as("ws_tokens"),
        aggregate(
          transform(w, x => ((length(x) + lit(3)) / lit(4)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("subword_tokens"),
        col("n_chars"))
      .orderBy("doc_id")
  }

  /** Polynomial rolling-hash fingerprints (Karp-Rabin, base 31 mod
    * 1e9+7): whole-document hash plus a first-64-char prefix hash —
    * exact integer folds, identical in both engines (Spark's explicit
    * zero and DuckDB's first-element seed agree because f(0,c)=c).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val M = 1000000007L
    def roll(chars: org.apache.spark.sql.Column) =
      aggregate(transform(chars, c => ascii(c).cast("long")),
        lit(0L), (acc, x) => (acc * 31L + x) % M)
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        roll(split(col("text"), "")).as("doc_hash"),
        roll(split(substring(col("text"), 1, 64), "")).as("prefix64_hash"))
      .orderBy("doc_id")
  }

  /** GPT-2-style PRE-tokenization by regex (contractions, space-prefixed
    * word/number runs, punctuation runs) — the pass that feeds BPE
    * ([[TextOps.bpeMergeStep]]). The pattern is RE2-safe (no lookahead —
    * the oracle engine's regex has none), so both engines extract the
    * identical token stream; verified on punctuated text in the spec and
    * bit-exact through the oracle on the corpus.
    */
  def tokenizeRegex(spark: SparkSession, dir: String): DataFrame = {
    val pat = "'[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"
    Tables(spark, dir, "documents")
      .withColumn("toks",
        expr(s"""regexp_extract_all(text, "$pat", 0)"""))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_regex_tokens"),
        array_join(slice(col("toks"), 1, 5), "|").as("head5"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition filter (Rae et al. 2021 §A1.1 rules,
    * adapted to this fixture's space-separated text): per document,
    * the fraction of tokens taken by the single most frequent word,
    * the fraction of bigrams taken by the most frequent bigram, and
    * the fraction of trigram OCCURRENCES that are duplicates
    * (1 - distinct/total), each thresholded into a named verdict.
    *
    * ONE corpus scan: the three gram streams are tagged structs
    * concatenated per row and exploded together, then counted with a
    * single (doc, n, gram)-keyed aggregate and collapsed to per-doc
    * stats — two narrow shuffles both keyed by doc_id, no joins, no
    * windows. At 100 TB this is the same explode + hash-agg topology
    * as llm_minhash_signature.
    */
  def repetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    val bigrams = Dedup.bigrams(col("text"))
    val grams = Tables.wide(spark, dir, "documents")
      .select(col("doc_id"), explode(concat(
        transform(w, g => struct(lit(1).as("n"), g.as("gram"))),
        transform(bigrams, g => struct(lit(2).as("n"), g.as("gram"))),
        transform(Dedup.shingles(col("text")),
          g => struct(lit(3).as("n"), g.as("gram"))))).as("g"))
      .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
    val st = grams.groupBy("doc_id", "n", "gram")
      .agg(count(lit(1)).as("ct"))
      .groupBy("doc_id", "n")
      .agg(max("ct").as("mx"), sum("ct").as("tot"), count(lit(1)).as("dst"))
    st.groupBy("doc_id")
      .agg(
        round(max(when(col("n") === 1,
          col("mx").cast("double") / col("tot"))), 4).as("top_word_frac"),
        round(max(when(col("n") === 2,
          col("mx").cast("double") / col("tot"))), 4).as("top_bigram_frac"),
        round(max(when(col("n") === 3,
          lit(1.0) - col("dst").cast("double") / col("tot"))), 4)
          .as("dup_trigram_frac"))
      .withColumn("verdict",
        when(col("top_word_frac") > 0.15, "repetitive_word")
          .when(col("top_bigram_frac") > 0.08, "repetitive_bigram")
          .when(col("dup_trigram_frac") > 0.01, "repetitive_trigram")
          .otherwise("keep"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_tokenize_regex" -> tokenizeRegex,
    "llm_lang_id" -> langId,
    "llm_quality_score" -> qualityScore,
    "llm_token_count" -> tokenCount,
    "llm_repetition_filter" -> repetitionFilter,
    "llm_fingerprint" -> fingerprint
  )

  def oracle: Map[String, String] = Map(
    "llm_repetition_filter" ->
      ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
        "g AS (SELECT doc_id, 1 AS n, unnest(w) AS gram FROM d " +
        "UNION ALL SELECT doc_id, 2 AS n, unnest(list_transform(range(1, len(w)), " +
        "i -> w[i] || ' ' || w[i+1])) AS gram FROM d " +
        "UNION ALL SELECT doc_id, 3 AS n, unnest(list_transform(range(1, len(w) - 1), " +
        "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram FROM d), " +
        "per AS (SELECT doc_id, n, gram, count(*) AS ct FROM g GROUP BY 1, 2, 3), " +
        "st AS (SELECT doc_id, n, max(ct) AS mx, sum(ct) AS tot, count(*) AS dst " +
        "FROM per GROUP BY 1, 2), " +
        "f AS (SELECT doc_id, " +
        "round(max(CASE WHEN n = 1 THEN CAST(mx AS DOUBLE) / tot END), 4) AS top_word_frac, " +
        "round(max(CASE WHEN n = 2 THEN CAST(mx AS DOUBLE) / tot END), 4) AS top_bigram_frac, " +
        "round(max(CASE WHEN n = 3 THEN 1.0 - CAST(dst AS DOUBLE) / tot END), 4) AS dup_trigram_frac " +
        "FROM st GROUP BY 1) " +
        "SELECT doc_id, top_word_frac, top_bigram_frac, dup_trigram_frac, " +
        "CASE WHEN top_word_frac > 0.15 THEN 'repetitive_word' " +
        "WHEN top_bigram_frac > 0.08 THEN 'repetitive_bigram' " +
        "WHEN dup_trigram_frac > 0.01 THEN 'repetitive_trigram' " +
        "ELSE 'keep' END AS verdict FROM f ORDER BY doc_id"),
    "llm_tokenize_regex" ->
      ("SELECT doc_id, " +
        "CAST(len(regexp_extract_all(text, " +
        "'''[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+')) AS BIGINT) " +
        "AS n_regex_tokens, " +
        "array_to_string(list_slice(regexp_extract_all(text, " +
        "'''[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+'), 1, 5), '|') " +
        "AS head5 " +
        "FROM documents ORDER BY doc_id"),
    "llm_lang_id" ->
      ("WITH words AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents), " +
        "profiles AS (SELECT plang, word FROM " +
        "(SELECT lang AS plang, word, count(*) AS tf, " +
        "row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, word) AS rnk " +
        "FROM words GROUP BY lang, word) WHERE rnk <= 10), " +
        "docwords AS (SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS word FROM documents), " +
        "scored AS (SELECT doc_id, lang, plang, count(*) AS score " +
        "FROM docwords JOIN profiles USING (word) GROUP BY 1, 2, 3) " +
        "SELECT doc_id, actual, predicted, score FROM " +
        "(SELECT doc_id, lang AS actual, plang AS predicted, score, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS r " +
        "FROM scored) WHERE r = 1 ORDER BY doc_id"),
    "llm_quality_score" ->
      ("SELECT doc_id, lang, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(len(list_filter(string_split(text, ' '), " +
        "w -> list_contains(['the','a','big','small'], w))) AS DOUBLE) " +
        "/ len(string_split(text, ' ')) AS stopword_ratio, " +
        "least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS len_score, " +
        "0.5 * (1.0 - CAST(len(list_filter(string_split(text, ' '), " +
        "w -> list_contains(['the','a','big','small'], w))) AS DOUBLE) " +
        "/ len(string_split(text, ' '))) " +
        "+ 0.5 * least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS quality " +
        "FROM documents ORDER BY doc_id"),
    "llm_token_count" ->
      ("SELECT doc_id, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens, " +
        "CAST(list_sum(list_transform(string_split(text, ' '), " +
        "w -> (length(w) + 3) // 4)) AS BIGINT) AS subword_tokens, " +
        "n_chars FROM documents ORDER BY doc_id"),
    "llm_fingerprint" ->
      ("SELECT doc_id, " +
        "list_reduce(list_transform(range(1, length(text) + 1), " +
        "i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)), " +
        "(a, b) -> (a * 31 + b) % 1000000007) AS doc_hash, " +
        "list_reduce(list_transform(range(1, least(length(text), 64) + 1), " +
        "i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)), " +
        "(a, b) -> (a * 31 + b) % 1000000007) AS prefix64_hash " +
        "FROM documents ORDER BY doc_id")
  )
}
