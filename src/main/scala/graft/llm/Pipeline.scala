package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-corpus pipeline operators beyond dedup/similarity: benchmark
  * contamination checks, deterministic sampling/sharding, PII redaction,
  * and C4-style quality filtering.
  *
  * Scale notes (100 TB):
  *  - contamination is the shingle inverted-index join again (one
  *    exchange on the 8-gram), with the eval side orders of magnitude
  *    smaller than the corpus — broadcastable at real scale;
  *  - sampling/sharding use a pure-arithmetic LCG hash of the stable doc
  *    id, so the sample is reproducible run-to-run on any engine with
  *    64-bit integers (no rand(), no engine-specific hash);
  *  - redaction and filtering are per-row codegen'd expressions — no
  *    shuffle at all until the final presentation sort.
  */
object Pipeline {

  /** h(doc_id): deterministic 31-bit mix via one LCG step. The id is
    * reduced mod 2^31 BEFORE the multiply, so the product stays below
    * 2^61 for ANY 64-bit id — Spark would silently wrap on overflow
    * while DuckDB raises, so overflow-free is the only way "identical
    * arithmetic on any engine" holds at 100 TB id ranges.
    */
  private def idHash(c: Column): Column =
    ((c % lit(2147483648L)) * lit(1103515245L) + lit(12345L)) % lit(2147483648L)

  /** Word n-grams. Guarded: for docs with < n words Spark's
    * sequence(1, size-n+1) would DESCEND (step defaults to -1 when
    * start > stop) and slice(w, 0, n) then throws — so short docs get an
    * explicit empty array, matching DuckDB's empty range(1, len-n+2).
    */
  private def ngrams(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - lit(n - 1)),
        i => array_join(slice(w, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Benchmark-contamination check: docs outside the eval source
    * (src0) sharing any distinct 8-gram with an eval doc, scored by how
    * many eval docs / distinct 8-grams they overlap. `words` is
    * materialized as a column BEFORE the n-gram lambda so the lambda
    * captures an attribute — an inline `split()` would re-split the text
    * once per gram (the round-1 shingle lesson).
    */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    // repartition on the gram BEFORE the per-side filters: both join
    // branches then share one identical Exchange subplan (ReusedExchange),
    // so the scan+explode runs once, and the join needs no further
    // shuffle — the same exchange-sharing shape as ngramJaccard. The
    // count is pinned so AQE doesn't coalesce the small shuffle into one
    // task and serialize the join (the ngramJaccard lesson); grams are
    // xxhash64'd to fixed-width longs before the exchange (~70-byte
    // 8-gram strings otherwise dominate shuffle width; distinct-counts
    // are preserved modulo 64-bit collisions).
    // data-derived like the wide() scan it rides on (guide §2): the gram
    // exchange carries xxhash64 longs, so ~192 KiB of source text per
    // partition keeps tasks meaningful at any scale
    val nPart = Tables.explodeWidth(spark, dir, "documents")
    val sh = Tables.wide(spark, dir, "documents")
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(transform(ngrams(col("w"), 8), xxhash64(_))))
          .as("g"))
      .repartition(nPart, col("g"))
    val eval_ = sh.filter(col("source") === "src0")
      .select(col("g"), col("doc_id").as("eval_id"))
    val train = sh.filter(col("source") =!= "src0")
      .select(col("g"), col("doc_id").as("train_id"))
    train.join(eval_, Seq("g"))
      .groupBy(col("train_id"))
      .agg(countDistinct("eval_id").as("n_eval_docs"),
        countDistinct("g").as("n_shared_grams"))
      .orderBy("train_id")
  }

  /** Deterministic stratified sample: exactly ceil(n/10) docs per lang,
    * chosen by the arithmetic id hash — reproducible, engine-agnostic,
    * and exact per stratum (a bernoulli `rand() < 0.1` is neither).
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val byLang = Window.partitionBy("lang")
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    Tables(spark, dir, "documents")
      .withColumn("h", idHash(col("doc_id")))
      .withColumn("n_lang", count(lit(1)).over(byLang))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= expr("(n_lang + 9) div 10"))
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy("lang", "rn")
  }

  /** Shard assignment for training input files: hash-mod placement into
    * 8 shards with per-shard size accounting (the write side would be
    * `partitionBy(shard)`; the balance columns are what an operator
    * would alert on).
    */
  def shardAssign(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("shard", idHash(col("doc_id")) % lit(8L))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      .orderBy("shard")

  /** PII redaction pass: digit-run ids, emails, phone-shaped tokens →
    * placeholder tags. The corpus has no real PII, so emails/phones are
    * synthesized from stable columns first — the redaction expressions
    * are the operator under test.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .withColumn("email",
        concat(lower(col("c_mktsegment")), col("c_custkey").cast("string"),
          lit("@example.com")))
      .withColumn("phone",
        concat(lit("555-"), lpad((col("c_custkey") % 10000).cast("string"),
          4, "0")))
      .select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]{4,}", "[ID]").as("name_red"),
        regexp_replace(col("email"), "[a-z0-9._%+-]+@[a-z0-9.-]+", "[EMAIL]")
          .as("email_red"),
        regexp_replace(col("phone"), "\\d{3}-\\d{4}", "[PHONE]")
          .as("phone_red"))
      .orderBy("c_custkey")

  /** C4-style quality filter: token-count band, type-token ratio floor,
    * and a stopword-evidence rule, with the first failing rule named per
    * dropped doc. Emits every doc with its verdict (the keep-only
    * projection is a trailing filter at scale).
    */
  def docFilter(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    Tables(spark, dir, "documents")
      .withColumn("n_tokens", size(w).cast("long"))
      .withColumn("ttr",
        size(array_distinct(w)).cast("double") / size(w).cast("double"))
      .withColumn("has_stop",
        array_contains(w, "the") || array_contains(w, "a"))
      .withColumn("verdict",
        when(col("n_tokens") < 30, "too_short")
          .when(col("n_tokens") > 90, "too_long")
          .when(col("ttr") < 0.25, "low_diversity")
          .when(!col("has_stop"), "no_stopwords")
          .otherwise("keep"))
      .select("doc_id", "lang", "n_tokens", "ttr", "verdict")
      .orderBy("doc_id")
  }

  /** Deterministic weighted source interleaving — the data-mixing step
    * that turns per-source corpora into one training stream honoring
    * mixing ratios. Stride scheduling: within each source, docs are
    * shuffled by the LCG hash (rank r); a source of weight w emits its
    * r-th doc at virtual time (2r+1)/(2w), and the global order is the
    * sort of those virtual times (ties: source, doc_id). Sources with
    * 2× weight appear 2× as often at every prefix of the stream — the
    * property the unit test asserts. Weights here derive from the source
    * name (1 + srcnum % 4) to keep the query self-contained.
    *
    * Global positions are assigned WITHOUT a global window (the r3
    * scale-killer: `row_number() OVER (ORDER BY p,...)` funnels the
    * whole stream through one task). Same bucket-offset technique as
    * `etl_surrogate_key`: (1) a tiny aggregate derives 32 virtual-time
    * range buckets and their cumulative row offsets (broadcast); (2)
    * rows rank WITHIN their bucket (parallel window, one bucket-keyed
    * exchange) and add the bucket's offset. bkt is monotone in p, so
    * the result is bit-identical to the global row_number at any
    * partition count — exactly what the oracle states.
    */
  def interleaveSources(spark: SparkSession, dir: String): DataFrame = {
    val bySource = Window.partitionBy("source")
      .orderBy(col("h"), col("doc_id"))
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        idHash(col("doc_id")).as("h"),
        (lit(1) + substring(col("source"), 4, 10).cast("int") % lit(4))
          .as("wt"))
      .withColumn("r", row_number().over(bySource).cast("long") - 1)
      .withColumn("p",
        (col("r") * 2 + 1).cast("double") / (col("wt") * 2).cast("double"))
    val mx = base.agg(max("p").as("mx"))
    val bucketed = base.crossJoin(broadcast(mx))
      .withColumn("bkt", least(floor(col("p") * 32 / col("mx")), lit(31L)))
    // exclusive prefix sum over the 32-row bucket-count table as a
    // broadcast theta-join (32² comparisons) instead of a global window:
    // even a windowed prefix sum over 32 rows plans a single-partition
    // WindowExec and trips the scale-killer scan. localCheckpoint pins
    // the counts so both join sides read 32 materialized rows rather
    // than re-running the corpus aggregate.
    val cnts = bucketed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val offsets = cnts
      .join(broadcast(cnts.select(col("bkt").as("b2"), col("cnt").as("cnt2"))),
        col("b2") < col("bkt"), "left")
      .groupBy("bkt")
      .agg(coalesce(sum("cnt2"), lit(0L)).as("offset"))
    val wB = Window.partitionBy("bkt")
      .orderBy(col("p"), col("source"), col("doc_id"))
    bucketed
      .withColumn("rk", row_number().over(wB).cast("long"))
      .join(broadcast(offsets), Seq("bkt"))
      .select((col("offset") + col("rk")).as("position"),
        col("doc_id"), col("source"), col("wt"))
      .orderBy("position")
  }

  /** Deterministic WEIGHTED sampling: each source keeps a quota
    * proportional to its mixing weight (wt/8 of its docs, wt = 1 +
    * srcnum % 4 as in [[interleaveSources]]), members chosen by the LCG
    * hash order — so a 2×-weight source contributes 2× the fraction of
    * its docs, reproducibly on any engine (pure integer arithmetic: the
    * quota is `(n·wt + 7) div 8`, never a float rate, and `rand()` never
    * appears). The up-/down-sampling step that enforces a data-mixing
    * recipe on a raw corpus.
    */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    val bySource = Window.partitionBy("source")
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        idHash(col("doc_id")).as("h"),
        (lit(1) + substring(col("source"), 4, 10).cast("int") % lit(4))
          .as("wt"))
      .withColumn("n_src", count(lit(1)).over(bySource))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= expr("(n_src * wt + 7) div 8"))
      .select(col("doc_id"), col("source"), col("wt"), col("rn"))
      .orderBy("source", "rn")
  }

  /** END-TO-END corpus pipeline — the five stages a real pretraining
    * data build chains, composed as ONE lazy DAG so Catalyst optimizes
    * across stage boundaries (the filter prunes columns into the scan;
    * no intermediate materialization):
    *   1. normalize (lower/trim/collapse-ws),
    *   2. C4-style quality gate (token band + stopword evidence),
    *   3. exact dedup on the normalized form (min-id survivor; the
    *      window partitions on md5(canon), NEVER the multi-KB canon
    *      string itself — the llm_canonicalize shuffle-width lesson),
    *   4. deterministic 75% LCG sample,
    *   5. hash-shard assignment, reported as per-shard manifest rows.
    * Every stage is engine-portable integer/string arithmetic, so the
    * whole five-stage chain is oracle-verified bit-exact end to end.
    */
  def corpusPipeline(spark: SparkSession, dir: String): DataFrame = {
    val canon = Tables(spark, dir, "documents")
      .withColumn("canon",
        lower(trim(regexp_replace(col("text"), " +", " "))))
      .withColumn("w", split(col("canon"), " "))
    val quality = canon.filter(
      size(col("w")).between(30, 90) &&
        (array_contains(col("w"), "the") || array_contains(col("w"), "a")))
    val surv = quality
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("canon"))).orderBy("doc_id")))
      .filter(col("rn") === 1)
    val sampled = surv.filter(idHash(col("doc_id")) % 4 =!= 0)
    sampled
      .withColumn("shard", idHash(col("doc_id")) % lit(8L))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      .orderBy("shard")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_corpus_pipeline" -> corpusPipeline,
    "llm_sample_weighted" -> sampleWeighted,
    "llm_interleave_sources" -> interleaveSources,
    "llm_contamination" -> contamination,
    "llm_sample_stratified" -> sampleStratified,
    "llm_shard_assign" -> shardAssign,
    "llm_pii_redact" -> piiRedact,
    "llm_doc_filter" -> docFilter
  )

  def oracle: Map[String, String] = Map(
    "llm_corpus_pipeline" ->
      ("WITH c AS (SELECT doc_id, n_chars, " +
        "lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS canon " +
        "FROM documents), " +
        "q AS (SELECT doc_id, n_chars, canon FROM c " +
        "WHERE len(string_split(canon, ' ')) BETWEEN 30 AND 90 " +
        "AND (list_contains(string_split(canon, ' '), 'the') " +
        "OR list_contains(string_split(canon, ' '), 'a'))), " +
        "s AS (SELECT doc_id, n_chars, row_number() OVER (" +
        "PARTITION BY md5(canon) ORDER BY doc_id) AS rn FROM q), " +
        "smp AS (SELECT doc_id, n_chars, " +
        "((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h " +
        "FROM s WHERE rn = 1) " +
        "SELECT h % 8 AS shard, count(*) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        "min(doc_id) AS min_id, max(doc_id) AS max_id " +
        "FROM smp WHERE h % 4 <> 0 GROUP BY 1 ORDER BY 1"),
    "llm_sample_weighted" ->
      ("WITH d AS (SELECT doc_id, source, " +
        "((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h, " +
        "1 + CAST(substring(source, 4, 10) AS INT) % 4 AS wt, " +
        "count(*) OVER (PARTITION BY source) AS n_src " +
        "FROM documents), " +
        "r AS (SELECT doc_id, source, wt, n_src, " +
        "CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) " +
        "AS BIGINT) AS rn FROM d) " +
        "SELECT doc_id, source, wt, rn FROM r " +
        "WHERE rn <= (n_src * wt + 7) // 8 ORDER BY source, rn"),
    "llm_interleave_sources" ->
      ("WITH d AS (SELECT doc_id, source, " +
        "((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h, " +
        "1 + CAST(substring(source, 4, 10) AS INT) % 4 AS wt FROM documents), " +
        "r AS (SELECT doc_id, source, wt, " +
        "row_number() OVER (PARTITION BY source ORDER BY h, doc_id) - 1 AS r " +
        "FROM d) " +
        "SELECT CAST(row_number() OVER (ORDER BY " +
        "CAST(r * 2 + 1 AS DOUBLE) / (wt * 2), source, doc_id) AS BIGINT) " +
        "AS position, doc_id, source, wt " +
        "FROM r ORDER BY position"),
    "llm_contamination" ->
      ("WITH sh AS (SELECT doc_id, source, unnest(list_distinct(" +
        "list_transform(range(1, len(string_split(text, ' ')) - 6), " +
        "i -> array_to_string(string_split(text, ' ')[i:i+7], ' ')))) AS g " +
        "FROM documents) " +
        "SELECT t.doc_id AS train_id, count(DISTINCT e.doc_id) AS n_eval_docs, " +
        "count(DISTINCT t.g) AS n_shared_grams " +
        "FROM sh t JOIN sh e ON t.g = e.g " +
        "WHERE t.source <> 'src0' AND e.source = 'src0' " +
        "GROUP BY t.doc_id ORDER BY train_id"),
    "llm_sample_stratified" ->
      ("WITH h AS (SELECT doc_id, lang, " +
        "((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h, " +
        "count(*) OVER (PARTITION BY lang) AS n_lang, " +
        "CAST(row_number() OVER (PARTITION BY lang ORDER BY " +
        "((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648, doc_id) AS BIGINT) AS rn " +
        "FROM documents) " +
        "SELECT doc_id, lang, rn FROM h WHERE rn <= (n_lang + 9) // 10 " +
        "ORDER BY lang, rn"),
    "llm_shard_assign" ->
      ("SELECT ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 % 8 AS shard, " +
        "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        "min(doc_id) AS min_id, max(doc_id) AS max_id " +
        "FROM documents GROUP BY 1 ORDER BY 1"),
    "llm_pii_redact" ->
      ("SELECT c_custkey, " +
        "regexp_replace(c_name, '[0-9]{4,}', '[ID]', 'g') AS name_red, " +
        "regexp_replace(lower(c_mktsegment) || c_custkey || '@example.com', " +
        "'[a-z0-9._%+-]+@[a-z0-9.-]+', '[EMAIL]', 'g') AS email_red, " +
        "regexp_replace('555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'), " +
        "'\\d{3}-\\d{4}', '[PHONE]', 'g') AS phone_red " +
        "FROM customer ORDER BY c_custkey"),
    "llm_doc_filter" ->
      ("SELECT doc_id, lang, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) " +
        "/ len(string_split(text, ' ')) AS ttr, " +
        "CASE WHEN len(string_split(text, ' ')) < 30 THEN 'too_short' " +
        "WHEN len(string_split(text, ' ')) > 90 THEN 'too_long' " +
        "WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) " +
        "/ len(string_split(text, ' ')) < 0.25 THEN 'low_diversity' " +
        "WHEN NOT (list_contains(string_split(text, ' '), 'the') " +
        "OR list_contains(string_split(text, ' '), 'a')) THEN 'no_stopwords' " +
        "ELSE 'keep' END AS verdict " +
        "FROM documents ORDER BY doc_id")
  )
}
