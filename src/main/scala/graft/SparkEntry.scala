package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §3.1 + §7.
  *
  * `queries` is the engine's declared operator inventory (SURVEY.md §2):
  * one key per operator, each `(SparkSession, sfDir) => DataFrame`.
  * `oracleSql` carries the DuckDB-equivalent SQL for every oracle-able
  * key; keys absent there are covered by unit/property tests instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregates.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sources.Sources.queries ++
      sources.GvtOps.queries ++
      operators.Scans.queries ++
      operators.Etl.queries ++
      operators.Filters.queries ++
      operators.Joins.queries ++
      operators.Aggregates.queries ++
      operators.Windows.queries ++
      operators.SortsSetOps.queries ++
      operators.SqlSurface.queries ++
      operators.TpchComplete.queries ++
      operators.TypedOps.queries ++
      functions.ScalarFns.queries ++
      streaming.EventOps.queries ++
      llm.Dedup.queries ++
      llm.DedupVariants.queries ++
      llm.Similarity.queries ++
      llm.AnnLsh.queries ++
      llm.TextOps.queries ++
      llm.TextQuality.queries ++
      llm.Multimodal.queries ++
      llm.Pipeline.queries ++
      llm.GraphOps.queries ++
      llm.CorpusOps.queries ++
      llm.Ranking.queries ++
      llm.Chunking.queries ++
      plans.TopK.queries ++
      plans.MaterializedViews.queries ++
      functions.Extensions.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    sources.Sources.oracle ++
      sources.GvtOps.oracle ++
      operators.Scans.oracle ++
      operators.Etl.oracle ++
      operators.Filters.oracle ++
      operators.Joins.oracle ++
      operators.Aggregates.oracle ++
      operators.Windows.oracle ++
      operators.SortsSetOps.oracle ++
      operators.SqlSurface.oracle ++
      operators.TpchComplete.oracle ++
      operators.TypedOps.oracle ++
      functions.ScalarFns.oracle ++
      streaming.EventOps.oracle ++
      llm.Dedup.oracle ++
      llm.DedupVariants.oracle ++
      llm.Similarity.oracle ++
      llm.AnnLsh.oracle ++
      llm.TextOps.oracle ++
      llm.TextQuality.oracle ++
      llm.Multimodal.oracle ++
      llm.Pipeline.oracle ++
      llm.GraphOps.oracle ++
      llm.CorpusOps.oracle ++
      llm.Ranking.oracle ++
      llm.Chunking.oracle ++
      plans.TopK.oracle ++
      plans.MaterializedViews.oracle ++
      functions.Extensions.oracle
}
