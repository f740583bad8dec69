package graft

/** Guards the SURVEY.md §2 contract: every inventoried key must exist in
  * SparkEntry.queries, and plans must be free of accidental cartesian
  * products (the only intentional one is join_cross, plus the tiny
  * broadcast-probe cross joins).
  */
class SurveyCoverageSpec extends GraftSuite {

  private val surveyKeys = Seq(
    // §2.1
    "scan_parquet", "scan_pruned", "scan_csv_roundtrip",
    "scan_orc_roundtrip", "scan_json_roundtrip", "scan_json_lines",
    "sink_parquet",
    // §2.2
    "filter_pred", "project_expr", "filter_like", "filter_null",
    // §2.3
    "join_inner_equi", "join_broadcast", "join_left_outer", "join_right_outer",
    "join_full_outer", "join_semi", "join_anti", "join_theta_range",
    "join_cross", "join_asof", "join_interval", "join_multiway",
    "join_bucketed",
    // §2.4
    "agg_hash_group", "agg_global", "agg_distinct", "agg_approx_distinct",
    "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_minmax_pivot",
    "agg_unpivot", "agg_collect", "agg_stats",
    // §2.5
    "win_rank_topn", "win_rank_variants", "win_analytic", "win_frame_rows",
    "win_frame_range", "win_running", "win_first_last", "win_cume_dist",
    // §2.6
    "sort_multi", "limit_topk", "setop_union", "setop_intersect",
    "setop_except", "distinct_rows",
    // §2.7
    "fn_string", "fn_string2", "fn_date", "fn_date2", "fn_math",
    "fn_bitwise", "fn_cond", "fn_array", "fn_map", "fn_json", "fn_explode",
    // §2.8
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_sessionize_sql", "stream_watermark_late", "stream_dedup_state",
    "stream_foreachbatch_sink",
    // §2.9 + round-1 delta (§2.11)
    "llm_dedup_exact", "llm_dedup_near", "llm_dedup_simhash",
    "llm_dedup_ngram_jaccard", "llm_dedup_embed", "llm_sim_cosine",
    "llm_sim_pairs", "llm_sim_ann", "llm_text_stats", "llm_text_tfidf",
    "llm_lang_id", "llm_quality_score", "llm_token_count",
    "llm_fingerprint", "llm_multimodal_join", "llm_multimodal_decode",
    "llm_minhash_signature",
    // §2.10
    "udf_scalar", "udaf_geomean", "udtf_ngrams",
    // round-1 additions
    "agg_salted_skew", "filter_scalar_subquery",
    "scan_fixed_width", "etl_noaa_daily", "sink_upsert_partition",
    // round-3 additions (§2.11 round-3 delta)
    "llm_contamination", "llm_sample_stratified", "llm_shard_assign",
    "llm_pii_redact", "llm_doc_filter",
    "llm_pack_sequences", "llm_embed_centroid", "llm_ann_ivf",
    "win_nth_value", "agg_median_mode", "agg_sketch_merge",
    "fn_struct", "fn_regexp", "scan_text_roundtrip",
    "llm_dedup_components", "llm_multimodal_resize", "llm_multimodal_frames",
    // round-3 wave 2
    "llm_bm25", "llm_embed_quantize", "llm_kmeans_step",
    "etl_funnel", "fn_hash", "scan_partition_pruned",
    // round-3 wave 3
    "plan_topk_native", "etl_scd2", "agg_percentile", "join_skew_salted",
    "fn_url", "llm_chunk_split", "llm_cross_entropy",
    "agg_corr_regression", "llm_canonicalize", "scan_fixed_width_dsv2",
    "llm_interleave_sources", "udtf_sliding_windows", "etl_dq_checks",
    "llm_minhash_agg", "join_lateral", "agg_bitmap_distinct", "fn_variant",
    "limit_offset", "join_range_banded", "plan_topk_rewrite",
    "stream_mapgroups_batch", "agg_grouping_id", "etl_retention_cohort",
    "win_ignore_nulls", "fn_try",
    // round-3 wave 4
    "agg_filtered", "fn_interval", "udf_sql", "scan_binary_files",
    "join_bloom_runtime", "join_dpp", "etl_gap_fill",
    "etl_malformed_split", "agg_approx_percentile",
    // round-3 wave 5
    "scan_metadata_cols", "sink_clustered_write", "llm_bpe_merge_step",
    "fn_collation", "llm_sample_weighted",
    // round-3 wave 6
    "llm_corpus_pipeline", "graph_pagerank_step",
    "sink_zorder_write", "llm_dedup_edit_distance",
    // round-3 wave 7
    "fn_mask", "etl_snapshot_diff", "win_rolling_median",
    "scan_fixed_width_filtered",
    "fn_map2", "llm_dataset_card", "plan_cache_reuse",
    "win_distinct_running", "sql_tpch_q5", "llm_tokenize_regex",
    "agg_histogram", "scan_schema_evolution",
    // round-3 wave 11 (second session)
    "sql_tpch_q3", "sql_tpch_q6", "sql_tpch_q10", "sql_tpch_q13",
    "sql_tpch_q14", "sql_tpch_q18",
    "join_nullsafe", "agg_string_agg", "fn_encode",
    "scan_avro_roundtrip", "scan_xml_roundtrip", "scan_fixed_width_limit",
    "stream_stream_join", "llm_dedup_semantic",
    "sql_recursive_cte", "sql_parameterized",
    "etl_surrogate_key", "win_frame_time",
    "stream_transform_state", "graph_pagerank_iter3", "llm_ngram_lm",
    "sql_pivot", "plan_cbo_stats",
    "stream_stream_outer", "llm_dedup_url", "join_skew_aqe",
    // round-3 wave 12
    "sql_group_by_all", "sql_ddl_defaults", "setop_union_by_name",
    "fn_aggregate_hof", "plan_observe", "sink_parquet_tuned",
    // round-4 (§2.14): keys shipped late in r3, documented r4
    "sql_tpch_q4x", "sql_tpch_q22x", "llm_mime_detect", "fn_timezone",
    // round-4 wave 13
    "llm_repetition_filter", "llm_word_entropy", "llm_knn_join",
    "llm_dedup_survivor",
    // round-4 wave 14
    "llm_bpe_train", "llm_vocab_coverage",
    // round-4 wave 15
    "scan_fixed_width_agg",
    // round-4 wave 16
    "plan_exchange_reuse", "stream_multi_batch_state",
    // round-4 wave 17
    "join_storage_partitioned", "join_asof_nearest",
    // round-4 wave 18
    "sql_tpch_q7", "sql_tpch_q8", "sql_tpch_q15", "sql_tpch_q17x",
    "agg_cms_heavy", "stream_rate_source", "typed_dataset_ops",
    "etl_bloom_incremental", "etl_climate_normals", "etl_station_qc",
    "etl_streaks", "etl_degree_days", "etl_interpolate",
    // round-5 (§2.15)
    "llm_dedup_substring", "graph_coorder", "graph_triangles",
    "llm_knn_join_scaled", "sink_fixed_width", "stream_custom_source",
    "fn_catalog_v2",
    // round-7 (§2.18): LSH banding split out of llm_dedup_near (which now
    // routes through the exact-recall PPJoin candidate stage at τ=0.5)
    "llm_dedup_lsh",
    // round-7: the nine shapes completing the 22-query TPC-H suite
    // (q2/q9/q11/q12/q16/q20/q21 adapted to the fixture's no-partsupp
    // column subset — same precedent as q4x/q17x/q22x)
    "sql_tpch_q1", "sql_tpch_q2x", "sql_tpch_q9x", "sql_tpch_q11x",
    "sql_tpch_q12x", "sql_tpch_q16x", "sql_tpch_q19x", "sql_tpch_q20x",
    "sql_tpch_q21x",
    // q21 aggregate rewrite — verifies against the ORIGINAL EXISTS
    // oracle, 4.8x faster at fact x100 (see BASELINE round-7 relational)
    "sql_tpch_q21r",
    // round-8 (§2.19): GVT versioned-table format — atomic commit log,
    // time travel, file-granular copy-on-write merge/delete, manifest
    // zone-map pruning, small-file compaction
    "sink_versioned_log", "scan_time_travel", "etl_merge_into",
    "scan_manifest_prune", "sink_compaction",
    // round-8: incremental view maintenance by algebraic partial-state
    // merge (oracle = the full recompute; merge ≡ recompute by hash)
    "etl_incremental_agg",
    // round-8: GVT change-data-feed — row-level diff between versions
    // from churned files only (bag difference cancels moved-not-changed
    // rows, so compaction yields an empty feed)
    "etl_gvt_diff",
    // round-8: parquet bloom-filter point-lookup skipping (the skip
    // mechanism when the probe column has no sort locality; row-group
    // skip evidence in ScanBloomSpec)
    "scan_parquet_bloom",
    // round-8: z-order x versioned table — 2-D manifest box pruning
    // over Morton-tiled commits (GvtSpec asserts 2-D beats 1-D)
    "scan_gvt_zorder",
    // round-8: changelog consumption — feed-fold ≡ state-read proven by
    // sharing the direct-aggregate oracle
    "etl_gvt_feed_apply",
    // round-8 lifecycle completion: VACUUM (physical cleanup + loud
    // retention floor) and merge-on-read schema evolution
    "sink_gvt_vacuum", "scan_gvt_schema_evo",
    // round-8: exactly-once streaming sink via txn-id idempotent commits
    "stream_gvt_sink",
    // round-8: versioned corpus curation — quality delete + distributed
    // dedup delete-by-join as auditable commits
    "etl_gvt_corpus",
    // round-8: materialized-view auto-rewrite — aggregate queries
    // transparently rerouted to a summary table, incl. rollups
    "plan_mv_rewrite",
    // round-8: merge-on-read deletion vectors — row deletes without
    // file rewrites (sidecar + anti-join), and the absorb maintenance
    // op that rewrites heavily-deleted files and drops their vectors
    "etl_gvt_dv_delete", "sink_gvt_absorb",
    // round-8: RESTORE — instant metadata-only rollback to a version,
    // history preserved above the restore point
    "etl_gvt_restore",
    // round-8: stream-static enrichment join — per-micro-batch
    // broadcast probe of a dimension, stateless on both sides
    "stream_static_join",
    // round-8: bag-semantics set ops (multiplicity-preserving)
    "setop_intersect_all", "setop_except_all",
    // round-8: MV rewrite with a grouping-column filter re-applied on
    // the view scan (the filtered-dashboard shape)
    "plan_mv_rewrite_filtered",
    // round-8: GVT-backed incremental materialized view — CDC deltas
    // folded into a versioned summary via merge + dead-group deletes
    "etl_gvt_mv_refresh",
    // round-8 third wave: the table format as a streaming SOURCE —
    // version-offset replay (append mode) and the change feed as a
    // stream with a signed incremental fold (cdc mode)
    "stream_gvt_source", "stream_gvt_cdc",
    // round-8 third wave: exactly-once delta-log IVM end to end
    "stream_gvt_ivm",
    // round-8 third wave: TIMESTAMP AS OF time travel (strictly-monotonic
    // commit timestamps + O(log tail) binary-search resolution)
    "scan_time_travel_ts",
    // round-9: the manifest as a DATAFRAME — parquet-checkpoint snapshot
    // resolution + zone-map pruning as Spark jobs (the ≥10⁵-file regime)
    "scan_manifest_df",
    // round-9: cost-based MV selection — cheapest covering candidate
    // view wins by actual stats bytes
    "plan_mv_select",
    // round-10: write-audit-publish on a GVT branch — isolated staging,
    // quality-rule audit, ONE atomic squash commit to the parent
    "etl_gvt_wap",
    // round-10: CDC with UPDATE images — churned keys on both diff
    // sides pair into update_preimage/update_postimage (Delta CDF)
    "etl_gvt_cdc_upd",
    // round-10: product-quantization ANN — 4×16-dim codebooks, ADC
    // lookup-table scoring, top-50 shortlist, exact cosine re-rank
    "llm_ann_pq",
    // round-10: the full IVF+PQ retrieval stack — cells bound the
    // candidates, codes + per-query ADC tables score them, exact
    // re-rank of the per-query top-20
    "llm_knn_join_ivfpq",
    // round-10: Spark 4 SQL pipe syntax — |> stages parse into the
    // ordinary operators, optimized identically to the keyword form
    "sql_pipe_syntax",
    // round-10: sub-document (paragraph/chunk) exact dedup —
    // keep-first winner election per chunk, per-doc survival stats
    "llm_dedup_paragraph",
    // round-11: GVT pruning made Catalyst-driven — DSv2 TableProvider
    // (format "gvt"), WHERE clauses route into the manifest zone-map
    // prune through GvtFileIndex.listFiles; stock ParquetScan does
    // the reading
    "scan_gvt_dsv2",
    // round-11: the composed production retrieval stack — IVFPQ on the
    // data-derived k = N/600 coarse codebook (floors to the fixture
    // codebook; candidate volume linear where fixed-k is quadratic)
    "llm_knn_join_ivfpq_scaled",
    // round-11: cross-table atomic publish — fact + summary pinned by
    // ONE createLink of a GvtTxn coordinator doc (the catalog-pointer
    // shape); a crash between table commits leaves invisible orphans
    "etl_gvt_txn_multi",
    // round-11: column mapping — rename/drop by stable physical name,
    // metadata-only schema commits, history never rewritten; every
    // version reads under its own names
    "scan_gvt_colmap",
    // round-11: commit-time CHECK constraints — in-write assert_true
    // enforcement (violating append commits NOTHING) + the WAP gate
    // (publishBranch re-validates net adds against the parent's
    // current checks)
    "etl_gvt_constraints",
    // round-11: BPE training driven to a target vocab — 8 chained
    // merge rounds, winner-pinned and corpus-lineage-truncated per
    // round (the pagerank-iter pattern)
    "llm_bpe_train_k",
    // round-12: zone-map pruning past numerics — TIMESTAMP/DATE/STRING
    // predicates prune via the chrono/UTF8-binary rules over the
    // string-encoded stats (date ranges: the #1 fact-table predicate)
    "scan_gvt_prune_ts",
    // round-12: the connector serves MoR snapshots — GvtScan appends
    // the temporary row-index column and a broadcast per-file position
    // map drops the vectors' rows at the reader
    "scan_gvt_dsv2_dv",
    // round-12: the connector serves column-mapped tables — logical
    // names re-reported over the physically-named stock scan, filters
    // and pruned columns translated on the way in
    "scan_gvt_dsv2_colmap",
    // round-12: the SQL write surface — GvtCatalog CREATE TABLE /
    // INSERT INTO / INSERT OVERWRITE / CTAS delegating to the same
    // clustered+statted+checked append pipeline the API uses
    "sink_gvt_dsv2",
    // round-12: cross-table WAP — branch fact AND summary, audit both
    // in isolation, squash both + link ONE coordinator doc; the view
    // flips atomically and an unpinned squash stays invisible
    "etl_gvt_txn_wap",
    // round-12: SQL DELETE FROM / TRUNCATE — SupportsDelete translates
    // the pushed condition and rides the same copy-on-write delete
    // pipeline the API uses
    "etl_gvt_sql_delete",
    // round-13: SQL UPDATE / MERGE INTO — RewriteGvtDml lowers the
    // resolved commands onto Gvt.updateWhere / Gvt.merge (SQL-text
    // command fields keep the plan resolved; non-canonical shapes
    // refuse loudly through the stock strategy error)
    "etl_gvt_sql_update", "etl_gvt_sql_merge",
    // round-13: the MoR scale regime (per-task DV sidecar fetch) and
    // coordinator-serialized overlapping transactions, each sharing its
    // twin's oracle restatement
    "scan_gvt_dsv2_dvf", "etl_gvt_txn_serial",
    // round-14: the GENERAL serialized transaction — ONE doc carrying a
    // merge on the fact and a delete on the summary (mixed ops, token
    // authorship), with a poison half-transaction rolled back first
    "etl_gvt_txn_serial_ops",
    // round-15: BOTH log vacuums driver-verified THROUGH their
    // auto-vacuum policies (txnRetain in the coordinator publish path,
    // tableRetain in the table commit gate) — head view + the oldest
    // contractually-retained pinned view, both restated from orders
    "sink_gvt_txn_vacuum", "sink_gvt_vacuum_auto",
    // round-16: the LAST manual maintenance op gets its policy (the
    // commit path bin-packs small files once compactAfterFiles is
    // crossed — no manual compact anywhere in the fixture) and the
    // commit log itself becomes a DataFrame surface whose known
    // sequence the oracle restates literally
    "sink_gvt_compact_auto", "scan_gvt_history",
    // round-12: SQL DDL — ALTER TABLE RENAME/DROP/ADD COLUMN and
    // check./stats TBLPROPERTIES land the same metadata-only schema
    // commits the API ops publish
    "scan_gvt_sql_ddl")

  test("every SURVEY §2 key is declared in SparkEntry.queries") {
    val missing = surveyKeys.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"missing query keys: $missing")
    val undocumented = SparkEntry.queries.keySet -- surveyKeys.toSet
    assert(undocumented.isEmpty, s"keys not in SURVEY inventory: $undocumented")
  }

  test("every declared key is mentioned in SURVEY.md itself") {
    // the r6 verdict's doc-drift lesson: the registry and the SURVEY
    // text diverged (a promised §2.17 never existed). The key list
    // above syncs the registry to THIS spec; this test syncs the spec
    // to the actual document, so a new key without a SURVEY mention
    // fails the suite.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")))
    // word-boundary match (r8 advisor): raw `contains` let short keys
    // pass vacuously inside longer ones (sql_tpch_q1 inside
    // sql_tpch_q19x), weakening the drift guard this test exists for
    def mentioned(key: String): Boolean =
      java.util.regex.Pattern
        .compile("(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(key) +
          "(?![A-Za-z0-9_])")
        .matcher(survey).find()
    val unmentioned = SparkEntry.queries.keySet.filterNot(mentioned)
    assert(unmentioned.isEmpty,
      s"keys declared but never mentioned in SURVEY.md: $unmentioned")
  }

  test("oracle keys are a subset of query keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("no accidental cartesian products in any plan") {
    val allowed = Set("join_cross", "llm_sim_cosine", "llm_sim_ann",
      "stream_watermark_late", "llm_text_tfidf", "llm_multimodal_decode")
    val offenders = SparkEntry.queries.collect {
      case (name, fn) if !allowed(name) =>
        val plan =
          try fn(spark, sf0001).queryExecution.executedPlan.toString
          catch { case _: Throwable => "" }
        if (plan.contains("CartesianProduct")) Some(name) else None
    }.flatten
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("aggregations use partial (map-side) aggregation") {
    val plan = operators.Aggregates.pricingSummary(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial+final HashAggregate")
  }

  test("salted aggregation equals the direct groupBy") {
    val salted = operators.Aggregates.saltedSkew(spark, sf0001)
    val direct = Tables(spark, sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_items"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag")
    assert(salted.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(salted).count() == 0)
  }
}
