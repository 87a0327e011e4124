"""Query modules — importing this package registers every SURVEY.md §2 key.

One module per §2 group; each module registers (query fn, oracle SQL) pairs
into :mod:`trireme_spark.registry`.

Registration ORDER is part of the driver contract: the round-1 grading
sweep recorded results for exactly the first 50 of 90 registered keys, so
the dicts are re-ordered after import by the explicit priority list below.
Policy: keys with no green driver row yet come first (cheapest first),
then keys whose implementation changed this round, then the
filesystem/streaming keys (still §2, costlier per run), then
previously-green §2 keys for re-confirmation, and the rows-only addendum
keys dead last — a truncated sweep loses the least information that way.
"""

from trireme_spark.queries import aggregates  # noqa: F401
from trireme_spark.queries import clustering  # noqa: F401
from trireme_spark.queries import filters  # noqa: F401
from trireme_spark.queries import geo  # noqa: F401
from trireme_spark.queries import governance  # noqa: F401
from trireme_spark.queries import functions_scalar  # noqa: F401
from trireme_spark.queries import joins  # noqa: F401
from trireme_spark.queries import llm_sim  # noqa: F401
from trireme_spark.queries import llm_text  # noqa: F401
from trireme_spark.queries import multimodal  # noqa: F401
from trireme_spark.queries import pipeline  # noqa: F401
from trireme_spark.queries import timeseries  # noqa: F401
from trireme_spark.queries import training  # noqa: F401
from trireme_spark.queries import windows  # noqa: F401
from trireme_spark.queries import scans  # noqa: F401
from trireme_spark.queries import search  # noqa: F401
from trireme_spark.queries import sorts_sets  # noqa: F401
from trireme_spark.queries import streaming  # noqa: F401
from trireme_spark.queries import udfs  # noqa: F401

# Sweep priority, round 5. The driver records rows for the FIRST 50 keys
# per sweep. Slots 1-22: the 21 round-4 additions that overflowed the r4
# window and have never received a driver row, plus the embed_pca_project
# retest (r4's one red row — output reshaped to scalar cells this round).
# Then: the round-5 keys (never-swept beats re-confirmation), cheapest
# first so a time-budgeted sweep loses the least — more than fill the
# window now, so the stale-§2 re-confirmation block below rotates into
# round 6, exactly as the r3→r4→r5 rotation has. Unlisted/new keys
# append after the list in module registration order.
_SWEEP_PRIORITY = [
    # --- slots 1-22: never-driver-swept r4 keys + the r4 red retest ---
    # cheap per-row / single-agg keys first
    "fn_uuid_deterministic",
    "text_html_strip",
    "text_template_detect",
    "text_chunk_long_docs",
    "join_null_safe",
    "join_point_in_time",
    "win_count_distinct",
    "events_anomaly_zscore",
    "events_top_paths",
    "events_active_users",
    "events_hourly_heatmap",
    "orders_daily_revenue_ma",
    "orders_rfm_segments",
    "lineitem_market_basket",
    "sample_source_mixture",
    "sim_sparse_cosine_tfidf",
    "embed_pca_project",  # r4 red: array cells -> posexplode'd scalar rows
    "etl_snapshot_diff",
    # file-IO keys (real tmp-dir writes)
    "etl_partition_checksum",
    "etl_compact_small_files",
    "etl_backfill_partition_overwrite",
    # streaming (costliest of the 22)
    "stream_static_join",
    # --- slots 23-39: round-5 new keys (never-swept beats
    #     re-confirmation), cheapest first ---
    "sample_reservoir_per_group",
    "events_funnel_latency",
    "sql_pipe_syntax",
    "events_bounce_rate",
    "multimodal_audio_frames",
    "dedup_fuzzy_names",
    "events_outlier_mad",
    "geo_distance_join",
    "etl_column_profile",
    "orders_cohort_ltv",
    "etl_incremental_agg_merge",
    "etl_zorder_layout",
    "source_python_datasource",
    "sink_python_datasource",
    "search_highlight",
    "search_prefix_suggest",
    "search_facets",
    "search_bm25_topk",
    "events_attribution_last_touch",
    "lineitem_pareto_abc",
    "text_bigram_logprob",
    "stream_complete_mode",
    "stream_python_datasource",
    "graph_pagerank_copurchase",
    # --- round-5 batch 12 (never-swept beats re-confirmation) ---
    "agg_boolean_countif",
    "agg_bitmap_distinct",
    "fn_aes_roundtrip",
    "udf_pandas_iter",
    "etl_merge_cdc_apply",
    "orders_open_backlog_daily",
    "ts_interpolate_linear",
    "graph_triangle_count",
    # --- round-5 batch 13 ---
    "win_pattern_runs",
    "fn_interval_arith",
    "search_boolean_minmatch",
    "sim_maxsim_late_interaction",
    # --- round-5 batch 14 ---
    "fn_xml_roundtrip",
    "scan_file_metadata",
    "agg_cms_heavy_hitters",
    # --- round-5 batch 15 ---
    "sql_parameterized",
    "udtf_polymorphic",
    "text_sentence_split",
    "dedup_url_canonical",
    "multimodal_image_patches",
    "lineitem_association_rules",
    # --- round-5 batch 16: governance + sketch rollup ---
    "etl_row_column_security",
    "etl_gdpr_crypto_shred",
    "events_wau_hll_sliding",
    "cluster_dbscan_grid",
    "text_boilerplate_removal",
    "etl_manifest_vacuum",
    "events_ab_test_analysis",
    "text_instruction_format",
    "embed_matryoshka_topk",
    "join_runtime_bloom_filter",
    "text_bpe_train_merges",
    "etl_observe_metrics",
    "win_nth_value",
    "agg_listagg_ordered",
    "sql_select_except",
    "events_attribution_linear",
    "search_phrase_query",
    "events_cumulative_adoption",
    "fn_binary_encoding",
    "ts_gap_detection",
    "fn_regexp_extended",
    "features_user_vector",
    "events_alert_throttle",
    "join_dpp_partitioned",
    "agg_grouping_sets_explicit",
    "agg_percentile_disc",
    "events_kpi_daily_scorecard",
    "etl_early_arriving_facts",
    "search_hybrid_rrf",
    "source_csv_malformed_modes",
    "fn_unicode_lengths",
    "agg_corr_matrix",
    "embed_binary_quantize_hamming",
    "orders_seasonality_index",
    "agg_skewness_kurtosis",
    "text_bpe_encode",
    # --- round-5 batch 30 ---
    "text_code_detect",
    "orders_forecast_seasonal_naive",
    "search_spellcheck",
    "ts_ewma_smoothing",
    "etl_deletion_vectors",
    "search_more_like_this",
    # --- round-5 batch 31 ---
    "sql_identifier_dynamic",
    "fn_struct_manipulate",
    "win_time_range_trailing",
    "udf_python_arrow",
    "source_jdbc_partitioned",
    # --- round-5 batch 32 ---
    "split_leakage_safe",
    "agg_weighted_median",
    "scan_glob_recursive",
    "events_funnel_windowed",
    "events_ab_cuped",
    "ts_cusum_changepoint",
    # --- round-5 batch 33 ---
    "events_anomaly_seasonal_hour",
    "catalog_managed_table",
    "sim_knn_filtered",
    "embed_outlier_centroid_distance",
    # --- round-5 batch 34 ---
    "orders_invoice_aging",
    "events_error_budget_slo",
    "graph_degree_distribution",
    "udtf_table_argument",
    "text_skipgram_pairs",
    # --- round-5 batch 35 ---
    "fn_rounding_semantics",
    "agg_geometric_mean",
    "sink_parquet_codecs",
    "source_binary_files",
    "agg_hll_intersection",
    # --- round-5 batch 36 ---
    "text_feature_hashing",
    "join_asof_tolerance",
    "source_csv_quoted_multiline",
    "orders_gini_coefficient",
    # --- round-5 batch 37 ---
    "stream_stateful_timeout",
    # --- round-5 batch 38 ---
    "fn_timezone_convert",
    "filter_top_percent",
    "udf_sql_registered",
    "multimodal_audio_silence",
    "ts_decompose_additive",
    "sim_knn_graph_all",
    # --- round-5 batch 41 ---
    "sql_distribute_sort_by",
    "events_ab_diff_in_diff",
    "search_pivot_facets",
    "etl_referential_integrity",
    "search_query_elevation",
    # --- round-5 batch 42 ---
    "text_gazetteer_ner",
    "events_velocity_flag",
    "dedup_containment",
    # --- round-5 batch 43 ---
    "fn_json_flatten_nested",
    "text_zipf_exponent",
    "udtf_polymorphic_table",
    # --- round-5 batch 44 ---
    "text_char_entropy",
    "sql_ctas_overwrite",
    "ts_holt_linear_trend",
    # --- round-5 batch 45 ---
    "agg_distinct_grouping_sets",
    "embed_similarity_histogram",
    "orders_duplicate_payments",
    # --- round-5 batch 46 ---
    "orders_currency_conversion",
    "text_collocations_pmi",
    "ts_ewma_control_chart",
    # --- round-5 batch 47 ---
    "stream_stream_left_outer",
    # --- round-5 batch 48 ---
    "fn_mask_builtin",
    "udaf_pandas_window",
    "events_feature_drift_psi",
    # --- round-5 batch 49 ---
    "orders_installments_split",
    "text_extractive_summary",
    # --- round-5 batch 50 ---
    "ts_autocorrelation",
    "orders_survival_km",
    # --- round-5 batch 51 ---
    "events_metric_decomposition",
    "events_bot_regularity",
    "lineitem_price_index",
    # --- round-5 batch 52/53 ---
    "orders_segment_migration",
    "fn_explode_outer_semantics",
    "lineitem_abc_xyz",
    # --- round-5 batch 54 ---
    "orders_cycle_time",
    "ts_supervised_lag_features",
    "supplier_return_rate_wilson",
    # --- round-5 batch 56 ---
    "ts_ar1_fit",
    "events_user_behavior_entropy",
    "ts_peak_detection",
    "text_term_burstiness",
    "ts_holt_winters_additive",
    # --- round-5 batch 58 ---
    "text_stylometry_attribution",
    "lineitem_eoq_replenishment",
    "multimodal_scene_cuts",
    # --- round-5 batch 59 ---
    "orders_hhi_concentration",
    "ts_seasonality_strength",
    # --- round-5 batch 60 ---
    "text_langid_eval",
    "events_ab_power_mde",
    # --- round-5 batch 61 ---
    "orders_benford_test",
    "embed_procrustes_align",
    # --- round-5 batch 62 ---
    "text_readability_fk",
    "agg_winsorized_mean",
    # --- round-5 batch 63 ---
    "agg_bimodality_coefficient",
    "events_recency_weighted_engagement",
    # --- round-5 batch 64 ---
    "events_longest_streak",
    "orders_weekend_welch_ttest",
    "sim_mmr_rerank",
    # --- round-5 batch 66 ---
    "orders_skyline_2d",
    "agg_trimmed_mean",
    # --- round-5 batch 67 ---
    "fn_datetime_format_patterns",
    "text_hapax_rate",
    # --- remaining slots to 50: stalest r1-only §2 keys ---
    "conditional_case",
    "fn_string",
    "fn_date",
    "fn_math",
    "fn_string_fuzzy",
    "fn_array",
    "fn_map",
    "fn_json",
    "join_inner_equi",
    "join_left_right_full",
    "join_broadcast",
    "join_semi_anti",
    "join_theta_range",
    "join_cross",
    "join_asof",
    "join_interval",
    "join_multiway",
    "agg_pricing_summary",
    "agg_global",
    "agg_count_distinct",
    "agg_grouping_sets",
    "agg_percentile",
    "agg_pivot",
    "agg_stats",
    "agg_mode",
    "agg_histogram",
    "fn_bitwise",
    "fn_hash",
    # --- slot 51+: r1-only keys that miss the r5 window (next rotation),
    #     then everything with fresher (r3/r4) evidence ---
    "join_bucketed_colocated",
    "text_tokenize_wordcount",
    "text_ngrams",
    "dedup_fuzzy_minhash",
    "dedup_ngram_jaccard",
    "sim_knn_per_query",
    "multimodal_struct",
    # --- r4-green keys (fresh rows; re-confirm later) ---
    "text_pii_redact",
    "sample_stratified",
    "split_train_holdout",
    "embed_normalize_quantize",
    "fn_try_arithmetic",
    "fn_variant",
    "fn_collation",
    "fn_url_parse",
    "reshape_unpivot",
    "win_ntile_bucket",
    "sql_group_by_all",
    "sql_subqueries",
    "sql_lateral_join",
    "sql_recursive_cte",
    "udf_arrow_map",
    "agg_regression",
    "agg_two_phase_skew",
    "join_skew_salted",
    "join_interval_bucketed",
    "join_asof_nearest",
    "events_funnel",
    "win_range_frame_distributed",
    "pack_sequences",
    "shuffle_deterministic",
    "ts_rollup_multigrain",
    "ts_resample_fill",
    "etl_scd2_dimension",
    "dedup_doc_canonical",
    "embed_centroid_label",
    "cluster_assign",
    "text_decontaminate",
    "text_quality_gopher",
    "dedup_connected_components",
    "dedup_minhash_clusters",
    "source_schema_evolution",
    "etl_corrupt_quarantine",
    "etl_incremental_migration",
    "multimodal_resize",
    "stream_stream_join",
    "etl_training_corpus",
    "sample_weighted",
    "embed_gram_matrix",
    "text_unigram_logprob",
    "etl_expectations",
    "agg_argmax_struct",
    "events_retention_cohorts",
    "cluster_kmeans_fit",
    "embed_pq_quantize",
    "sim_ann_ivfpq",
    # --- r3-green keys (freshest rows; re-confirm last) ---
    "agg_collect",
    "win_ranking",
    "win_topk_per_group",
    "win_lag_lead",
    "win_running_frame",
    "win_analytic",
    "sort_multi_key",
    "limit_topk",
    "set_union",
    "set_intersect_except",
    "dedup_exact",
    "udf_python",
    "udf_pandas_scalar",
    "udaf_pandas_agg",
    "udtf_grouped_map",
    "udtf_python",
    "udtf_cogrouped_map",
    "text_tfidf",
    "text_stats",
    "text_language_id",
    "text_quality_score",
    "text_token_count",
    "doc_fingerprint",
    "multimodal_decode",
    "multimodal_frame_sample",
    "sim_knn_cosine",
    "dedup_semantic",
    "scan_parquet",
    "scan_projected",
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    "source_text_roundtrip",
    "sink_partitioned_parquet",
    "doc_assembly",
    "sink_batched_upsert",
    "etl_migration_pipeline",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup",
    "stream_stateful",
    "stream_watermark_late",
    "stream_foreachbatch_sink",
    "filter_comparison",
    "filter_between_in",
    "filter_like_regex",
    "filter_null_bool",
    "project_compute",
    "project_cast",
    # --- rows-only keys with a prior clean row: weakest info, dead last ---
    "agg_approx_distinct",
    "agg_hll_sketch_union",
    "agg_approx_percentile",
    "sim_ann_lsh",
    "dedup_simhash",
    "sim_ann_ivf",
]


def _apply_sweep_order() -> None:
    from trireme_spark import registry

    for d in (registry.QUERIES, registry.ORACLES):
        ordered = {k: d[k] for k in _SWEEP_PRIORITY if k in d}
        ordered.update((k, v) for k, v in d.items() if k not in ordered)
        d.clear()
        d.update(ordered)


_apply_sweep_order()
