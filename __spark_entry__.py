"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Analysis-C-analog query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
``markt_database_analyzer_spark.catalog`` (one entry per implemented
operator family from SURVEY.md §2, each with a DuckDB oracle unless the
operator is not SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from markt_database_analyzer_spark.catalog import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The Analysis-C-analog HAVING threshold scales with the data: sf0.001
    has only ~6 customers per nation, so the smoke run uses >= 5.
    """
    return REGISTRY["c_gain_by_nation"].fn(spark, "/root/testdata/sf0.001", min_customers=5)


# The driver's per-round correctness run covers a bounded prefix of this
# dict (r1-r3 each checked exactly the first 50 entries, in dict order).
# Cumulative driver-green after r3: 142/240, zero standing reds; 98
# entries have never been driver-checked. Round-4 ordering puts those 98
# (plus this round's changed/new entries) at the head so the r4 window
# extends the driver record: (1) semantics-changed, (2) new, (3)
# never-checked priorities, (4) never-checked rest cheapest-first,
# (5) prior greens. See COVERAGE.md "driver rotation".
_DRIVER_HEAD: list[str] = [
    # (1) semantics changed this round: sorted-neighborhood rank cap added
    # to the fuzzy-ER block join (bounded per-block verify work) — oracle
    # updated in lockstep; needs a fresh driver verdict
    "join_fuzzy_blocked",
    # (2) new this round: scale-path variants (ln(n)-sized SRP bands;
    # percentile-cut equi-depth family replacing single-partition ntile)
    "similarity_srp_lsh_sized",
    "histogram_equi_depth_cuts",
    "segment_rfm_customers_cuts",
    "eval_calibration_bins_cuts",
    "stats_quantile_normalize_grid",
    "stats_winsorized_mean_cuts",
    "pack_equal_token_shards",
    # (3) never driver-checked priorities (VERDICT r3 item 1/5): the
    # iterative/graph/pipeline family + all remaining streaming entries
    "graph_triangle_count",
    "graph_pagerank_bipartite",
    "pipeline_curate_full",
    "er_fuzzy_canonicalize",
    "join_set_similarity_prefix",
    "streaming_sliding_avg",
    "streaming_keyed_deltas",
    "streaming_enrich_static_join",
    "streaming_curation_gate",
    "streaming_dedup_within_watermark",
    "streaming_foreachbatch_upsert",
    "pysource_stream_counts",
    "histogram_equi_depth",
    "segment_rfm_customers",
    # (4) remaining never-driver-checked entries, cheapest first
    # (BENCH_FULL r3 ordering) — every one green in the local full
    # differential (tools/check_oracle.py)
    "sample_weighted_reservoir",
    "text_bpe_pair_merge",
    "growth_cumulative_users",
    "stats_chi2_lang_source",
    "sample_epoch_upsample",
    "events_cohort_retention",
    "layout_zorder_stats",
    "agg_mode_by_user",
    "pivot_dynamic_event_types",
    "agg_incremental_maintenance",
    "sample_balanced_classes",
    "stats_ks_test",
    "stats_mannwhitney_u",
    "pack_sequences_bucketed",
    "dedup_url_canonical",
    "stats_welch_ttest",
    "events_funnel_stages",
    "dq_constraint_suite",
    "f_variant_props_shred",
    "index_inverted_postings",
    "cdc_snapshot_diff",
    "ts_seasonal_index_how",
    "events_attribution_last_touch",
    "tpch_q12_shipmode_priority",
    "udf_map_in_arrow",
    "filter_bloom_semijoin",
    "events_kaplan_meier",
    "search_bm25_topk",
    "rollup_hier_timegrain",
    "pysource_range_catalog",
    "embeddings_standardize_dims",
    "sql_lateral_topk_per_customer",
    "events_markov_transitions",
    "join_interval_overlap",
    "session_window_native",
    "ts_stl_residual_outliers",
    "scd2_user_state_history",
    "sql_group_by_all",
    "udf_grouped_agg_gini",
    "pipeline_analytics_daily",
    "pipeline_multimodal_pairs",
    "text_pmi_collocations",
    "gapfill_interpolate_hourly",
    "sketch_countmin_freq",
    "rank_distribution_window",
    "growth_rolling_engagement",
    "paths_top_sequences",
    "stats_boxplot_by_event_type",
    "text_c4_line_filters",
    "tpch_q2_min_cost_supplier",
    "tpch_q20_potential_promotion",
    "growth_rolling_wau_hll",
    "approx_distinct_parts",
    "text_readability",
    "tpch_q9_product_profit",
    "ts_autocorrelation",
    "events_changepoint_cusum",
    "sql_pipe_syntax_revenue",
    "regression_by_key",
    "tpch_q11_important_stock",
    "tpch_q21_waiting_supplier",
    "text_bpe_train_merges",
    "stats_mad_by_event_type",
    "intervals_open_orders_daily",
    "filter_quality_quantile",
    "text_entropy_quality",
    "assoc_rules_parts",
    "embeddings_silhouette_simplified",
    "parts_abc_pareto",
    "profile_table_stats",
    "stats_winsorized_mean",
    "text_keyword_rake",
    "sql_api_revenue",
    "stats_weighted_median",
    "w_ewma_smoothed",
    "stats_corr_matrix",
    "join_star_denormalize",
    "embeddings_pca_power_component",
    "sql_recursive_tree_depth",
    "dedup_minhash_jaccard_estimate",
    "salted_join_revenue",
    "text_ccnet_buckets",
    "sample_kcenter_coreset",
    # (5) driver-green in r1-r3 — refreshed only after all of the above
    "a_lifetime_rate_curve",
    "b1_events_per_slot",
    "b2_initial_rate_by_month",
    "j1_revenue_by_priority",
    "a4_first_last_per_order",
    "w1_lag_deltas",
    "w2_smoothed_hourly_value",
    "j3_having_segment_orders",
    "d1_dedup_first_event",
    "b2bin_value_histogram",
    "f_scalars_part_category",
    "f_json_props",
    "p_filters_inlist",
    "topk_orders_per_customer",
    "rollup_lineitem_status",
    "set_intersect_customers",
    "dedup_exact_groups",
    "dedup_fingerprint_tokenset",
    "dedup_minhash_lsh",
    "dedup_simhash_signatures",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard_sample",
    "similarity_bruteforce_topk",
    "similarity_ivf_topk",
    "embedding_neardup_pairs",
    "text_langid",
    "text_quality",
    "text_token_counts",
    "text_fingerprints",
    "multimodal_meta",
    "multimodal_decode_features",
    "streaming_tumbling_counts",
    "streaming_dedup_distinct_pairs",
    "text_tfidf_top_terms",
    "text_sentiment_lexicon",
    "similarity_ivf_kmeans_topk",
    "sample_hash_documents",
    "split_train_eval",
    "pipeline_training_mix",
    "pack_chunks_documents",
    "embedding_quantize_sq8",
    "similarity_pq_adc_topk",
    "similarity_ivf_pq_topk",
    "pivot_status_by_priority",
    "cube_segment_nation",
    "sessionize_events",
    "running_total_per_customer",
    "rank_lead_ntile",
    "percentiles_by_event_type",
    "except_customers",
    "asof_join_last_event",
    "range_join_first_day_events",
    "union_all_key_counts",
    "a3_value_counts_nation",
    "udf_scalar_age_group",
    "udf_grouped_first_last",
    "multimodal_frame_sample",
    "grouping_sets_status_priority",
    "udf_udtf_tokenize",
    "w_time_range_rolling",
    "fullouter_balance_by_nation",
    "unpivot_part_metrics",
    "approx_percentile_values",
    "text_token_stats_by_lang",
    "dedup_cluster_resolve",
    "sample_stratified_lang",
    "vocab_top_terms",
    "dedup_cross_corpus",
    "text_pii_redact",
    "dedup_paragraphs",
    "events_anomaly_zscore",
    "similarity_srp_lsh_pairs",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_forecast",
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q16_supplier_cnt_by_parttype",
    "tpch_q18_large_volume_customer",
    "sample_k_per_group",
    "filter_blocklist_sources",
    "text_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "text_bigram_logprob",
    "semdedup_prune",
    "sample_dsir_importance",
    "streaming_interval_join",
    "text_gopher_rules",
    "sample_temperature_mix",
    "pipeline_quality_curate",
    "dedup_substring_spans",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_sleeper_accounts",
    "stats_bootstrap_ci",
    "graph_link_prediction",
    "classify_naive_bayes_langid",
    "stats_benford_digits",
    "eval_roc_auc",
    "stats_quantile_normalize",
    "iso_regression_pav",
    "cf_item_item_cosine",
    "multimodal_mime_sniff",
    "text_info_gain",
    "cluster_grid_density",
    "finance_vwap_monthly",
    "dq_psi_drift",
    "ml_logreg_gd",
    "sketch_kmv_intersection",
    "eval_calibration_bins",
    "graph_bfs_distance",
    "ts_holt_forecast",
    "array_hof_vector_stats",
    "join_null_safe",
    "graph_kcore",
    "ts_time_weighted_avg",
    "stats_theilsen_slope",
    "sample_hard_negatives",
    "events_funnel_latency",
    "growth_mom_yoy",
    "text_feature_hashing",
    "eval_confusion_matrix",
    "events_dau_streaks",
    "sample_curriculum_order",
    "parts_skyline_2d",
    "text_zipf_fit",
    "sql_named_window",
    "dq_freshness_lag",
    "join_point_in_time",
    "ts_peak_detection",
    "agg_multi_distinct",
    "gapfill_locf_hourly",
]


_DRIVER_TAIL: list[str] = [
    # already green in r1/r2 and the most expensive to re-verify
    "pipeline_clean_corpus",
    "pipeline_contamination_check",
    "text_repetition",
    "c_gain_by_nation",
]


def _ordered_names() -> list[str]:
    head = [n for n in _DRIVER_HEAD if n in REGISTRY]
    tail = [n for n in _DRIVER_TAIL if n in REGISTRY]
    mid = [n for n in REGISTRY if n not in set(head) | set(tail)]
    return head + mid + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each query (omitted where the operator
    is not SQL-expressible; the driver then records a rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
