"""Measure the scale story instead of asserting it (VERDICT r1 item 6).

Runs the dedup / similarity / pipeline family at sf0.1 and again at a 10×
replication of the documents/embeddings tables, recording per-entry:

- wall seconds,
- number of stages executed,
- shuffle read + write bytes (the quantity SCALE.md's claims are about:
  banded LSH shuffles signatures not text, contamination joins 8-byte
  ints, scoring runs only on banded candidates).

Metrics come from the Spark UI REST API (``/api/v1``, status store —
public monitoring surface), diffed around each entry. The 10× set is
written to a scratch dir (never to /root/testdata): doc/vec ids are
offset per replica, content unchanged — which keeps per-doc signature
cost identical and grows candidate-pair density, i.e. the ADVERSARIAL
direction for near-dup joins.

Output: one JSON line per (entry, scale) to stdout and a markdown table
appended to SCALE_EVIDENCE.md (overwritten each run).

Usage: python tools/scale_evidence.py [--families dedup,sim,pipe]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/mda_scale10x"
REPLICAS = 10

ENTRIES = [
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard_sample",
    "pipeline_contamination_check",
    "pipeline_clean_corpus",
    "embedding_neardup_pairs",
    "similarity_bruteforce_topk",
    "similarity_ivf_kmeans_topk",
    "pack_chunks_documents",
    # round-2 curation layer
    "dedup_cluster_resolve",
    "similarity_srp_lsh_pairs",
    "dedup_paragraphs",
    "text_pii_redact",
    "dedup_cross_corpus",
    "vocab_top_terms",
    # round-2 second tranche
    "text_bigram_logprob",
    "sample_dsir_importance",
    "semdedup_prune",
]

# Pair-generating operators re-measured on the constant-density
# (distinct-content) replication — the set whose verbatim-replica ratios
# are dominated by duplicate multiplicity rather than plan shape.
# NOTE on SRP: with 4-bit bands, RANDOM pairs collide in some band at
# ~4/16 = 25%, so candidate volume is Theta(n^2 * p_rand) regardless of
# density — linear scaling requires band width to grow with ln(n) (the
# standard LSH sizing), which this corpus's weak-similarity regime
# (max cos 0.51) cannot afford recall-wise. Expect the fixed-band demo
# entry to stay superlinear here; round 4 added the ln(n)-sized
# similarity_srp_lsh_sized (measured ~2x wall / 8.5x shuffle at 10x —
# see the Round-4 section), keeping this one as the documented law.
PAIR_ENTRIES = [
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "embedding_neardup_pairs",
    "similarity_srp_lsh_pairs",
    "dedup_cluster_resolve",
    "pipeline_curate_full",
]


def rest(spark, path: str):
    port = spark.sparkSession.conf.get("spark.ui.port", "4040") if hasattr(spark, "sparkSession") else "4040"
    base = f"http://localhost:{port}/api/v1"
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.load(r)


def app_id(spark) -> str:
    return spark.sparkContext.applicationId


def stage_metrics(spark) -> tuple[int, int, int]:
    """(n_complete_stages, shuffle_read_bytes, shuffle_write_bytes) cumulative."""
    stages = rest(spark, f"/applications/{app_id(spark)}/stages?status=complete")
    n = len(stages)
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return n, rd, wr


def build_10x(spark, distinct: bool = False) -> str:
    """``distinct=False``: replicate rows verbatim (ids offset) — duplicate
    multiplicity grows 10×, the adversarial direction for pair-generating
    operators. ``distinct=True``: keep pair DENSITY constant instead —
    replica documents get a per-replica token prefix (shingles/signatures
    all differ → no cross-replica near-dups) and replica embeddings are
    seeded random unit-ish vectors (near-orthogonal in 64-dim: |cos|
    ~ N(0, 1/8), far below every threshold in use) — this isolates PLAN
    scaling from data-property scaling."""
    from pyspark.sql import functions as F

    from markt_database_analyzer_spark.sources.readers import read_table

    scratch = SCRATCH + ("_distinct" if distinct else "")
    if os.path.isdir(scratch):
        shutil.rmtree(scratch)
    os.makedirs(scratch)
    for tbl, idc in (("documents", "doc_id"), ("embeddings", "vec_id")):
        df = read_table(spark, SF_DIR, tbl)
        n = df.count()
        parts = []
        for i in range(REPLICAS):
            p = df.withColumn(idc, (F.col(idc) + F.lit(i * n)).cast("long"))
            if distinct and i > 0:
                if tbl == "documents":
                    # per-replica prefix on EVERY token (one regexp pass):
                    # all shingles/signatures/fingerprints differ from every
                    # other replica's, so cross-replica near-dup density is
                    # exactly zero while per-doc compute cost is unchanged
                    p = p.withColumn(
                        "text",
                        F.regexp_replace("text", r"(\S+)", f"r{i}$1"),
                    )
                else:
                    # seeded pseudo-random vector per (replica, vec_id):
                    # element e_j = (md5-hash(i|id|j) scaled to [-1, 1]);
                    # independent draws → near-orthogonal to everything
                    # fresh cells per replica: the corpus grows 10x AND the
                    # cell count grows 10x (the documented IVF scale lever),
                    # keeping per-cell pair volume constant
                    p = p.withColumn("label", F.col("label") + F.lit(i * 1000))
                    p = p.withColumn(
                        "embedding",
                        F.transform(
                            F.sequence(F.lit(0), F.size("embedding") - 1),
                            lambda j: (
                                F.pmod(
                                    F.conv(
                                        F.substring(
                                            F.md5(
                                                F.concat_ws(
                                                    "|",
                                                    F.lit(str(i)),
                                                    F.col(idc).cast("string"),
                                                    j.cast("string"),
                                                )
                                            ),
                                            1,
                                            15,
                                        ),
                                        16,
                                        10,
                                    ).cast("bigint"),
                                    F.lit(2_000_001),
                                )
                                / F.lit(1_000_000.0)
                                - F.lit(1.0)
                            ).cast("float"),
                        ),
                    )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # one physical file per ~n rows keeps scan parallelism comparable
        out.repartition(REPLICAS).write.parquet(f"{scratch}/{tbl}.parquet")
    return scratch


# Round-3 relational/analytics families: measured on a 10× replication
# of the RELATIONAL tables (consistent key offsets per replica so joins
# stay referentially intact; replica subgraphs are disjoint).
R3_ENTRIES = [
    "scd2_user_state_history",
    "rollup_hier_timegrain",
    "sketch_countmin_freq",
    "text_bpe_pair_merge",
    "text_pmi_collocations",
    "agg_incremental_maintenance",
    "layout_zorder_stats",
    "search_bm25_topk",
    "index_inverted_postings",
    "filter_bloom_semijoin",
    "join_interval_overlap",
    "embeddings_standardize_dims",
    "stats_chi2_lang_source",
    "graph_pagerank_bipartite",
    "assoc_rules_parts",
    "dq_constraint_suite",
    "stats_mad_by_event_type",
    "w_ewma_smoothed",
    "growth_cumulative_users",
    "segment_rfm_customers",
    "events_markov_transitions",
    "paths_top_sequences",
    "ts_seasonal_index_how",
    "text_readability",
    "sample_balanced_classes",
    "events_changepoint_cusum",
    "intervals_open_orders_daily",
    "parts_abc_pareto",
    # quadratic-per-block BY DESIGN (levenshtein verify inside blocks;
    # replication grows every block 10×) — kept to document the law
    "join_fuzzy_blocked",
]

R4_ENTRIES = [
    # round-3 tranches 18-22 (supervised/eval/graph/sketch layer)
    "join_set_similarity_prefix",
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
    # re-measured after their round-3 perf rebuilds
    "graph_link_prediction",
    "stats_bootstrap_ci",
    "multimodal_decode_features",
]

# Round-4 scale-path variants (VERDICT r3 items 2-4): the sized SRP is
# measured on the CONSTANT-DENSITY (distinct-content) replication — the
# protocol under which its fixed-band sibling measured 13.1x wall / 57x
# shuffle; the capped fuzzy join and the percentile-cut family run on
# the relational replication (fuzzy blocks grow 10x there — exactly the
# adversarial direction the cap exists for).
R5_PAIR_ENTRIES = ["similarity_srp_lsh_sized"]
R5_REL_ENTRIES = [
    "join_fuzzy_blocked",
    # er_fuzzy_canonicalize composes join_fuzzy_blocked + the CC resolver,
    # both measured individually; under VERBATIM 10x replication the
    # near-identical replica names chain into cross-replica fuzzy
    # components whose diameter exceeds the CC round bound — a duplicate-
    # multiplicity data property (same caveat as the minhash table), not
    # a plan property, so the composed entry is excluded here.
    "stats_winsorized_mean_cuts",
    "pack_equal_token_shards",
    "histogram_equi_depth_cuts",
    "segment_rfm_customers_cuts",
    "eval_calibration_bins_cuts",
    "stats_quantile_normalize_grid",
]

# Round-6: sf1 row (VERDICT r4 item 4 / r5 item 3). 10x of sf0.1 is
# ~6M lineitem rows = TPC-H sf1 = 100x of the sf0.01 oracle fixtures.
# Measured: the four reference-analysis analogs (the numbers BASELINE.md
# anchors against) plus the fixed scale-path entries from the r4 work.
R6_REL_ENTRIES = [
    "a_lifetime_rate_curve",
    "b1_events_per_slot",
    "b2_initial_rate_by_month",
    "c_gain_by_nation",
    "join_fuzzy_blocked",
    "histogram_equi_depth_cuts",
    "segment_rfm_customers_cuts",
    "stats_winsorized_mean_cuts",
    "eval_calibration_bins_cuts",
    "pack_equal_token_shards",
    "stats_quantile_normalize_grid",
]
R6_PAIR_ENTRIES = ["similarity_srp_lsh_sized"]

# Round-6 part 2: the five new entries, measured at the same sf1 volume
# (relational replication; nationkeys are NOT offset, so each NDCG query's
# candidate list grows 10x - the adversarial direction for the per-query
# window; the MaxSim panel stays 5 queries over a 10x corpus, like the
# brute-force kNN protocol).
R6B_ENTRIES = [
    "stats_spearman_corr",
    "stats_anova_oneway",
    "eval_ndcg_at_k",
    "similarity_maxsim_late_interaction",
    "finance_max_drawdown",
    "eval_pr_auc",
]

# Round-6 parts 3+4: the eleven classical-evaluation/trend entries,
# measured at the same sf1 volume (relational replication). The
# interesting rows: Kruskal-Wallis pushes ~6M rows through the
# distinct-domain prefix sum (the _cuts machinery at 100x of the oracle
# SF); the lift deciles keep the laptop-form global ntile (its
# documented scale substitute is the equi-depth cut path); hapax
# richness shuffles one row per VOCABULARY entry; Mann-Kendall's
# O(days^2) pair join is invariant (the day domain does not grow with
# volume), so its wall should track the scan.
R6C_ENTRIES = [
    "stats_kruskal_wallis",
    "eval_mrr_at_k",
    "ts_bollinger_bands",
    "stats_cramers_v",
    "eval_cohens_kappa",
    "eval_lift_gains_deciles",
    "ts_mann_kendall_trend",
    "ts_cross_correlation",
    "finance_rsi_sma",
    "eval_brier_score",
    "text_hapax_richness",
    # part 5: Brown-Forsythe exercises the GROUPED prefix sum at ~6M
    # rows; burstiness shuffles vocabulary-sized rows; the permutation
    # test's x64 explode is the volume-proportional row
    "stats_levene_brownforsythe",
    "text_burstiness",
    "stats_permutation_test",
]

# Round-6 parts 6-8: the nine experimentation/retrieval/resampling
# entries, measured at the same sf1 volume (relational replication).
# The interesting rows: CUPED's groupBy-user shuffle carries 10x users;
# PRF's two posting-list passes and the corpus document-frequency build
# are the volume rows (the query model stays <=8 terms); everything
# else (OLS, FDR, jackknife, PACF, JSD, Nelson-Aalen) reduces to
# sufficient statistics or day/month/category-grain frames, so wall
# should track the scan.
R6D_ENTRIES = [
    "stats_cuped_adjustment",
    "dq_jensen_shannon_drift",
    "events_nelson_aalen",
    "regression_multiple_ols",
    "rank_fusion_rrf",
    "stats_fdr_bh_nations",
    "search_pseudo_relevance_feedback",
    "ts_pacf_yule_walker",
    "stats_jackknife_ratio_se",
    # parts 9/10: Gini and the stump push the volume through the
    # distributed distinct-domain prefix sum; the Poisson bootstrap's
    # x32 explode is the volume row; QL retrieval repeats the PRF
    # posting-list shape
    "stats_gini_lorenz",
    "ml_decision_stump_gini",
    "stats_poisson_bootstrap",
    "stats_tost_equivalence",
    "finance_sharpe_sortino",
    "stats_wilson_ci_by_nation",
    "search_query_likelihood_dirichlet",
]

# Round-6 parts 11-13: the eight post-window (r7-queued) entries,
# measured at the same sf1 volume (relational replication). The
# interesting rows: the OOV entry's token-stream groupBy and broadcast
# membership pass scale with volume; zone maps add a second full-scan
# zone assignment per layout (two map-only passes + a 128-row frame);
# LTOB / ridge / McNemar / Cohen's d / G-test reduce to day-grain
# frames or sufficient statistics, so wall should track the scan. RBO's
# posting-list machinery repeats the BM25 shape.
R6E_ENTRIES = [
    "stats_mcnemar_test",
    "stats_cohens_d_effect",
    "stats_gtest_independence",
    "ml_ridge_normal_equations",
    "vocab_oov_rate_topk",
    "eval_rank_biased_overlap",
    "stats_zone_map_pruning",
    "ts_downsample_ltob",
    # part-14: Adamic-Adar repeats the link-prediction wedge shape
    # (threshold-filtered edges, capped anchors); the F1 sweep pushes
    # the volume through the paired distinct-domain prefix sums; SRM's
    # distinct-user groupBy and HHI's (month, supplier) groupBy are the
    # volume rows
    "graph_adamic_adar",
    "stats_srm_check",
    "stats_hhi_concentration",
    "eval_f1_threshold_sweep",
    # parts 15-17: the novelty entry's hashed-trigram distinct sets and
    # membership join, the lognormal-KS distinct-domain prefix sum, the
    # snippet entry's posting-list projection, and the burstiness
    # per-(user,type) lag window are the volume rows; power/MDE and
    # VaR/CVaR reduce to sufficient statistics / day-grain frames; the
    # k-anonymity class frame is attribute-domain-bounded; the LSH
    # recall eval runs on a FIXED 200-doc sample (volume-invariant by
    # construction)
    "stats_power_mde",
    "text_ngram_novelty",
    "stats_lognormal_fit_ks",
    "privacy_k_anonymity_audit",
    "events_interarrival_burstiness",
    "search_snippet_extraction",
    "ts_seasonal_strength",
    "finance_var_cvar",
    "dedup_lsh_recall_eval",
]

# Round-7: the five r6-queued entries that still lacked sf1 rows plus
# every new-in-r7 entry, measured at the same sf1 volume
# (relational replication). The volume rows: the cuts-path lift deciles
# push 10x docs through the distinct-domain prefix sum; code-detect is
# two regex passes over 10x text; assortativity's edge self-join grows
# with the (disjoint-replica) co-purchase graph; beta/ljung/sax/macd/
# hampel/grubbs/runs/heatmap/kendall reduce to hour- or day-grain
# frames (volume-invariant after the first groupBy), so wall should
# track the scan; the as-of join and hash-gate audits repeat their
# banded/ECDF shapes at 10x events.
R7_ENTRIES = [
    "stats_bayes_beta_binomial",
    "stats_runs_test",
    "events_dow_hour_heatmap",
    "join_asof_nearest",
    "dq_hash_gate_uniformity",
    "eval_lift_gains_deciles_cuts",
    "stats_grubbs_test",
    "stats_ljung_box",
    "finance_beta_capm",
    "graph_degree_assortativity",
    "privacy_l_diversity",
    "privacy_dp_laplace_counts",
    "text_code_detect",
    "stats_kendall_tau_daily",
    "ts_hampel_outliers",
    "finance_macd",
    "source_partition_pruning",
    "ts_sax_symbols",
    # batch 4
    "events_markov2_transitions",
    "stats_theil_index",
    "sample_stratified_neyman",
    "stats_cochran_armitage",
    # batch 5
    "embeddings_norm_histogram",
    "stats_capture_recapture",
    "dq_id_completeness",
    "agg_geometric_harmonic_means",
    # batches 6-8
    "similarity_cosine_hist_sample",
    "ts_pettitt_changepoint",
    "vocab_heaps_law_fit",
    "multimodal_payload_dedup",
    "stats_friedman_test",
    "stats_bartlett_test",
    "stats_odds_ratio_ci",
    "pack_token_budget_truncation",
    "stats_anderson_darling",
    "stats_cooks_distance",
    "sample_pps_systematic",
    "stats_hurst_exponent",
    "source_schema_evolution",
    "events_entropy_rate",
    "stats_esd_outliers",
    "join_asof_forward",
    "ts_seasonal_mann_kendall",
]

R9_ENTRIES = [
    "stats_mood_median_test",
    "stats_sprt_sequential",
    "ts_granger_causality",
    "privacy_t_closeness",
    "eval_expected_calibration_error",
    "eval_kendalls_w",
    "text_msttr_lexical_diversity",
    "ml_knn_classify_embeddings",
    "finance_evt_pot_tail",
    "stats_fisher_exact_2x2",
    "eval_cohens_kappa_weighted",
    "events_attribution_linear",
    "graph_hits_scores",
    "stats_cmh_test",
    "sample_ipf_raking",
    "events_logrank_test",
    "eval_auc_hanley_ci",
]

R10_ENTRIES = [
    "finance_benford_first_digit",
    "finance_basket_association_rules",
    "stats_mutual_information",
    "stats_jarque_bera",
    "stats_cliffs_delta",
    "stats_wasserstein_binned",
    "ts_durbin_watson",
    "events_page_hinkley",
    "eval_embedding_mmd_shift",
    "stats_cochran_q",
    "stats_atkinson_index",
    "multimodal_decode_real",
    "text_unigram_kl_divergence",
    "eval_bleu_adjacent_pairs",
]

# Round-11 additions, plus the two entries whose joins changed in the
# r11 broadcast audit (re-measured post-de-hint).
R11_ENTRIES = [
    "multimodal_decode_audio",
    "finance_basket_triples",
    "eval_chrf_adjacent_pairs",
    "streaming_session_counts",
    "finance_basket_association_rules",
    "tpch_q9_product_profit",
    "search_bm25_topk",
]

R12_ENTRIES = [
    "eval_rouge_l_adjacent_pairs",
    "eval_wer_adjacent_pairs",
    "multimodal_decode_gif",
    "multimodal_decode_gif_frames",
    "sketch_hll_cardinality",
    "sketch_bloom_membership",
    "streaming_batch_parity_tumbling",
    "streaming_hll_distinct",
]

_OFF = 10_000_000  # per-replica key offset (disjoint key spaces)

_R3_TABLES = {
    # table -> columns to offset per replica
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build_10x_rel(spark) -> str:
    """10× replication of the relational testdata with CONSISTENT key
    offsets: every replica is a disjoint, referentially-intact copy
    (orders.o_custkey and customer.c_custkey shift together, etc.), so
    join fan-outs stay exactly 1× per replica — pure volume scaling."""
    from pyspark.sql import functions as F

    from markt_database_analyzer_spark.sources.readers import read_table

    scratch = SCRATCH + "_rel"
    if os.path.isdir(scratch):
        shutil.rmtree(scratch)
    os.makedirs(scratch)
    for dim in ("region", "nation", "supplier"):
        read_table(spark, SF_DIR, dim).write.parquet(f"{scratch}/{dim}.parquet")
    for tbl, keys in _R3_TABLES.items():
        df = read_table(spark, SF_DIR, tbl)
        parts = []
        for i in range(REPLICAS):
            p = df
            for k in keys:
                p = p.withColumn(k, (F.col(k) + F.lit(i * _OFF)).cast("long"))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(REPLICAS).write.parquet(f"{scratch}/{tbl}.parquet")
    return scratch


def main() -> None:
    from markt_database_analyzer_spark.catalog import REGISTRY
    from markt_database_analyzer_spark.session import get_spark

    spark = get_spark(
        app_name="mda-scale-evidence",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4040",
            # the stage-diff metrics below need the status store to retain
            # every stage for the run's lifetime — eviction mid-run makes
            # cumulative diffs go negative
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    r3_mode = "--r3" in sys.argv
    r4_mode = "--r4" in sys.argv
    r5_mode = "--r5" in sys.argv
    r6_mode = "--r6" in sys.argv
    r6b_mode = "--r6b" in sys.argv
    r6c_mode = "--r6c" in sys.argv
    r6d_mode = "--r6d" in sys.argv
    r6e_mode = "--r6e" in sys.argv
    r7_mode = "--r7" in sys.argv
    r9_mode = "--r9" in sys.argv
    r10_mode = "--r10" in sys.argv
    r11_mode = "--r11" in sys.argv
    r12_mode = "--r12" in sys.argv
    r13_mode = "--r13" in sys.argv
    if r13_mode:
        r12_mode = False
    if r11_mode:
        r10_mode = False

    if r3_mode or r4_mode or r5_mode or r6_mode or r6b_mode or r6c_mode or r6d_mode or r6e_mode or r7_mode or r9_mode or r10_mode or r11_mode or r12_mode or r13_mode:
        print("building 10x relational replication ...", file=sys.stderr)
        big_rel = build_10x_rel(spark)
    else:
        print("building 10x replication ...", file=sys.stderr)
        big_dir = build_10x(spark)
    if r5_mode or r6_mode or not (r3_mode or r4_mode or r6b_mode or r6c_mode or r6d_mode or r6e_mode or r7_mode or r9_mode or r10_mode or r11_mode or r12_mode):
        print("building 10x distinct-content replication ...", file=sys.stderr)
        big_distinct_dir = build_10x(spark, distinct=True)

    def measure(names, big):
        out = []
        for name in names:
            out.append(run_entry(name, big))
            print(json.dumps(out[-1]))
        return out

    def run_entry(name, big):
        spec = REGISTRY[name]
        rec = {"entry": name}
        for label, d in (("1x", SF_DIR), ("10x", big)):
            force(spec.fn(spark, d))  # warm (codegen, footers)
            spark.catalog.clearCache()
            n0, rd0, wr0 = stage_metrics(spark)
            t0 = time.time()
            force(spec.fn(spark, d))
            wall = time.time() - t0
            n1, rd1, wr1 = stage_metrics(spark)
            rec[label] = {
                "wall_sec": round(wall, 2),
                "stages": n1 - n0,
                "shuffle_read_mb": round((rd1 - rd0) / 1e6, 2),
                "shuffle_write_mb": round((wr1 - wr0) / 1e6, 2),
            }
            spark.catalog.clearCache()
        rec["wall_ratio"] = round(rec["10x"]["wall_sec"] / max(rec["1x"]["wall_sec"], 1e-9), 2)
        rec["shuffle_ratio"] = round(
            rec["10x"]["shuffle_write_mb"] / max(rec["1x"]["shuffle_write_mb"], 1e-3), 2
        )
        return rec

    if r13_mode:
        # r12 verdict item 6: the HLL/Bloom/CMS value claim is "constant
        # exchange at ANY cardinality" — the r12 catalog rows could not
        # show it because each entry carries an exact-distinct AUDIT
        # column whose shuffle grows with cardinality. Measure the
        # SKETCH-ONLY dataflows (audit dropped), plus KMV as the honest
        # contrast: its k-smallest build rides a full distinct, so its
        # exchange SCALES with cardinality (k-smallest partial-agg is
        # the documented 100 TB fix, not yet needed at catalog SF).
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from markt_database_analyzer_spark.datapipe.hashing import hash60
        from markt_database_analyzer_spark.datapipe.sketches import (
            bloom_bits, cms_cells, hll_estimate, hll_registers)
        from markt_database_analyzer_spark.sources.readers import read_table

        def _ev(d):
            return read_table(spark, d, "events")

        def _kmv(d):
            h = _ev(d).select(
                "event_type",
                hash60(F.col("user_id").cast("string")).alias("h"),
            ).distinct()
            w = Window.partitionBy("event_type").orderBy("h")
            return (
                h.withColumn("r", F.row_number().over(w))
                .filter(F.col("r") <= 64)
                .select("event_type", "h")
            )

        FLOWS = [
            ("hll_registers_only", lambda d: hll_registers(
                _ev(d), F.col("user_id").cast("string"))),
            ("hll_estimate_no_audit", lambda d: hll_estimate(hll_registers(
                _ev(d), F.col("user_id").cast("string")))),
            ("bloom_bits_only", lambda d: bloom_bits(
                _ev(d), F.col("user_id").cast("string"))),
            ("cms_cells_only", lambda d: cms_cells(
                _ev(d), F.col("user_id").cast("string"), 4, 256)),
            ("kmv_sketch_build (distinct-backed: NOT flat)", _kmv),
        ]

        def run_flow(name, fn):
            rec = {"entry": name}
            for label, d in (("1x", SF_DIR), ("10x", big_rel)):
                force(fn(d))  # warm
                spark.catalog.clearCache()
                n0, rd0, wr0 = stage_metrics(spark)
                t0 = time.time()
                force(fn(d))
                wall = time.time() - t0
                n1, rd1, wr1 = stage_metrics(spark)
                rec[label] = {
                    "wall_sec": round(wall, 2),
                    "stages": n1 - n0,
                    "shuffle_read_mb": round((rd1 - rd0) / 1e6, 2),
                    "shuffle_write_mb": round((wr1 - wr0) / 1e6, 2),
                }
            rec["wall_ratio"] = round(
                rec["10x"]["wall_sec"] / max(rec["1x"]["wall_sec"], 1e-9), 2
            )
            rec["shuffle_ratio"] = round(
                rec["10x"]["shuffle_write_mb"]
                / max(rec["1x"]["shuffle_write_mb"], 1e-3), 2
            )
            return rec

        rows_r13 = []
        for name, fn in FLOWS:
            rows_r13.append(run_flow(name, fn))
            print(json.dumps(rows_r13[-1]))
        # the new r13 catalog entries, same protocol as prior rounds
        rows_r13_new = measure(
            [
                "sketch_kmv_set_ops",
                "multimodal_decode_png",
                "streaming_cms_heavy_hitters",
                "eval_smith_waterman_pairs",
                "sketch_qdigest_quantiles",
                "streaming_qdigest_quantiles",
            ],
            big_rel,
        )
    elif r12_mode:
        rows_r12 = measure(R12_ENTRIES, big_rel)
    elif r11_mode:
        rows_r11 = measure(R11_ENTRIES, big_rel)
    elif r10_mode:
        rows_r10 = measure(R10_ENTRIES, big_rel)
    elif r9_mode:
        rows_r9 = measure(R9_ENTRIES, big_rel)
    elif r7_mode:
        rows_r7 = measure(R7_ENTRIES, big_rel)
    elif r6e_mode:
        rows_r6e = measure(R6E_ENTRIES, big_rel)
    elif r6d_mode:
        rows_r6d = measure(R6D_ENTRIES, big_rel)
    elif r6c_mode:
        rows_r6c = measure(R6C_ENTRIES, big_rel)
    elif r6b_mode:
        rows_r6b = measure(R6B_ENTRIES, big_rel)
    elif r6_mode:
        rows_r6 = measure(R6_REL_ENTRIES, big_rel)
        rows_r6 += measure(R6_PAIR_ENTRIES, big_distinct_dir)
    elif r5_mode:
        rows_r5 = measure(R5_REL_ENTRIES, big_rel)
        rows_r5 += measure(R5_PAIR_ENTRIES, big_distinct_dir)
    elif r4_mode:
        rows_r4 = measure(R4_ENTRIES, big_rel)
    elif r3_mode:
        rows_r3 = measure(R3_ENTRIES, big_rel)
    else:
        rows = measure(ENTRIES, big_dir)
        rows_distinct = measure(PAIR_ENTRIES, big_distinct_dir)

    def table(rs):
        out = [
            "| entry | wall 1x (s) | wall 10x (s) | ratio | stages 1x\u219210x | shuffle write 1x\u219210x (MB) | ratio |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in rs:
            out.append(
                f"| {r['entry']} | {r['1x']['wall_sec']} | {r['10x']['wall_sec']} | {r['wall_ratio']}\u00d7 "
                f"| {r['1x']['stages']}\u2192{r['10x']['stages']} "
                f"| {r['1x']['shuffle_write_mb']}\u2192{r['10x']['shuffle_write_mb']} | {r['shuffle_ratio']}\u00d7 |"
            )
        return out

    md_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_EVIDENCE.md"
    )
    if r13_mode:
        lines = [
            "",
            "## Round-13 at sf1: the sketch-family FLAT-EXCHANGE claim, isolated",
            "",
            "The r12 catalog rows above show HLL shuffle growing 62x at "
            "10x — that is the exact-distinct AUDIT column each entry "
            "deliberately carries, not the sketch. These rows measure the "
            "SKETCH-ONLY dataflows over the same 1x/10x events tables "
            "(rows AND user_id cardinality grow 10x; the 10x set also has "
            "10x the parquet files, i.e. 10x map tasks). The HLL register "
            "build, the register+estimate fold, the Bloom bit table, and "
            "the CMS cell table partial-agg every map task to <= m rows "
            "before the ONE exchange, so their map-output is bounded by "
            "(#map tasks x m) — INDEPENDENT of row count and key "
            "cardinality. That is exactly what the bytes show: sketch "
            "exchanges grow only with the task count (x10 files -> "
            "~x7-14 bytes, i.e. constant per task and absolutely tiny), "
            "while the KMV contrast row — whose distinct() exchange "
            "state grows with CARDINALITY — blows up 66x to 150x the "
            "HLL bytes on identical input. At 1000 executors the sketch "
            "exchange is still (tasks x m) rows of ints; the documented "
            "100 TB fix for KMV is a per-partition k-smallest partial "
            "aggregate (top-k combiner) before the exchange. streaming_hll_distinct drives the SAME register build (hll_registers row above IS its per-microbatch exchange); its stream state is the <= 256-row register table forever, the unbounded-cardinality streaming-distinct answer. sketch_kmv_set_ops (r13) shares the KMV posture: per-corpus sketches are <= k rows, every pairwise set-op stage runs on <= k x |pairs| rows — only the build-side distinct carries the cardinality cost measured here.",
            "",
        ]
        lines += table(rows_r13)
        lines += [
            "",
            "The new r13 catalog entries, same protocol: the KMV "
            "set-op entry's growth is its exact-audit self-join (the "
            "sketch stages are <= k x |pairs| rows); the PNG decode is "
            "two map-only Arrow stages (shuffle is the deterministic "
            "orderBy only); the streaming CMS probe side scales with "
            "DISTINCT users (the truth/probe frame), its sketch state "
            "fixed at 256 rows; Smith-Waterman ships each 10x doc <= 2x "
            "through the one groupBy(pid) exchange (the ROUGE-L/WER "
            "envelope — token arrays ARE the payload); both q-digest "
            "entries' only distributed step is the domain-bounded "
            "histogram agg (<= 1024-row exchange at ANY volume).",
            "",
        ]
        lines += table(rows_r13_new)
        lines += [""]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-13 at sf1"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-13 sf1 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return
    elif r12_mode:
        lines = [
            "",
            "## Round-12 at sf1 (sequence DP, compressed/temporal decode, sketches, parity)",
            "",
            "Same sf1 relational-replication protocol as the tables above. "
            "The two sequence-DP metrics ship each 10x doc at most twice "
            "through one groupBy(pid) exchange and run the O(len^2) DP in "
            "a batch-vectorized pandas_udf — shuffle should scale ~10x "
            "(token arrays ARE the payload, the floor for order-sensitive "
            "DP), stages flat. The GIF decoders are two map-only Arrow "
            "stages — near-zero shuffle at both scales. The HLL/Bloom "
            "sketches are the constant-exchange story: register/bit "
            "tables partial-agg to <= m rows per partition, so shuffle "
            "bytes stay FLAT at 10x while the scan grows. The parity "
            "entry runs the same tumbling helper twice (batch + stream) "
            "plus window-level exceptAll — time-bounded, not "
            "data-bounded, beyond its two scans.",
            "",
        ]
        lines += table(rows_r12)
        lines += [""]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-12 at sf1"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-12 sf1 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return
    elif r11_mode:
        lines = [
            "",
            "## Round-11 at sf1 (new entries + the de-broadcast joins)",
            "",
            "Same sf1 relational-replication protocol as the tables above. "
            "The WAV decode is two map-only Arrow stages over 10x "
            "payloads (the raster-twin envelope); basket TRIPLES push 10x "
            "baskets through the co-partitioned cubic self-join after the "
            "lossless Apriori part-prune; chrF counts char grams once per "
            "doc and pair-joins only (pid, n, gram) counts — the BLEU "
            "staging; the streaming session entry replays the full stream "
            "(state cost ~ active users). The last three rows re-measure "
            "joins whose broadcast hints were REMOVED in the r11 audit "
            "(per-part counts / part x supplier legs / per-token IDF now "
            "plain joins AQE sizes at runtime) — flat stage counts and "
            "~linear shuffle confirm the de-hint cost nothing at bench "
            "scale while removing the 100 TB driver-OOM.",
            "",
        ]
        lines += table(rows_r11)
        lines += [""]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-11 at sf1"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-11 sf1 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    if r10_mode:
        lines = [
            "",
            "## Round-10 at sf1 (the fourteen new entries)",
            "",
            "Same sf1 relational-replication protocol as the tables above. "
            "The basket self-join (co-partitioned on the order key, pair "
            "volume ~ baskets x C(basket,2)) and Cliff's delta (10x order "
            "values through the distinct-domain prefix sum) are the volume "
            "rows; the BMP/PPM decode is two map-only Arrow stages over "
            "10x payloads; Benford/MI/JB/Cochran/Atkinson/MMD reduce to "
            "digit/cell/type/dim-bounded frames after one map-side-"
            "combined agg; Durbin-Watson, Page-Hinkley and Wasserstein "
            "live on calendar- or domain-bounded frames after the scan.",
            "",
        ]
        lines += table(rows_r10)
        lines += [""]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-10 at sf1"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-10 sf1 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    if r9_mode:
        lines = [
            "",
            "## Round-9 at sf1 (the nine new entries)",
            "",
            "Same sf1 relational-replication protocol as the tables above. "
            "MSTTR's positional token explode and the kNN anchor-panel "
            "scoring pass are the volume rows; Mood's median pushes 10x "
            "order values through the distinct-domain prefix sum; SPRT / "
            "Granger / EVT reduce to day- or hour-grain frames after one "
            "map-side-combined groupBy; t-closeness and ECE collapse to "
            "attribute-domain grids; Kendall's W ranks a CONSTANT 1000-"
            "item panel, so its wall should be flat.",
            "",
        ]
        lines += table(rows_r9)
        lines += [""]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-9 at sf1"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-9 sf1 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    if r7_mode:
        lines = [
            "",
            "## Round-7 at sf1 (five r6 stragglers + the new r7 entries)",
            "",
            "Same sf1 relational-replication protocol as the tables above. "
            "The cuts-path lift deciles (10x docs through the distinct-"
            "domain prefix sum), code-detect's regex passes, and the "
            "assortativity edge join are the volume rows; the stats/ts "
            "entries reduce to hour- or day-grain frames after one "
            "map-side-combined groupBy, so wall should track the scan.",
            "",
        ]
        lines += table(rows_r7)
        lines += [""]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-7 at sf1"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-7 sf1 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    if r6e_mode:
        lines = [
            "",
            "## Round-6 parts 11-13 at sf1 (the eight r7-queued entries)",
            "",
            "Same sf1 relational-replication protocol as the tables above. "
            "The OOV token-stream groupBy + broadcast membership pass and "
            "the zone maps' two map-only full-scan zone assignments are "
            "the volume rows; RBO repeats the BM25 posting-list shape; "
            "McNemar / Cohen's d / G-test / ridge / LTOB reduce to "
            "sufficient statistics or day-grain frames, so wall should "
            "track the scan.",
            "",
        ]
        lines += table(rows_r6e)
        lines += [""]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-6 parts 11"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-6 parts-11-13 sf1 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    if r6d_mode:
        lines = [
            "",
            "## Round-6 parts 6-10 at sf1 (the sixteen experimentation/retrieval/scale-path entries)",
            "",
            "Same sf1 relational-replication protocol as the tables above. "
            "CUPED/TOST's per-user shuffles, the PRF and query-likelihood "
            "posting-list passes, the Poisson bootstrap's x32 explode, and "
            "the Gini/stump distinct-domain prefix sums are the volume "
            "rows; the rest reduce to sufficient statistics or "
            "day/month/category-grain frames, so wall should track the scan.",
            "",
        ]
        lines += table(rows_r6d)
        lines += [""]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-6 parts 6"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-6 parts-6-8 sf1 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    if r6c_mode:
        lines = [
            "",
            "## Round-6 parts 3-5 at sf1 (the fourteen classical-evaluation entries)",
            "",
            "Same sf1 relational-replication protocol as the tables above. "
            "Kruskal-Wallis is the headline row: ~6M quantities through "
            "the distinct-domain distributed prefix sum (the _cuts "
            "machinery) plus the rank join-back. Mann-Kendall / CCF / "
            "Bollinger / RSI aggregate to day- or hour-grain first, so "
            "their post-scan state is volume-invariant and wall should "
            "track the scan; the lift deciles deliberately keep the "
            "laptop-form global ntile (documented scale substitute: "
            "equi-depth score cuts).",
            "",
        ]
        lines += table(rows_r6c)
        lines += [""]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-6 parts 3"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-6 parts-3+4 sf1 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    if r6b_mode:
        lines = [
            "",
            "## Round-6 additions at sf1 (the five part-2 entries)",
            "",
            "Same sf1 relational-replication protocol as the table above. "
            "nationkeys are NOT offset, so every NDCG query (nation) sees "
            "a 10\u00d7 candidate list \u2014 the adversarial direction for the "
            "per-query ranking windows; the MaxSim panel is 5 fixed "
            "queries over the 10\u00d7 corpus (the brute-force-kNN protocol); "
            "Spearman's rank domain grows to ~5.8M distinct values "
            "through the grouped prefix sum.",
            "",
        ]
        lines += table(rows_r6b)
        lines += [""]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-6 additions at sf1"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-6 part-2 sf1 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    if r6_mode:
        lines = [
            "",
            "## Round-6: sf1 (~6M-row lineitem; 10\u00d7 of sf0.1 = 100\u00d7 of the oracle SF)",
            "",
            "Same protocols as above (10\u00d7 disjoint referentially-intact "
            "relational replicas for the analysis/relational entries; "
            "constant-density distinct-content replicas for the sized SRP), "
            "with the dimension tables (region/nation/supplier) copied "
            "verbatim. The 1\u00d7 column is sf0.1; the 10\u00d7 column is "
            "TPC-H-sf1-equivalent volume \u2014 the absolute-scale row the "
            "r4/r5 verdicts asked for, covering the four reference-analysis "
            "analogs (the BASELINE.md anchors) and the round-4/6 "
            "scale-path entries after this round's two-gear rank change.",
            "",
        ]
        lines += table(rows_r6)
        lines += [
            "",
            "Annotations: the analyses are two/three-shuffle plans over "
            "events or lineitem\u22c8orders \u2014 wall should track the scan "
            "with shuffle \u2248 data; join_fuzzy_blocked at 6M-row part "
            "volume (200k parts) crosses the two-gear threshold, so this "
            "row measures the prefix-sum gear end-to-end; the _cuts "
            "family's domain-sized aggregations keep every task bounded "
            "by a range slice regardless of corpus size.",
            "",
        ]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-6: sf1"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-6 sf1 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    if r5_mode:
        lines = [
            "",
            "## Round-4 scale-path variants",
            "",
            "The three r3 'weak at scale' items, re-measured after their "
            "round-4 fixes. join_fuzzy_blocked and the percentile-cut "
            "family run on the 10× RELATIONAL replication (every fuzzy "
            "block grows 10× — the direction that made the uncapped form "
            "9.9×/69×); similarity_srp_lsh_sized runs on the "
            "CONSTANT-DENSITY distinct-content replication (where the "
            "fixed-band form measured 13.1× wall / 57× shuffle).",
            "",
        ]
        lines += table(rows_r5)
        lines += [
            "",
            "Annotations: the sorted-neighborhood cap makes fuzzy-ER "
            "verify work O(n·W); the equi-depth/cut entries do two "
            "domain-sized aggregations plus a scan (no total order "
            "anywhere), so their wall should track the scan; the sized "
            "SRP's ln(n) band width keeps random-pair candidates linear "
            "— its per-row projection work grows by r(10n)/r(n) "
            "(a log factor), which the wall ratio includes. "
            "segment_rfm_customers_cuts's ~22× shuffle-byte ratio is a "
            "constant-factor effect, not growth: its dominant vc frame "
            "is keyed by m_value (distinct ≈ customers, rows scale "
            "exactly 10×); at 1× the 1,500-customer frames compress "
            "into near-empty map-side partials while at 10× they carry "
            "real rows — wall and stage count show the plan is linear.",
            "",
        ]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-4 scale-path variants"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-4 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    if r4_mode:
        lines = [
            "",
            "## Round-3 tranches 18-22 — 10× relational replication",
            "",
            "Same protocol as the round-3 table (disjoint, referentially-"
            "intact 10× replicas; warmed runs; status-store stage/shuffle "
            "diffs).",
            "",
        ]
        lines += table(rows_r4)
        lines += [
            "",
            "Annotations: iterative entries (logreg 8 GD steps, BFS "
            "rounds, grid-clustering label propagation, Holt fold) do "
            "fixed iteration counts — their ratio reflects 10× data per "
            "step plus constant per-round scheduling; graph entries "
            "(link prediction, BFS, CF) see 10 disjoint graph copies, so "
            "wedge/frontier volume scales exactly 10×; model-sized "
            "outputs (Benford, PSI, calibration, KMV, VWAP, info gain) "
            "should land ≲10× wall with shuffle ≈ data ratio.",
            "",
        ]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        marker = "\n## Round-3 tranches 18-22 — 10× relational replication"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-3 tranche-18-22 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    if r3_mode:
        # append the round-3 section, leaving the r1/r2 tables intact
        lines = [
            "",
            "## Round-3 families — 10× relational replication",
            "",
            "10× replication of events/orders/lineitem/customer/part/"
            "documents/embeddings with CONSISTENT per-replica key offsets "
            "(each replica is a disjoint, referentially-intact copy — join "
            "fan-out stays 1×, pure volume scaling). Same warmed-run, "
            "status-store-diffed protocol as above.",
            "",
        ]
        lines += table(rows_r3)
        lines += [
            "",
            "Annotations: join_fuzzy_blocked is quadratic per block BY "
            "DESIGN (the replication grows every (noun, size) block 10×, so "
            "the levenshtein verify does ~100× work — production blocking "
            "keys are chosen so block size is O(1) in corpus growth). "
            "graph_pagerank_bipartite runs 5 fixed iterations; its ratio "
            "reflects 10× edges per iteration. Entries whose output is "
            "model-sized (seasonal index, chi2, Markov, DQ, rollup, growth) "
            "should land ≲10× wall with shuffle ratios ≈ the data ratio.",
            "",
        ]
        prev = open(md_path).read() if os.path.exists(md_path) else ""
        # drop any previous round-3 section before appending the fresh one
        marker = "\n## Round-3 families — 10× relational replication"
        if marker in prev:
            prev = prev[: prev.index(marker)]
        with open(md_path, "w") as f:
            f.write(prev.rstrip("\n") + "\n" + "\n".join(lines))
        print("appended round-3 section to SCALE_EVIDENCE.md", file=sys.stderr)
        return

    lines = [
        "# SCALE_EVIDENCE — measured, not asserted",
        "",
        f"10× replication of documents/embeddings from {SF_DIR} "
        f"(ids offset per replica, content unchanged → near-dup candidate density GROWS, "
        "the adversarial direction). local[32]; stage counts and shuffle bytes from the "
        "Spark status store, diffed around each warmed run.",
        "",
    ]
    lines += table(rows)
    lines += [
        "",
        "Reading: a wall ratio ≲ 10× on 10× data means the plan scales at worst linearly "
        "on this machine (constant stage count = no per-scale plan degeneration); "
        "shuffle-byte ratios ≈ data ratio confirm shuffles carry per-row constants "
        "(signatures/ints), never quadratic pair material. Entries that score banded "
        "candidate PAIRS (minhash/simhash/jaccard/neardup) may exceed 10× in wall time "
        "when the replication inflates true duplicate density — the pair count is a "
        "property of the data, not the plan; the shuffle columns show the join input "
        "stayed linear.",
        "",
        "## Constant-density 10\u00d7 (distinct-content replicas)",
        "",
        "Same 10\u00d7 row counts, but replicas are CONTENT-DISTINCT (per-replica "
        "token prefixes shift every shingle; replica embeddings are seeded "
        "near-orthogonal random vectors), so true pair density stays at the 1\u00d7 "
        "level. This isolates PLAN scaling from data-property scaling \u2014 the "
        "pair-generating operators must land \u2248 linear here:",
        "",
    ]
    lines += table(rows_distinct)
    lines += [
        "",
        "A pair-entry that is superlinear in the verbatim-replica table but "
        "\u2248linear here is superlinear only in TRUE DUPLICATE MULTIPLICITY \u2014 "
        "the quantity the operator exists to surface \u2014 not in corpus size; "
        "that is the correct scaling law for dedup (output \u221d duplicates found). "
        "Exception by design: SRP with fixed 4-bit bands admits ~25% of RANDOM "
        "pairs as candidates, so its candidate volume is \u0398(n\u00b2\u00b7p_rand) at any "
        "density \u2014 the standard LSH sizing grows band width with ln(n) to keep "
        "p_rand\u00b7n\u00b2 linear; this corpus's weak-similarity regime (max cos "
        "0.51) can't afford that recall-wise, so the entry keeps demo-sized "
        "bands and this table documents the law instead of hiding it.",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_EVIDENCE.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALE_EVIDENCE.md", file=sys.stderr)


if __name__ == "__main__":
    main()
