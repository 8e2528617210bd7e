"""Physical-plan audit: evidence that headline queries compile to the
plans you'd want at 100 TB.

For each audited query this captures `.explain("formatted")` and
greps for: parquet filter pushdown (PushedFilters), join strategies
(broadcast vs shuffled vs nested-loop), and whole-stage codegen
spans. Writes PLANS.md with a summary table plus the flagged lines,
and exits nonzero if a red flag appears (CartesianProduct or
BroadcastNestedLoopJoin outside the documented ANN allowlist, or a
filtered parquet scan with no pushed filter).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from advisorydatapipeline_spark.session import get_spark  # noqa: E402
from advisorydatapipeline_spark.registry import QUERIES
import advisorydatapipeline_spark.queries  # noqa: F401  (registers)

AUDIT = [
    "flagship_advisory_resolution",
    "scan_filter_pushdown",
    "ci_compound_key_left_join",
    "grouped_max_by",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash64",
    "decontaminate_overlap",
    "dedup_incremental",
    "local_supplier_revenue",
    "sequence_packing",
    "repetition_stats",
    "asof_join_last_view",
    "range_join_views_before_purchase",
    "time_rollup",
    "skew_salted_agg",
    "window_running_metrics",
    "zscore_anomalies",
    "scd2_intervals",
    "grouping_sets_returns",
    "ann_ivf_topk",
    "ann_cosine_topk",  # brute-force ground truth: nested-loop expected
    "tfidf_top_terms",
    "dup_span_fraction",
    "split_assignment",
    "curation_pipeline",
    "small_qty_brand_revenue",
    "supplier_value_share",
    "priority_semi_join",
    "disjunctive_filter_revenue",
    "pagerank_suppliers",
    "ewma_user_values",
    "retention_cohorts",
    "funnel_analysis",
    "min_gap_events",
    "mad_outliers",
    "not_in_antijoin",
    "intersect_except_all",
    "range_frame_rolling_sum",
    "props_map_stats",
    "cube_event_matrix",
    "unpivot_metrics",
    "training_mix_plan",
    "federated_union_scan",
    "compact_small_files",
    "full_outer_reconciliation",
    "window_value_functions",
    "user_erasure_rewrite",
    "recursive_cte_chain",
    "vector_pair_dot",
    "sample_capped_per_group",
    "schema_evolution_scan",
    "sole_fault_supplier",
    "idle_customer_balance",
    "customer_order_distribution",
    "contrastive_triplets",
    "group_normalized_features",
    "canonical_corpus",
    "parameterized_sql_filter",
    "sql_udf_revenue",
    "skew_salted_join",
    "large_order_customers",
    "ttl_cutoff_filter",
    "fuzzy_name_pairs",
    "hll_shard_union",
    "theta_set_overlap",
    "modern_sql_aggregates",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "winnowing_fingerprints",
    "winnow_neardup_pairs",
    "session_membership_join",
    "bitmap_exact_distinct",
    "incremental_rollup_merge",
    "forecast_revenue_band",
    "returned_item_ranking",
    "nation_volume_shipping",
    "regional_market_share",
    "price_qty_regression",
    "sorted_event_type_sets",
    "calendar_spine_fill",
    "null_safe_join",
    "binary_file_scan",
    "log_parse_text",
    "pmi_collocations",
    "neardup_triangles",
    "kmeans_lloyd_step",
    "session_window_api",
    "merge_into_customers",
    "source_quota_cap",
    "corpus_mixture_waterfill",
    "zorder_chunk_stats",
    "dedup_embedding_rhp",
    "bm25_doc_ranking",
    "vocab_oov_rate",
    "dedup_containment",
    "bloom_corpus_probe",
    "entity_resolution_parts",
    "histogram_quantile_estimate",
    "rhp_recall_eval",
    "ivf_recall_eval",
    "bpe_pair_ranks",
    "seasonal_dow_indices",
    "interval_merge_coverage",
    "bfs_reachable_hops",
    "column_profile_orders",
    "inverted_index_postings",
    "duplicate_passages",
    "rolling_distinct_users",
    "gap_fill_interpolate",
    "event_transition_matrix",
    "ks_value_drift",
    "cross_source_dup_matrix",
    "time_weighted_value",
    "cep_pattern_matches",
    "dedup_jaccard_prefix",
    "grid_proximity_join",
    "countmin_estimates",
    "asof_join_next_purchase",
    "asof_join_nearest_purchase",
    "trending_per_hour",
    "funnel_time_bound",
    "session_relative_features",
    "attribution_last_touch",
    "percent_of_parent_rollup",
    "gap_histogram_log2",
    "temperature_mix_rates",
    "length_bucket_batching",
    "syndicated_families",
    "ngram_novelty",
    "daily_autocorr_moments",
    "chi2_independence_scan",
    "rfm_segments",
    "benford_screen",
    "federated_dim_join",
    "table_diff_fingerprints",
    "ab_test_lift",
    "cohort_ltv_curve",
    "sorted_neighborhood_pairs",
    "winsorized_revenue",
    "basket_pair_lift",
    "pareto_skyline",
    "interval_concurrency_curve",
    "streaming_transition_counts",
    "lsh_s_curve",
    "activity_streaks",
    "bounce_rate_daily",
    "ship_latency_percentiles",
    "dedup_pair_evidence",
    "lorenz_revenue_deciles",
    "emd_value_distributions",
    "theil_sen_trend",
    "kmv_distinct_sketch",
    "centroid_separation",
    "temperature_mix_apply",
    "decile_migration_matrix",
    "shuffle_skew_whatif",
    "media_decode_stats",
    "bpe_encode_tokens",
    "join_cardinality_whatif",
    "cdc_chunk_stats",
    "binary_media_files",
    "variant_extract_props",
    "unpivot_event_matrix",
    "collated_ci_join",
    "cdc_apply_changelog",
    "weighted_sample_ares",
    "constraint_suite_orders",
    "lateral_topn_join",
    "attribution_position_based",
    "pq_adc_topk",
    "pq_recall_eval",
    "kaplan_meier_retention",
    "rake_keywords",
    "basket_brand_triples",
    "k_core_suppliers",
    "char_unigram_surprisal",
    "cdc_shared_chunks",
    "bm25_maxscore_topk",
    "ivf_pq_topk",
    "scd2_apply_changes",
    "l_diversity_audit",
    "cusum_changepoint_revenue",
    "tokenizer_fertility_lang",
    "weighted_median_price",
    "code_switch_chunks",
    "bloom_join_prune",
    "temporal_split_leakage",
    "pseudonymize_join_consistency",
    "target_encode_segment",
    "zipf_slope_tokens",
    "markov_attribution_removal",
    "knn_label_eval",
    "langid_confusion_eval",
    "quantile_normalize_balance",
    "jackknife_ratio_se",
    "ivm_join_delta",
    "geometric_median_embeddings",
    "ann_hubness_audit",
    "spearman_rank_corr",
    "knn_distance_outliers",
    "forecast_backtest_mae",
    "sql_session_variables",
    "dbscan_grid_clusters",
    "heaps_vocab_growth",
    "holt_linear_weekly",
    "label_propagation_communities",
    "cdc_doc_coverage",
    "interarrival_burstiness",
    "gini_revenue_nation",
    "lm_perplexity_scores",
    "jpeg_header_stats",
    "semantic_dedup",
    "gopher_quality_flags",
    "dsir_importance_weights",
    "perceptron_lang_step",
    "gif_frame_sampling",
    "wav_frame_energy",
    "bmp_pixel_stats",
    "quality_gate_pipeline",
    "image_phash_neardup",
    "jpeg_pixel_stats",
    "audio_fingerprint_neardup",
    "t_closeness_audit",
    "mannwhitney_value_drift",
    "epoch_shard_plan",
    "avi_mjpeg_frame_sampling",
    "url_canonical_dedup",
    "domain_quota_retention",
    "decontaminate_longest_span",
    "clip_pair_gate",
    "clip_source_retention",
    "mp3_frame_stats",
    "html_text_extract",
    "html_block_link_density",
    "robots_txt_gate",
    "corpus_datasheet",
    "bitext_margin_mining",
    "bitext_margin_mining_ivf",
    "bitext_ivf_recall",
    "mp3_granule_synthesis",
    "pass_at_k_eval",
    "best_of_n_reward_selection",
    "unimax_epoch_mix",
    "wav_dft_bands",
    "mp3_huffman_decode",
    "mp3_polyphase_synthesis",
    "suffix_dup_depths",
    "kn_bigram_scores",
    "dpo_pair_builder",
    "self_consistency_vote",
    "nucleus_topp_plan",
    "quant_calibration_absmax",
    "duplicate_spans_exact",
    "kn_trigram_scores",
    "kn_5gram_scores",
    "moe_router_load",
    "gradient_noise_scale",
    "packing_crossdoc_attention",
    "rlhf_kl_budget",
    "ams_f2_moment",
    "distill_disagreement_set",
    "jm_lambda_em_step",
    "video_pframe_decode",
    "grpo_advantage_baseline",
    "rejection_sampling_keep",
    "dataset_cartography",
    "tracin_influence_topk",
    "speculative_decode_accept",
    "matryoshka_recall_eval",
    "rrf_fusion_topk",
    "rrf_fusion_ivf",
    "rrf_ivf_recall_eval",
    "mink_prob_membership",
    "ema_checkpoint_average",
    "brier_decomposition_eval",
    "span_corruption_plan",
    "unicode_normalize_stats",
    "pii_multiclass_scrub",
    "streaming_url_dedup",
    "c4_line_filters",
    "line_global_dedup",
    "hashed_ngram_classifier",
    "crawl_politeness_plan",
    "secret_entropy_scrub",
    "bradley_terry_mm_step",
    "roc_pr_calibration",
    "doremi_domain_reweight",
    "template_slot_fingerprint",
    "ndcg_ranking_eval",
    "source_diversity_loo",
    "flac_stream_stats",
    "warc_record_stats",
    "web_corpus_pipeline",
    "license_compat_audit",
    "crawl_frontier_refresh",
]

# documented exceptions: broadcast-side cross joins in the ANN
# exact/assignment plans (operators/similarity.py), and the 1-row
# broadcast global-scalar cross joins (corpus size / global total)
# in tfidf and the Q11 shape
NESTED_LOOP_OK = {
    # 1-row broadcast total_pairs scalar join
    "join_cardinality_whatif",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "tfidf_top_terms",
    "supplier_value_share",
    # 1-row broadcast global-scalar cross joins (stage-count scalars /
    # corpus totals) — single-row build side, not a data-scale loop
    "funnel_analysis",
    "training_mix_plan",
    # Spark's NOT IN = null-aware anti join is planned as a broadcast
    # nested loop with a single-column build side by design
    "not_in_antijoin",
    # 1-row broadcast scalars (balance mean + recency cutoff)
    "idle_customer_balance",
    # broadcast anchor set scored against the corpus scan — the same
    # exact-scoring plan as ann_cosine_topk
    "contrastive_triplets",
    # broadcast-centroid assignment cross join (the IVF assign plan)
    "kmeans_lloyd_step",
    # 1-row broadcast corpus-total scalar
    "pmi_collocations",
    # 1-row broadcast token-budget scalar (B = total DIV 2)
    "corpus_mixture_waterfill",
    # same 1-row budget scalar, capacities instead of sizes
    "unimax_epoch_mix",
    # 1-row broadcast (min, width) bin-edge scalar + 3-row quantile
    # literals — single/constant-row build sides, not data-scale loops
    "histogram_quantile_estimate",
    # 1-row broadcast (N, sum dl) corpus-stats scalar
    "bm25_doc_ranking",
    # 1-row broadcast corpus-count scalar (candidate map modulus,
    # the clip_pair_gate precedent)
    "tracin_influence_topk",
    # broadcast query-sample cross joins (brute gauge arms, the
    # ann_cosine_topk precedent) + 1-row doc-count broadcast (rrf idf)
    "matryoshka_recall_eval",
    "rrf_fusion_topk",
    # broadcast centroid/probe-list cross joins (the IVF assign plan,
    # kmeans/ann_ivf precedent) + the 1-row doc-count idf broadcast
    "rrf_fusion_ivf",
    # both fusion arms above + 1-row count scalars (recall-ppm)
    "rrf_ivf_recall_eval",
    # 1-row broadcast count scalars (recall-ppm assembly) + the
    # labeled brute-force truth side
    "rhp_recall_eval",
    "ivf_recall_eval",
    # 1-row broadcast overall-mean scalar
    "seasonal_dow_indices",
    # 1-row broadcast corpus-doc-count scalar (df band bounds)
    "inverted_index_postings",
    # 1-row broadcast (min ts, max ts) bounds scalar (midpoint split)
    "ks_value_drift",
    # same 1-row bounds scalar as ks_value_drift (shared split trick)
    "mannwhitney_value_drift",
    # 4-row broadcast global band-distribution table (grid densify)
    "t_closeness_audit",
    # 2-row broadcast lag-list constant (lags 1 and 7)
    "daily_autocorr_moments",
    # 1-row broadcast basket-total scalar
    "basket_pair_lift",
    # 1-row broadcast corpus-token-total scalar (interpolation p1 arm)
    "lm_perplexity_scores",
    # 1-row broadcast corpus-token-total scalar (word-unigram model)
    "mink_prob_membership",
    # 1-row broadcast token-count scalar (per-expert fractions)
    "moe_router_load",
    # 1-row broadcast lower-median estimator scalar beside the exact
    # F2 aggregate
    "ams_f2_moment",
    # 1-row broadcast train-token-total scalar (unigram denominator)
    "jm_lambda_em_step",
    # 1-row broadcast count-of-counts model scalar (dn, dd, nall)
    "kn_bigram_scores",
    # two 1-row broadcast count-of-counts model scalars (trigram +
    # modified-bigram levels) + the max_t bound rows — visible now
    # that the audit reads the lazy seam instead of the checkpointed
    # Scan ExistingRDD
    "kn_trigram_scores",
    # four 1-row model scalars + the combined max_t bound row
    # (KenLM-default order 5)
    "kn_5gram_scores",
    # 1-row broadcast (Nt, Ns) smoothing-denominator scalar
    "dsir_importance_weights",
    # broadcast-centroid assignment cross joins (seed + refined) —
    # the same IVF-assign plan shape as kmeans_lloyd_step
    "semantic_dedup",
    # 1-row broadcast corpus-mean-surprisal threshold scalar
    "quality_gate_pipeline",
    # 4-row broadcast banding-config constant x 19-row grid (the
    # whole query is constant-size; no data-scale side exists)
    "lsh_s_curve",
    # pairwise-slope self-join runs on the ~30-row daily rollup —
    # quadratic in DAYS by design, never in events
    "theil_sen_trend",
    # 1-row broadcast true-distinct scalar beside the 1-row kth-hash
    "kmv_distinct_sketch",
    # 1-row broadcast (min, max) order-date bounds scalar
    "decile_migration_matrix",
    # broadcast codebook-row / query-table cross joins (the PQ
    # encode + ADC plans) — build sides are 1 row and |queries| rows
    "pq_adc_topk",
    "pq_recall_eval",
    # 1-row broadcast horizon/total scalars on the user-lifetime rollup
    "kaplan_meier_retention",
    # 1-row broadcast (n_baskets, minsup) stats scalar
    "basket_brand_triples",
    # 1-row broadcast k-threshold / alphabet-total scalars
    "k_core_suppliers",
    "char_unigram_surprisal",
    # 1-row broadcast theta / audit-count scalars (MaxScore pruning)
    "bm25_maxscore_topk",
    # broadcast centroid/codebook-row cross joins (coarse assign +
    # residual encode + per-(query,cell) tables) — constant-size
    # build sides; the candidate join itself is an equi-join
    "ivf_pq_topk",
    # 1-row broadcast (n, total) scalar onto the ~30-row daily rollup
    "cusum_changepoint_revenue",
    # 1-row broadcast audit-count scalars beside the pruned join
    "bloom_join_prune",
    # 1-row broadcast leak-count / global-mean scalars
    "temporal_split_leakage",
    "target_encode_segment",
    # tiny variant-expansion cross join (5 constant rows) + 1-row
    # base/total scalars around the ~30-row chain model
    "markov_attribution_removal",
    # broadcast query set scored against the corpus scan (the
    # ann_cosine_topk ground-truth plan) + tiny label joins
    "knn_label_eval",
    # same brute-scoring plan + 1-row histogram-total scalar
    "ann_hubness_audit",
    # brute k-th-neighbor plan (the labeled ground-truth ceiling)
    "knn_distance_outliers",
    # 1-row broadcast last-doc scalar closing the growth curve
    "heaps_vocab_growth",
    # 1-row broadcast corpus-sized grid/minpts scalars
    "dbscan_grid_clusters",
    # 1-row broadcast embedding-count scalar (modular pair map)
    "clip_pair_gate",
    "clip_source_retention",
    # 5-row broadcast rules table theta-joined on a prefix compare —
    # RFC longest-match cannot be an equi-join; build side is the
    # (tiny, constant) robots ruleset
    "robots_txt_gate",
    # exact brute baseline / recall truth for bitext mining; pair
    # scoring is the block-replicated cogroup matmul (no pair-row
    # shuffle); production is bitext_margin_mining_ivf
    "bitext_margin_mining",
    # broadcast centroid cross-joins (8 constant rows) feeding the
    # probe/assign argmins; the candidate generation itself is a
    # cogrouped bucket matmul, pair rows never carry vectors
    "bitext_margin_mining_ivf",
    # both arms above + 1-row accepted-count scalars for the ppm math
    "bitext_ivf_recall",
    # 1-row broadcast normalization-total scalar over the 8-row
    # strength table (both MM-step denominators are equi-joins)
    "bradley_terry_mm_step",
    # 1-row broadcast AUC scalar beside the 10-row bucket table
    "roc_pr_calibration",
    # 1-row broadcast global/base/decomposition scalars (10-bin agg)
    "brier_decomposition_eval",
    # 1-row broadcast corpus-mean / normalization scalars over the
    # k-domain table
    "doremi_domain_reweight",
    # 1-row broadcast instruction-count scalar (df threshold)
    "template_slot_fingerprint",
    # 1-row broadcast (total, sumsq) corpus scalar over the k-source
    # table (the LOO decomposition)
    "source_diversity_loo",
    # inherits robots_txt_gate's tiny-ruleset prefix theta join (its
    # member subtree; see that entry's note)
    "web_corpus_pipeline",
}

# Global (partition-less) window allowlist: every surviving
# single-partition WindowExec must carry a machine-checkable
# boundedness argument here (r11 verdict item 3). The audit FAILS on
# a global window in any plan whose query is not listed; PLANS.md
# prints the argument next to each detection.
GLOBAL_WINDOW_OK = {
    # --- bounded by a limit in the plan itself -----------------------
    "bm25_maxscore_topk": (
        "rank window input is TakeOrderedAndProject output — at most"
        " k rows by the limit itself, not by a data argument"
    ),
    "bpe_pair_ranks": (
        "rank window over the TakeOrdered top-10 pair rows — bounded"
        " by the limit, never the pair table"
    ),
    # --- windows over per-group / per-bucket aggregate tables --------
    "unimax_epoch_mix": (
        "same per-SOURCE waterfill windows as corpus_mixture_waterfill"
        " (capacities instead of sizes)"
    ),
    "corpus_mixture_waterfill": (
        "water-fill level windows over the per-SOURCE token table"
        " (k sources), documents partial-agg away first"
    ),
    "temperature_mix_rates": (
        "rate windows over the per-source table (k rows)"
    ),
    "temperature_mix_apply": (
        "same per-source table as temperature_mix_rates"
    ),
    "ks_value_drift": (
        "cumulative CDF windows over the fixed cent-bucket table"
        " (value-range / bucket-width rows)"
    ),
    "emd_value_distributions": (
        "same bucket-table CDF windows as ks_value_drift"
    ),
    "mannwhitney_value_drift": (
        "cumulative windows over the distinct-cent-value table;"
        " beyond ~3e9 rows/side the docstring's bucket trick applies"
    ),
    "t_closeness_audit": (
        "EMD windows over the sensitive-value bucket table"
    ),
    "chi2_independence_scan": (
        "windows over the k x m contingency-cell table"
    ),
    "benford_screen": ("windows over the 9-row leading-digit table"),
    "roc_pr_calibration": (
        "cumulative windows over the fixed score-bucket table"
    ),
    "bradley_terry_mm_step": (
        "rank over the k-model strength table (k^2 pair collapse"
        " happens before any window)"
    ),
    "cusum_changepoint_revenue": (
        "cumulative windows over the per-day revenue rollup"
        " (calendar-bounded)"
    ),
    "forecast_backtest_mae": (
        "windows over the per-day series (calendar-bounded)"
    ),
    "interval_concurrency_curve": (
        "running sum over the distinct-boundary-day curve table;"
        " range-partitioned prefix-sum at scale (docstring)"
    ),
    "kaplan_meier_retention": (
        "survival product over the per-lifetime-day table"
        " (horizon-bounded)"
    ),
    "decile_migration_matrix": (
        "ntile over the per-customer rollup x2 halves — exact"
        " quantile semantics require a total order; range-partitioned"
        " sort at scale (same contract as rfm_segments)"
    ),
    "rake_keywords": (
        "only the deduped candidate-phrase table hits the global"
        " top-N window (docstring plan note)"
    ),
    "zipf_slope_tokens": (
        "global rank over the |vocab| term-frequency table"
        " (tens of thousands of rows; docstring)"
    ),
    "heaps_vocab_growth": (
        "cumulative curve window over |docs| first-occurrence rows"
        " (sampled curve; docstring)"
    ),
    "lorenz_revenue_deciles": (
        "ntile over the per-customer revenue rollup (total-order"
        " contract, range-partitioned sort at scale) + share windows"
        " on the 10-row decile table"
    ),
    # --- total-order semantics the operator is DEFINED by ------------
    "rfm_segments": (
        "exact ntile quartiles over the per-customer rollup — the"
        " quartile SEMANTICS are the contract; docstring documents"
        " the broadcast-quantile-cut swap at real scale"
    ),
    "sorted_neighborhood_pairs": (
        "SNM is DEFINED by a global sort order; rank becomes a"
        " range-partitioned sort + per-range offsets at scale"
        " (docstring), window body unchanged"
    ),
    "pareto_skyline": (
        "sort-based skyline needs the frequency total order over the"
        " per-customer point set; range-partitions at scale"
        " (docstring)"
    ),
    "spearman_rank_corr": (
        "deterministic rank windows over the doc-metric table;"
        " docstring documents rank-one-metric-at-a-time / sampling"
        " at 100 TB"
    ),
    "knn_distance_outliers": (
        "global top-N outlier rank over per-point kth-distance"
        " scores — the brute arm is the labeled ground-truth ceiling"
        " (sample-scale; IVF swap documented)"
    ),
    "ams_f2_moment": (
        "lower-median rank over the 16-row estimator table"
        " (constant J, never data-scale)"
    ),
    "crawl_frontier_refresh": (
        "global crawl-order rank over the page universe (fixture:"
        " <=997 pages; a deployment frontier range-partitions the"
        " schedule by next-crawl time)"
    ),
}

# Entries whose registry function eagerly localCheckpoints its result
# (the cache-leak discipline): the registry df explains as a Scan
# ExistingRDD, so auditing it is VACUOUS — the red-flag checks would
# see an empty plan (r14 ADVICE item 1). Each such entry maps to its
# lazy ``*_plan`` seam here; the audit runs on THAT plan (the one the
# cluster actually executes before the checkpoint) and the PLANS.md
# row is labeled "checkpointed (lazy seam)" so the provenance is
# explicit. The same seams are pinned shape-by-shape in
# tests/test_explain_plans.py.


def _seam_kn_bigram(spark, sf_dir):
    from advisorydatapipeline_spark.operators.lm import (
        kneser_ney_bigram_plan,
    )
    from advisorydatapipeline_spark.queries.helpers import load

    return kneser_ney_bigram_plan(load(spark, sf_dir, "documents"))


def _seam_kn_trigram(spark, sf_dir):
    from advisorydatapipeline_spark.operators.lm import (
        kneser_ney_trigram_plan,
    )
    from advisorydatapipeline_spark.queries.helpers import load

    return kneser_ney_trigram_plan(load(spark, sf_dir, "documents"))


def _seam_kn_5gram(spark, sf_dir):
    from advisorydatapipeline_spark.operators.lm import (
        kneser_ney_5gram_plan,
    )
    from advisorydatapipeline_spark.queries.helpers import load

    return kneser_ney_5gram_plan(load(spark, sf_dir, "documents"))


def _seam_duplicate_spans(spark, sf_dir):
    from advisorydatapipeline_spark.operators.suffix import (
        duplicate_span_plan,
    )
    from advisorydatapipeline_spark.queries.helpers import load

    out, dup = duplicate_span_plan(load(spark, sf_dir, "documents"))
    return out, [dup]


CHECKPOINTED = {
    "kn_bigram_scores": _seam_kn_bigram,
    "kn_trigram_scores": _seam_kn_trigram,
    "kn_5gram_scores": _seam_kn_5gram,
    "duplicate_spans_exact": _seam_duplicate_spans,
}

JOIN_PAT = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def _toplevel_groups(line: str) -> list[str]:
    """Split an ``Arguments: [...], [...], ...`` line into its
    top-level bracket groups (bracket-depth scan — groups nest
    arbitrary parens/brackets inside)."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(line):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(line[start + 1 : i])
                start = None
    return groups


def global_window_count(plan: str) -> int:
    """Count Window NODES with no partition spec. The inline
    windowspecdefinition text is unreliable (Catalyst omits partition
    columns from it on decorrelated plans), and an unpartitioned
    node OMITS the partition group from its Arguments line entirely:
    partitioned -> ``[exprs], [partSpec], [orderSpec]`` (3 top-level
    groups), global -> ``[exprs], [orderSpec]`` (2 groups). A
    partitioned window with NO order spec also prints 2 groups
    (``[exprs], [partSpec]``); the two cases split on the last
    group's sort markers — an order spec always carries ASC/DESC, a
    partition spec never does."""
    n = 0
    for block in plan.split("\n\n"):
        head = block.strip().split("\n", 1)[0]
        # plain Window nodes only: WindowGroupLimit's Arguments have a
        # different shape and it never moves data to one partition
        if not re.match(r"\(\d+\) Window(\s|$)", head.strip()):
            continue
        for ln in block.splitlines():
            ln = ln.strip()
            if not ln.startswith("Arguments: "):
                continue
            groups = _toplevel_groups(ln)
            if len(groups) == 1:
                n += 1  # no partition, no order: OVER ()
            elif len(groups) == 2 and (
                " ASC" in groups[-1] or " DESC" in groups[-1]
            ):
                n += 1  # ordered but partition-less
    return n


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(spark, sf_dir: str):
    rows, details, failures = [], [], []
    for name in AUDIT:
        handles = []
        if name in CHECKPOINTED:
            df, handles = CHECKPOINTED[name](spark, sf_dir)
        else:
            df = QUERIES[name](spark, sf_dir)
        # materialize THROUGH the df's own query execution so AQE
        # finalizes it: the explain then shows the *executed* plan
        # (real join strategy picks, codegen spans). A noop write
        # would execute a separate QueryExecution and leave this
        # df's plan unfinalized.
        try:
            df.collect()
            plan = plan_of(df)
        finally:
            for h in handles:
                h.unpersist()
        joins = sorted(set(JOIN_PAT.findall(plan)))
        pushed = re.findall(r"PushedFilters: \[(?!\])", plan)
        s_cans = re.findall(r"\(\d+\) Scan parquet", plan)
        scans = len(s_cans)
        # column pruning: widths of the pruned read schemas
        widths = [
            str(ln.count(",") + 1) if "," in ln or ":" in ln else "0"
            for ln in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        ]
        pruned = ",".join(widths) or "—" 
        codegen = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
        flags = []
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if bad in joins and name not in NESTED_LOOP_OK:
                flags.append(bad)
                failures.append(f"{name}: {bad}")
        n_gw = global_window_count(plan)
        if n_gw and name not in GLOBAL_WINDOW_OK:
            flags.append("WindowExec-global")
            failures.append(
                f"{name}: {n_gw} global window(s) with no boundedness"
                " entry in GLOBAL_WINDOW_OK"
            )
        elif n_gw:
            details.append(
                f"### {name} — global window (allowlisted)\n\n"
                f"{n_gw} partition-less window(s); bounded because:"
                f" {GLOBAL_WINDOW_OK[name]}\n"
            )
        ok_label = (
            "ok (checkpointed; lazy seam)"
            if name in CHECKPOINTED
            else "ok"
        )
        rows.append(
            f"| `{name}` | {scans} | {len(pushed)} | {pruned} | "
            f"{', '.join(joins) or '—'} | {codegen} | "
            f"{', '.join(flags) or ok_label} |"
        )
        flagged = [
            ln.strip()
            for ln in plan.splitlines()
            if JOIN_PAT.search(ln) or "PushedFilters" in ln
        ]
        details.append(
            f"### {name}\n\n```\n" + "\n".join(flagged[:14]) + "\n```\n"
        )
    return rows, details, failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    rows, details, failures = audit(spark, sf_dir)
    doc = (
        "# PLANS — physical-plan audit\n\n"
        f"Generated by `tools/plan_audit.py` at `{sf_dir}`.\n\n"
        "| query | parquet scans | scans w/ pushed filters | read cols/scan | "
        "joins | codegen spans | red flags |\n|---|---|---|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n\nBroadcastNestedLoopJoin is expected (and allowlisted) only "
        "in the ANN exact/assignment plans (broadcast-small query/centroid "
        "set) and in the 1-row broadcast global-scalar cross joins of "
        "`tfidf_top_terms` / `supplier_value_share` — a single-row build "
        "side, not a data-scale nested loop.\n\n## Join/pushdown lines\n\n"
        + "\n".join(details)
    )
    with open("PLANS.md", "w") as f:
        f.write(doc)
    print(f"PLANS.md written; {len(failures)} red flag(s)")
    for f_ in failures:
        print("  RED:", f_)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
