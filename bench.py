#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is fully materialized via the `noop` sink (forces the
whole plan, no driver collect, no result-size bias).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from advisorydatapipeline_spark.registry import QUERIES  # noqa: E402
from advisorydatapipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "flagship_advisory_resolution",
    "pricing_summary",
    "revenue_topn",
    "local_supplier_revenue",
    "sessionization",
    "window_top1_per_key",
    "grouped_max_by",
    "upsert_anti_union",
    "state_machine_native",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_incremental",
    "dedup_simhash64",
    "dedup_clusters",
    "decontaminate_overlap",
    "repetition_stats",
    "jdbc_live_scan",
    "advisory_datasource_scan",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "text_quality",
    "text_lang_id",
    "media_metadata",
    "asof_join_last_view",
    "range_join_views_before_purchase",
    "dedup_embedding_cosine",
    "time_rollup",
    "skew_salted_agg",
    "streaming_hourly_counts",
    "streaming_dedup_pairs",
    "window_running_metrics",
    "doc_chunks",
    "sample_stratified",
    "pii_scrub",
    "corpus_ngram_stats",
    "sequence_packing",
    "embedding_centroids",
    "json_extract_props",
    "window_analytics",
    "pivot_event_matrix",
    "tfidf_top_terms",
    "curation_pipeline",
    "small_qty_brand_revenue",
    "priority_semi_join",
    "pagerank_suppliers",
    "ewma_user_values",
    "retention_cohorts",
    "federated_union_scan",
    "sole_fault_supplier",
    "customer_order_distribution",
    "contrastive_triplets",
    "group_normalized_features",
    "pmi_collocations",
    "kmeans_lloyd_step",
    "neardup_triangles",
    "dpp_partitioned_join",
    "hll_shard_union",
    "theta_set_overlap",
    "modern_sql_aggregates",
    "incremental_rollup_merge",
    "regional_market_share",
    "winnow_neardup_pairs",
    "bitmap_exact_distinct",
    "session_membership_join",
    "freq_sketch_merge",
    "merge_into_customers",
    "dedup_embedding_rhp",
    "bm25_doc_ranking",
    "vocab_oov_rate",
    "dedup_containment",
    "bloom_corpus_probe",
    "entity_resolution_parts",
    "histogram_quantile_estimate",
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
    "streaming_sliding_distinct",
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # warm the session outside the timed region: JVM/codegen init,
    # shuffle service, and Python-worker (Arrow) startup
    warm_dir = "/root/testdata/sf0.001"
    # flagship/media warm the JVM + Arrow paths; the advisory read
    # warms Python DataSource worker spinup (one-time per process)
    for warm_name in (
        "flagship_advisory_resolution",
        "media_metadata",
        "advisory_datasource_scan",
    ):
        QUERIES[warm_name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()

    import gc

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # per-query isolation: unpersist caches AND release dropped
        # localCheckpoint/persisted RDDs (driver gc -> ContextCleaner)
        # + JVM old-gen, so one query's garbage isn't billed to the
        # next query's timing
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    print(
        json.dumps(
            {
                "metric": "headline query wall time, local[*] at sf=" + sf,
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
