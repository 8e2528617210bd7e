#!/usr/bin/env python
"""sf0.1 oracle sweep over the top-50 never-driver-sampled entries
(by round-5 bench cost — complexity proxy): the local gate proves
sf0.01, this catches SCALE-DEPENDENT value bugs (the class the round-5
connected-components truncation bug belonged to). Writes
LOCAL_GATE_SF01.json.

Usage: python tools/sweep_sf01.py
"""

from __future__ import annotations

import subprocess
import sys

TOP50 = """dbscan_grid_clusters dedup_jaccard_prefix streaming_range_join
bm25_maxscore_topk markov_attribution_removal label_propagation_communities
basket_brand_triples syndicated_families bfs_reachable_hops k_core_suppliers
pq_recall_eval ivf_pq_topk dedup_pair_evidence streaming_transition_counts
dedup_containment bloom_join_prune column_profile_orders
cross_source_dup_matrix pq_adc_topk winnow_neardup_pairs
streaming_append_windows lsh_recall_eval streaming_sliding_distinct
knn_distance_outliers dpp_partitioned_join advisory_stream_scan
ship_latency_percentiles duplicate_passages char_unigram_surprisal
cdc_doc_coverage dedup_embedding_rhp streaming_dedup_watermarked
ewma_user_values bloom_corpus_probe ann_hubness_audit
streaming_upsert_merge cdc_chunk_stats sole_fault_supplier ivf_recall_eval
streaming_session_windows streaming_stateful_counts rake_keywords
curation_pipeline cdc_shared_chunks rhp_recall_eval bpe_encode_tokens
streaming_sliding_counts tfidf_top_terms geometric_median_embeddings
streaming_static_enrich""".split()


def main() -> int:
    return subprocess.call(
        [
            sys.executable,
            "tools/check_oracle.py",
            "/root/testdata/sf0.1",
            *TOP50,
            "--out",
            "LOCAL_GATE_SF01.json",
        ]
    )


if __name__ == "__main__":
    sys.exit(main())
