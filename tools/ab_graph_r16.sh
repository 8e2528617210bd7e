#!/bin/bash
# Interleaved same-box A/B for the r16 graph depth-gate commit.
# base = b2d377a (r15 unconditional compaction), new = HEAD.
# Order B,N,B,N so drift hits both arms symmetrically.
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
ONLY="dedup_clusters,canonical_corpus,syndicated_families,dbscan_grid_clusters,k_core_suppliers,pagerank_suppliers,bfs_reachable_hops,neardup_triangles,label_propagation_communities"
BASE=b2d377a

run() { # $1 = out file
  python bench.py --reps 3 --only "$ONLY" --out "plans/r16/$1" >/dev/null 2>"plans/r16/$1.log"
}

for i in 1 2; do
  git checkout $BASE -- advisorydatapipeline_spark/operators/graph.py advisorydatapipeline_spark/queries/graph_queries.py
  run "AB2_graph_base$i.json"
  git checkout HEAD -- advisorydatapipeline_spark/operators/graph.py advisorydatapipeline_spark/queries/graph_queries.py
  run "AB2_graph_new$i.json"
done
echo DONE
