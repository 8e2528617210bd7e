"""Graph-analytics queries beyond connected components.

``pagerank_suppliers``: fixed-point integer PageRank over the
customer<->supplier interaction graph (edge = customer ordered from
supplier). The DuckDB oracle replays the iteration loop as unrolled
CTEs — every intermediate rank is BIGINT, so three engine-independent
iterations land on identical values (float PageRank cannot be
value-checked across engines; see operators/graph.pagerank_quantized).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    pagerank_quantized,
)
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

# customer and supplier key spaces overlap numerically; namespace
# supplier nodes into a disjoint id range
SUPP_OFFSET = 10_000_000
PR_ITERS = 3
_BASE = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN


def _iter_cte(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT u.b AS a,
         CAST({_BASE} + sum(({PR_DAMP_NUM} * r.rank)
                            // ({PR_DAMP_DEN} * d.deg)) AS BIGINT) AS rank
  FROM und u JOIN {prev} r ON u.a = r.a JOIN deg d ON u.a = d.a
  GROUP BY u.b
)"""


@query(
    "pagerank_suppliers",
    oracle=f"""
WITH e0 AS (
  SELECT DISTINCT o.o_custkey AS src,
                  l.l_suppkey + {SUPP_OFFSET} AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
und AS (
  SELECT src AS a, dst AS b FROM e0
  UNION
  SELECT dst AS a, src AS b FROM e0
),
deg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
r0 AS (SELECT a, CAST({PR_SCALE} AS BIGINT) AS rank FROM deg),
{_iter_cte('r0', 'r1')},
{_iter_cte('r1', 'r2')},
{_iter_cte('r2', 'r3')}
SELECT a AS node, rank FROM r3
""",
)
def pagerank_suppliers(spark, sf_dir):
    """Integer PageRank (3 fixed iterations, damping 85/100) over the
    customer-supplier order graph. Iterative DataFrame loop with
    per-round localCheckpoint; ranks/degrees are the only shuffled
    payloads. Undirected + namespaced nodes => no dangling mass."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    return pagerank_quantized(edges, "src", "dst", iters=PR_ITERS)
