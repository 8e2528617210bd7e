"""Z-order layout query: value-gated Morton math + the pruning-bound
property it buys.

``zorder_chunk_stats`` z-orders orders on (customer bucket, order-day
bucket) and reports per-chunk row counts and min/max of both
dimensions. Because a chunk fixes the high bits of the z-value — i.e.
the high bits of BOTH dimensions — every chunk's (min, max) box is at
most 16 wide per dimension: exactly the tight file-statistics a
z-clustered rewrite gives a 100 TB table (chunk == file; the min/max
box == the parquet footer stats a scan prunes on). The DuckDB oracle
replays the identical magic-constant bit spread, so the z-values
themselves are hash-gated.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.layout import zvalue
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

#: chunk width: dropping 8 low z-bits leaves a 16x16 tile per chunk
Z_CHUNK = 256
_EPOCH = "1992-01-01"


def _duck_spread(x: str) -> str:
    expr = f"(({x}) & 65535)"
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        expr = f"((({expr}) | (({expr}) << {shift})) & {mask})"
    return expr


_DUCK_Z = (
    f"({_duck_spread('d1')} | ({_duck_spread('d2')} << 1))"
)


@query(
    "zorder_chunk_stats",
    oracle=f"""
WITH dims AS (
  SELECT CAST(o_custkey % 256 AS BIGINT) AS d1,
         CAST((CAST(o_orderdate AS DATE) - DATE '{_EPOCH}') % 256 AS BIGINT)
           AS d2
  FROM orders
),
zed AS (
  SELECT d1, d2, CAST({_DUCK_Z} AS BIGINT) AS z FROM dims
)
SELECT CAST(z // {Z_CHUNK} AS BIGINT) AS chunk,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(d1) AS BIGINT) AS min_d1, CAST(max(d1) AS BIGINT) AS max_d1,
       CAST(min(d2) AS BIGINT) AS min_d2, CAST(max(d2) AS BIGINT) AS max_d2
FROM zed GROUP BY 1
""",
)
def zorder_chunk_stats(spark, sf_dir):
    """Per-z-chunk stats proving the two-dimensional pruning bound."""
    od = load(spark, sf_dir, "orders")
    dims = od.select(
        (F.col("o_custkey") % 256).cast("long").alias("d1"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit(_EPOCH).cast("date")
            )
            % 256
        )
        .cast("long")
        .alias("d2"),
    )
    zed = dims.withColumn("z", zvalue(F.col("d1"), F.col("d2")))
    return (
        zed.groupBy(
            F.expr(f"z DIV {Z_CHUNK}").cast("long").alias("chunk")
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("d1").cast("long").alias("min_d1"),
            F.max("d1").cast("long").alias("max_d1"),
            F.min("d2").cast("long").alias("min_d2"),
            F.max("d2").cast("long").alias("max_d2"),
        )
    )
