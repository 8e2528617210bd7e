"""Z-order operator: Morton correctness + the pruning-bound property."""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.layout import (
    spread16,
    zorder_layout,
    zvalue,
)


def _morton(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference_morton(spark):
    pts = [(0, 0), (1, 0), (0, 1), (255, 255), (65535, 0), (12345, 54321)]
    df = spark.createDataFrame(pts, "a long, b long").select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton(r.a, r.b), (r.a, r.b)


def test_spread16_is_even_bits_only(spark):
    df = spark.range(1024).select(spread16(F.col("id")).alias("s"))
    odd_mask = 0xAAAAAAAA
    assert df.filter(F.col("s").bitwiseAND(F.lit(odd_mask)) != 0).count() == 0


def test_chunk_bounds_both_dimensions(spark):
    """Fixing the high z-bits confines BOTH dims to a 16-wide aligned
    range — the min/max-stat tightness a z-layout buys per file."""
    pts = [(a, b) for a in range(0, 256, 3) for b in range(0, 256, 5)]
    df = spark.createDataFrame(pts, "a long, b long").select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")
    )
    stats = (
        df.groupBy(F.expr("z DIV 256").alias("chunk"))
        .agg(
            (F.max("a") - F.min("a")).alias("wa"),
            (F.max("b") - F.min("b")).alias("wb"),
        )
        .collect()
    )
    assert stats and all(r.wa <= 15 and r.wb <= 15 for r in stats)


def test_zorder_layout_sorted_within_partitions(spark):
    df = spark.createDataFrame(
        [(i % 97, (i * 13) % 89) for i in range(2000)], "a long, b long"
    )
    out = zorder_layout(df, F.col("a"), F.col("b"), partitions=4)
    assert "_z" in out.columns

    def check(it):
        prev = None
        for row in it:
            assert prev is None or row._z >= prev
            prev = row._z
        return iter(())

    out.rdd.mapPartitions(lambda it: check(it)).count()
    # nothing lost in the rewrite
    assert out.count() == 2000
