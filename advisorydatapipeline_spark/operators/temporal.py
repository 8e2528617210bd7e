"""Temporal join operators: as-of join and binned range join.

Beyond-reference (the reference has no temporal joins — SURVEY.md
§2.3 "absent" row). These are the two workhorses of event/market-data
analytics, implemented Spark-first:

- ``asof_join``: most-recent-match join. NOT a nested-loop or
  inequality join: both sides are tagged, unioned, and resolved with
  one ``last(..., ignorenulls)`` window pass — a single shuffle on
  (keys), cost O((|L|+|R|) log) per partition, no pair blowup. This
  is the standard scalable as-of plan (same shape Flink/kdb use).
- ``range_join_binned``: right rows within a time window before each
  left row. Naive inequality join plans as BroadcastNestedLoopJoin
  (quadratic); instead both sides are bucketed to ``width`` bins,
  the right side replicated to (bin, bin+1), equi-joined on
  (keys, bin), then exact-filtered. Shuffle volume is 2|R| + |L|,
  and the equi-join stays a hash join at any scale.

Determinism contract (oracle-checkable): ties on the right timestamp
are resolved by ``tiebreak`` (max wins) *before* the join, matching
what the DuckDB ``ASOF JOIN`` oracle sees after the same dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    *,
    tiebreak: str,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of left join: for every left row, attach the
    payload of the right row with the greatest ``right_ts`` <=
    ``left_ts`` within the same key group (NULLs when none exists).

    Output: all left columns + ``<payload><suffix>`` columns +
    ``<right_ts><suffix>`` (the matched timestamp).
    """
    keys = list(keys)
    payload_cols = list(payload_cols)

    mcols = [f"{c}{suffix}" for c in payload_cols] + [f"{right_ts}{suffix}"]
    l_tagged = left.select(
        "*",
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(m)
          for c, m in zip([*payload_cols, right_ts], mcols)],
    )
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        *keys,
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        *[F.col(c).alias(m) for c, m in zip(payload_cols, mcols)],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    ).withColumn("_ts_order", F.col(f"{right_ts}{suffix}"))
    l_tagged = l_tagged.withColumn("_ts_order", F.col(left_ts))

    cols = [*left.columns, "_side", "_tb", "_ts_order", *mcols]
    unioned = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    # sort (ts, side, tiebreak): right rows (_side=0) sort before left
    # rows at equal ts => ts_r <= ts_l inclusive, exactly DuckDB ASOF's
    # `ON l.ts >= r.ts`; among right rows tied on ts, ascending
    # tiebreak makes last() pick the max-tiebreak row — tie resolution
    # costs zero extra shuffles (it rides the one window sort)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts_order", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        "_side",
        *[F.last(m, ignorenulls=True).over(w).alias(m) for m in mcols],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    width: int,
) -> DataFrame:
    """All (left, right) pairs per key with ``right_ts`` in
    ``[left_ts - width, left_ts]`` (units = the ts columns' own units;
    the testdata uses epoch-ns longs).

    Returns left columns + right columns (caller aliases beforehand to
    avoid collisions) — the exact pair set of the naive inequality
    join, at hash-join cost.
    """
    keys = list(keys)
    # integer DIV, not `/`: epoch-ns values (~1.7e18) are far beyond
    # double's 2^53 integer range, so float division would misbin
    lb = left.withColumn("_bin", F.expr(f"{left_ts} DIV {width}"))
    rbin = F.expr(f"{right_ts} DIV {width}")
    rb = right.withColumn(
        "_bin", F.explode(F.array(rbin, rbin + F.lit(1)))
    )
    joined = lb.join(rb, [*keys, "_bin"]).drop("_bin")
    delta = F.col(left_ts) - F.col(right_ts)
    return joined.filter((delta >= 0) & (delta <= width))


def interval_cover_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    pt_col: str,
    start_col: str,
    end_col: str,
    width: int,
) -> DataFrame:
    """All (point, interval) pairs per key with
    ``start <= pt < end`` for VARIABLE-width intervals — the
    generalization of ``range_join_binned`` (fixed lookback) to
    arbitrary spans: point-in-time SCD lookups, session membership,
    IP-range geo tables.

    Each interval is replicated across every ``width``-sized bin it
    covers (``sequence(start DIV w, (end-1) DIV w)``); points land in
    exactly one bin, so the equi-join on (keys, bin) meets each
    qualifying interval exactly once — no post-join dedup — and the
    plan stays a hash join at any scale. Pick ``width`` near the
    typical interval length: replication factor is
    ~avg_len/width + 1. Caller aliases columns to avoid collisions.
    """
    keys = list(keys)
    # integer DIV: epoch-ns/us longs overflow double's exact range
    ivb = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} DIV {width}"),
                F.expr(f"({end_col} - 1) DIV {width}"),
            )
        ),
    )
    ptb = points.withColumn("_bin", F.expr(f"{pt_col} DIV {width}"))
    return (
        ptb.join(ivb, [*keys, "_bin"])
        .filter(
            (F.col(pt_col) >= F.col(start_col))
            & (F.col(pt_col) < F.col(end_col))
        )
        .drop("_bin")
    )


def merge_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
    order_cols: Sequence[str],
) -> DataFrame:
    """Merge overlapping/touching ``[start, end]`` intervals per key
    (gaps-and-islands). Returns one row per merged island:
    ``keys..., island_id, isl_start, isl_end, n_intervals``.

    Plan shape: ONE shuffle on ``keys``, then two window passes over
    the same (keys, start, end, tiebreak) sort — Catalyst reuses the
    sort, so the per-partition cost is a single O(n log n) sort plus
    two linear scans. No join, no pair blowup: the classic quadratic
    formulation (interval x interval overlap test) never appears.
    At 100 TB the only concern is per-key row count (a key's
    intervals must window within one task); keys here are natural
    shard keys (supplier, user) with bounded fan-in.

    A new island starts where ``start`` exceeds the running max of
    every *previous* ``end`` (strict >: touching intervals merge).
    ``order_cols`` must make the sort total so island numbering is
    deterministic under any partitioning.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(
        start_col, end_col, *order_cols
    )
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new_island",
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "island_id",
        F.sum("_new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return numbered.groupBy(*keys, "island_id").agg(
        F.min(start_col).alias("isl_start"),
        F.max(end_col).alias("isl_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    *,
    tiebreak: str,
    suffix: str = "_r",
) -> DataFrame:
    """Forward as-of left join: for every left row, the right row
    with the SMALLEST ``right_ts`` >= ``left_ts`` per key (pandas
    ``merge_asof(direction='forward')``).

    Implemented by time negation over :func:`asof_join`: the
    earliest future event under ``ts`` is the latest past event
    under ``-ts``, so the forward join inherits the backward plan
    verbatim — one shuffle, union + last-ignorenulls window, no
    inequality join — instead of duplicating the window machinery.
    Tie semantics follow the backward operator: at equal ``right_ts``
    the max-``tiebreak`` row wins. ns-long timestamps negate exactly
    (no float passage)."""
    l2 = left.withColumn(left_ts, -F.col(left_ts))
    r2 = right.withColumn(right_ts, -F.col(right_ts))
    out = asof_join(
        l2, r2, keys, left_ts, right_ts, payload_cols,
        tiebreak=tiebreak, suffix=suffix,
    )
    m = f"{right_ts}{suffix}"
    return out.withColumn(left_ts, -F.col(left_ts)).withColumn(
        m, -F.col(m)
    )
