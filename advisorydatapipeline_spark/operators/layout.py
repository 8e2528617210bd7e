"""Z-order (Morton-curve) clustering — data layout for multi-dim
pruning (beyond-reference, lakehouse table-maintenance surface).

Parquet pruning is driven by per-file min/max stats, which only help
on columns the data is sorted by. Sorting by (a) destroys locality on
(b); interleaving the bits of both (the Z-curve) bounds BOTH columns
inside every contiguous z-range, so range-partitioning + sorting by
z-value gives files whose min/max are tight on every participating
dimension — the layout trick behind Delta OPTIMIZE ZORDER BY and
Iceberg's sort-order rewrite, expressed here with nothing but
codegen'd integer bit math (shiftleft/AND/OR; no UDF, no shuffle
beyond the one range-partition exchange a rewrite needs anyway).

The bit-spread uses the classic magic-constant doubling steps, which
DuckDB replays verbatim in the oracle — the z-values are value-gated,
not just plausible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shift, mask) doubling steps spreading a 16-bit value so its bits
#: occupy even positions of a 32-bit lane
SPREAD16_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in SPREAD16_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zvalue(col_a: Column, col_b: Column) -> Column:
    """Morton z-value interleaving two 16-bit dimensions (a gets the
    even bits, b the odd bits). Callers bucket wider domains down to
    16 bits first (``pmod(col, 65536)`` or a DIV-based coarsening)."""
    return spread16(col_a).bitwiseOR(F.shiftleft(spread16(col_b), 1))


def zorder_layout(
    df: DataFrame,
    col_a: Column,
    col_b: Column,
    *,
    partitions: int | None = None,
) -> DataFrame:
    """Rewrite ``df`` into z-clustered order: range-partition on the
    z-value, sort within partitions — the pre-write shape for a
    compaction/OPTIMIZE pass. Each output file then covers a tight
    min/max box in BOTH dimensions, so scans filtered on either
    column prune files. Drop ``_z`` downstream if the physical column
    is unwanted (keeping it costs 8 bytes/row and documents the
    clustering)."""
    zed = df.withColumn("_z", zvalue(col_a, col_b))
    parted = (
        zed.repartitionByRange(partitions, "_z")
        if partitions
        else zed.repartitionByRange("_z")
    )
    return parted.sortWithinPartitions("_z")
