"""Bucketed tables: co-located, shuffle-free joins and aggregations.

The 100 TB answer to "this fact-to-fact join shuffles both sides
every run": persist both tables bucketed (and sorted) by the join
key. Spark's bucketing contract then satisfies the join's
distribution requirement directly from the files — the plan has NO
Exchange on either side (asserted in tests/test_bucketing.py), and
with matching sortBy no Sort either. Every subsequent run of every
query joining on that key skips both shuffles.

The reference hand-builds Hive-style partition *directories* but
never buckets (SURVEY.md §1.4); partitioning prunes, bucketing
co-locates — a scale engine wants both.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    *,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sort-within-bucket) parquet
    table in the session catalog. Both sides of a future join must use
    the same ``num_buckets`` and bucket columns to co-locate."""
    spark = df.sparkSession
    if mode == "overwrite":
        # the in-memory catalog forgets tables across sessions but the
        # managed location survives on disk; clear both or saveAsTable
        # fails with LOCATION_ALREADY_EXISTS
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse:
            import shutil

            shutil.rmtree(
                f"{warehouse.removeprefix('file:')}/{table_name}",
                ignore_errors=True,
            )
    writer = (
        df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys —
    plans with zero Exchange when the bucketing matches."""
    return spark.table(left_table).join(
        spark.table(right_table), list(keys), how
    )
