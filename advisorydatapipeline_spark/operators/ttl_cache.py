"""TTL-based incremental-work cache.

Re-expresses the reference's enrichment cache
(enrichment/cache.py:15-165): skip keys enriched within the TTL
window, evict + merge after each batch. The reference's wall-clock
``datetime.now()`` (cache.py:69) is replaced by explicit cutoff/now
parameters — deterministic under test, injectable from
``PipelineConfig.clock`` in production.

This is batch-incremental computation (SURVEY.md §2.9): the engine's
analogue of event-time state expiry. At scale the cache is a compact
keys-only table: the anti-join broadcasts it when small, and the
merge is one partial-aggregated shuffle on the key.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recent_entries(
    cache_df: DataFrame,
    source_name: str,
    cutoff: datetime,
    *,
    source_col: str = "source_name",
    ts_col: str = "last_accessed",
) -> DataFrame:
    """Cache rows for ``source_name`` still inside the TTL window
    (reference: cache.py:68-75)."""
    return cache_df.filter(
        (F.col(source_col) == source_name) & (F.col(ts_col) >= F.lit(cutoff))
    )


def pending_work(
    work_df: DataFrame,
    cache_df: DataFrame,
    keys: Sequence[str],
    source_name: str,
    cutoff: datetime,
) -> DataFrame:
    """Work items whose key is NOT freshly cached — distinct cached
    keys, then a left-anti join (reference: cache.py:85-95)."""
    cached_keys = (
        recent_entries(cache_df, source_name, cutoff).select(*keys).distinct()
    )
    return work_df.join(cached_keys, on=list(keys), how="left_anti")


def update_cache(
    cache_df: DataFrame,
    done_keys: DataFrame,
    keys: Sequence[str],
    source_name: str,
    now: datetime,
    *,
    source_col: str = "source_name",
    ts_col: str = "last_accessed",
) -> DataFrame:
    """Merge freshly-processed keys into the cache: evict this
    source's superseded entries (anti-join), union the new ones with
    ``last_accessed = now`` (reference: cache.py:109-165 — evict,
    unionByName, overwrite)."""
    new_entries = (
        done_keys.select(*keys)
        .distinct()
        .withColumn(source_col, F.lit(source_name))
        .withColumn(ts_col, F.lit(now))
    )
    survivors = cache_df.join(
        new_entries.select(*keys).withColumn(source_col, F.lit(source_name)),
        on=[*keys, source_col],
        how="left_anti",
    )
    return new_entries.unionByName(survivors.select(*new_entries.columns))
