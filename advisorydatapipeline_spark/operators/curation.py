"""Training-corpus curation operators (beyond-reference, north-star).

Chunking, deterministic sampling, and PII scrubbing — the
transformations between "raw corpus" and "training-ready shards".
All built-in column expressions (JVM-side, whole-stage-codegen'd,
portable-md5 keyed) so every operator is DuckDB-oracle-checkable and
shuffle-free: each is a narrow per-row transformation that pipelines
inside the scan stage, which is exactly what you want when the input
is 100 TB — no state, no skew sensitivity, linear scan cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from advisorydatapipeline_spark.functions.text import hash64

# conservative regex subset shared by Java regex (Spark) and RE2
# (DuckDB) so the oracle replays the exact scrub
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_chars: int = 256,
    stride: int = 200,
) -> DataFrame:
    """Split each document into fixed-width character chunks with
    ``chunk_chars - stride`` overlap (context-window packing prep).

    Explode of ``sequence(0, len-1, stride)`` — one generated row per
    chunk, no shuffle. Empty/null texts produce no chunks. Output:
    (id, chunk_idx, chunk_text, chunk_len)."""
    if stride <= 0 or chunk_chars <= 0:
        raise ValueError("chunk_chars and stride must be positive")
    c = F.col(text_col)
    nonempty = df.filter(F.length(c) > 0)
    starts = F.sequence(F.lit(0), F.length(c) - 1, F.lit(stride))
    out = nonempty.select(
        F.col(id_col),
        c.alias("_t"),
        F.explode(starts).alias("_start"),
    )
    return out.select(
        F.col(id_col),
        (F.col("_start") / stride).cast("int").alias("chunk_idx"),
        F.substring(F.col("_t"), F.col("_start") + 1, chunk_chars).alias(
            "chunk_text"
        ),
        F.length(
            F.substring(F.col("_t"), F.col("_start") + 1, chunk_chars)
        ).alias("chunk_len"),
    )


def hash_bucket(key: Column, salt: str, buckets: int = 100) -> Column:
    """Deterministic uniform bucket in [0, buckets) from the portable
    md5 hash of ``salt || key`` — the reproducible substitute for
    rand(): stable across runs, engines, partitionings, and restarts
    (rand() is none of those in a distributed retry/speculation
    world)."""
    return hash64(F.concat(F.lit(salt), key.cast("string"))) % buckets


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    rate_pct: Column,
    *,
    salt: str = "sample#1",
) -> DataFrame:
    """Keep a row iff its hash bucket falls under ``rate_pct`` (a
    per-row Column in [0, 100]) — deterministic stratified downsampling
    keyed on a stable id. Pure filter: pushes down, no shuffle."""
    return df.filter(hash_bucket(F.col(key_col), salt) < rate_pct)


def scrub_pii(col: Column | str) -> dict[str, Column]:
    """Redact emails and count the redactions. Returns the scrubbed
    text column and the match count (for curation audit metrics)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "scrubbed": F.regexp_replace(c, EMAIL_RE, "<EMAIL>"),
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)).cast("int"),
    }
