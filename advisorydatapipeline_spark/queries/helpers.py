"""Shared helpers for the operator-parity query registry.

Oracle-safety conventions (the driver hashes canonicalized values, so
Spark and DuckDB must agree *exactly*):

- Double **aggregations** go through DECIMAL casts (exact, order-
  independent) and come back as DOUBLE. Summing raw doubles is
  association-order-dependent and can differ in the last ulp between
  engines/plans. Per-row double arithmetic (no reduction) is IEEE-
  deterministic and safe.
- Inputs here have 2-decimal monetary columns, so DECIMAL(18,2)
  round-trips them exactly in both engines.
- ``events.ts`` is epoch-ns LongType on the Spark side (see
  session.py); DuckDB reads TIMESTAMP_NS — oracles use
  ``epoch_ns(ts)`` for outputs and ns-literals for cutoffs so both
  engines compare the same integers.
- Every ORDER BY / window ends in a unique tiebreaker column.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


def ensure_read_confs(spark: SparkSession) -> None:
    """Make reads correct under ANY caller-provided SparkSession.

    The external driver builds its own bare session, so confs set in
    :mod:`advisorydatapipeline_spark.session` do not apply there.
    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark rejects unless ``nanosAsLong`` is on (it then reads epoch-ns
    LongType — the representation every query here assumes). The conf
    is runtime-settable and idempotent, so setting it per-read is free.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_read_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ns_literal(iso: str) -> int:
    """Epoch-nanos for an ISO date/time string (UTC)."""
    dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000


def dec_sum(expr: str, alias: str, scale: int = 2) -> str:
    """Portable exact sum of a monetary double: cast each value to
    DECIMAL, sum exactly, return DOUBLE. Identical text runs on Spark
    and DuckDB."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"
    )
