"""JDBC source (reference S5/S6), gated behind driver availability.

Re-expresses ``spark_utils.py:94-126`` (option-style) and ``:218-277``
(properties-style): schema-cast projection on read, empty DataFrame
with the declared schema when the table/connection is unavailable —
the same "absent = empty relation" contract as file reads.

The PostgreSQL JDBC jar is not in this image; calls degrade to the
empty-relation contract (``strict=False``) or raise (``strict=True``).
At scale: pass ``partition_options`` (partitionColumn/lowerBound/
upperBound/numPartitions) so the scan parallelizes instead of running
on one executor — the reference reads serially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from advisorydatapipeline_spark.sources.io import conform, empty_df


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    schema: T.StructType,
    *,
    user: str | None = None,
    password: str | None = None,
    driver: str = "org.postgresql.Driver",
    partition_options: dict[str, str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Schema-enforced JDBC scan with the empty-on-unavailable
    contract."""
    if schema is None:
        raise ValueError("schema is mandatory for read_jdbc_table")
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    for k, v in (partition_options or {}).items():
        reader = reader.option(k, v)
    try:
        return conform(reader.load(), schema)
    except Exception:
        if strict:
            raise
        return empty_df(spark, schema)
