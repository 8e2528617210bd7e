"""CSV / JSON source-format parity (SURVEY.md §2.1 S3/S4).

The reference's `read_table` supports parquet, JSON, and CSV arms
(pipeline_libs/spark/spark_utils.py:142-157). The testdata ships as
parquet, so these queries prove the format arms by round-tripping a
table through the format under test — write CSV/JSON to scratch, read
it back with the declared schema — and hash-matching a plain SELECT
oracle over the original parquet. Any quoting/escaping/type-inference
defect in either direction breaks the hash.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import types as T

from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query
from advisorydatapipeline_spark.sources.io import read_table

_scratch: dict[str, str] = {}


def _dir(tag: str) -> str:
    if tag not in _scratch:
        _scratch[tag] = tempfile.mkdtemp(prefix=f"adp_fmt_{tag}_")
    return _scratch[tag]


NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

SUPPLIER_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)


@query(
    "csv_scan_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def csv_scan_roundtrip(spark, sf_dir):
    """S4: schema'd CSV scan (header on, explicit schema — no
    inference job at scale) proven by parquet -> CSV -> read-back."""
    path = _dir("csv")
    load(spark, sf_dir, "nation").write.mode("overwrite").option(
        "header", True
    ).csv(path)
    return read_table(spark, path, NATION_SCHEMA, fmt="csv", header=True)


@query(
    "json_scan_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def json_scan_roundtrip(spark, sf_dir):
    """S3: schema'd JSON-lines scan proven by parquet -> JSON ->
    read-back. Doubles survive because Spark prints round-trippable
    repr (shortest-repr) and parses exactly."""
    path = _dir("json")
    load(spark, sf_dir, "supplier").write.mode("overwrite").json(path)
    return read_table(spark, path, SUPPLIER_SCHEMA, fmt="json")


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # epoch-ns (session.py)
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        # from the partition directory name, like the reference's
        # enrichment_source=<name> (state_machine/pipeline.py:20-33)
        T.StructField("event_type", T.StringType(), True),
    ]
)


@query(
    "multipath_partitioned_scan",
    oracle="""
SELECT event_id, user_id, value, event_type
FROM events
WHERE event_type IN ('click', 'purchase')
""",
)
def multipath_partitioned_scan(spark, sf_dir):
    """S2: multi-path scan under one basePath with Hive-style
    partition dirs — the reference's staged layout
    (staging/.../enrichment/normalized/enrichment_source=<src>) where
    a column's value lives only in the directory name. Selecting two
    of five partition paths IS the partition pruning."""
    from advisorydatapipeline_spark.queries.helpers import load as _load

    # scratch keyed per sf_dir: a session may run several scale
    # factors (bench warms at sf0.001 then times sf0.1)
    tag = "multipath_" + sf_dir.strip("/").replace("/", "_")
    base = _dir(tag)
    marker = Path(base) / "_staged"
    if not marker.exists():
        _load(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(f"{base}/events")
        marker.write_text("ok")
    return read_table(
        spark,
        None,
        EVENTS_SCHEMA,
        paths=[
            f"{base}/events/event_type=click",
            f"{base}/events/event_type=purchase",
        ],
        base_path=f"{base}/events",
    ).select("event_id", "user_id", "value", "event_type")


NOT_APPLICABLE_SCHEMA = T.StructType(
    [
        T.StructField("cve_id", T.StringType(), True),
        T.StructField("package", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("fixed_version", T.StringType(), True),
        T.StructField("internal_status", T.StringType(), True),
    ]
)


@query(
    "jdbc_absent_empty_relation",
    oracle="""
SELECT CAST(NULL AS VARCHAR) AS cve_id, CAST(NULL AS VARCHAR) AS package,
       CAST(NULL AS VARCHAR) AS status, CAST(NULL AS VARCHAR) AS fixed_version,
       CAST(NULL AS VARCHAR) AS internal_status
WHERE false
""",
)
def jdbc_absent_empty_relation(spark, sf_dir):
    """S5/S6 executed under the gate: the JDBC arm's
    absent-source = empty-relation-with-declared-schema contract —
    load-bearing in the reference (it is how first runs bootstrap,
    spark_utils.py:266-271); the live-connection path needs a real
    database (tested shape in sources/jdbc.py, partitioned-scan
    options documented there)."""
    from advisorydatapipeline_spark.sources.jdbc import read_jdbc_table

    return read_jdbc_table(
        spark,
        "jdbc:postgresql://nohost:5432/nodb",
        "not_applicable_cves",
        NOT_APPLICABLE_SCHEMA,
    )
