"""Scan / projection / filter parity queries (SURVEY.md §2.1–2.2).

Covers: S1 schema'd parquet scan with pushed filters, P1
cast-projection, P4 conjunctive TTL-style timestamp cutoff, P5/P6
equality & null predicates. All filters and projections are
declarative so Catalyst pushes them into the parquet scan
(verified via .explain: PushedFilters / ReadSchema — see
tests/test_explain_plans.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.registry import query
from advisorydatapipeline_spark.queries.helpers import load, ns_literal

TTL_CUTOFF_ISO = "2024-01-15"
TTL_CUTOFF_NS = ns_literal(TTL_CUTOFF_ISO)


@query(
    "scan_filter_pushdown",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-01-01' AND l_quantity > 30
""",
)
def scan_filter_pushdown(spark, sf_dir):
    """S1/P6: projection + predicate reaching the parquet scan.
    Per-row double arithmetic only (IEEE-deterministic, oracle-safe)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_quantity") > 30)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


@query(
    "cast_projection",
    oracle="""
SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS total_floor,
       lower(o_orderpriority) AS priority_text
FROM orders
""",
)
def cast_projection(spark, sf_dir):
    """P1: schema conform by cast-projection (the reference's
    enforcement style, spark_utils.py:49-50). floor-before-cast keeps
    double->int conversion portable (Spark truncates, DuckDB rounds)."""
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.floor("o_totalprice").cast("bigint").alias("total_floor"),
        F.lower("o_orderpriority").alias("priority_text"),
    )


@query(
    "ttl_cutoff_filter",
    oracle=f"""
SELECT event_id, user_id, value
FROM events
WHERE ts >= TIMESTAMP '{TTL_CUTOFF_ISO}' AND event_type = 'click'
""",
)
def ttl_cutoff_filter(spark, sf_dir):
    """P4/P5: conjunctive filter with a timestamp cutoff — the
    reference's TTL predicate shape (enrichment/cache.py:68-75), with
    the cutoff injected as a literal (deterministic clock). The
    cutoff goes through ``load_events`` so it lands on the physical
    column and reaches ``PushedFilters`` (row-group pruning)."""
    from advisorydatapipeline_spark.queries.helpers import load_events

    ev = load_events(spark, sf_dir, ts_ge_ns=TTL_CUTOFF_NS)
    return ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "value"
    )


@query(
    "null_predicates",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_mktsegment IS NOT NULL AND c_name <> '' AND c_acctbal >= 0
""",
)
def null_predicates(spark, sf_dir):
    """P6: IS NOT NULL / != '' predicate shapes
    (packages_to_enrich.py:27-29)."""
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isNotNull()
        & (F.col("c_name") != "")
        & (F.col("c_acctbal") >= 0)
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "observed_scan_metrics",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(value) AS BIGINT) AS n_values,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events
""",
)
def observed_scan_metrics(spark, sf_dir):
    """A3 as a first-class result: `observe()` collects named metrics
    DURING the scan that materializes the data — the lazy replacement
    for the reference's eager `count()` logging (nvd pipeline),
    which costs a second full scan per metric. One pass computes all
    three metrics; the 1-row result frame is built from the
    observation, so the plan is scan-once by construction."""
    from pyspark.sql import Observation

    ev = load(spark, sf_dir, "events")
    obs = Observation("scan_metrics")
    cents = F.floor(F.col("value") * 100).cast("long")
    observed_df = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_values"),
        F.sum(cents).alias("sum_cents"),
    )
    observed_df.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_values"]),
                int(m["sum_cents"]),
            )
        ],
        "n_rows long, n_values long, sum_cents long",
    )
