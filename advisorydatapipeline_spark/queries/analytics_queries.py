"""Wider analytics surface: JSON extraction, pivot, analytic window
family (lag/running frames).

All beyond-reference (SURVEY.md lists no JSON scalar functions §2.8,
no pivot §2.4, and no analytic windows §2.5) — table stakes for an
analytics engine, each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "json_extract_props",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
FROM events
WHERE props IS NOT NULL
""",
)
def json_extract_props(spark, sf_dir):
    """Engine-side JSON field extraction (the reference flattens JSON
    in driver Python, fetch.py:16-43; at scale extraction must run in
    the scan stage). get_json_object pushes nothing to Python."""
    ev = load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id", k.alias("k"), (k % 10).alias("k_bucket")
    )


@query(
    "pivot_event_matrix",
    oracle="""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events
GROUP BY user_id
""",
)
def pivot_event_matrix(spark, sf_dir):
    """user x event_type count matrix via pivot with an EXPLICIT value
    list — the implicit form runs an extra distinct job to discover
    columns and is non-deterministic about column order at scale."""
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL where a (user, type) pair never occurred
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    )


@query(
    "window_analytics",
    oracle="""
SELECT event_id, user_id,
       epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_last5,
       max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS running_max
FROM events
WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_analytics(spark, sf_dir):
    """Analytic window family the reference lacks (§2.5: row_number
    only): lag deltas, bounded frames (ROWS BETWEEN), running max.
    One shuffle on user_id serves all three functions (same window
    spec)."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("ts DIV 1000")
    lag_us = F.lag(F.expr("ts DIV 1000")).over(w)
    return ev.select(
        "event_id",
        "user_id",
        (us - lag_us).alias("gap_us"),
        F.count(F.lit(1))
        .over(w.rowsBetween(-4, Window.currentRow))
        .alias("n_last5"),
        F.max("value")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running_max"),
    )


@query(
    "grouped_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       quantile_cont(l_extendedprice, 0.99) AS p99_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def grouped_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group — Spark `percentile`
    and DuckDB `quantile_cont` share the linear-interpolation
    definition, so the doubles hash-match. (At 100 TB swap in
    approx_percentile and drop the oracle to a tolerance check: exact
    percentile keeps the full group sorted.)"""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("p99_price"),
    )
