"""Set-operation / upsert parity queries (SURVEY.md §2.7).

Covers: U1 UNION ALL, U2 unionByName, J4 anti-join+union upsert as
the reusable ``upsert`` operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.upsert import upsert
from advisorydatapipeline_spark.operators.window_ops import top_k_per_key
from advisorydatapipeline_spark.queries.helpers import load, ns_literal
from advisorydatapipeline_spark.registry import query

SNAPSHOT_CUTOFF_ISO = "2024-01-15"
SNAPSHOT_CUTOFF_NS = ns_literal(SNAPSHOT_CUTOFF_ISO)

_SNAPSHOT_SQL = """
  SELECT user_id, event_id, event_type
  FROM (
    SELECT user_id, event_id, event_type,
           ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events {where}
  ) WHERE rn = 1
"""


@query(
    "upsert_anti_union",
    oracle=f"""
WITH new_snap AS ({_SNAPSHOT_SQL.format(where=f"WHERE ts >= TIMESTAMP '{SNAPSHOT_CUTOFF_ISO}'")}),
     old_snap AS ({_SNAPSHOT_SQL.format(where=f"WHERE ts < TIMESTAMP '{SNAPSHOT_CUTOFF_ISO}'")})
SELECT user_id, event_id, event_type FROM new_snap
UNION ALL
SELECT o.user_id, o.event_id, o.event_type
FROM old_snap o
WHERE NOT EXISTS (SELECT 1 FROM new_snap n WHERE n.user_id = o.user_id)
""",
)
def upsert_anti_union(spark, sf_dir):
    """U1 + J4: the reference's upsert (upsert_data.py:56-68) — new
    state per key wins, old rows survive only where no new key exists.
    Old/new snapshots are latest-event-per-user before/after a cutoff."""
    ev = load(spark, sf_dir, "events")

    def snap(df):
        return top_k_per_key(
            df, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()], k=1
        ).select("user_id", "event_id", "event_type")

    new_snap = snap(ev.filter(F.col("ts") >= F.lit(SNAPSHOT_CUTOFF_NS)))
    old_snap = snap(ev.filter(F.col("ts") < F.lit(SNAPSHOT_CUTOFF_NS)))
    return upsert(new_snap, old_snap, ["user_id"])


@query(
    "union_by_name",
    oracle="""
SELECT event_id, user_id, 'recent' AS bucket FROM events
WHERE ts >= TIMESTAMP '2024-01-15'
UNION ALL
SELECT event_id, user_id, 'old' AS bucket FROM events
WHERE ts < TIMESTAMP '2024-01-15'
""",
)
def union_by_name(spark, sf_dir):
    """U2: unionByName schema alignment (enrichment/cache.py:146) —
    the two inputs deliberately have different column orders."""
    ev = load(spark, sf_dir, "events")
    recent = ev.filter(F.col("ts") >= F.lit(SNAPSHOT_CUTOFF_NS)).select(
        "event_id", "user_id", F.lit("recent").alias("bucket")
    )
    old = ev.filter(F.col("ts") < F.lit(SNAPSHOT_CUTOFF_NS)).select(
        F.lit("old").alias("bucket"), F.col("user_id"), F.col("event_id")
    )
    return recent.unionByName(old)


@query(
    "intersect_except_keys",
    oracle="""
WITH buyers AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
),
clickers AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
),
errorers AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
)
SELECT user_id, 'click_and_buy' AS cohort
FROM (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers)
UNION ALL
SELECT user_id, 'buy_no_error' AS cohort
FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errorers)
""",
)
def intersect_except_keys(spark, sf_dir):
    """INTERSECT / EXCEPT (absent from the reference, SURVEY.md §2.7)
    as cohort algebra over event actors. Both plan as aggregated
    semi/anti joins — one shuffle each on the key."""
    ev = load(spark, sf_dir, "events")

    def actors(etype):
        return ev.filter(F.col("event_type") == etype).select("user_id").distinct()

    click_and_buy = (
        actors("click").intersect(actors("purchase"))
        .select("user_id", F.lit("click_and_buy").alias("cohort"))
    )
    buy_no_error = (
        actors("purchase").exceptAll(actors("error"))
        .select("user_id", F.lit("buy_no_error").alias("cohort"))
    )
    return click_and_buy.unionByName(buy_no_error)
