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


@query(
    "not_in_antijoin",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_custkey NOT IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
GROUP BY 1
""",
)
def not_in_antijoin(spark, sf_dir):
    """NOT IN as a null-aware anti join — the subtle set operator
    (one NULL in the subquery empties the result under ANSI
    semantics); distinct from the plain left_anti in
    left_anti_cache_skip. Expressed as shared SQL text so Spark
    plans its NullAwareAntiJoin/anti path and DuckDB applies the
    same ANSI rules."""
    ev = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    ev.createOrReplaceTempView("_orders_ni")
    cust.createOrReplaceTempView("_customer_ni")
    return spark.sql("""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM _orders_ni
WHERE o_custkey NOT IN (
  SELECT c_custkey FROM _customer_ni WHERE c_mktsegment = 'MACHINERY'
)
GROUP BY o_orderpriority
""")


@query(
    "intersect_except_all",
    oracle="""
WITH h1 AS (
  SELECT user_id, event_type FROM events
  WHERE epoch_us(ts) % 2 = 0
),
h2 AS (
  SELECT user_id, event_type FROM events
  WHERE epoch_us(ts) % 2 = 1
),
i AS (SELECT * FROM h1 INTERSECT ALL SELECT * FROM h2),
x AS (SELECT * FROM h1 EXCEPT ALL SELECT * FROM h2)
SELECT 'intersect_all' AS op, user_id, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM i GROUP BY 2, 3
UNION ALL
SELECT 'except_all' AS op, user_id, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM x GROUP BY 2, 3
""",
)
def intersect_except_all(spark, sf_dir):
    """Multiset INTERSECT ALL / EXCEPT ALL (duplicate-preserving —
    different physical operators from the distinct-ifying variants in
    intersect_except_keys), over an even/odd event-time split of the
    same table."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("us")
    )
    h1 = ev.filter(F.col("us") % 2 == 0).select("user_id", "event_type")
    h2 = ev.filter(F.col("us") % 2 == 1).select("user_id", "event_type")
    i = (
        h1.intersectAll(h2)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "user_id", "event_type", "n")
    )
    x = (
        h1.exceptAll(h2)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("except_all").alias("op"), "user_id", "event_type", "n")
    )
    return i.unionAll(x)
