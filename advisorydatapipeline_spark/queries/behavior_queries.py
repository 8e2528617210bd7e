"""User-behavior analytics: retention cohorts, funnel conversion,
min-gap event thinning. All integer epoch-us arithmetic (ns truncated per-value) — exact on
both engines; no float aggregation anywhere.

Shuffle budget at 100 TB: every stage keys on ``user_id`` (cohort
min, funnel stage mins, gap windows), so AQE reuses one exchange
across the per-user stages; the final small aggregations are partial.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

US_DAY = 86_400_000_000


@query(
    "retention_cohorts",
    oracle=f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) // {US_DAY} AS day
  FROM events WHERE ts IS NOT NULL
),
cohort AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
FROM d JOIN cohort c USING (user_id)
GROUP BY 1, 2
""",
)
def retention_cohorts(spark, sf_dir):
    """Classic cohort-retention matrix: users grouped by first-seen
    day, counted per day-offset of later activity. Day bucketing is
    integer DIV on epoch-microseconds (ns truncated to us per the
    repo-wide oracle rule: DuckDB reads TIMESTAMP(NANOS) at us
    precision); the cohort min and the rejoin both hash
    on user_id (one reusable exchange), then one partial agg on
    (cohort_day, offset)."""
    d = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", F.expr(f"(ts DIV 1000) DIV {US_DAY}").alias("day"))
    )
    cohort = d.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        d.join(cohort, "user_id")
        .select(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@query(
    "funnel_analysis",
    oracle="""
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS s_ts
  FROM events WHERE event_type = 'signup' AND ts IS NOT NULL GROUP BY 1
),
v AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS v_ts
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'view' AND epoch_us(e.ts) >= s.s_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS p_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v_ts
  GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
       CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view_after_signup,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after_view
""",
)
def funnel_analysis(spark, sf_dir):
    """Ordered conversion funnel (signup -> first view after it ->
    first purchase after that): each stage is a filtered per-user min
    joined to the previous stage's timestamps. All three stage
    aggregations and joins key on user_id; counts are exact."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_type", F.expr("ts DIV 1000").alias("us"))
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("s_ts"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("us") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("us").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("us") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_ts"))
    )
    counts = [
        s.agg(F.count("*").cast("long").alias("n_signup")),
        v.agg(F.count("*").cast("long").alias("n_view_after_signup")),
        p.agg(F.count("*").cast("long").alias("n_purchase_after_view")),
    ]
    out = counts[0].crossJoin(F.broadcast(counts[1])).crossJoin(
        F.broadcast(counts[2])
    )
    return out


US_MIN_GAP = 60_000_000  # 60 s


@query(
    "min_gap_events",
    oracle=f"""
WITH g AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events WHERE ts IS NOT NULL
)
SELECT event_id, user_id, event_type, us
FROM g
WHERE prev_us IS NULL OR us - prev_us > {US_MIN_GAP}
""",
)
def min_gap_events(spark, sf_dir):
    """Min-gap thinning: drop events closer than 60 s to the previous
    event of the same (user, type) — the lag-window formulation of
    client-side event debouncing. One shuffle on the partition key;
    (ts, event_id) ordering makes the kept set deterministic."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_id", "user_id", "event_type", F.expr("ts DIV 1000").alias("us"))
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    g = ev.withColumn("prev_us", F.lag("us").over(w))
    return g.filter(
        F.col("prev_us").isNull()
        | (F.col("us") - F.col("prev_us") > US_MIN_GAP)
    ).select("event_id", "user_id", "event_type", "us")
