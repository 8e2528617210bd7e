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

from advisorydatapipeline_spark.operators.temporal import asof_join
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


ROLL_DAYS = 7


@query(
    "rolling_distinct_users",
    oracle=f"""
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // {US_DAY} AS day, user_id
  FROM events WHERE ts IS NOT NULL
),
days AS (SELECT DISTINCT day FROM du),
win AS (
  SELECT d.day AS day, du.day AS src_day, du.user_id
  FROM days d JOIN du
    ON du.day BETWEEN d.day - {ROLL_DAYS - 1} AND d.day
)
SELECT day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS u7_users,
       CAST(count(DISTINCT CASE WHEN src_day = day THEN user_id END)
            AS BIGINT) AS day_users
FROM win GROUP BY day
""",
)
def rolling_distinct_users(spark, sf_dir):
    """Trailing-{7}-day distinct active users per day — the sliding-
    window DISTINCT neither engine's window frames can express
    (COUNT(DISTINCT) OVER RANGE is unsupported everywhere). Plan:
    pre-distinct to (day, user) — the corpus-shrinking step; at
    100 TB this is days x active-users, orders of magnitude under raw
    events — then replicate each compact pair to the {7} window
    anchors it serves and count per anchor. Replication factor is
    window/slide, the same strategy Structured Streaming uses for
    sliding windows; the shuffle moves the deduped pair set, never
    raw events. The oracle computes the identical windows via a
    range join on the distinct set."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    du = ev.select(
        F.expr(f"ts DIV {US_DAY * 1000}").alias("src_day"), "user_id"
    ).distinct()
    days = du.select(F.col("src_day").alias("day")).distinct()
    rep = du.withColumn(
        "day",
        F.explode(
            F.sequence(
                F.col("src_day"), F.col("src_day") + F.lit(ROLL_DAYS - 1)
            )
        ),
    )
    return (
        rep.join(days, "day")
        .groupBy("day")
        .agg(
            F.countDistinct("user_id").alias("u7_users"),
            F.countDistinct(
                F.when(F.col("src_day") == F.col("day"), F.col("user_id"))
            ).alias("day_users"),
        )
    )


@query(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type
  FROM events WHERE ts IS NOT NULL
),
tr AS (
  SELECT from_type, event_type AS to_type, count(*) AS n
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type,
       CAST(n AS BIGINT) AS n_transitions,
       CAST(n * 1000000
            // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
            AS BIGINT) AS ppm
FROM tr
""",
)
def event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: count + integer-ppm probability of each
    (from_type -> to_type) edge. One lag window on user_id, one
    partial-agg shuffle to the (from, to) matrix (|types|^2 rows —
    tiny at any corpus scale), then the row-normalizing window runs
    on that tiny matrix, not the events. The per-user sequence sort
    is the only event-scale work and reuses the exchange other
    user-keyed windows need anyway."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    tr = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    return tr.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr(
            "n_transitions * 1000000 DIV "
            "sum(n_transitions) OVER (PARTITION BY from_type)"
        ).alias("ppm"),
    )


@query(
    "time_weighted_value",
    oracle="""
WITH seq AS (
  SELECT user_id,
         CAST(floor(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS ts_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt_us
  FROM events WHERE ts IS NOT NULL
),
held AS (
  SELECT user_id, cents, nxt_us - ts_us AS dur_us
  FROM seq WHERE nxt_us IS NOT NULL
)
SELECT user_id,
       CAST(sum(dur_us) AS BIGINT) AS obs_us,
       CAST(sum(cents * dur_us) // sum(dur_us) AS BIGINT) AS twa_cents
FROM held GROUP BY user_id
HAVING sum(dur_us) > 0
""",
)
def time_weighted_value(spark, sf_dir):
    """Time-weighted average value per user (the TWAB shape: each
    observation holds until the next one, weights = holding
    duration). One user-keyed window for the lead() duration — the
    same exchange every other per-user window reuses — then a
    partial-agg rollup; integer microsecond x floor-cents products
    stay far inside BIGINT (1e11 us x 1e4 cents = 1e15/term). Users
    with a single event have no holding interval and drop out via
    the HAVING guard on both engines."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        F.expr("ts DIV 1000").alias("ts_us"),
        (F.lead(F.expr("ts DIV 1000")).over(w)).alias("nxt_us"),
    ).filter(F.col("nxt_us").isNotNull())
    held = seq.select(
        "user_id", "cents", (F.col("nxt_us") - F.col("ts_us")).alias("dur_us")
    )
    return (
        held.groupBy("user_id")
        .agg(
            F.sum("dur_us").alias("obs_us"),
            F.expr("sum(cents * dur_us) DIV sum(dur_us)").alias("twa_cents"),
        )
        .filter(F.col("obs_us") > 0)
    )


CEP_WINDOW_US = 24 * 3600 * 1_000_000


@query(
    "cep_pattern_matches",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         lag(event_type, 1) OVER w AS t1,
         lag(event_type, 2) OVER w AS t2,
         lag(epoch_us(ts), 2) OVER w AS start_us
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id AS purchase_id, start_us, ts_us AS end_us,
       CAST(ts_us - start_us AS BIGINT) AS span_us
FROM seq
WHERE event_type = 'purchase' AND t1 = 'view' AND t2 = 'view'
  AND ts_us - start_us <= {CEP_WINDOW_US}
""",
)
def cep_pattern_matches(spark, sf_dir):
    """Complex-event-processing pattern match: the CONTIGUOUS
    per-user sequence view -> view -> purchase completing within 24
    hours (MATCH_RECOGNIZE's simplest shape, strict contiguity —
    an intervening event of any other type breaks the match, which
    is exactly what funnel_analysis' stage-min formulation cannot
    express). One per-user sequence window — two lags over one sort,
    no joins, no state: at 100 TB this is a single exchange the
    other user-keyed windows already pay for, and the pattern
    predicate is a codegen'd row filter."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "event_type",
        F.expr("ts DIV 1000").alias("end_us"),
        F.lag("event_type", 1).over(w).alias("t1"),
        F.lag("event_type", 2).over(w).alias("t2"),
        F.lag(F.expr("ts DIV 1000"), 2).over(w).alias("start_us"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "purchase")
            & (F.col("t1") == "view")
            & (F.col("t2") == "view")
            & (F.col("end_us") - F.col("start_us") <= CEP_WINDOW_US)
        )
        .select(
            "user_id",
            "purchase_id",
            "start_us",
            "end_us",
            (F.col("end_us") - F.col("start_us")).alias("span_us"),
        )
    )


US_HOUR = 3_600_000_000
TREND_K = 3


@query(
    "trending_per_hour",
    oracle=f"""
WITH hc AS (
  SELECT (epoch_us(ts) // {US_HOUR}) * {US_HOUR} AS hour_us, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT hour_us, event_type, n,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT hour_us, event_type, n,
         row_number() OVER (PARTITION BY hour_us
                            ORDER BY n DESC, event_type) AS rnk
  FROM hc
)
WHERE rnk <= {TREND_K}
""",
)
def trending_per_hour(spark, sf_dir):
    """Trending items: top-{3} event types per hour bucket by count,
    deterministic (count DESC, type ASC) ranking — the leaderboard
    shape every analytics surface serves. One partial-agg shuffle to
    the (hour, type) table (tiny: hours x |types|); the rank window
    runs on that rollup, never on events. At 100 TB the rollup is
    the only event-scale pass and it combines map-side."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hc = (
        ev.select(
            F.expr(f"(ts DIV {US_HOUR * 1000}) * {US_HOUR}").alias(
                "hour_us"
            ),
            "event_type",
        )
        .groupBy("hour_us", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("hour_us").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        hc.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TREND_K)
    )


FUNNEL_STEP_US = 7 * 86_400_000_000  # 7-day stage-to-stage window


@query(
    "funnel_time_bound",
    oracle=f"""
WITH v1 AS (
  SELECT user_id, min(epoch_us(ts)) AS v_us
  FROM events WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY 1
),
c1 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS c_us
  FROM events e JOIN v1 ON e.user_id = v1.user_id
  WHERE e.event_type = 'click' AND e.ts IS NOT NULL
    AND epoch_us(e.ts) > v1.v_us
    AND epoch_us(e.ts) <= v1.v_us + {FUNNEL_STEP_US}
  GROUP BY 1
),
p1 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
  FROM events e JOIN c1 ON e.user_id = c1.user_id
  WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL
    AND epoch_us(e.ts) > c1.c_us
    AND epoch_us(e.ts) <= c1.c_us + {FUNNEL_STEP_US}
  GROUP BY 1
)
SELECT CASE WHEN p_us IS NOT NULL THEN 3
            WHEN c_us IS NOT NULL THEN 2
            ELSE 1 END AS stage,
       CAST(count(*) AS BIGINT) AS n_users
FROM v1 LEFT JOIN c1 USING (user_id) LEFT JOIN p1 USING (user_id)
GROUP BY 1
""",
)
def funnel_time_bound(spark, sf_dir):
    """Time-bound conversion funnel: view -> click within 7 days ->
    purchase within 7 days of the click (stage-to-stage windows —
    what funnel_analysis' lifetime stage-mins cannot express, and
    looser than cep_pattern_matches' strict contiguity: the three
    funnel formulations triangulate the semantics space). Each stage
    is one filtered min-agg joined to the previous stage's users;
    all three joins key on user_id so AQE reuses one exchange, and
    stage tables only ever shrink."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    us = F.expr("ts DIV 1000")

    def stage(etype, prev, prev_col, alias):
        e = ev.filter(F.col("event_type") == etype).select(
            "user_id", us.alias("_us")
        )
        if prev is None:
            return e.groupBy("user_id").agg(F.min("_us").alias(alias))
        return (
            e.join(prev, "user_id")
            .filter(
                (F.col("_us") > F.col(prev_col))
                & (F.col("_us") <= F.col(prev_col) + FUNNEL_STEP_US)
            )
            .groupBy("user_id")
            .agg(F.min("_us").alias(alias))
        )

    v1 = stage("view", None, None, "v_us")
    c1 = stage("click", v1, "v_us", "c_us")
    p1 = stage("purchase", c1, "c_us", "p_us")
    return (
        v1.join(c1, "user_id", "left")
        .join(p1, "user_id", "left")
        .select(
            F.when(F.col("p_us").isNotNull(), F.lit(3))
            .when(F.col("c_us").isNotNull(), F.lit(2))
            .otherwise(F.lit(1))
            .alias("stage")
        )
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


SESSION_GAP_US = 3_600 * 1_000_000  # mirrors aggregates.sessionization


@query(
    "session_relative_features",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                OR lag(epoch_us(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, event_id, ts_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, event_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(row_number() OVER (PARTITION BY user_id, session_id
                               ORDER BY ts_us, event_id) AS BIGINT)
         AS idx_in_session,
       CAST(ts_us - min(ts_us) OVER (PARTITION BY user_id, session_id)
            AS BIGINT) AS us_since_start
FROM sess
""",
)
def session_relative_features(spark, sf_dir):
    """Per-EVENT session-relative features (index within session, us
    since session start) — the feature-engineering face of
    sessionization: what a sequence model consumes, where the
    `sessionization` entry emits per-session rollups. Three window
    passes, all over (user_id)-rooted sorts, so one exchange serves
    the gap flag, the running session id, and the within-session
    rank/min — Catalyst reuses the sort across them."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    wu = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("ts_us")
    ).withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(wu).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(wu) > SESSION_GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("is_new").over(
            wu.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts_us", "event_id"
    )
    return sess.select(
        "user_id",
        "event_id",
        "session_id",
        F.row_number().over(ws).cast("long").alias("idx_in_session"),
        (
            F.col("ts_us")
            - F.min("ts_us").over(
                Window.partitionBy("user_id", "session_id")
            )
        ).alias("us_since_start"),
    )


@query(
    "attribution_last_touch",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
),
v AS (
  SELECT user_id, ts,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'view' AND ts IS NOT NULL
),
v1 AS (SELECT user_id, ts, k FROM v WHERE rn = 1),
m AS (
  SELECT p.cents, v1.k // 10 AS bucket
  FROM p ASOF LEFT JOIN v1
    ON p.user_id = v1.user_id AND p.ts >= v1.ts
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS attributed_cents
FROM m GROUP BY bucket
""",
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch revenue attribution: each purchase's floor-cents
    value credited to the campaign decile (props.k // 10) of the
    user's most recent prior view; unattributed purchases land in
    the NULL bucket. Composition entry: backward as-of join (one
    shuffle, no inequality join) + JSON extraction + partial-agg
    rollup — the marketing-attribution shape, value-gated end to
    end against DuckDB's native ASOF."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    v = ev.filter(
        (F.col("event_type") == "view") & F.col("ts").isNotNull()
    ).select(
        "user_id",
        "ts",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.col("event_id").alias("vid"),
    )
    m = asof_join(
        p, v, ["user_id"], "ts", "ts", ["k"], tiebreak="vid"
    )
    return (
        m.select(
            "cents", F.expr("k_r DIV 10").alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("attributed_cents"),
        )
    )


@query(
    "gap_histogram_log2",
    oracle="""
WITH gaps AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS gap_us
  FROM events WHERE ts IS NOT NULL
)
SELECT CAST(length(bin(gap_us)) - 1 AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM gaps WHERE gap_us > 0
GROUP BY 1
""",
)
def gap_histogram_log2(spark, sf_dir):
    """Inter-event gap distribution in log2 buckets (the latency/
    cadence histogram every ops dashboard wants). The bucket is
    ``len(binary(gap)) - 1`` — exact floor(log2) via STRING length
    of the base-2 rendering, because float log2's last-ulp behavior
    is libm-specific and would flake the gate at power-of-two
    boundaries; string length is exact in both engines. One user-
    keyed lag window (the shared exchange) then a partial-agg
    histogram of at most 64 buckets."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (
            F.expr("ts DIV 1000")
            - F.lag(F.expr("ts DIV 1000")).over(w)
        ).alias("gap_us")
    ).filter(F.col("gap_us") > 0)
    return (
        gaps.select(
            (F.length(F.conv(F.col("gap_us"), 10, 2)) - 1)
            .cast("long")
            .alias("log2_bucket")
        )
        .groupBy("log2_bucket")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


@query(
    "daily_autocorr_moments",
    oracle=f"""
WITH daily AS (
  SELECT epoch_us(ts) // {US_DAY} AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
lagged AS (
  SELECT u.lag AS lag_days, d.n_events AS y, p.n_events AS x
  FROM daily d
  JOIN (SELECT unnest([1, 7]) AS lag) u ON true
  JOIN daily p ON p.day = d.day - u.lag
)
SELECT lag_days,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sx,
       CAST(sum(y) AS BIGINT) AS sy,
       CAST(sum(x * x) AS BIGINT) AS sxx,
       CAST(sum(y * y) AS BIGINT) AS syy,
       CAST(sum(x * y) AS BIGINT) AS sxy
FROM lagged GROUP BY 1
""",
)
def daily_autocorr_moments(spark, sf_dir):
    """Autocorrelation of the daily event-count series at lags 1 and
    7, emitted as EXACT integer moments (n, sx, sy, sxx, syy, sxy) —
    Pearson r is one driver-side formula away, but the distributed
    part stays bit-stable (integer sums are association-order-free,
    float reductions are not; same contract as
    price_qty_regression's decimal moments). The lag pairing is a
    self-join on the tiny daily rollup, not on events; the only
    event-scale pass is the day rollup with map-side combine."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        ev.select(F.expr(f"ts DIV {US_DAY * 1000}").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    lags = daily.sparkSession.createDataFrame(
        [(1,), (7,)], "lag_days long"
    )
    d = daily.select("day", F.col("n_events").alias("y"))
    p = daily.select(
        F.col("day").alias("p_day"), F.col("n_events").alias("x")
    )
    lagged = (
        d.crossJoin(F.broadcast(lags))
        .join(
            p,
            F.col("p_day") == F.col("day") - F.col("lag_days"),
        )
    )
    return lagged.groupBy("lag_days").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )


@query(
    "chi2_independence_scan",
    oracle="""
WITH obs AS (
  -- calendar-free weekday: epoch-day mod 7 (0 = Thursday) — the
  -- engines disagree on dayofweek() numbering (DuckDB 0-6 Sun-first,
  -- Spark 1-7), integer day arithmetic cannot
  SELECT event_type,
         CAST((epoch_us(ts) // 86400000000) % 7 AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS o
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
margins AS (
  SELECT event_type, dow, o,
         CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
         CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS c,
         CAST(sum(o) OVER () AS BIGINT) AS t
  FROM obs
)
SELECT event_type, dow, o,
       CAST(r * c // t AS BIGINT) AS e_floor,
       CAST((o - r * c // t) * (o - r * c // t) * 1000000
            // greatest(r * c // t, 1) AS BIGINT) AS cell_chi2_scaled
FROM margins
""",
)
def chi2_independence_scan(spark, sf_dir):
    """Per-cell chi-square contributions for the event_type x
    day-of-week contingency table (the independence screen a data-
    quality monitor runs to catch schedule-skewed collection). The
    expected count rides as the FLOOR integer r*c/t so every cell
    statistic is exact integer arithmetic — a float expected-count
    would be libm-identical but its squared residual would not
    survive the hash gate across engines at boundary cells. One
    event-scale rollup; margins and cells compute on the 5x7 table."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    obs = (
        ev.select(
            "event_type",
            F.expr(f"(ts DIV {US_DAY * 1000}) % 7").alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    return obs.selectExpr(
        "event_type",
        "dow",
        "o",
        "sum(o) OVER (PARTITION BY event_type) * sum(o) OVER (PARTITION BY dow)"
        " DIV sum(o) OVER () AS e_floor",
    ).selectExpr(
        "event_type",
        "dow",
        "o",
        "e_floor",
        "(o - e_floor) * (o - e_floor) * 1000000"
        " DIV greatest(e_floor, 1) AS cell_chi2_scaled",
    )


@query(
    "ab_test_lift",
    oracle="""
WITH arms AS (
  SELECT user_id,
         (('0x' || substr(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 15))
          ::BIGINT) % 2 AS arm,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS purchase_cents
  FROM events GROUP BY 1, 2
)
SELECT arm,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       CAST(sum(converted) * 1000000 // count(*) AS BIGINT)
         AS conv_ppm,
       CAST(sum(purchase_cents) AS BIGINT) AS revenue_cents,
       CAST(sum(purchase_cents) // count(*) AS BIGINT)
         AS arpu_cents
FROM arms GROUP BY arm
""",
)
def ab_test_lift(spark, sf_dir):
    """Experimentation readout: users deterministically split into
    two arms by salted portable hash (the assignment IS the
    experiment infrastructure — stable under re-runs and engine-
    independent), with per-arm exact conversion ppm and ARPU in
    floor-cents. One user rollup (partial-agg) then a 2-row arm
    rollup; significance math happens driver-side on these exact
    counts. Same salt-hash machinery as split_assignment, applied
    to the metrics face."""
    from advisorydatapipeline_spark.functions.text import hash64

    ev = load(spark, sf_dir, "events")
    arms = (
        ev.withColumn(
            "arm",
            hash64(
                F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))
            )
            % 2,
        )
        .groupBy("user_id", "arm")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("CAST(floor(value * 100) AS BIGINT)"),
                ).otherwise(F.lit(0))
            ).alias("purchase_cents"),
        )
    )
    return arms.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
        F.expr("sum(converted) * 1000000 DIV count(*)").alias("conv_ppm"),
        F.sum("purchase_cents").alias("revenue_cents"),
        F.expr("sum(purchase_cents) DIV count(*)").alias("arpu_cents"),
    )


@query(
    "cohort_ltv_curve",
    oracle=f"""
WITH firsts AS (
  SELECT user_id, min(epoch_us(ts) // {US_DAY}) AS cohort_day
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
rev AS (
  SELECT f.cohort_day,
         (epoch_us(e.ts) // {US_DAY}) - f.cohort_day AS age_days,
         CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT)
           AS day_cents
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT cohort_day, age_days, day_cents,
       CAST(sum(day_cents) OVER (
         PARTITION BY cohort_day ORDER BY age_days
         ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS cum_cents
FROM rev
""",
)
def cohort_ltv_curve(spark, sf_dir):
    """Cohort LTV curve: cumulative purchase revenue (exact floor-
    cents) by signup cohort and account age in days — the growth-
    accounting surface retention_cohorts' user counts feed into. The
    cohort join keys on user_id (the exchange every behavior query
    shares), the day rollup partial-aggs, and the cumulative window
    runs on the cohort x age grid, not on events."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    firsts = (
        ev.select("user_id", F.expr(f"ts DIV {US_DAY * 1000}").alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("cohort_day"))
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr(f"ts DIV {US_DAY * 1000}").alias("d"),
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("_c"),
        )
        .join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("d") - F.col("cohort_day")).alias("age_days"),
        )
        .agg(F.sum("_c").alias("day_cents"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return rev.select(
        "cohort_day",
        "age_days",
        "day_cents",
        F.sum("day_cents").over(w).alias("cum_cents"),
    )


@query(
    "basket_pair_lift",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {US_DAY} AS day, event_type
  FROM events WHERE ts IS NOT NULL
),
n_baskets AS (
  SELECT CAST(count(*) AS BIGINT) AS t
  FROM (SELECT DISTINCT user_id, day FROM items)
),
singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n
  FROM items GROUP BY 1
),
pairs AS (
  SELECT a.event_type AS item_a, b.event_type AS item_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b
    ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.item_a, p.item_b, p.n_ab,
       sa.n AS n_a, sb.n AS n_b,
       CAST(p.n_ab * nb.t * 1000000 // (sa.n * sb.n) AS BIGINT)
         AS lift_ppm
FROM pairs p
JOIN singles sa ON sa.event_type = p.item_a
JOIN singles sb ON sb.event_type = p.item_b
CROSS JOIN n_baskets nb
""",
)
def basket_pair_lift(spark, sf_dir):
    """Market-basket association: support and integer-ppm lift for
    every event-type pair co-occurring in a (user, day) basket —
    lift > 1e6 means the pair co-occurs more than independence
    predicts. The basket self-join keys on (user, day), so pair
    blowup is bounded by per-basket item count (<= |event types|,
    a constant) — the property that makes frequent-itemset mining
    feasible at 100 TB. Singles and the basket total broadcast back
    onto the tiny pair table; everything after the distinct is
    integer."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    items = ev.select(
        "user_id",
        F.expr(f"ts DIV {US_DAY * 1000}").alias("day"),
        "event_type",
    ).distinct()
    t = items.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("t")
    )
    singles = items.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    a = items.select(
        "user_id", "day", F.col("event_type").alias("item_a")
    )
    b = items.select(
        "user_id", "day", F.col("event_type").alias("item_b")
    )
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = singles.select(
        F.col("event_type").alias("item_a"), F.col("n").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("item_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(t))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(
                "CAST(n_ab * t * 1000000 DIV (n_a * n_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


@query(
    "activity_streaks",
    oracle=f"""
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {US_DAY} AS day
  FROM events WHERE ts IS NOT NULL
),
grp AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS streak_key
  FROM days
),
streaks AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS len
  FROM grp GROUP BY user_id, streak_key
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM streaks GROUP BY user_id
""",
)
def activity_streaks(spark, sf_dir):
    """Consecutive-day activity streaks per user (the engagement
    metric behind every 'X-day streak' badge): the day-minus-rank
    trick turns consecutive runs into equal keys — one distinct
    shuffle, one window, two partial aggs, no self-join. The rank
    window and both rollups share the user_id exchange."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    days = ev.select(
        "user_id", F.expr(f"ts DIV {US_DAY * 1000}").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "streak_key", F.col("day") - F.row_number().over(w)
    )
    streaks = grp.groupBy("user_id", "streak_key").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@query(
    "bounce_rate_daily",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                OR lag(epoch_us(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, ts_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
),
per_session AS (
  SELECT user_id, session_id,
         min(ts_us) // {US_DAY} AS start_day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM sess GROUP BY 1, 2
)
SELECT start_day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS bounce_ppm
FROM per_session GROUP BY start_day
""",
)
def bounce_rate_daily(spark, sf_dir):
    """Daily bounce rate: share of sessions (1 h inactivity gap, the
    sessionization contract) containing exactly one event, by
    session-start day in integer ppm — the engagement-quality metric
    product teams watch. Reuses the session windows' user exchange;
    the daily rollup is partial-agg over the per-session table."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    wu = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("ts_us")
    ).withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(wu).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(wu) > SESSION_GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("is_new").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.expr(f"min(ts_us) DIV {US_DAY}").alias("start_day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_session.groupBy("start_day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.when(F.col("n_events") == 1, 1).otherwise(0)
        ).alias("n_bounces"),
        F.expr(
            "sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000"
            " DIV count(*)"
        ).alias("bounce_ppm"),
    )


@query(
    "theil_sen_trend",
    oracle=f"""
WITH daily AS (
  SELECT epoch_us(ts) // {US_DAY} AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
slopes AS (
  SELECT (b.n_events - a.n_events)
           / CAST(b.day - a.day AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON b.day > a.day
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       quantile_disc(slope, 0.5) AS median_slope
FROM slopes
""",
)
def theil_sen_trend(spark, sf_dir):
    """Theil-Sen robust trend of the daily event-count series: the
    MEDIAN of all pairwise slopes — immune to the outlier days that
    wreck least squares (price_qty_regression's moments). Pairwise
    slopes are quadratic in DAYS, not events (30 days -> 435 pairs),
    so the self-join runs on the tiny daily rollup; each slope is
    one IEEE division (identical per-row on both engines) and the
    median is a discrete quantile — an actual slope value, rank-
    selected identically, no interpolation to drift."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        ev.select(F.expr(f"ts DIV {US_DAY * 1000}").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("n_events").alias("na")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("n_events").alias("nb")
    )
    slopes = (
        a.join(b, F.col("db") > F.col("da"))
        .select(
            (
                (F.col("nb") - F.col("na"))
                / (F.col("db") - F.col("da")).cast("double")
            ).alias("slope")
        )
    )
    return slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile_approx(slope, 0.5, 2147483647)").alias(
            "median_slope"
        ),
    )


# --- position-based (U-shaped) multi-touch attribution --------------


@query(
    "attribution_position_based",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN event_type = 'purchase' THEN event_id END AS p_id,
         CASE WHEN event_type = 'purchase'
              THEN CAST(floor(value * 100) AS BIGINT) END AS p_cents
  FROM events WHERE ts IS NOT NULL
),
assigned AS (
  SELECT *,
         last_value(p_id IGNORE NULLS) OVER w AS purchase_id,
         last_value(p_cents IGNORE NULLS) OVER w AS cents
  FROM ev
  WINDOW w AS (
    PARTITION BY user_id
    ORDER BY ts DESC,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END ASC,
             event_id DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  )
),
ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY purchase_id
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY purchase_id
                            ORDER BY ts DESC, event_id DESC) AS rn_d,
         count(*) OVER (PARTITION BY purchase_id) AS n
  FROM assigned
  WHERE event_type <> 'purchase' AND purchase_id IS NOT NULL
),
credited AS (
  SELECT event_type, cents,
         CASE WHEN n = 1 THEN 1000000
              WHEN n = 2 THEN 500000
              WHEN rn_a = 1 THEN 400000
              WHEN rn_d = 1 THEN 400000
              ELSE 200000 // (n - 2)
                   + CASE WHEN rn_a = 2
                          THEN 200000 - (n - 2) * (200000 // (n - 2))
                          ELSE 0 END
         END AS ppm
  FROM ranked
)
SELECT event_type AS channel,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(ppm) AS BIGINT) AS credit_ppm_total,
       CAST(sum(cents * ppm) AS BIGINT) AS attributed_micro_cents
FROM credited GROUP BY 1
""",
)
def attribution_position_based(spark, sf_dir):
    """U-shaped (position-based) multi-touch attribution: each
    purchase's value splits 40% to the first touch, 40% to the last,
    20% across the middles — per-channel credit the last-touch model
    can't express. Credits are integer parts-per-million (the middle
    pool divides by floor with the remainder pinned to the earliest
    middle touch), so every engine computes the identical split —
    no float credit drift at any scale.

    Plan: one scan; a per-user descending running `last(ignorenulls)`
    assigns each touch to its NEXT purchase (strictly later — the
    tie order puts a same-timestamp purchase after the touch in the
    scan, keeping it invisible); two row_numbers + a partition count
    rank touches within each purchase; one partial-agg shuffle
    produces the 4-row channel rollup. Touch rows carry (ids, ts,
    cents) only — at 100 TB nothing wider ever shuffles.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    is_p = F.col("event_type") == "purchase"
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(is_p, F.col("event_id")).alias("p_id"),
        F.when(is_p, F.floor(F.col("value") * 100).cast("long")).alias(
            "p_cents"
        ),
        is_p.cast("int").alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").desc(), F.col("is_p").asc(), F.col("event_id").desc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = tagged.select(
        "event_id",
        "ts",
        "event_type",
        F.last("p_id", ignorenulls=True).over(w).alias("purchase_id"),
        F.last("p_cents", ignorenulls=True).over(w).alias("cents"),
    ).filter(
        (F.col("event_type") != "purchase")
        & F.col("purchase_id").isNotNull()
    )
    wp = Window.partitionBy("purchase_id")
    ranked = assigned.select(
        "event_type",
        "cents",
        F.row_number()
        .over(wp.orderBy(F.col("ts").asc(), F.col("event_id").asc()))
        .alias("rn_a"),
        F.row_number()
        .over(wp.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    ppm = (
        F.when(F.col("n") == 1, F.lit(1000000))
        .when(F.col("n") == 2, F.lit(500000))
        .when(F.col("rn_a") == 1, F.lit(400000))
        .when(F.col("rn_d") == 1, F.lit(400000))
        .otherwise(
            F.expr("200000 DIV (n - 2)")
            + F.when(
                F.col("rn_a") == 2,
                F.lit(200000) - (F.col("n") - 2) * F.expr("200000 DIV (n - 2)"),
            ).otherwise(F.lit(0))
        )
    )
    return (
        ranked.withColumn("ppm", ppm.cast("long"))
        .groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("ppm").cast("long").alias("credit_ppm_total"),
            F.sum(F.col("cents") * F.col("ppm"))
            .cast("long")
            .alias("attributed_micro_cents"),
        )
    )


# --- Kaplan-Meier retention curve (right-censored) ------------------

# the synthetic corpus spans ~30 days with near-continuous activity,
# so the clinically-typical day/14d grid would censor everyone; the
# ESTIMATOR is granularity-agnostic -- hours + a 24h censor window
_KM_CENSOR_NS = 24 * 3600 * 1_000_000_000  # active in last 24h => censored
_KM_DAY_NS = 3600 * 1_000_000_000  # duration bucket: hours


@query(
    "kaplan_meier_retention",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         (max(epoch_ns(ts)) - min(epoch_ns(ts))) // {_KM_DAY_NS}
           AS dur_hours,
         max(epoch_ns(ts)) AS last_ns
  FROM events WHERE ts IS NOT NULL GROUP BY user_id
),
h AS (SELECT max(epoch_ns(ts)) AS horizon_ns FROM events),
lab AS (
  SELECT dur_hours,
         CASE WHEN h.horizon_ns - last_ns > {_KM_CENSOR_NS}
              THEN 1 ELSE 0 END AS churned
  FROM u, h
),
per_t AS (
  SELECT dur_hours, CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(churned) AS BIGINT) AS n_churn
  FROM lab GROUP BY dur_hours
),
risk AS (
  SELECT dur_hours, n_all, n_churn,
         (SELECT CAST(count(*) AS BIGINT) FROM lab)
           - CAST(COALESCE(sum(n_all) OVER (
               ORDER BY dur_hours ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS n_risk
  FROM per_t
),
steps AS (
  SELECT dur_hours, n_risk, n_churn,
         CASE WHEN n_risk > n_churn
              THEN CAST(floor(1000000 * ln(
                     (n_risk - n_churn) / CAST(n_risk AS DOUBLE)
                   )) AS BIGINT) END AS step_micro
  FROM risk WHERE n_churn > 0
)
SELECT dur_hours AS t_hours, n_risk, n_churn,
       CAST(sum(step_micro) OVER (
         ORDER BY dur_hours ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS logsurv_micro
FROM steps
""",
)
def kaplan_meier_retention(spark, sf_dir):
    """Kaplan-Meier product-limit retention curve over user activity
    lifespans, with RIGHT CENSORING: a user active within 24 hours of
    the corpus horizon hasn't churned — their lifetime is a lower
    bound, and naive retention curves that drop them are biased
    toward early churn. At each churn duration t: n_risk (users
    surviving >= t), n_churn, and the running log-survival
    ln S(t) = sum ln((n_i - d_i)/n_i), emitted as an exact
    floor-quantized integer (micro-nats) so both engines agree
    bit-for-bit: the per-step ln is one per-row op; only integers
    are ever summed.

    Plan: one groupBy(user) pass collapses events to (duration,
    censored) — at 100 TB the only full shuffle; the curve itself
    lives on |distinct durations| rows (a single-partition window
    over a tiny rollup, like the other curve queries).
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.expr(f"(max(ts) - min(ts)) DIV {_KM_DAY_NS}").alias("dur_hours"),
        F.max("ts").alias("last_ns"),
    )
    h = ev.agg(F.max("ts").alias("horizon_ns"))
    lab = u.crossJoin(F.broadcast(h)).select(
        "dur_hours",
        (
            (F.col("horizon_ns") - F.col("last_ns")) > _KM_CENSOR_NS
        ).cast("long").alias("churned"),
    )
    total = lab.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    per_t = lab.groupBy("dur_hours").agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("churned").cast("long").alias("n_churn"),
    )
    w_prev = (
        Window.orderBy(F.col("dur_hours").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_users")
            - F.coalesce(F.sum("n_all").over(w_prev), F.lit(0)).cast(
                "long"
            ),
        )
        .filter(F.col("n_churn") > 0)
    )
    step = F.when(
        F.col("n_risk") > F.col("n_churn"),
        F.floor(
            1000000
            * F.log(
                (F.col("n_risk") - F.col("n_churn"))
                / F.col("n_risk").cast("double")
            )
        ).cast("long"),
    )
    w_cum = (
        Window.orderBy(F.col("dur_hours").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        risk.withColumn("step_micro", step)
        .select(
            F.col("dur_hours").alias("t_hours"),
            "n_risk",
            "n_churn",
            F.sum("step_micro").over(w_cum).cast("long").alias(
                "logsurv_micro"
            ),
        )
    )


# --- apriori frequent 3-itemsets (brand baskets) --------------------


@query(
    "basket_brand_triples",
    oracle="""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS it
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
nb AS MATERIALIZED (
  SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM b
),
s AS MATERIALIZED (
  SELECT GREATEST(2, (SELECT n FROM nb) // 400) AS minsup
),
fitems AS (
  SELECT it FROM b GROUP BY it
  HAVING count(*) >= (SELECT minsup FROM s)
),
fb AS MATERIALIZED (SELECT b.o, b.it FROM b JOIN fitems USING (it)),
-- the o-keyed pair expansion is the expensive stage; build it ONCE
-- (MATERIALIZED) and let both the support count and the probe side
-- read it, instead of re-running the fb self-join (r6 gate: 76s at
-- sf0.1 from re-inlined expansions)
rawpairs AS MATERIALIZED (
  SELECT a.o, a.it AS ia, c.it AS ib
  FROM fb a JOIN fb c ON a.o = c.o AND a.it < c.it
),
fpairs AS MATERIALIZED (
  SELECT ia, ib, CAST(count(*) AS BIGINT) AS sup
  FROM rawpairs
  GROUP BY 1, 2 HAVING count(*) >= (SELECT minsup FROM s)
),
po AS (
  SELECT r.o, r.ia, r.ib
  FROM rawpairs r
  JOIN fpairs fp ON fp.ia = r.ia AND fp.ib = r.ib
),
tri AS (
  SELECT po.ia, po.ib, f3.it AS ic, CAST(count(*) AS BIGINT) AS support
  FROM po
  JOIN fb f3 ON f3.o = po.o AND f3.it > po.ib
  JOIN fpairs p2 ON p2.ia = po.ia AND p2.ib = f3.it
  JOIN fpairs p3 ON p3.ia = po.ib AND p3.ib = f3.it
  GROUP BY 1, 2, 3 HAVING count(*) >= (SELECT minsup FROM s)
)
SELECT ia AS brand_a, ib AS brand_b, ic AS brand_c, support,
       CAST(support * 1000000 // (SELECT n FROM nb) AS BIGINT)
         AS support_ppm
FROM tri
""",
)
def basket_brand_triples(spark, sf_dir):
    """Apriori frequent 3-itemsets over order baskets of part BRANDS
    (the dim join rolls 200k parts up to 25 brands — itemset mining
    needs a bounded item vocabulary to mean anything). Full apriori
    pruning: items below min-support leave first, pair candidates
    must be frequent, and a triple (a,b,c) is only COUNTED if all
    three of its 2-subsets survived — at 100 TB this prefilter chain
    is what keeps the 3-way basket self-join from enumerating the
    long tail. Min-support derives from the basket count
    (max(2, n/400)), so the same query is meaningful at every SF.

    Plan: baskets distinct once; self-joins key on the basket id
    (pairs per basket bounded by per-basket brand count); fpairs and
    the 1-row stats broadcast into the probe sides.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # every downstream stage re-reads the basket table, the 1-row
    # stats scalar, and the pair expansion — persist each once or the
    # lineitem/part join replans per consumer (13.6s -> ~5s at sf0.1)
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            F.col("l_orderkey").alias("o"), F.col("p_brand").alias("it")
        )
        .distinct()
        .persist()
    )
    stats = b.agg(
        F.countDistinct("o").cast("long").alias("n")
    ).withColumn(
        "minsup", F.greatest(F.lit(2), F.expr("n DIV 400"))
    ).persist()
    fitems = (
        b.groupBy("it")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(stats))
        .filter(F.col("cnt") >= F.col("minsup"))
        .select("it")
    )
    fb = b.join(F.broadcast(fitems), "it").select("o", "it").persist()
    a1 = fb.select("o", F.col("it").alias("ia"))
    a2 = fb.select("o", F.col("it").alias("ib"))
    rawpairs = (
        a1.join(a2, "o").filter(F.col("ia") < F.col("ib")).persist()
    )
    fpairs = (
        rawpairs.groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .crossJoin(F.broadcast(stats.select("minsup")))
        .filter(F.col("sup") >= F.col("minsup"))
        .select("ia", "ib")
    )
    po = rawpairs.join(F.broadcast(fpairs), ["ia", "ib"])
    f3 = fb.select("o", F.col("it").alias("ic"))
    tri = (
        po.join(f3, "o")
        .filter(F.col("ic") > F.col("ib"))
        .join(
            F.broadcast(
                fpairs.select(
                    F.col("ia"), F.col("ib").alias("ic")
                )
            ),
            ["ia", "ic"],
        )
        .join(
            F.broadcast(
                fpairs.select(
                    F.col("ia").alias("ib"), F.col("ib").alias("ic")
                )
            ),
            ["ib", "ic"],
        )
        .groupBy("ia", "ib", "ic")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .crossJoin(F.broadcast(stats))
        .filter(F.col("support") >= F.col("minsup"))
    )
    return tri.select(
        F.col("ia").alias("brand_a"),
        F.col("ib").alias("brand_b"),
        F.col("ic").alias("brand_c"),
        "support",
        F.expr("support * 1000000 DIV n").alias("support_ppm"),
    )


# --- Markov removal-effect attribution ------------------------------

_MK_CHANNELS = ["click", "error", "signup", "view"]
_MK_ITERS = 12


def _markov_oracle() -> str:
    variants = ", ".join(f"('{v}')" for v in ["base"] + _MK_CHANNELS)
    iters = []
    prev = "p0"
    # AS MATERIALIZED everywhere: without it DuckDB inlines the
    # single-reference CTE chain, re-planning counts' whole upstream
    # (events window functions) once per unrolled iteration — the
    # r6 gate measured 97s at sf0.1 for what is a tiny fixpoint over
    # states x variants once the chain is pinned.
    for k in range(1, _MK_ITERS + 1):
        iters.append(f"""
p{k} AS MATERIALIZED (
  SELECT v.variant, c.src AS state, c.tot,
         CASE WHEN c.src = v.variant THEN 0 ELSE
           CAST(sum(c.cnt * CASE WHEN c.dst = 'conv' THEN 1000000
                WHEN c.dst = 'null' THEN 0
                WHEN c.dst = v.variant THEN 0
                ELSE COALESCE(pp.p, 0) END) // c.tot AS BIGINT)
         END AS p
  FROM counts c
  CROSS JOIN variants v
  LEFT JOIN {prev} pp ON pp.variant = v.variant AND pp.state = c.dst
  GROUP BY v.variant, c.src, c.tot
)""")
        prev = f"p{k}"
    return f"""
WITH ev AS MATERIALIZED (
  SELECT user_id, event_id, ts, event_type FROM events
  WHERE ts IS NOT NULL
),
fp AS MATERIALIZED (
  SELECT user_id, min(ts) AS pts FROM ev
  WHERE event_type = 'purchase' GROUP BY 1
),
pre AS MATERIALIZED (
  SELECT e.user_id, e.event_type, e.ts, e.event_id
  FROM ev e LEFT JOIN fp ON fp.user_id = e.user_id
  WHERE (fp.pts IS NULL OR e.ts < fp.pts)
    AND e.event_type <> 'purchase'
),
usr AS MATERIALIZED (
  SELECT e.user_id,
         CAST(max(CASE WHEN fp.pts IS NULL THEN 0 ELSE 1 END) AS INT)
           AS converted
  FROM ev e LEFT JOIN fp ON fp.user_id = e.user_id
  GROUP BY 1
),
seq AS MATERIALIZED (
  SELECT p.user_id, p.event_type,
         lead(p.event_type) OVER (
           PARTITION BY p.user_id ORDER BY p.ts, p.event_id
         ) AS nxt,
         row_number() OVER (
           PARTITION BY p.user_id ORDER BY p.ts, p.event_id
         ) AS rn
  FROM pre p
),
t_mid AS (
  SELECT s.event_type AS src,
         COALESCE(s.nxt,
           CASE WHEN u.converted = 1 THEN 'conv' ELSE 'null' END) AS dst
  FROM seq s JOIN usr u USING (user_id)
),
t_start AS (
  SELECT 'start' AS src, s.event_type AS dst
  FROM seq s WHERE s.rn = 1
  UNION ALL
  SELECT 'start',
         CASE WHEN u.converted = 1 THEN 'conv' ELSE 'null' END
  FROM usr u
  WHERE NOT EXISTS (SELECT 1 FROM pre p WHERE p.user_id = u.user_id)
),
raw AS (SELECT * FROM t_mid UNION ALL SELECT * FROM t_start),
cnts AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt
  FROM raw GROUP BY 1, 2
),
counts AS MATERIALIZED (
  SELECT c.src, c.dst, c.cnt,
         CAST(sum(c.cnt) OVER (PARTITION BY c.src) AS BIGINT) AS tot
  FROM cnts c
),
variants(variant) AS (VALUES {variants}),
p0 AS (
  SELECT v.variant, c.src AS state, CAST(0 AS BIGINT) AS p
  FROM (SELECT DISTINCT src FROM counts) c CROSS JOIN variants v
),
{",".join(iters)},
base AS (
  SELECT p AS p_base FROM p{_MK_ITERS}
  WHERE variant = 'base' AND state = 'start'
),
eff AS MATERIALIZED (
  SELECT variant AS channel, p AS p_removed,
         (SELECT p_base FROM base) AS p_base,
         ((SELECT p_base FROM base) - p) * 1000000
           // GREATEST((SELECT p_base FROM base), 1) AS removal_ppm
  FROM p{_MK_ITERS}
  WHERE variant <> 'base' AND state = 'start'
)
SELECT channel, p_base, p_removed,
       CAST(removal_ppm AS BIGINT) AS removal_ppm,
       CAST(removal_ppm * 1000000
            // GREATEST((SELECT CAST(sum(removal_ppm) AS BIGINT)
                         FROM eff), 1) AS BIGINT) AS share_ppm
FROM eff
"""


@query("markov_attribution_removal", oracle=_markov_oracle())
def markov_attribution_removal(spark, sf_dir):
    """Markov removal-effect attribution (Anderl et al.): model user
    journeys as a first-order chain over channels with conv/null
    absorbers; a channel's credit is how much the start-state
    absorption probability DROPS when journeys touching it are
    killed — the data-driven alternative to positional heuristics
    (attribution_position_based is the heuristic twin). Absorption
    probabilities are K={k}-step truncated power iterations in exact
    integer ppm (floor per step), so every engine lands on identical
    values.

    Plan (r15): the event log collapses to the (src,dst)
    transition-count table in one window+agg pass — the only
    corpus-sized work; the 5-variant 12-step fixpoint over that
    MODEL (<= ~50 rows at any corpus scale) runs inside one
    single-group applyInPandas, replaying the same integer floors —
    formerly ~40 tiny Spark jobs of pure scheduler/checkpoint tax.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    evp = ev.join(F.broadcast(fp), "user_id", "left")
    pre = evp.filter(
        (F.col("pts").isNull() | (F.col("ts") < F.col("pts")))
        & (F.col("event_type") != "purchase")
    ).select("user_id", "event_type", "ts", "event_id")
    usr = evp.groupBy("user_id").agg(
        F.max(F.col("pts").isNotNull().cast("int")).alias("converted")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = pre.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    )
    t_mid = seq.join(usr, "user_id").select(
        F.col("event_type").alias("src"),
        F.coalesce(
            F.col("nxt"),
            F.when(F.col("converted") == 1, "conv").otherwise("null"),
        ).alias("dst"),
    )
    t_start = seq.filter(F.col("rn") == 1).select(
        F.lit("start").alias("src"), F.col("event_type").alias("dst")
    ).unionByName(
        usr.join(pre.select("user_id").distinct(), "user_id", "left_anti")
        .select(
            F.lit("start").alias("src"),
            F.when(F.col("converted") == 1, "conv")
            .otherwise("null")
            .alias("dst"),
        )
    )
    cnts = (
        t_mid.unionByName(t_start)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    counts = cnts.withColumn(
        "tot",
        F.sum("cnt").over(Window.partitionBy("src")).cast("long"),
    )

    # r15 optimization (guide §1.2 step 1 — fix the distributed
    # algorithm): the K=12-step x 5-variant fixpoint previously ran
    # as 12 Spark join+agg jobs with lineage cuts — pure fixed
    # scheduler/checkpoint cost, because the iterating state is the
    # transition MODEL (<= |event_types + 3|^2 rows ~ 50, at ANY
    # corpus scale — it is an aggregate, not data). The event-log
    # collapse above stays the distributed pass; the fixpoint now
    # runs vectorized inside ONE single-group applyInPandas over the
    # model rows, replaying the identical integer-ppm floors
    # (acc DIV tot per step, the removal/share DIVs at the end) in
    # exact Python bigints — same values, one job instead of ~40.
    schema = (
        "channel string, p_base long, p_removed long, "
        "removal_ppm long, share_ppm long"
    )

    def _trunc_div(a: int, b: int) -> int:
        # Spark's DIV truncates toward zero (all quantities here are
        # non-negative in practice, where trunc == floor)
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def _solve(pdf):
        import pandas as pd

        cols = [
            "channel", "p_base", "p_removed", "removal_ppm",
            "share_ppm",
        ]
        trans = list(
            zip(
                pdf["src"].tolist(),
                pdf["dst"].tolist(),
                [int(c) for c in pdf["cnt"].tolist()],
                [int(t) for t in pdf["tot"].tolist()],
            )
        )
        states = sorted({s for s, _, _, _ in trans})
        if "start" not in states:
            return pd.DataFrame({c: [] for c in cols})
        tot_of = {s: t for s, _, _, t in trans}

        def absorb(variant):
            p = {s: 0 for s in states}
            for _ in range(_MK_ITERS):
                acc = dict.fromkeys(states, 0)
                for s, d, c, _t in trans:
                    if d == "conv":
                        v = 1_000_000
                    elif d == "null" or d == variant:
                        v = 0
                    else:
                        v = p.get(d, 0)
                    acc[s] += c * v
                p = {
                    s: (0 if s == variant else acc[s] // tot_of[s])
                    for s in states
                }
            return p["start"]

        p_base = absorb("base")
        rows = []
        for ch in _MK_CHANNELS:
            pr = absorb(ch)
            rows.append(
                (
                    ch,
                    pr,
                    _trunc_div((p_base - pr) * 1_000_000, max(p_base, 1)),
                )
            )
        s_rem = sum(r[2] for r in rows)
        return pd.DataFrame(
            [
                (
                    ch,
                    p_base,
                    pr,
                    rm,
                    _trunc_div(rm * 1_000_000, max(s_rem, 1)),
                )
                for ch, pr, rm in rows
            ],
            columns=cols,
        )

    return counts.groupBy(F.lit(1).alias("_g")).applyInPandas(
        _solve, schema
    )


# --- inter-arrival burstiness (bursty vs periodic users) ------------


@query(
    "interarrival_burstiness",
    oracle="""
WITH g AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS gap_s
  FROM events WHERE ts IS NOT NULL
),
s AS (
  SELECT user_id,
         CAST(count(gap_s) AS BIGINT) AS n,
         CAST(sum(gap_s) AS BIGINT) AS sx,
         CAST(sum(gap_s * gap_s) AS BIGINT) AS sxx
  FROM g GROUP BY user_id
  HAVING count(gap_s) >= 2
)
SELECT user_id, n,
       CAST(sx // n AS BIGINT) AS mean_gap_s,
       CAST(floor(
         (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) - CAST(sx AS DOUBLE))
         * 1000000
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) + CAST(sx AS DOUBLE))
       ) AS BIGINT) AS burstiness_ppm
FROM s
""",
)
def interarrival_burstiness(spark, sf_dir):
    """Per-user burstiness of event inter-arrival gaps (Goh-Barabasi
    B = (sigma - mu)/(sigma + mu), here computed scale-free as
    (n*sigma' - sx)/(n*sigma' + sx) with sigma' = sqrt(n*sxx - sx^2)
    so only exact integer moments enter): B -> -1 is a metronome,
    B ~ 0 is Poisson, B -> +1 is maximally bursty — the
    temporal-shape feature that separates scripted/bot traffic
    (periodic) from humans (bursty) when volumes look identical.
    Gaps are whole SECONDS (microsecond gaps squared overflow
    BIGINT over a 30-day horizon; event spacing here is minutes, so
    nothing real is lost). One lag window + one per-user moment
    rollup; a single correctly-rounded sqrt per user."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.expr("ts DIV 1000000000")
            - F.lag(F.expr("ts DIV 1000000000")).over(w)
        ).alias("gap_s"),
    )
    s = (
        g.groupBy("user_id")
        .agg(
            F.count("gap_s").cast("long").alias("n"),
            F.sum("gap_s").cast("long").alias("sx"),
            F.sum(F.col("gap_s") * F.col("gap_s"))
            .cast("long")
            .alias("sxx"),
        )
        .filter(F.col("n") >= 2)
    )
    sig = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    return s.select(
        "user_id",
        "n",
        F.expr("CAST(sx DIV n AS BIGINT)").alias("mean_gap_s"),
        F.floor(
            (sig - F.col("sx").cast("double"))
            * 1000000
            / (sig + F.col("sx").cast("double"))
        ).cast("long").alias("burstiness_ppm"),
    )
