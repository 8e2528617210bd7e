"""Temporal-join queries: as-of join and range join over `events`.

Beyond-reference capability (SURVEY.md §2.3 lists temporal joins as
absent). The DuckDB oracles use DuckDB's *native* ``ASOF JOIN`` and a
plain inequality join respectively — i.e. the Spark operators'
shuffle-friendly plans are checked against an independent reference
implementation of the same semantics, not a transliteration.

`events.ts` is epoch-ns LongType on the Spark side (normalized by
helpers.load whatever the parquet physical type) and a native
timestamp in DuckDB; outputs go through epoch-us integers so both
engines hash the same values.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from advisorydatapipeline_spark.operators.temporal import (
    asof_join,
    asof_join_forward,
    merge_intervals,
    range_join_binned,
)
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

RANGE_WIDTH_NS = 30 * 60 * 1_000_000_000  # 30 minutes


@query(
    "asof_join_last_view",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'view' AND ts IS NOT NULL
),
v1 AS (SELECT user_id, ts, event_id, value FROM v WHERE rn = 1)
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS purchase_ts_us,
       v1.event_id AS view_event_id,
       epoch_us(v1.ts) AS view_ts_us,
       v1.value AS view_value
FROM p ASOF LEFT JOIN v1
  ON p.user_id = v1.user_id AND p.ts >= v1.ts
""",
)
def asof_join_last_view(spark, sf_dir):
    """For every purchase, the user's most recent view at-or-before it
    (union + last-ignorenulls window plan: ONE shuffle on user_id,
    no inequality join)."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id"), "value"
    )
    out = asof_join(
        p, v, ["user_id"], "ts", "ts",
        ["view_event_id", "value"], tiebreak="view_event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.expr("ts DIV 1000").alias("purchase_ts_us"),
        F.col("view_event_id_r").alias("view_event_id"),
        F.expr("ts_r DIV 1000").alias("view_ts_us"),
        F.col("value_r").alias("view_value"),
    )


@query(
    "range_join_views_before_purchase",
    oracle=f"""
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL 30 MINUTE
 AND v.ts <= p.ts
""",
)
def range_join_views_before_purchase(spark, sf_dir):
    """All views within the 30 min before each purchase, same user —
    binned range join (equi-join on (user, time-bucket) with the right
    side replicated x2, then exact filter): hash-join cost instead of
    the nested-loop plan a naive inequality join produces."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("ts").alias("v_ts"),
    )
    out = range_join_binned(p, v, ["user_id"], "p_ts", "v_ts", RANGE_WIDTH_NS)
    return out.select(
        "purchase_id",
        "view_id",
        "user_id",
        # truncate each ts to us *before* differencing — matches the
        # oracle's epoch_us(p.ts) - epoch_us(v.ts) when sub-us digits
        # straddle a boundary
        F.expr("p_ts DIV 1000 - v_ts DIV 1000").alias("gap_us"),
    )


from advisorydatapipeline_spark.registry import ORACLES  # noqa: E402


@query("asof_join_cogrouped", oracle=ORACLES["asof_join_last_view"])
def asof_join_cogrouped(spark, sf_dir):
    """Cogroup API surface: the as-of join as
    ``groupBy(bucket).cogroup(...).applyInPandas`` with a vectorized
    per-user backward as-of inside the body — same oracle as the
    native union+window twin (`asof_join_last_view`), proving the
    cogrouped path value-identical. The native twin is the hot path;
    this covers the escape hatch for per-key logic Spark expressions
    can't say.

    Precision notes: null-ts purchases are split out Spark-side
    (pandas would coerce the int64 ns column to float64, whose ulp at
    1.7e18 is 256 ns); inside pandas, ns timestamps stay int64
    end-to-end (numpy lexsort/cumsum; nothing rides a NaN-able float
    column) and the match columns come back as nullable Int64.

    Perf (r15 optimization round, guide §4.1/§4.2): cogrouping on the
    raw user key invoked the body once per user (~1,500 Arrow
    group-exchanges here, and billions at 100 TB — per-GROUP protocol
    overhead is the wall time once AQE coalesces the tiny shuffle to
    ~2 tasks; 8.2 s at freeze). The cogroup key is now
    ``pmod(hash(user_id), buckets)`` with buckets = 8x default
    parallelism (scale-adaptive: group count tracks the cluster, not
    the user cardinality), and the body does ALL its users in one
    vectorized pass: lexsort by (user, ts, event_id) + last-per-(user,
    ts) mask dedupes the tiebreak, then a views-count cumsum per user
    segment resolves each purchase's rightmost view at-or-before it
    (inclusive: views sort before purchases at equal ts). Replaced
    ``pd.merge_asof`` + ``sort_values`` + ``drop_duplicates`` per
    user. Identical values at every bucket count."""
    import numpy as np
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = (
        ev.filter(
            (F.col("event_type") == "view") & F.col("ts").isNotNull()
        )
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("view_event_id"),
            F.col("value").alias("view_value"),
        )
    )
    p_ok = p.filter(F.col("ts").isNotNull())
    p_null = p.filter(F.col("ts").isNull())

    n_buckets = spark.sparkContext.defaultParallelism * 8
    bucket = F.pmod(F.hash("user_id"), F.lit(n_buckets))

    schema = (
        "event_id long, user_id long, purchase_ts_us long, "
        "view_event_id long, view_ts_us long, view_value double"
    )

    def merge(pdf_p: pd.DataFrame, pdf_v: pd.DataFrame) -> pd.DataFrame:
        cols = [
            "event_id", "user_id", "purchase_ts_us",
            "view_event_id", "view_ts_us", "view_value",
        ]
        np_ = len(pdf_p)
        if np_ == 0:
            return pd.DataFrame({c: [] for c in cols})
        p_uid = pdf_p["user_id"].to_numpy()
        p_ts = pdf_p["ts"].to_numpy()
        out = {
            "event_id": pdf_p["event_id"].to_numpy(),
            "user_id": p_uid,
            "purchase_ts_us": p_ts // 1000,
        }
        if len(pdf_v) == 0:
            na = pd.array([pd.NA] * np_, dtype="Int64")
            out["view_event_id"] = na
            out["view_ts_us"] = na
            out["view_value"] = np.full(np_, np.nan)
            return pd.DataFrame(out)[cols]
        # views: sort by (user, ts, event_id), keep LAST per (user, ts)
        # = max-view_event_id tiebreak at equal ts
        v_uid = pdf_v["user_id"].to_numpy()
        v_ts = pdf_v["ts"].to_numpy()
        v_eid = pdf_v["view_event_id"].to_numpy()
        vo = np.lexsort((v_eid, v_ts, v_uid))
        v_uid, v_ts, v_eid = v_uid[vo], v_ts[vo], v_eid[vo]
        v_val = pdf_v["view_value"].to_numpy()[vo]
        keep = np.empty(len(v_ts), dtype=bool)
        keep[:-1] = (v_uid[:-1] != v_uid[1:]) | (v_ts[:-1] != v_ts[1:])
        keep[-1] = True
        v_uid, v_ts = v_uid[keep], v_ts[keep]
        v_eid, v_val = v_eid[keep], v_val[keep]
        # merged order: views before purchases at equal (user, ts)
        # (inclusive as-of), purchases carry their output row index
        kind = np.concatenate(
            [np.zeros(len(v_ts), np.int8), np.ones(np_, np.int8)]
        )
        m_uid = np.concatenate([v_uid, p_uid])
        m_ts = np.concatenate([v_ts, p_ts])
        mo = np.lexsort((kind, m_ts, m_uid))
        kind, m_uid = kind[mo], m_uid[mo]
        # cs[i] = number of view rows at combined positions < i... <= i
        # (inclusive cumsum); the matched view's GLOBAL index in the
        # deduped view arrays is cs[i] - 1 — valid only if this user's
        # segment contributed at least one view before position i
        cs = np.cumsum(kind == 0)
        seg_first = np.concatenate(
            ([True], m_uid[1:] != m_uid[:-1])
        )
        seg_id = np.cumsum(seg_first) - 1
        # views of users sorting before this user = cs at segment
        # start minus that first row's own contribution
        first_ix = np.flatnonzero(seg_first)
        base = (cs[first_ix] - (kind[first_ix] == 0))[seg_id]
        is_p = kind == 1
        p_out_ix = mo[is_p] - len(v_ts)  # row index into pdf_p order
        g = cs[is_p] - 1
        ok = (cs[is_p] - base[is_p]) >= 1
        ixc = np.where(ok, g, 0)
        vei = pd.array(v_eid[ixc], dtype="Int64")
        vei[~ok] = pd.NA
        vtu = pd.array(v_ts[ixc] // 1000, dtype="Int64")
        vtu[~ok] = pd.NA
        inv = np.empty(np_, dtype=np.int64)
        inv[p_out_ix] = np.arange(np_)
        out["view_event_id"] = vei[inv]
        out["view_ts_us"] = vtu[inv]
        out["view_value"] = np.where(
            ok, v_val[ixc].astype(np.float64), np.nan
        )[inv]
        return pd.DataFrame(out)[cols]

    matched = (
        p_ok.withColumn("b", bucket)
        .groupBy("b")
        .cogroup(v.withColumn("b", bucket).groupBy("b"))
        .applyInPandas(merge, schema)
    )
    unmatched = p_null.select(
        "event_id",
        "user_id",
        F.lit(None).cast("long").alias("purchase_ts_us"),
        F.lit(None).cast("long").alias("view_event_id"),
        F.lit(None).cast("long").alias("view_ts_us"),
        F.lit(None).cast("double").alias("view_value"),
    )
    return matched.unionByName(unmatched)


SESSION_GAP_US = 3_600 * 1_000_000  # mirrors session_window_api


@query(
    "session_membership_join",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {SESSION_GAP_US}
                OR lag(epoch_us(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), sess_rows AS (
  SELECT user_id, ts_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
), sessions AS (
  SELECT user_id,
         min(ts_us) AS session_start_us,
         max(ts_us) + {SESSION_GAP_US} AS session_end_us
  FROM sess_rows GROUP BY user_id, sid
)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       s.session_start_us, s.session_end_us
FROM events e
JOIN sessions s
  ON s.user_id = e.user_id
 AND epoch_us(e.ts) >= s.session_start_us
 AND epoch_us(e.ts) <  s.session_end_us
WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL
""",
)
def session_membership_join(spark, sf_dir):
    """Variable-width interval-cover join under the gate: every
    purchase is joined to the session window containing it. Sessions
    come from the declarative `F.session_window` aggregate (variable
    span per session); the join is `interval_cover_join` — each
    session replicated across the 1-hour bins it covers, purchases
    equi-joined on (user, bin), exact-filtered — a hash join where
    the naive plan is a BroadcastNestedLoopJoin inequality. The
    oracle replays sessionization + inequality join in SQL."""
    from advisorydatapipeline_spark.operators.temporal import (
        interval_cover_join,
    )

    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    with_time = ev.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts DIV 1000"))
    )
    sessions = (
        with_time.groupBy(
            F.session_window("event_time", "1 hour").alias("win"), "user_id"
        )
        .agg(F.count("*").alias("_n"))
        .select(
            "user_id",
            F.unix_micros("win.start").alias("session_start_us"),
            F.unix_micros("win.end").alias("session_end_us"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("ts_us")
    )
    return interval_cover_join(
        purchases,
        sessions,
        ["user_id"],
        "ts_us",
        "session_start_us",
        "session_end_us",
        SESSION_GAP_US,
    ).select(
        "event_id", "user_id", "ts_us", "session_start_us", "session_end_us"
    )


@query(
    "seasonal_dow_indices",
    oracle="""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(dayofweek(o_orderdate) AS INT) % 7 AS dow,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
),
base AS (
  SELECT CAST(avg(rev) AS DOUBLE) AS overall FROM daily
)
SELECT dow,
       CAST(count(*) AS BIGINT) AS n_days,
       sum(rev) / count(*) AS dow_mean,
       (sum(rev) / count(*)) / b.overall AS seasonal_index
FROM daily, base b
GROUP BY dow, b.overall
""",
)
def seasonal_dow_indices(spark, sf_dir):
    """Time-series seasonal decomposition, the multiplicative
    day-of-week component: per-dow mean daily revenue over the overall
    mean (index > 1 = busy weekday). Two partial-agg shuffles (daily
    rollup, then 7-row dow rollup) + a broadcast 1-row overall scalar
    — the seasonal-baseline job every forecasting pipeline runs before
    fitting residuals (detrended twin: forecast_revenue_band;
    anomaly twin: zscore_anomalies). dow normalized 0=Sunday on both
    engines."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").alias("d"),
        ((F.dayofweek("o_orderdate") - 1) % 7).cast("int").alias("dow"),
    ).agg(F.sum("o_totalprice").alias("rev"))
    base = daily.agg(F.avg("rev").cast("double").alias("overall"))
    return (
        daily.crossJoin(F.broadcast(base))
        .groupBy("dow", "overall")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            (F.sum("rev") / F.count("*")).alias("dow_mean"),
        )
        .select(
            "dow",
            "n_days",
            "dow_mean",
            (F.col("dow_mean") / F.col("overall")).alias("seasonal_index"),
        )
    )


@query(
    "interval_merge_coverage",
    oracle="""
WITH iv AS (
  SELECT l_suppkey, l_orderkey, l_linenumber,
         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           AS start_day,
         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           + CAST(floor(l_quantity) AS BIGINT) AS end_day
  FROM lineitem
),
flagged AS (
  SELECT l_suppkey, l_orderkey, l_linenumber, start_day, end_day,
         CASE WHEN max(end_day) OVER (
                PARTITION BY l_suppkey
                ORDER BY start_day, end_day, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR start_day > max(end_day) OVER (
                PARTITION BY l_suppkey
                ORDER BY start_day, end_day, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
         THEN 1 ELSE 0 END AS new_island
  FROM iv
),
numbered AS (
  SELECT l_suppkey, start_day, end_day,
         sum(new_island) OVER (
           PARTITION BY l_suppkey
           ORDER BY start_day, end_day, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS island_id
  FROM flagged
),
islands AS (
  SELECT l_suppkey, island_id,
         min(start_day) AS isl_start, max(end_day) AS isl_end,
         count(*) AS n_intervals
  FROM numbered GROUP BY l_suppkey, island_id
)
SELECT l_suppkey,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(n_intervals) AS BIGINT) AS n_intervals,
       CAST(sum(isl_end - isl_start) AS BIGINT) AS covered_days
FROM islands GROUP BY l_suppkey
""",
)
def interval_merge_coverage(spark, sf_dir):
    """Gaps-and-islands interval merge: each lineitem contributes a
    supplier-busy interval [ship_day, ship_day + quantity days];
    overlapping/touching intervals per supplier merge into islands,
    reported as per-supplier island count + covered days. ONE shuffle
    on l_suppkey, window + partial-agg — the quadratic interval-
    overlap join never appears (see operators/temporal.py
    merge_intervals). The DuckDB oracle recomputes the same islands
    independently. Both window passes (flag + running sum) use the
    SAME total order ending in (l_orderkey, l_linenumber) — with
    duplicate (start,end) rows at an island boundary, a shorter sort
    key could swap a flag-0 row ahead of its island's flag-1 row and
    bridge a real gap.
    """
    epoch = F.lit("1970-01-01").cast("date")
    iv = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.datediff(F.to_date("l_shipdate"), epoch).alias("start_day"),
            # floor-then-cast: a bare double->BIGINT cast ROUNDS in
            # DuckDB but truncates in Spark; floor() pins both (the
            # data is integer-valued today, but the guard is free)
            (
                F.datediff(F.to_date("l_shipdate"), epoch)
                + F.expr("CAST(floor(l_quantity) AS BIGINT)")
            ).alias("end_day"),
        )
    )
    islands = merge_intervals(
        iv, ["l_suppkey"], "start_day", "end_day",
        ["l_orderkey", "l_linenumber"],
    )
    return islands.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_intervals").alias("n_intervals"),
        F.sum(F.col("isl_end") - F.col("isl_start")).alias("covered_days"),
    )


@query(
    "asof_join_next_purchase",
    oracle="""
WITH v AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
),
p1 AS (SELECT user_id, ts, event_id, value FROM p WHERE rn = 1)
SELECT v.event_id, v.user_id,
       epoch_us(v.ts) AS view_ts_us,
       p1.event_id AS purchase_event_id,
       epoch_us(p1.ts) AS purchase_ts_us,
       p1.value AS purchase_value
FROM v ASOF LEFT JOIN p1
  ON v.user_id = p1.user_id AND v.ts <= p1.ts
""",
)
def asof_join_next_purchase(spark, sf_dir):
    """FORWARD as-of join: for every view, the user's next purchase
    at-or-after it (pandas merge_asof direction='forward'; DuckDB's
    native forward ASOF is the oracle). Time-negation reuse of the
    backward union+window plan — see operators/temporal.py
    asof_join_forward; same single shuffle, no inequality join."""
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        "value",
    )
    out = asof_join_forward(
        v, p, ["user_id"], "ts", "ts",
        ["purchase_event_id", "value"], tiebreak="purchase_event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.expr("ts DIV 1000").alias("view_ts_us"),
        F.col("purchase_event_id_r").alias("purchase_event_id"),
        F.expr("ts_r DIV 1000").alias("purchase_ts_us"),
        F.col("value_r").alias("purchase_value"),
    )


@query(
    "asof_join_nearest_purchase",
    oracle="""
WITH c AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL
),
p AS (
  SELECT user_id, ts, event_id,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
),
p1 AS (SELECT user_id, ts, event_id FROM p WHERE rn = 1),
b AS (
  SELECT c.event_id, c.user_id, c.ts,
         p1.event_id AS b_id, p1.ts AS b_ts
  FROM c ASOF LEFT JOIN p1
    ON c.user_id = p1.user_id AND c.ts >= p1.ts
),
f AS (
  SELECT c.event_id, p1.event_id AS f_id, p1.ts AS f_ts
  FROM c ASOF LEFT JOIN p1
    ON c.user_id = p1.user_id AND c.ts <= p1.ts
)
SELECT b.event_id, b.user_id, epoch_us(b.ts) AS click_ts_us,
       CASE
         WHEN b_ts IS NULL THEN f_id
         WHEN f_ts IS NULL THEN b_id
         WHEN epoch_us(b.ts) - epoch_us(b_ts)
              <= epoch_us(f_ts) - epoch_us(b.ts) THEN b_id
         ELSE f_id
       END AS purchase_event_id,
       CASE
         WHEN b_ts IS NULL THEN epoch_us(f_ts) - epoch_us(b.ts)
         WHEN f_ts IS NULL THEN epoch_us(b.ts) - epoch_us(b_ts)
         ELSE least(epoch_us(b.ts) - epoch_us(b_ts),
                    epoch_us(f_ts) - epoch_us(b.ts))
       END AS gap_us
FROM b JOIN f ON b.event_id = f.event_id
""",
)
def asof_join_nearest_purchase(spark, sf_dir):
    """NEAREST as-of join (pandas merge_asof direction='nearest',
    ties -> backward): each click matched to the user's closest
    purchase in either time direction. Composition of the backward
    and forward union+window operators joined on the unique left
    event id — still zero inequality joins; the oracle runs BOTH
    native DuckDB ASOF directions and replays the same
    closest-with-backward-ties choice. Gap arithmetic truncates each
    ts to us before differencing, matching the oracle's
    epoch_us-based gaps."""
    ev = load(spark, sf_dir, "events")
    c = ev.filter(
        (F.col("event_type") == "click") & F.col("ts").isNotNull()
    ).select("event_id", "user_id", "ts")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("pid")
    )
    b = asof_join(
        c, p, ["user_id"], "ts", "ts", ["pid"], tiebreak="pid"
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("pid_r").alias("b_id"),
        F.col("ts_r").alias("b_ts"),
    )
    f = asof_join_forward(
        c, p, ["user_id"], "ts", "ts", ["pid"], tiebreak="pid"
    ).select(
        "event_id",
        F.col("pid_r").alias("f_id"),
        F.col("ts_r").alias("f_ts"),
    )
    j = b.join(f, "event_id")
    gb = F.expr("ts DIV 1000 - b_ts DIV 1000")
    gf = F.expr("f_ts DIV 1000 - ts DIV 1000")
    return j.select(
        "event_id",
        "user_id",
        F.expr("ts DIV 1000").alias("click_ts_us"),
        F.when(F.col("b_ts").isNull(), F.col("f_id"))
        .when(F.col("f_ts").isNull(), F.col("b_id"))
        .when(gb <= gf, F.col("b_id"))
        .otherwise(F.col("f_id"))
        .alias("purchase_event_id"),
        F.when(F.col("b_ts").isNull(), gf)
        .when(F.col("f_ts").isNull(), gb)
        .otherwise(F.least(gb, gf))
        .alias("gap_us"),
    )


@query(
    "interval_concurrency_curve",
    oracle="""
WITH iv AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           AS start_day,
         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           + CAST(floor(l_quantity) AS BIGINT) AS end_day
  FROM lineitem
),
deltas AS (
  SELECT start_day AS day, CAST(count(*) AS BIGINT) AS delta FROM iv
  GROUP BY 1
  UNION ALL
  SELECT end_day + 1 AS day, -CAST(count(*) AS BIGINT) AS delta FROM iv
  GROUP BY 1
),
curve AS (
  SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM deltas GROUP BY 1
)
SELECT day,
       CAST(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS n_active
FROM curve
""",
)
def interval_concurrency_curve(spark, sf_dir):
    """Sweep-line concurrency curve: how many supplier-busy
    intervals (ship_day .. ship_day + quantity, as in
    interval_merge_coverage) are active on each boundary day — the
    resource-utilization question behind capacity planning, answered
    WITHOUT expanding intervals to their days. Each interval becomes
    two deltas (+1 at start, -1 past end), deltas partial-agg to one
    row per boundary day, and a single running sum rebuilds the
    curve: shuffle volume is 2x intervals collapsing to |distinct
    days|, never interval-length-dependent. The global running sum
    orders by day — at scale a range-partitioned prefix-sum; here
    the curve table is tiny."""
    epoch = F.lit("1970-01-01").cast("date")
    iv = load(spark, sf_dir, "lineitem").select(
        F.datediff(F.to_date("l_shipdate"), epoch).alias("start_day"),
        (
            F.datediff(F.to_date("l_shipdate"), epoch)
            + F.expr("CAST(floor(l_quantity) AS BIGINT)")
        ).alias("end_day"),
    )
    starts = iv.groupBy(F.col("start_day").alias("day")).agg(
        F.count(F.lit(1)).alias("delta")
    )
    ends = iv.groupBy((F.col("end_day") + 1).alias("day")).agg(
        (-F.count(F.lit(1))).alias("delta")
    )
    curve = (
        starts.unionByName(ends)
        .groupBy("day")
        .agg(F.sum("delta").alias("net"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return curve.select(
        "day", F.sum("net").over(w).alias("n_active")
    )
