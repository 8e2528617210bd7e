"""Wider analytics surface: JSON extraction, pivot, analytic window
family (lag/running frames).

All beyond-reference (SURVEY.md lists no JSON scalar functions §2.8,
no pivot §2.4, and no analytic windows §2.5) — table stakes for an
analytics engine, each oracle-checked.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
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
    "variant_extract_props",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(NULL AS BIGINT) AS missing_field,
       CAST(CASE WHEN json_extract(props, '$.k') IS NOT NULL
            THEN 1 ELSE 0 END AS INTEGER) AS has_k
FROM events
WHERE props IS NOT NULL
""",
)
def variant_extract_props(spark, sf_dir):
    """Spark 4 VARIANT surface (the json_extract_props twin on the
    native semi-structured type): ``parse_json`` once into a VARIANT
    column, then typed access via ``variant_get`` and null-safe
    ``try_variant_get`` on a missing path. VARIANT is the scale
    answer for ragged JSON — one binary parse per row, typed
    shredded access downstream, no per-access string re-parse like
    repeated get_json_object calls."""
    ev = load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.try_variant_get(v, "$.missing", "long").alias("missing_field"),
        F.when(k.isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("has_k"),
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
    "unpivot_event_matrix",
    oracle="""
WITH u AS (SELECT DISTINCT user_id FROM events),
t(event_type) AS (
  VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')
),
c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT u.user_id, t.event_type,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM u CROSS JOIN t
LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
""",
)
def unpivot_event_matrix(spark, sf_dir):
    """``unpivot``/melt surface: the wide user x event-type matrix
    from the pivot twin folded back to long form — wide-to-long is
    how feature matrices return to a joinable shape. Dense by
    construction (every user carries all 5 type rows, zeros where the
    pair never occurred), which the oracle mirrors with a
    dim-cross-join; the unpivot itself is narrow (row-local
    transpose, no shuffle beyond the pivot's)."""
    wide = pivot_event_matrix(spark, sf_dir)
    return wide.unpivot(
        "user_id", list(EVENT_TYPES), "event_type", "n_events"
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


@query(
    "distinct_agg_counts",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
""",
)
def distinct_agg_counts(spark, sf_dir):
    """Grouped COUNT(DISTINCT) (absent in the reference, §2.4) —
    plans as a two-phase expand/aggregate; at 100 TB swap to
    approx_count_distinct when a ~2% error is acceptable (HLL++ avoids
    the per-group distinct state entirely)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "datetime_derivations",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(month(o_orderdate) AS INT) AS mth,
       CAST(dayofweek(o_orderdate) AS INT) % 7 AS dow,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
""",
)
def datetime_derivations(spark, sf_dir):
    """Calendar scalar functions (absent in-engine in the reference,
    §2.8 — it compares ISO strings lexically). dayofweek is normalized
    to 0..6-Sunday-0 on both engines (Spark is 1-based Sunday-1,
    DuckDB 0-based Sunday-0)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mth"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


def blocked_fuzzy_pairs(parts: DataFrame) -> DataFrame:
    """Blocked fuzzy matching over a (p_partkey, p_name) relation:
    equi-join on the first-word block, then exact Levenshtein <= 2
    inside the block — the classic entity-resolution plan (blocking
    bounds the quadratic step; the expensive distance runs only on
    block-local pairs). Aggregated to per-block pair counts."""
    c = parts.select(
        "p_partkey",
        F.lower("p_name").alias("nm"),
        F.split(F.lower("p_name"), " ").getItem(0).alias("blk"),
    )
    # second blocking key: levenshtein(a,b) <= 2 implies
    # |len(a)-len(b)| <= 2, so replicating one side across its 5
    # admissible lengths and joining on (blk, length) is EXACTLY the
    # same result set as the plain block join + filter — but join
    # groups shrink from |block|^2 to per-length cells (the oracle
    # keeps the plain formulation; semantics, not plans, must match).
    # two more exact-preserving cuts: (a) an identical common prefix
    # never changes edit distance, and every in-block name starts
    # with <blk> — strip exactly len(blk) chars and compare the
    # remainders (the separating space stays IN the remainder: a
    # single-token name's remainder is '', and dropping the space
    # from the other side would undercount the distance by 1);
    # (b) the thresholded levenshtein(x, y, 2) banded form is
    # O(len * k) instead of O(len^2) and returns -1 past the bound.
    c = c.withColumn("rest", F.expr("substring(nm, length(blk) + 1)"))
    a = c.select(
        F.col("p_partkey").alias("id_a"),
        F.col("rest").alias("rest_a"),
        "blk",
        F.length("nm").alias("lkey"),
    )
    lb = F.length("nm")
    b = c.select(
        F.col("p_partkey").alias("id_b"),
        F.col("rest").alias("rest_b"),
        "blk",
        F.explode(
            F.array(lb - 2, lb - 1, lb, lb + 1, lb + 2)
        ).alias("lkey"),
    )
    # CPU/bytes mismatch guard: a 20k-row part file arrives as ONE
    # split, and a broadcast join would then BUILD all ~24M candidate
    # pairs (and run their levenshteins) inside that single task.
    # Pre-shuffling both sides on the join key spreads pair
    # construction + distance across the cluster — the input is KB,
    # the pair stage is the real work (measured 13.7s -> 2.3s at
    # sf0.1, 32 cores).
    nparts = parts.sparkSession.sparkContext.defaultParallelism
    a = a.repartition(nparts, "blk", "lkey")
    b = b.repartition(nparts, "blk", "lkey")
    return (
        a.join(b, ["blk", "lkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("rest_a", "rest_b", 2))
        .filter(F.col("dist") >= 0)
        .groupBy("blk", "dist")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "fuzzy_name_pairs",
    oracle="""
WITH c AS (
  SELECT p_partkey, lower(p_name) AS nm,
         split_part(lower(p_name), ' ', 1) AS blk
  FROM part
),
pairs AS (
  SELECT a.blk, CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
  FROM c a JOIN c b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
  WHERE levenshtein(a.nm, b.nm) <= 2
)
SELECT blk, dist, CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY blk, dist
""",
)
def fuzzy_name_pairs(spark, sf_dir):
    """See :func:`blocked_fuzzy_pairs` (registered wrapper)."""
    return blocked_fuzzy_pairs(load(spark, sf_dir, "part"))


@query(
    "sketch_aggregates",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS est_ok
FROM events
GROUP BY event_type
""",
)
def sketch_aggregates(spark, sf_dir):
    """Sketch aggregates — the 100 TB path for cardinality and
    quantiles: HLL++ approximate distinct (constant memory per group,
    2% rsd) and approx_percentile (mergeable quantile sketch) next to
    the exact twins. Estimator internals are engine-specific, so raw
    estimates cannot hash-match DuckDB; instead the gate hashes the
    exact count plus a tolerance CLAIM (same contract as
    `hll_shard_union`): distinct estimate within 5%, quantile
    estimates within the [p25, p100] exact bracket around each target
    quantile — if either estimator drifts, `est_ok` flips and the row
    stops matching."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.expr(
            "approx_percentile(value, array(0.5, 0.95, 0.99), 10000)"
        ).alias("vq"),
        F.percentile("value", F.lit(0.25)).alias("_p25"),
        F.percentile("value", F.lit(0.5)).alias("_p50"),
        F.percentile("value", F.lit(0.95)).alias("_p95"),
        F.max("value").alias("_pmax"),
    )
    dist_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= 0.05 * F.col("exact_users")
    )
    q_ok = (
        (F.col("vq")[0] >= F.col("_p25"))
        & (F.col("vq")[0] <= F.col("_p95"))
        & (F.col("vq")[1] >= F.col("_p50"))
        & (F.col("vq")[1] <= F.col("_pmax"))
        & (F.col("vq")[2] >= F.col("_p50"))
        & (F.col("vq")[2] <= F.col("_pmax"))
    )
    return agg.select(
        "event_type",
        "exact_users",
        (dist_ok & q_ok).alias("est_ok"),
    )


@query(
    "udaf_quantized_sum",
    oracle="""
SELECT event_type,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS qvalue_sum,
       CAST(count(value) AS BIGINT) AS n
FROM events
GROUP BY event_type
""",
)
def udaf_quantized_sum(spark, sf_dir):
    """Custom UDAF surface: a pandas grouped-agg UDF (Arrow-batched,
    one call per group partition — the vectorized way to express an
    aggregate Spark lacks). Integer quantization (floor(x*100), exact
    in IEEE doubles both engines) makes the Python-side sum
    bit-identical to the SQL oracle — proving the UDAF path is
    value-correct, not just runnable. The built-in-expression twin of
    this aggregation is `pricing_summary`'s decimal-sum pattern."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def qsum(v: pd.Series) -> int:
        import numpy as np

        return int(np.floor(v.dropna() * 100).astype("int64").sum())

    @pandas_udf("long")
    def nnotnull(v: pd.Series) -> int:
        return int(v.notna().sum())

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        qsum("value").alias("qvalue_sum"), nnotnull("value").alias("n")
    )


US_DAY_SKETCH = 86_400 * 1_000_000


@query(
    "hll_shard_union",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS est_ok
FROM events
WHERE user_id IS NOT NULL
GROUP BY event_type
""",
)
def hll_shard_union(spark, sf_dir):
    """Mergeable-sketch distinct counting, the 100 TB pattern: build
    one Datasketches HLL per (day, event_type) SHARD — in production
    these are precomputed once per ingested partition and persisted a
    few KB each — then answer the cross-period question by UNIONING
    sketches (`hll_union_agg`), never re-shuffling raw keys. The gate
    hashes the exact count plus an `est_ok` tolerance claim: if the
    sketch-union estimate ever strays >5% from the exact distinct
    count, the row stops matching the oracle. lgConfigK=14 -> ~0.8%
    rsd, far inside the asserted 5%."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    daily = ev.select(
        "event_type",
        F.expr(f"(ts DIV 1000) DIV {US_DAY_SKETCH}").alias("day"),
        "user_id",
    ).groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("est_ok"),
    )


@query(
    "theta_set_overlap",
    oracle="""
WITH c AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'click' AND user_id IS NOT NULL),
     p AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase' AND user_id IS NOT NULL)
SELECT CAST((SELECT count(*) FROM c JOIN p USING (user_id)) AS BIGINT)
         AS exact_both,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS exact_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS exact_purchase,
       TRUE AS est_ok
""",
)
def theta_set_overlap(spark, sf_dir):
    """Sketch SET ALGEBRA (what HLL cannot do): Theta sketches
    support intersection, so "distinct users who both clicked AND
    purchased" is answered from two per-segment sketches instead of a
    join over raw keys. At 100 TB each segment's sketch is built in
    its own shard pass and the intersection costs KBs. Same gated
    tolerance contract as `hll_shard_union` (theta intersections have
    looser error than unions; 10% asserted here over an ~exact regime
    — at these cardinalities lgNomEntries=12 keeps the sketch in
    exact mode, so the estimate is exact and the margin is slack)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isin("click", "purchase")
    )
    # two-level aggregation, ZERO joins: per-user segment flags (one
    # shuffle on user_id), then one global reduce computing exact
    # counts AND both theta sketches from the same per-user frame —
    # sketch insertion is idempotent, so the distinct-user sketch over
    # per-user rows equals the sketch over the raw stream.
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("has_c"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_p"),
    )
    c_user = F.when(F.col("has_c") == 1, F.col("user_id"))
    p_user = F.when(F.col("has_p") == 1, F.col("user_id"))
    row = per_user.agg(
        F.count(
            F.when((F.col("has_c") == 1) & (F.col("has_p") == 1), 1)
        ).cast("long").alias("exact_both"),
        F.count(c_user).cast("long").alias("exact_click"),
        F.count(p_user).cast("long").alias("exact_purchase"),
        F.theta_sketch_agg(c_user, F.lit(12)).alias("sk_c"),
        F.theta_sketch_agg(p_user, F.lit(12)).alias("sk_p"),
    )
    tol = 0.10
    return row.select(
        "exact_both",
        "exact_click",
        "exact_purchase",
        (
            (
                F.abs(
                    F.theta_sketch_estimate(
                        F.theta_intersection("sk_c", "sk_p")
                    )
                    - F.col("exact_both")
                )
                <= tol * F.greatest(F.col("exact_both"), F.lit(1))
            )
            & (
                F.abs(
                    F.theta_sketch_estimate("sk_c") - F.col("exact_click")
                )
                <= tol * F.col("exact_click")
            )
            & (
                F.abs(
                    F.theta_sketch_estimate("sk_p")
                    - F.col("exact_purchase")
                )
                <= tol * F.col("exact_purchase")
            )
        ).alias("est_ok"),
    )


@query(
    "zscore_anomalies",
    oracle="""
WITH stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(18,2))
                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2,
         CAST(count(value) AS BIGINT) AS n
  FROM events
  GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - s.s1 / s.n)
         / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)) AS zscore
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE abs((e.value - s.s1 / s.n)
          / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n))) > 3
""",
)
def zscore_anomalies(spark, sf_dir):
    """Per-group z-score outlier flags — the monitoring query over a
    metric stream. Moments come from EXACT decimal sums (sum, sum of
    squares), so mean/stddev are bit-identical across engines and
    partitionings; the per-row z and the |z|>3 cut are then plain IEEE
    arithmetic. One partial-agg shuffle for the 5-row stats dim,
    broadcast back onto the fact scan."""
    ev = load(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(18,2)")
    stats = ev.groupBy("event_type").agg(
        F.sum(d).cast("double").alias("s1"),
        F.sum(d * d).cast("double").alias("s2"),
        F.count("value").alias("n"),
    )
    mean = F.col("s1") / F.col("n")
    z = (F.col("value") - mean) / F.sqrt(
        F.col("s2") / F.col("n") - mean * mean
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 3)
        .select("event_id", "event_type", "value", "zscore")
    )


@query(
    "scd2_intervals",
    oracle="""
SELECT user_id, event_type,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER (
         PARTITION BY user_id, event_type ORDER BY ts, event_id
       ) AS valid_to_us,
       CAST(lead(epoch_us(ts)) OVER (
         PARTITION BY user_id, event_type ORDER BY ts, event_id
       ) IS NULL AS BOOLEAN) AS is_current,
       value
FROM events
WHERE ts IS NOT NULL
""",
)
def scd2_intervals(spark, sf_dir):
    """SCD2 interval construction: each change record's validity
    window [valid_from, valid_to) comes from lead() over the change
    stream per key — the standard dimension-history build, one window
    shuffle, no self-join. Open intervals (lead IS NULL) are the
    current rows."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    nxt = F.lead(F.expr("ts DIV 1000")).over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.expr("ts DIV 1000").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        "value",
    )


@query(
    "group_normalized_features",
    oracle="""
WITH stats AS (
  SELECT l_returnflag,
         MIN(l_quantity) AS q_min,
         MAX(l_quantity) AS q_max,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_quantity,
       (l.l_quantity - s.q_min) / (s.q_max - s.q_min) AS qty_minmax,
       (l.l_quantity - s.s1 / s.n)
         / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)) AS qty_z
FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
""",
)
def group_normalized_features(spark, sf_dir):
    """Per-group feature scaling (min-max + z-score) — the standard
    feature-engineering pass before model training. Group moments come
    from ONE partial-aggregated shuffle producing a 3-row stats dim
    that broadcasts back onto the fact scan; a window over the raw
    groups would instead sort 100 TB inside 3 giant partitions.
    Moments use exact decimal sums (repo-wide rule) so mean/stddev —
    and therefore every normalized value — are bit-identical across
    engines and partitionings."""
    li = load(spark, sf_dir, "lineitem")
    d = F.col("l_quantity").cast("decimal(18,2)")
    stats = li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("q_min"),
        F.max("l_quantity").alias("q_max"),
        F.sum(d).cast("double").alias("s1"),
        F.sum(d * d).cast("double").alias("s2"),
        F.count("*").alias("n"),
    )
    mean = F.col("s1") / F.col("n")
    z = (F.col("l_quantity") - mean) / F.sqrt(
        F.col("s2") / F.col("n") - mean * mean
    )
    return (
        li.join(F.broadcast(stats), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_quantity",
            (
                (F.col("l_quantity") - F.col("q_min"))
                / (F.col("q_max") - F.col("q_min"))
            ).alias("qty_minmax"),
            z.alias("qty_z"),
        )
    )


@query(
    "bitmap_exact_distinct",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE user_id IS NOT NULL
GROUP BY event_type
""",
)
def bitmap_exact_distinct(spark, sf_dir):
    """EXACT distinct counting via bitmap aggregates — the exact
    complement to `hll_shard_union`'s approximate path, and the third
    precompute-and-merge pattern (with the HLL union and the
    incremental rollup): per-(group, 32k-bucket) bitmaps are built
    once with `bitmap_construct_agg` (in production, persisted per
    ingest partition), OR-merged with `bitmap_or_agg`, and popcounted
    with `bitmap_count`. Merge is associative and lossless, so the
    result is not an estimate — it hash-matches count(DISTINCT)
    exactly. Two partial-agg shuffles carrying <=4 KB bitmaps per
    (group, bucket), never raw keys."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    per_bucket = ev.select(
        "event_type",
        F.bitmap_bucket_number("user_id").alias("bucket"),
        F.bitmap_bit_position("user_id").alias("pos"),
    ).groupBy("event_type", "bucket").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).cast("long").alias("n_users")
    )


@query(
    "freq_sketch_merge",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events
WHERE event_type IS NOT NULL
GROUP BY event_type
""",
)
def freq_sketch_merge(spark, sf_dir):
    """Mergeable frequent-items sketches (Spark 4 approx_top_k
    family), the fourth precompute-and-merge pattern: one sketch is
    ACCUMULATED per day shard, sketches are COMBINED across shards,
    and the heavy-hitter list is ESTIMATED from the merged state —
    raw values never re-shuffle at query time. Gated exactly: the
    event-type vocabulary is far below maxItemsTracked, and the
    Misra-Gries-style summary is provably exact while the tracked-item
    budget is not exceeded, so the estimated counts hash-match the
    exact GROUP BY. The estimate uses the SAME k as maxItemsTracked
    (100) — a smaller k would silently truncate (and tie-break
    nondeterministically at the boundary) the moment the vocabulary
    grows past it. The struct array is exploded to scalar columns
    (the driver's comparator hashes scalar cells only)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    daily = ev.select(
        "event_type",
        F.expr(f"(ts DIV 1000) DIV {US_DAY_SKETCH}").alias("day"),
    ).groupBy("day").agg(
        F.expr("approx_top_k_accumulate(event_type, 100)").alias("sk")
    )
    merged = daily.agg(
        F.expr("approx_top_k_estimate(approx_top_k_combine(sk), 100)").alias(
            "top"
        )
    )
    return merged.select(F.explode("top").alias("t")).select(
        F.col("t.item").alias("event_type"),
        F.col("t.count").cast("long").alias("n"),
    )


# --- entity resolution (block -> match -> cluster -> survivorship) ----------

ER_MAX_DIST = 2

_ER_ORACLE = f"""
WITH RECURSIVE c AS MATERIALIZED (
  SELECT p_partkey, lower(p_name) AS nm,
         split_part(lower(p_name), ' ', 1) AS blk
  FROM part
),
names AS MATERIALIZED (
  -- distinct-then-expand, same as the engine (r6 VERDICT: the naive
  -- raw-pair replay cost 200s at sf0.1 — quadratic in identical-name
  -- copies). Provably equivalent to the raw-pair graph: identical
  -- names are dist-0 matches (a clique containing their min-key
  -- rep), and levenshtein is a function of the NAME, so a raw edge
  -- between two name groups exists iff the rep edge exists; raw
  -- components are therefore exactly the expanded rep components,
  -- and min node id = min rep = min partkey (each rep is its
  -- group's min).
  SELECT nm, blk, min(p_partkey) AS rep,
         CAST(count(*) AS BIGINT) AS n_members
  FROM c GROUP BY nm, blk
),
pairs AS (
  SELECT a.rep AS id_a, b.rep AS id_b
  FROM names a JOIN names b ON a.blk = b.blk AND a.rep < b.rep
  WHERE levenshtein(a.nm, b.nm) <= {ER_MAX_DIST}
),
edges AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
  UNION ALL
  -- multi-member groups surface even with no fuzzy neighbor: their
  -- dist-0 twins are matches (self-edge keeps the rep in the graph)
  SELECT rep, rep FROM names WHERE n_members >= 2
),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
),
cl AS MATERIALIZED (
  SELECT id AS rep, min(r) AS cluster_id FROM reach GROUP BY id
)
SELECT c.p_partkey AS entity_id, cl.cluster_id,
       CAST(count(*) OVER (PARTITION BY cl.cluster_id) AS BIGINT)
         AS cluster_size,
       CAST(cl.cluster_id = c.p_partkey AS BOOLEAN) AS is_canonical
FROM c JOIN names USING (nm) JOIN cl ON cl.rep = names.rep
"""


@query("entity_resolution_parts", oracle=_ER_ORACLE)
def entity_resolution_parts(spark, sf_dir):
    """Entity resolution end-to-end, the distinct-then-expand shape
    production ER uses at scale: collapse records to DISTINCT names
    first (64 names stand in for 20k parts at sf0.1 — identical-name
    twins are dist-0 matches by definition, so nothing is lost), block
    on the first name token, match rep pairs by bounded levenshtein,
    run min-label connected components on the tiny rep graph, then
    expand membership back to every record and elect the min-key
    record as the surviving canonical entity.

    Compared to pairing raw records, this removes the quadratic
    identical-name blowup (312 copies of one name = ~49k pairs that
    all say nothing) — the match stage cost now scales with distinct
    entities, not records. The oracle replays the naive raw-pair
    graph; results are identical because dist-0 twins always land in
    their rep's cluster."""
    from advisorydatapipeline_spark.operators.graph import (
        connected_components,
    )
    from pyspark.sql import Window

    c = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_name").alias("nm"),
        F.split_part(F.lower("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
    )
    # one representative (min key) per distinct name
    names = c.groupBy("nm", "blk").agg(
        F.min("p_partkey").alias("rep"),
        F.count("*").cast("long").alias("n_members"),
    )
    a = names.select(
        F.col("rep").alias("id_a"), F.col("nm").alias("nm_a"), "blk"
    )
    b = names.select(
        F.col("rep").alias("id_b"), F.col("nm").alias("nm_b"), "blk"
    )
    rep_edges = (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("nm_a", "nm_b", ER_MAX_DIST) >= 0)
        .select("id_a", "id_b")
    )
    # multi-member groups must surface even with no fuzzy neighbor
    # (their identical-name twins ARE matches): a self-edge keeps the
    # rep in the component graph without changing any component
    self_edges = (
        names.filter(F.col("n_members") >= 2)
        .select(F.col("rep").alias("id_a"), F.col("rep").alias("id_b"))
    )
    cc = connected_components(
        rep_edges.unionByName(self_edges), "id_a", "id_b"
    )
    # expand: every record of a clustered name joins its rep's
    # component; cluster_id = min reachable rep = min partkey in the
    # cluster, because each rep is already its group's min key
    clustered = (
        c.join(names.select("nm", "rep"), "nm")
        .join(
            cc.select(
                F.col("node").alias("rep"),
                F.col("component").alias("cluster_id"),
            ),
            "rep",
        )
        .select(F.col("p_partkey").alias("entity_id"), "cluster_id")
    )
    w = Window.partitionBy("cluster_id")
    return clustered.withColumn(
        "cluster_size", F.count("*").over(w).cast("long")
    ).withColumn("is_canonical", F.col("cluster_id") == F.col("entity_id"))


# --- mergeable histogram quantile sketch ------------------------------------

HIST_BINS = 50
HIST_QS = (0.5, 0.95, 0.99)


@query(
    "histogram_quantile_estimate",
    oracle=f"""
WITH edges AS (
  SELECT min(l_extendedprice) AS mn,
         (max(l_extendedprice) - min(l_extendedprice)) / {HIST_BINS}
           AS width
  FROM lineitem
),
binned AS (
  SELECT l.l_returnflag,
         CAST(least(floor((l.l_extendedprice - e.mn) / e.width),
                    {HIST_BINS - 1}) AS INT) AS bin
  FROM lineitem l, edges e
),
hist AS (
  SELECT l_returnflag, bin, CAST(count(*) AS BIGINT) AS c
  FROM binned GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, bin, c,
         CAST(sum(c) OVER (
           PARTITION BY l_returnflag ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum,
         CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
  FROM hist
),
qs(q) AS (VALUES {', '.join(f'(CAST({q} AS DOUBLE))' for q in HIST_QS)}),
hit AS (
  SELECT l_returnflag, q, min(bin) AS bin
  FROM cum, qs WHERE cum >= q * n GROUP BY 1, 2
)
SELECT h.l_returnflag, h.q, h.bin,
       e.mn + h.bin * e.width AS est_lower_edge
FROM hit h, edges e
""",
)
def histogram_quantile_estimate(spark, sf_dir):
    """Mergeable approximate quantiles: fixed-width histogram over
    globally shared bin edges, per-group cumulative counts, and the
    first bin covering each target quantile. This is the
    distributed-quantile shape that scales where exact percentiles
    don't: per-shard histograms are one partial-agg shuffle of at most
    |groups| x {HIST_BINS} rows and merge by bin-count addition —
    the same accumulate/combine contract as the HLL/theta sketch
    entries. Shared edges come from one broadcast (min, max) row;
    identical IEEE bin arithmetic on both engines keeps the estimate
    deterministic (exact-percentile twin: grouped_percentiles)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    edges = li.agg(
        F.min("l_extendedprice").alias("mn"),
        (
            (F.max("l_extendedprice") - F.min("l_extendedprice"))
            / HIST_BINS
        ).alias("width"),
    )
    binned = li.crossJoin(F.broadcast(edges)).select(
        "l_returnflag",
        F.least(
            F.floor((F.col("l_extendedprice") - F.col("mn")) / F.col("width")),
            F.lit(HIST_BINS - 1),
        )
        .cast("int")
        .alias("bin"),
    )
    hist = binned.groupBy("l_returnflag", "bin").agg(
        F.count("*").cast("long").alias("c")
    )
    from pyspark.sql import Window

    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "bin",
        F.sum("c").over(wc).cast("long").alias("cum"),
        F.sum("c").over(wn).cast("long").alias("n"),
    )
    qs = spark.createDataFrame([(q,) for q in HIST_QS], "q double")
    hit = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("l_returnflag", "q")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.crossJoin(F.broadcast(edges)).select(
        "l_returnflag",
        "q",
        "bin",
        (F.col("mn") + F.col("bin") * F.col("width")).alias(
            "est_lower_edge"
        ),
    )


SNM_WINDOW = 3  # compare each record with its next W sort neighbors


@query(
    "sorted_neighborhood_pairs",
    oracle=f"""
WITH s AS (
  SELECT p_partkey, lower(p_name) AS nm,
         row_number() OVER (ORDER BY lower(p_name), p_partkey) AS rn
  FROM part
),
pairs AS (
  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
         CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
  FROM s a JOIN s b
    ON b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW}
  WHERE levenshtein(a.nm, b.nm) <= 2
)
SELECT id_a, id_b, dist FROM pairs
""",
)
def sorted_neighborhood_pairs(spark, sf_dir):
    """Sorted-Neighborhood Method (Hernandez & Stolfo): the OTHER
    classic entity-resolution blocking — sort on a fuzzy key, then
    compare each record only with its next {3} sort neighbors.
    Complements fuzzy_name_pairs' hash blocking: SNM catches pairs
    whose first token differs (hash blocking's blind spot) as long
    as they sort adjacently. Spark plan: rank window, then the
    neighbor join becomes a LEAD explode — each row emits its {3}
    (rn, offset) probes and equi-joins back on rn, so no inequality
    join exists and the work is W x |rows| however large the table.
    At scale the global sort becomes a range-partitioned sort; the
    window body is unchanged."""
    s = load(spark, sf_dir, "part").select(
        "p_partkey", F.lower("p_name").alias("nm")
    )
    w = Window.orderBy("nm", "p_partkey")
    ranked = s.withColumn("rn", F.row_number().over(w))
    a = ranked.select(
        F.col("p_partkey").alias("id_a"),
        F.col("nm").alias("nm_a"),
        F.explode(
            F.array(*[F.col("rn") + F.lit(i) for i in range(1, SNM_WINDOW + 1)])
        ).alias("rn_b"),
    )
    b = ranked.select(
        F.col("p_partkey").alias("id_b"),
        F.col("nm").alias("nm_b"),
        F.col("rn").alias("rn_b"),
    )
    return (
        a.join(b, "rn_b")
        .withColumn("dist", F.levenshtein("nm_a", "nm_b", 2).cast("long"))
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )


WINSOR_LO, WINSOR_HI = 0.05, 0.95


@query(
    "winsorized_revenue",
    oracle=f"""
WITH fences AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, {WINSOR_LO}) AS lo,
         quantile_cont(l_extendedprice, {WINSOR_HI}) AS hi
  FROM lineitem GROUP BY 1
),
clamped AS (
  SELECT l.l_returnflag,
         CAST(floor(least(greatest(l.l_extendedprice, f.lo), f.hi) * 100)
              AS BIGINT) AS cents
  FROM lineitem l JOIN fences f ON l.l_returnflag = f.l_returnflag
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS winsorized_cents,
       CAST(sum(cents) // count(*) AS BIGINT) AS winsorized_mean_cents
FROM clamped GROUP BY l_returnflag
""",
)
def winsorized_revenue(spark, sf_dir):
    """Winsorized (outlier-clamped) revenue per return flag: exact
    P05/P95 fences (both engines' continuous percentile interpolates
    identically on the sorted doubles), values clamped to the
    fences, floor-cents AFTER clamping so the aggregation is pure
    integer. The robust-statistics twin of mad_outliers — two passes
    over the same grouped exchange: fence agg broadcast back, then
    clamp + partial agg."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    fences = li.groupBy("l_returnflag").agg(
        F.expr(
            f"percentile(l_extendedprice, {WINSOR_LO})"
        ).alias("lo"),
        F.expr(
            f"percentile(l_extendedprice, {WINSOR_HI})"
        ).alias("hi"),
    )
    clamped = li.join(F.broadcast(fences), "l_returnflag").select(
        "l_returnflag",
        F.expr(
            "CAST(floor(least(greatest(l_extendedprice, lo), hi) * 100)"
            " AS BIGINT)"
        ).alias("cents"),
    )
    return clamped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("winsorized_cents"),
        F.expr("sum(cents) DIV count(*)").alias("winsorized_mean_cents"),
    )


# --- incremental SCD2 apply (equivalence-gated vs full rebuild) -----

# change batches arrive after this cutoff; everything before it is
# the "existing" dimension snapshot
_SCD2_CUTOFF_US = 1_705_708_800_000_000  # 2024-01-20T00:00:00Z


@query(
    "scd2_apply_changes",
    oracle="""
SELECT user_id, event_type,
       epoch_us(ts) AS valid_from_us,
       event_id,
       value,
       lead(epoch_us(ts)) OVER (
         PARTITION BY user_id, event_type ORDER BY ts, event_id
       ) AS valid_to_us,
       CAST(lead(epoch_us(ts)) OVER (
         PARTITION BY user_id, event_type ORDER BY ts, event_id
       ) IS NULL AS BOOLEAN) AS is_current
FROM events
WHERE ts IS NOT NULL
""",
)
def scd2_apply_changes(spark, sf_dir):
    """INCREMENTAL SCD2 maintenance: apply a change batch (events
    after the cutoff) to an existing dimension snapshot (intervals
    built from events before it) — untouched keys pass through
    verbatim via an anti-join; only touched keys' histories are
    rebuilt (their dim rows re-expand to change records, union the
    batch, one lead() window re-derives validity). The oracle is the
    FULL batch rebuild over all events: the gate therefore proves
    incremental apply == rebuild, the invariant every warehouse
    dimension job owes its consumers.

    At 100 TB the anti/semi split is the whole point: a daily batch
    touches a sliver of keys, so the rewrite (and with partitioned
    storage, the I/O) is proportional to the CHANGES, not the
    dimension. The surrogate event_id rides along so same-timestamp
    changes re-order identically in both paths.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    change_cols = [
        "user_id",
        "event_type",
        F.expr("ts DIV 1000").alias("valid_from_us"),
        "event_id",
        "value",
    ]
    pre = ev.filter(
        F.expr(f"ts DIV 1000 < {_SCD2_CUTOFF_US}")
    ).select(*change_cols)
    batch = ev.filter(
        F.expr(f"ts DIV 1000 >= {_SCD2_CUTOFF_US}")
    ).select(*change_cols)

    w = Window.partitionBy("user_id", "event_type").orderBy(
        "valid_from_us", "event_id"
    )

    def intervals(changes: DataFrame) -> DataFrame:
        nxt = F.lead("valid_from_us").over(w)
        return changes.select(
            "user_id",
            "event_type",
            "valid_from_us",
            "event_id",
            "value",
            nxt.alias("valid_to_us"),
            nxt.isNull().alias("is_current"),
        )

    dim = intervals(pre)  # the existing SCD2 snapshot
    touched = batch.select("user_id", "event_type").distinct()

    untouched = dim.join(
        touched, ["user_id", "event_type"], "left_anti"
    )
    # touched histories: dim rows re-expand to their change records
    # (valid_from/event_id/value are exactly the original events),
    # union the new batch, re-derive intervals
    touched_changes = dim.join(
        touched, ["user_id", "event_type"], "left_semi"
    ).select(
        "user_id", "event_type", "valid_from_us", "event_id", "value"
    ).unionByName(batch)
    return untouched.unionByName(intervals(touched_changes))


# --- CUSUM changepoint on the daily revenue series ------------------


@query(
    "cusum_changepoint_revenue",
    oracle="""
WITH d AS (
  SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS total
  FROM d
),
c AS (
  SELECT d.day, d.cents,
         CAST(row_number() OVER (ORDER BY d.day) AS BIGINT) AS t,
         CAST(sum(s.n * d.cents) OVER (
           ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_scaled,
         s.n, s.total
  FROM d, s
),
scored AS (
  SELECT day, t, n, total,
         cum_scaled - t * total AS s_stat,
         abs(cum_scaled - t * total) AS abs_s,
         CAST(sum(cents) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_cents
  FROM c
),
best AS (
  SELECT * FROM scored
  ORDER BY abs_s DESC, day ASC LIMIT 1
)
SELECT day AS split_day, CAST(t AS BIGINT) AS t,
       CAST(n AS BIGINT) AS n_days,
       CAST(abs_s AS BIGINT) AS max_abs_s_scaled,
       CAST(cum_cents // t AS BIGINT) AS pre_mean_cents,
       CAST((total - cum_cents) // (n - t) AS BIGINT)
         AS post_mean_cents
FROM best WHERE t < n
""",
)
def cusum_changepoint_revenue(spark, sf_dir):
    """CUSUM mean-shift changepoint over the daily revenue series:
    the split day maximizing |cumulative deviation from the global
    mean| — the standard single-changepoint detector, here in EXACT
    integer form (the statistic is scaled by n: S'_t = n*cumsum(x) -
    t*total, avoiding the mean's division entirely), so both engines
    agree bit-for-bit with zero float risk. Reports the split plus
    pre/post-segment mean cents — the before/after evidence.

    Plan: one partial-agg shuffle to the ~30-row daily rollup;
    everything after (scalars, windows, argmax) lives on that tiny
    series. At 100 TB the heavy lifting is the first groupBy; the
    detector itself is O(days).
    """
    o = load(spark, sf_dir, "orders")
    d = (
        o.select(
            F.date_format("o_orderdate", "yyyyMMdd")
            .cast("long")
            .alias("day"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias(
                "_c"
            ),
        )
        .groupBy("day")
        .agg(F.sum("_c").cast("long").alias("cents"))
    )
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = (
        d.crossJoin(F.broadcast(s))
        .withColumn(
            "t", F.row_number().over(Window.orderBy("day")).cast("long")
        )
        .withColumn(
            "cum_scaled",
            F.sum(F.col("n") * F.col("cents")).over(w).cast("long"),
        )
        .withColumn("cum_cents", F.sum("cents").over(w).cast("long"))
        .withColumn(
            "abs_s", F.abs(F.col("cum_scaled") - F.col("t") * F.col("total"))
        )
    )
    return (
        c.filter(F.col("t") < F.col("n"))
        .orderBy(F.col("abs_s").desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("day").alias("split_day"),
            "t",
            F.col("n").alias("n_days"),
            F.col("abs_s").alias("max_abs_s_scaled"),
            F.expr("cum_cents DIV t").alias("pre_mean_cents"),
            F.expr("(total - cum_cents) DIV (n - t)").alias(
                "post_mean_cents"
            ),
        )
    )


# --- weighted median (quantity-weighted unit price) -----------------


@query(
    "weighted_median_price",
    oracle="""
WITH x AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w,
         l_orderkey, l_linenumber
  FROM lineitem
),
c AS (
  SELECT flag, cents, w,
         CAST(sum(w) OVER (
           PARTITION BY flag
           ORDER BY cents, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cumw,
         CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS total_w,
         l_orderkey, l_linenumber
  FROM x
)
SELECT flag, total_w,
       cents AS weighted_median_cents
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY flag ORDER BY cents, l_orderkey, l_linenumber
  ) AS rn
  FROM c WHERE cumw * 2 >= total_w
) WHERE rn = 1
""",
)
def weighted_median_price(spark, sf_dir):
    """Quantity-weighted median line price per return flag — the
    robust 'typical unit sold' price (an unweighted median
    over-represents small orders). Lower weighted median: smallest
    value whose cumulative weight reaches half the total, fully
    deterministic (integer cents/weights, composite tiebreak), no
    percentile_approx sketch variance.

    One window pass per group ordered by value (at 100 TB: a range
    repartition + local sort, same cost class as any exact grouped
    quantile); the first row at cumw*2 >= W wins via one more
    bounded window."""
    li = load(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias(
            "cents"
        ),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    order = [F.col("cents"), F.col("l_orderkey"), F.col("l_linenumber")]
    wcum = (
        Window.partitionBy("flag")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = x.withColumn("cumw", F.sum("w").over(wcum).cast("long")).withColumn(
        "total_w",
        F.sum("w").over(Window.partitionBy("flag")).cast("long"),
    )
    first = Window.partitionBy("flag").orderBy(*order)
    return (
        c.filter(F.col("cumw") * 2 >= F.col("total_w"))
        .withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .select(
            "flag",
            "total_w",
            F.col("cents").alias("weighted_median_cents"),
        )
    )


# --- cluster-jackknife SE for a ratio metric ------------------------


@query(
    "jackknife_ratio_se",
    oracle="""
WITH per_cust AS (
  SELECT c.c_mktsegment, c.c_custkey,
         CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS t_i,
         CAST(count(*) AS BIGINT) AS n_i
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
seg AS (
  SELECT c_mktsegment,
         CAST(sum(t_i) AS BIGINT) AS big_t,
         CAST(sum(n_i) AS BIGINT) AS big_n,
         CAST(count(*) AS BIGINT) AS g
  FROM per_cust GROUP BY 1
),
loo AS (
  SELECT p.c_mktsegment, s.big_t, s.big_n, s.g,
         (s.big_t - p.t_i) // (s.big_n - p.n_i) AS r_i
  FROM per_cust p JOIN seg s USING (c_mktsegment)
  WHERE s.big_n > p.n_i
),
m AS (
  SELECT c_mktsegment, big_t, big_n, g,
         CAST(sum(r_i) // count(*) AS BIGINT) AS mean_jack
  FROM loo GROUP BY 1, 2, 3, 4
)
SELECT l.c_mktsegment,
       m.g AS n_clusters,
       m.big_n AS n_orders,
       CAST(m.big_t // m.big_n AS BIGINT) AS ratio_cents,
       CAST(floor(sqrt(CAST(
         (m.g - 1) * sum((l.r_i - m.mean_jack) * (l.r_i - m.mean_jack))
           // m.g AS DOUBLE))) AS BIGINT) AS jack_se_cents
FROM loo l JOIN m USING (c_mktsegment)
GROUP BY 1, 2, 3, 4
""",
)
def jackknife_ratio_se(spark, sf_dir):
    """Cluster-jackknife standard error for revenue-per-order by
    segment: orders cluster within customers (correlated!), so the
    naive iid SE understates uncertainty — the delete-one-CLUSTER
    jackknife is the standard fix, and unlike a bootstrap it is
    fully deterministic (no resampling RNG to reconcile across
    engines or retries). Leave-one-customer-out ratios are integer
    floor divisions; the variance sum is exact (deviations around
    the floored jack mean stay small, ~1e6 cents, so squares fit
    BIGINT with orders of magnitude to spare); only the final
    sqrt is a single correctly-rounded IEEE op.

    Plan: one fact rollup to per-customer sums; segment scalars
    broadcast back; the LOO 'loop' is per-row arithmetic — there is
    no g-fold recomputation anywhere."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.sum("cents").cast("long").alias("t_i"),
            F.count(F.lit(1)).cast("long").alias("n_i"),
        )
    )
    seg = per_cust.groupBy("c_mktsegment").agg(
        F.sum("t_i").cast("long").alias("big_t"),
        F.sum("n_i").cast("long").alias("big_n"),
        F.count(F.lit(1)).cast("long").alias("g"),
    )
    loo = (
        per_cust.join(F.broadcast(seg), "c_mktsegment")
        .filter(F.col("big_n") > F.col("n_i"))
        .select(
            "c_mktsegment",
            "big_t",
            "big_n",
            "g",
            F.expr("(big_t - t_i) DIV (big_n - n_i)").alias("r_i"),
        )
    )
    m = loo.groupBy("c_mktsegment", "big_t", "big_n", "g").agg(
        F.expr("CAST(sum(r_i) DIV count(*) AS BIGINT)").alias(
            "mean_jack"
        )
    )
    return (
        loo.join(
            F.broadcast(m.select("c_mktsegment", "mean_jack")),
            "c_mktsegment",
        )
        .groupBy("c_mktsegment", "g", "big_t", "big_n")
        .agg(
            F.sum(
                (F.col("r_i") - F.col("mean_jack"))
                * (F.col("r_i") - F.col("mean_jack"))
            ).alias("ssd")
        )
        .select(
            "c_mktsegment",
            F.col("g").alias("n_clusters"),
            F.col("big_n").alias("n_orders"),
            F.expr("CAST(big_t DIV big_n AS BIGINT)").alias(
                "ratio_cents"
            ),
            F.expr(
                "CAST(floor(sqrt(CAST((g - 1) * ssd DIV g AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("jack_se_cents"),
        )
    )


# --- walk-forward forecast backtest (naive vs seasonal-naive) -------

_BT_DAYS = 14


@query(
    "forecast_backtest_mae",
    oracle=f"""
WITH d AS (
  SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT day, cents,
         lag(cents, 1) OVER (ORDER BY day) AS pred_naive,
         lag(cents, 7) OVER (ORDER BY day) AS pred_seasonal,
         row_number() OVER (ORDER BY day DESC) AS rrn
  FROM d
),
test AS (
  SELECT * FROM lagged
  WHERE rrn <= {_BT_DAYS}
    AND pred_naive IS NOT NULL AND pred_seasonal IS NOT NULL
),
scores AS (
  SELECT 'naive_lag1' AS model,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(abs(cents - pred_naive)) AS BIGINT)
           AS total_abs_err_cents,
         CAST(sum(abs(cents - pred_naive)) // count(*) AS BIGINT)
           AS mae_cents
  FROM test
  UNION ALL
  SELECT 'seasonal_lag7',
         CAST(count(*) AS BIGINT),
         CAST(sum(abs(cents - pred_seasonal)) AS BIGINT),
         CAST(sum(abs(cents - pred_seasonal)) // count(*) AS BIGINT)
  FROM test
)
SELECT model, n_days, total_abs_err_cents, mae_cents,
       mae_cents = min(mae_cents) OVER () AS is_best
FROM scores
""",
)
def forecast_backtest_mae(spark, sf_dir):
    """Walk-forward forecast BACKTEST: replay the last {n} days and
    score naive (yesterday) vs seasonal-naive (same weekday last
    week) by MAE in exact cents — the eval harness a forecasting
    query (forecast_revenue_band) should be judged against before
    anyone trusts its band. Every prediction uses only data strictly
    before its target day (lag windows), so there is no lookahead
    leakage; integer MAE + an is_best verdict.

    Plan: one partial-agg rollup to the daily series; lags, the
    test-window cut and both scores live on the tiny series (one
    window sort)."""
    from pyspark.sql.window import Window

    d = (
        load(spark, sf_dir, "orders")
        .select(
            F.date_format("o_orderdate", "yyyyMMdd")
            .cast("long")
            .alias("day"),
            F.floor(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("_c"),
        )
        .groupBy("day")
        .agg(F.sum("_c").cast("long").alias("cents"))
    )
    w = Window.orderBy("day")
    lagged = d.select(
        "day",
        "cents",
        F.lag("cents", 1).over(w).alias("pred_naive"),
        F.lag("cents", 7).over(w).alias("pred_seasonal"),
        F.row_number()
        .over(Window.orderBy(F.col("day").desc()))
        .alias("rrn"),
    )
    test = lagged.filter(
        (F.col("rrn") <= _BT_DAYS)
        & F.col("pred_naive").isNotNull()
        & F.col("pred_seasonal").isNotNull()
    )
    scores = test.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(F.col("cents") - F.col("pred_naive")))
        .cast("long")
        .alias("err_naive"),
        F.sum(F.abs(F.col("cents") - F.col("pred_seasonal")))
        .cast("long")
        .alias("err_seasonal"),
    ).select(
        F.stack(
            F.lit(2),
            F.lit("naive_lag1"),
            F.col("n_days"),
            F.col("err_naive"),
            F.expr("CAST(err_naive DIV n_days AS BIGINT)"),
            F.lit("seasonal_lag7"),
            F.col("n_days"),
            F.col("err_seasonal"),
            F.expr("CAST(err_seasonal DIV n_days AS BIGINT)"),
        ).alias("model", "n_days", "total_abs_err_cents", "mae_cents")
    )
    return scores.withColumn(
        "is_best",
        F.col("mae_cents")
        == F.min("mae_cents").over(Window.partitionBy()),
    )


# --- Holt linear (level+trend) smoothing on the weekly series -------
# alpha = 3/10, beta = 2/10, applied as exact integer ratios with
# TRUNCATING division (both engines truncate toward zero; the
# Python recurrence below emulates the same)


@query(
    "holt_linear_weekly",
    oracle="""
WITH RECURSIVE wk AS (
  SELECT CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7
              AS BIGINT) AS week,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
seq AS (
  SELECT week, cents,
         CAST(row_number() OVER (ORDER BY week) AS BIGINT) AS k
  FROM wk
),
holt AS (
  SELECT k, week, cents, cents AS level_cents,
         CAST(0 AS BIGINT) AS trend_cents
  FROM seq WHERE k = 1
  UNION ALL
  SELECT s.k, s.week, s.cents,
         (3 * s.cents + 7 * (h.level_cents + h.trend_cents)) // 10,
         (2 * ((3 * s.cents + 7 * (h.level_cents + h.trend_cents)) // 10
               - h.level_cents)
          + 8 * h.trend_cents) // 10
  FROM holt h JOIN seq s ON s.k = h.k + 1
)
SELECT k, week, cents, level_cents, trend_cents,
       level_cents + trend_cents AS forecast_next_cents
FROM holt
""",
)
def holt_linear_weekly(spark, sf_dir):
    """Holt's linear (double-exponential) smoothing over the weekly
    revenue series: level and trend recurrences with alpha=0.3,
    beta=0.2 as exact integer ratios under truncating division, so
    every state is a reproducible BIGINT and the one-step forecast
    (level + trend) is judged by forecast_backtest_mae's harness.
    The recurrence is irreducibly sequential, so it runs where a
    sequential scan belongs: ONE applyInPandas task over the ~340-row
    weekly rollup (the heavy lifting — collapsing the fact table —
    already happened in parallel); the oracle replays it as a
    recursive CTE.

    NB division: both engines truncate toward zero; Python's // is
    floor, so the UDF uses an explicit truncating divide — trend
    goes negative, where the two differ.
    """
    d = (
        load(spark, sf_dir, "orders")
        .select(
            F.expr(
                "CAST(datediff(o_orderdate, DATE '1970-01-01') DIV 7"
                " AS BIGINT)"
            ).alias("week"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("_c"),
        )
        .groupBy("week")
        .agg(F.sum("_c").cast("long").alias("cents"))
        .withColumn("_g", F.lit(1))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("week")

        def tdiv(a: int, b: int) -> int:
            q = abs(a) // b
            return -q if a < 0 else q

        rows = []
        level = trend = 0
        for k, (week, cents) in enumerate(
            zip(pdf["week"].tolist(), pdf["cents"].tolist()), start=1
        ):
            if k == 1:
                level, trend = cents, 0
            else:
                new_level = tdiv(3 * cents + 7 * (level + trend), 10)
                trend = tdiv(2 * (new_level - level) + 8 * trend, 10)
                level = new_level
            rows.append(
                (k, week, cents, level, trend, level + trend)
            )
        return pd.DataFrame(
            rows,
            columns=[
                "k",
                "week",
                "cents",
                "level_cents",
                "trend_cents",
                "forecast_next_cents",
            ],
        )

    return d.groupBy("_g").applyInPandas(
        holt,
        "k long, week long, cents long, level_cents long, "
        "trend_cents long, forecast_next_cents long",
    )


# --- Gini coefficient of customer revenue by nation -----------------


@query(
    "gini_revenue_nation",
    oracle="""
WITH pc AS (
  SELECT c.c_nationkey, c.c_custkey,
         CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
r AS (
  SELECT c_nationkey, cents,
         CAST(row_number() OVER (
           PARTITION BY c_nationkey ORDER BY cents, c_custkey
         ) AS BIGINT) AS i
  FROM pc
),
s AS (
  SELECT c_nationkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS tot,
         CAST(sum(i * cents) AS BIGINT) AS sic
  FROM r GROUP BY 1
)
SELECT c_nationkey, n AS n_customers, tot AS total_cents,
       CAST(floor(
         CAST(2 * sic - (n + 1) * tot AS DOUBLE) * 1000000
         / CAST(n * tot AS DOUBLE)
       ) AS BIGINT) AS gini_ppm
FROM s WHERE tot > 0
""",
)
def gini_revenue_nation(spark, sf_dir):
    """Gini coefficient of customer revenue per nation — the
    concentration SCALAR beside lorenz_revenue_deciles' curve
    (0 = every customer equal, ->1 = one whale): the one-number
    inequality KPI dashboards track. Rank-formula Gini
    (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending ranks
    with a custkey tiebreak; moments are exact BIGINT, the final
    ratio is one deterministic double divide floored to ppm.

    One fact rollup -> per-nation rank window -> per-nation moment
    rollup; ranks never leave their nation partition."""
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    pc = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    r = pc.select(
        "c_nationkey",
        "cents",
        F.row_number()
        .over(
            Window.partitionBy("c_nationkey").orderBy(
                "cents", "c_custkey"
            )
        )
        .cast("long")
        .alias("i"),
    )
    s = r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("tot"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("sic"),
    )
    return s.filter(F.col("tot") > 0).select(
        "c_nationkey",
        F.col("n").alias("n_customers"),
        F.col("tot").alias("total_cents"),
        F.floor(
            (2 * F.col("sic") - (F.col("n") + 1) * F.col("tot")).cast(
                "double"
            )
            * 1000000
            / (F.col("n") * F.col("tot")).cast("double")
        ).cast("long").alias("gini_ppm"),
    )
