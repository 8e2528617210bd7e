"""Ordered-sequence, higher-order-function, and rank-distribution
queries with DuckDB oracles.

- ``ewma_user_values``: a per-key *sequential recurrence* — the class
  of computation SQL aggregates can't express (each output depends on
  the previous). Spark side: applyInPandas per user, rows sorted by
  (ts, event_id); oracle side: DuckDB ``list_reduce`` over the same
  ordered window list. The recurrence runs in pure non-negative
  integer arithmetic (``(7*acc + 3*x) DIV 10`` on cents), so both
  engines produce bit-identical values. (Python ``//`` floors while
  DuckDB ``//`` truncates — they only agree on non-negatives, which
  quantized cents of a positive-valued column guarantee.)
- ``embedding_norms``: array higher-order functions (transform +
  aggregate fold) — the JVM-side way to compute per-vector stats
  without exploding 64 rows per embedding or leaving codegen.
- ``rank_distribution`` / ``conditional_aggregates``: percent_rank /
  cume_dist (rational counts — one exact double division per row) and
  ANSI ``FILTER`` clause aggregation, same SQL text on both engines.

100 TB notes: EWMA shuffles once on the user key and streams each
group through Arrow; HOF norms are narrow per-row work inside the
scan; rank windows shuffle on their partition key only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

EWMA_OUT = (
    "user_id long, event_id long, ts_us long, cents long, ewma long"
)


@query(
    "ewma_user_values",
    oracle="""
SELECT user_id, event_id,
       epoch_us(ts) AS ts_us,
       CAST(floor(value * 100) AS BIGINT) AS cents,
       list_reduce(
         list(CAST(floor(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING),
         (acc, x) -> (7 * acc + 3 * x) // 10
       ) AS ewma
FROM events
WHERE ts IS NOT NULL
""",
)
def ewma_user_values(spark, sf_dir):
    """Per-user running EWMA (alpha=0.3, integer cents) over events in
    (ts, event_id) order — a sequential per-key recurrence via
    applyInPandas. The group is sorted inside the UDF: Spark does NOT
    guarantee intra-group row order into applyInPandas, so relying on
    upstream sort order would be a latent scale bug.

    r15 (guide §4.1 — amortize the Python boundary): the Arrow group
    key is ``pmod(hash(user_id), buckets)`` rather than the raw user
    id, and the body resolves ALL its users in one pass — the same
    bucketed-cogroup pattern as asof_join_cogrouped (which measured
    4.4x from it). Group count tracks the cluster (defaultParallelism
    * 8), not user cardinality; per-user semantics are unchanged (the
    recurrence resets at each user boundary of the
    (user, ts, event_id) lexsort)."""

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        # numpy lexsort + column-wise take beats pandas sort_values
        # (no block consolidation, no index bookkeeping), and the
        # recurrence runs over native Python ints (`tolist`) — ~4x
        # less per-row overhead than iterating a pandas Series. The
        # per-step integer floor makes each output depend on the
        # previous, so the scan itself is irreducibly sequential per
        # USER; users are independent, so a bucket's cost is the sum
        # of its users' event counts — skew is bounded by the hot
        # USER, exactly as with raw-key groups.
        uid = pdf["user_id"].to_numpy()
        order = np.lexsort(
            (pdf["event_id"].to_numpy(), pdf["ts_us"].to_numpy(), uid)
        )
        uid = uid[order]
        cents = pdf["cents"].to_numpy()[order]
        # recurrence with a reset at every user boundary
        new_user = np.empty(len(uid), dtype=bool)
        if len(uid):
            new_user[0] = True
            new_user[1:] = uid[1:] != uid[:-1]
        out = []
        acc = 0
        for c, first in zip(cents.tolist(), new_user.tolist()):
            acc = c if first else (7 * acc + 3 * c) // 10
            out.append(acc)
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": pdf["event_id"].to_numpy()[order],
                "ts_us": pdf["ts_us"].to_numpy()[order],
                "cents": cents,
                "ewma": np.asarray(out, dtype=np.int64),
            }
        )

    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    buckets = spark.sparkContext.defaultParallelism * 8
    prepared = ev.select(
        "user_id",
        "event_id",
        F.expr("ts DIV 1000").alias("ts_us"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.pmod(F.hash("user_id"), F.lit(buckets)).alias("_bk"),
    )
    return prepared.groupBy("_bk").applyInPandas(ewma, EWMA_OUT)


QUANT = 10_000


@query(
    "embedding_norms",
    oracle=f"""
SELECT vec_id, label,
       CAST(len(embedding) AS INT) AS dim,
       CAST(list_sum(list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)
                   * CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))) AS BIGINT)
         AS qnorm2,
       CAST(list_max(list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))) AS BIGINT) AS qmax
FROM embeddings
""",
)
def embedding_norms(spark, sf_dir):
    """Per-vector stats via array HOFs (transform + aggregate fold +
    array_max) — no explode, no Python, stays in codegen. Components
    quantize to 1e-4 grid (round-half-away-from-zero matches in both
    engines) so the squared norm is exact BIGINT.

    Measured (sf0.1, 5k x 64-dim, warm, 3-run mean): the fold is
    0.13s vs 0.24s for the explode+groupBy equivalent — ~1.8x, and
    the gap widens at scale because explode materializes dim x rows
    and re-aggregates through a hash shuffle while the fold is
    row-local."""
    emb = load(spark, sf_dir, "embeddings")
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x * QUANT).cast("long"),
    )
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).alias("qnorm2"),
        F.array_max(q).alias("qmax"),
    )


@query(
    "rank_distribution",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
""",
)
def rank_distribution(spark, sf_dir):
    """percent_rank / cume_dist within order-priority groups. Both are
    rational counts finished by ONE double division per row — exact
    and engine-portable (unlike float running sums). Unique tiebreak
    (o_orderkey) makes ranks deterministic."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "conditional_aggregates",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE value > 50) AS BIGINT) AS n_high,
       CAST(count(DISTINCT user_id) FILTER (WHERE value > 50) AS BIGINT)
         AS n_high_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            FILTER (WHERE value > 50) AS DOUBLE) AS high_total
FROM events
GROUP BY event_type
""",
)
def conditional_aggregates(spark, sf_dir):
    """ANSI FILTER-clause aggregation (conditional counts/sums without
    CASE scaffolding) — identical SQL text runs on Spark and DuckDB;
    distinct-count under a filter exercises the expand-based distinct
    aggregation path."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n"),
        F.expr("CAST(count(*) FILTER (WHERE value > 50) AS BIGINT) AS n_high"),
        F.expr(
            "CAST(count(DISTINCT user_id) FILTER (WHERE value > 50) "
            "AS BIGINT) AS n_high_users"
        ),
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(18,2))) "
            "FILTER (WHERE value > 50) AS DOUBLE) AS high_total"
        ),
    )


@query(
    "mad_outliers",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
),
mad AS (
  SELECT e.event_type,
         quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY 1
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE abs(e.value - m.med) > 3 * d.mad)
            AS BIGINT) AS n_outliers
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
GROUP BY e.event_type
""",
)
def mad_outliers(spark, sf_dir):
    """Median-absolute-deviation outlier counts per event type — the
    robust twin of zscore_anomalies (medians ignore the outliers that
    corrupt a mean/stddev fence). Two exact-percentile passes, each a
    per-group aggregate joined back broadcast-small; the 3*MAD fence
    comparison is per-row double arithmetic (exact both engines)."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr(
                "CAST(count(*) FILTER (WHERE adev > 3 * mad) AS BIGINT)"
            ).alias("n_outliers"),
        )
    )


@query(
    "vector_pair_dot",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(list_sum([p[1] * p[2] FOR p IN list_zip(a.qv, b.qv)])
            AS BIGINT) AS qdot
FROM q a JOIN q b ON b.vec_id = a.vec_id + 1
""",
)
def vector_pair_dot(spark, sf_dir):
    """zip_with + fold: quantized dot product between consecutive
    embeddings (deterministic pairing via vec_id+1 self-join). The
    elementwise multiply never leaves the array — no explode, no
    shuffle beyond the join."""
    emb = load(spark, sf_dir, "embeddings")
    q = F.transform(F.col("embedding"), lambda x: F.round(x * QUANT).cast("long"))
    qe = emb.select("vec_id", q.alias("qv"))
    a = qe.alias("a")
    b = qe.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.qv"), F.col("b.qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        dot.alias("qdot"),
    )


@query(
    "hof_predicates",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents
)
SELECT doc_id,
       list_has_any(ts, ['the', 'a']) AS has_stop,
       len(list_filter(ts, t -> regexp_matches(t, '^[a-z]+$'))) = len(ts)
         AS all_alpha,
       CAST(len(list_filter(ts, t -> length(t) > 5)) AS INT) AS n_long
FROM toks
""",
)
def hof_predicates(spark, sf_dir):
    """exists / forall / filter-count higher-order predicates over the
    token array — quantifier logic without exploding rows."""
    from advisorydatapipeline_spark.functions.text import tokens

    d = load(spark, sf_dir, "documents")
    ts = tokens("text")
    stop = F.array(F.lit("the"), F.lit("a"))
    return d.select(
        "doc_id",
        F.exists(ts, lambda t: F.array_contains(stop, t)).alias("has_stop"),
        F.forall(ts, lambda t: t.rlike("^[a-z]+$")).alias("all_alpha"),
        F.size(F.filter(ts, lambda t: F.length(t) > 5))
        .cast("int")
        .alias("n_long"),
    )


@query(
    "bitwise_aggregates",
    oracle="""
SELECT event_type,
       CAST(bit_and(event_id) AS BIGINT) AS id_and,
       CAST(bit_or(event_id) AS BIGINT) AS id_or,
       CAST(bit_xor(event_id) AS BIGINT) AS id_xor
FROM events
GROUP BY event_type
""",
)
def bitwise_aggregates(spark, sf_dir):
    """bit_and / bit_or / bit_xor aggregates — order-independent by
    construction (bitwise ops are associative+commutative), so they
    are exactly reproducible under any partitioning; the xor doubles
    as a cheap membership checksum for reconciliation jobs."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("event_id").cast("long").alias("id_and"),
        F.bit_or("event_id").cast("long").alias("id_or"),
        F.bit_xor("event_id").cast("long").alias("id_xor"),
    )


US_DAY = 86_400_000_000
NS_DAY = US_DAY * 1000


@query(
    "gap_fill_interpolate",
    oracle=f"""
WITH daily AS (
  SELECT user_id, epoch_us(ts) // {US_DAY} AS day,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(range(mn, mx + 1)) AS day FROM bounds
),
j AS (
  SELECT s.user_id, s.day, d.cents
  FROM spine s LEFT JOIN daily d USING (user_id, day)
),
ctx AS (
  SELECT user_id, day, cents,
    last_value(cents IGNORE NULLS) OVER wp AS pv,
    last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
      OVER wp AS pd,
    first_value(cents IGNORE NULLS) OVER wf AS nv,
    first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
      OVER wf AS nd
  FROM j
  WINDOW
    wp AS (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       CAST(CASE WHEN cents IS NOT NULL THEN cents
                 ELSE pv + ((nv - pv) * (day - pd)) // (nd - pd)
            END AS BIGINT) AS cents_filled,
       CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS interpolated
FROM ctx
""",
)
def gap_fill_interpolate(spark, sf_dir):
    """Per-user daily spine with LINEAR interpolation of missing
    days — the time-series feature-prep step beyond forward fill
    (calendar_spine_fill). All integer: daily totals in floor-cents,
    interpolation as pv + (nv-pv)*(day-pd) intdiv (nd-pd); both
    engines truncate integer division toward zero, so the lerp is
    bit-identical. Plan: one shuffle to daily totals (partial agg),
    a per-user bounds agg reused to explode the spine (bounded by
    the user's own span — no global calendar broadcast), then two
    window passes over the SAME (user, day) sort — Catalyst reuses
    the exchange and the sort. Interior gaps always have both
    neighbors because the spine is bounded by each user's min/max
    observed day."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        ev.select(
            "user_id",
            F.expr(f"ts DIV {NS_DAY}").alias("day"),
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("_c"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("_c").alias("cents"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("day"),
        )
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_day = F.when(F.col("cents").isNotNull(), F.col("day"))
    ctx = (
        j.withColumn("pv", F.last("cents", ignorenulls=True).over(wp))
        .withColumn("pd", F.last(known_day, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("cents", ignorenulls=True).over(wf))
        .withColumn("nd", F.first(known_day, ignorenulls=True).over(wf))
    )
    return ctx.select(
        "user_id",
        "day",
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .otherwise(
            F.col("pv")
            + F.expr("((nv - pv) * (day - pd)) DIV (nd - pd)")
        )
        .cast("long")
        .alias("cents_filled"),
        F.when(F.col("cents").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("interpolated"),
    )
