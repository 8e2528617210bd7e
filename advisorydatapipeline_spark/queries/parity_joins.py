"""Join parity queries (SURVEY.md §2.3) + distinct (§2.4 A1/A2).

Covers: J1 case-insensitive compound-key left join, J2 double left
join (also in the flagship), J3/J4 left-anti, A1 distinct. Dimension
sides are broadcast — at 100 TB the fact side never shuffles for
these joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.registry import query
from advisorydatapipeline_spark.queries.helpers import load, ns_literal

PURCHASE_CUTOFF_ISO = "2024-01-28"
PURCHASE_CUTOFF_NS = ns_literal(PURCHASE_CUTOFF_ISO)


@query(
    "ci_compound_key_left_join",
    oracle="""
WITH dim AS (
  SELECT upper(p_brand) AS ov_brand, upper(p_type) AS ov_type,
         'flagged' AS flag
  FROM part WHERE p_size > 40
  GROUP BY upper(p_brand), upper(p_type)
)
SELECT p.p_partkey, p.p_brand, p.p_type,
       coalesce(d.flag, 'none') AS flag
FROM part p
LEFT JOIN dim d
  ON lower(p.p_brand) = lower(d.ov_brand)
 AND lower(p.p_type) = lower(d.ov_type)
""",
)
def ci_compound_key_left_join(spark, sf_dir):
    """J1: left join on lower()-normalized compound keys — the
    reference's expression join (packages_to_enrich.py:34). The dim is
    broadcast: an expression join can't use bucketing, but a broadcast
    hash join sidesteps the shuffle entirely."""
    part = load(spark, sf_dir, "part")
    dim = (
        part.filter(F.col("p_size") > 40)
        .select(
            F.upper("p_brand").alias("ov_brand"),
            F.upper("p_type").alias("ov_type"),
        )
        .distinct()
        .withColumn("flag", F.lit("flagged"))
    )
    joined = part.join(
        F.broadcast(dim),
        (F.lower(part.p_brand) == F.lower(dim.ov_brand))
        & (F.lower(part.p_type) == F.lower(dim.ov_type)),
        "left",
    )
    return joined.select(
        "p_partkey",
        "p_brand",
        "p_type",
        F.coalesce("flag", F.lit("none")).alias("flag"),
    )


@query(
    "collated_ci_join",
    oracle="""
WITH dim AS (
  SELECT upper(p_brand) AS ov_brand, upper(p_type) AS ov_type,
         'flagged' AS flag
  FROM part WHERE p_size > 40
  GROUP BY upper(p_brand), upper(p_type)
)
SELECT p.p_partkey, p.p_brand, p.p_type,
       coalesce(d.flag, 'none') AS flag
FROM part p
LEFT JOIN dim d
  ON lower(p.p_brand) = lower(d.ov_brand)
 AND lower(p.p_type) = lower(d.ov_type)
""",
)
def collated_ci_join(spark, sf_dir):
    """The J1 case-insensitive join on Spark 4 NATIVE collations
    (``collate(col, 'UTF8_LCASE')`` equality) instead of lower()
    wrappers — same answer (oracle shared with
    ci_compound_key_left_join), different physical story: collated
    equality is a first-class equi-join key (hash-partitionable,
    statistics-aware), where a lower() expression key blinds column
    stats and blocks bucketed co-location. This is the modern form of
    the reference's packages_to_enrich.py:34 join at scale."""
    part = load(spark, sf_dir, "part")
    dim = (
        part.filter(F.col("p_size") > 40)
        .select(
            F.upper("p_brand").alias("ov_brand"),
            F.upper("p_type").alias("ov_type"),
        )
        .distinct()
        .withColumn("flag", F.lit("flagged"))
    )
    joined = part.join(
        F.broadcast(dim),
        (
            F.collate(part.p_brand, "UTF8_LCASE")
            == F.collate(dim.ov_brand, "UTF8_LCASE")
        )
        & (
            F.collate(part.p_type, "UTF8_LCASE")
            == F.collate(dim.ov_type, "UTF8_LCASE")
        ),
        "left",
    )
    return joined.select(
        "p_partkey",
        "p_brand",
        "p_type",
        F.coalesce("flag", F.lit("none")).alias("flag"),
    )


@query(
    "left_anti_cache_skip",
    oracle=f"""
SELECT e.event_id, e.user_id, e.event_type
FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM events c
  WHERE c.event_type = 'purchase' AND c.ts >= TIMESTAMP '{PURCHASE_CUTOFF_ISO}'
    AND c.value > 150 AND c.user_id = e.user_id
)
""",
)
def left_anti_cache_skip(spark, sf_dir):
    """J3: left-anti join — the reference's cache-skip
    (enrichment/cache.py:91-95): keep only work whose key is absent
    from the cached set."""
    from advisorydatapipeline_spark.queries.helpers import load_events

    ev = load(spark, sf_dir, "events")
    # the cached-set side re-scans with the cutoff pushed to the
    # physical column (row-group pruning on the small side's scan)
    cached = (
        load_events(spark, sf_dir, ts_ge_ns=PURCHASE_CUTOFF_NS)
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .select("user_id")
        .distinct()
    )
    return ev.join(F.broadcast(cached), "user_id", "left_anti").select(
        "event_id", "user_id", "event_type"
    )


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def distinct_pairs(spark, sf_dir):
    """A1/A2: SELECT DISTINCT on the worklist key pair
    (packages_to_enrich.py:37-42). Partial aggregation dedups map-side
    before the shuffle."""
    return load(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@query(
    "double_left_join_merge",
    oracle="""
SELECT c.c_custkey AS cust_key,
       n.n_name AS nation_name,
       coalesce(o.order_count, 0) AS order_count
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS order_count
  FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
""",
)
def double_left_join_merge(spark, sf_dir):
    """J2: chained double left join (map_new_info_with_udf.py:110-114
    shape) with COALESCE backstop."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("order_count"))
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(o, c.c_custkey == o.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("cust_key"),
            F.col("n_name").alias("nation_name"),
            F.coalesce("order_count", F.lit(0)).alias("order_count"),
        )
    )


@query(
    "full_outer_reconciliation",
    oracle="""
WITH jan AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_jan
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1996-07-01'
  GROUP BY 1
),
jul AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_jul
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-07-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
  GROUP BY 1
)
SELECT coalesce(jan.o_custkey, jul.o_custkey) AS custkey,
       coalesce(jan.n_jan, 0) AS n_first_half,
       coalesce(jul.n_jul, 0) AS n_second_half,
       CASE WHEN jan.o_custkey IS NULL THEN 'second_only'
            WHEN jul.o_custkey IS NULL THEN 'first_only'
            ELSE 'both' END AS presence
FROM jan FULL OUTER JOIN jul ON jan.o_custkey = jul.o_custkey
""",
)
def full_outer_reconciliation(spark, sf_dir):
    """FULL OUTER join — the reconciliation operator (which keys exist
    on which side, with null-backfilled measures) that completes the
    join family alongside inner/left/semi/anti/null-aware-anti. Both
    sides pre-aggregate before the join, so the full-outer shuffle
    carries one row per key per side, never raw orders."""
    o = load(spark, sf_dir, "orders")
    first = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("n_jan"))
    )
    second = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("n_jul"))
    )
    j = first.alias("a").join(
        second.alias("b"),
        F.col("a.o_custkey") == F.col("b.o_custkey"),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col("a.o_custkey"), F.col("b.o_custkey")).alias("custkey"),
        F.coalesce(F.col("a.n_jan"), F.lit(0)).alias("n_first_half"),
        F.coalesce(F.col("b.n_jul"), F.lit(0)).alias("n_second_half"),
        F.when(F.col("a.o_custkey").isNull(), "second_only")
        .when(F.col("b.o_custkey").isNull(), "first_only")
        .otherwise("both")
        .alias("presence"),
    )


@query(
    "null_safe_join",
    oracle="""
WITH l AS (
  SELECT event_id, NULLIF(event_type, 'view') AS k FROM events
),
d AS (
  SELECT k, CAST(count(*) AS BIGINT) AS grp_n FROM l GROUP BY k
)
SELECT l.event_id, l.k, d.grp_n
FROM l JOIN d ON l.k IS NOT DISTINCT FROM d.k
""",
)
def null_safe_join(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of silently dropping — the contract
    regular equi-joins break. NULLIF plants a null-keyed population
    so the semantic is actually exercised. Spark plans `<=>` as an
    ordinary hash join (nulls hash like any value under null-safe
    comparison), so the scale profile is identical to a plain
    equi-join — no nested-loop penalty for null handling."""
    ev = load(spark, sf_dir, "events")
    lhs = ev.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("view")).alias("k"),
    ).alias("l")
    dim = (
        lhs.groupBy("k")
        .agg(F.count("*").cast("long").alias("grp_n"))
        .withColumnRenamed("k", "dk")
        .alias("d")
    )
    return lhs.join(
        dim, F.col("l.k").eqNullSafe(F.col("d.dk"))
    ).select("event_id", F.col("l.k").alias("k"), "grp_n")


# --- Bloom-filter join pruning --------------------------------------


def _bloom_join_oracle() -> str:
    from advisorydatapipeline_spark.operators.dedup import (
        BLOOM_K,
        BLOOM_M_BITS,
    )
    from advisorydatapipeline_spark.queries.dedup_queries import (
        DUCK_HASH64,
    )

    pos = (
        f"((h % {BLOOM_M_BITS}) + i * (1 + (h // {BLOOM_M_BITS})"
        f" % {BLOOM_M_BITS - 1})) % {BLOOM_M_BITS}"
    )
    return f"""
WITH dim AS (
  SELECT c_custkey, c_nationkey FROM customer
  WHERE c_mktsegment = 'BUILDING'
),
ks AS (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i),
dh AS (
  SELECT {DUCK_HASH64.format(x="CAST(c_custkey AS VARCHAR)")} AS h
  FROM dim
),
bloom AS (
  SELECT p // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS word
  FROM (SELECT {pos} AS p FROM dh, ks) GROUP BY 1
),
oh AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
         {DUCK_HASH64.format(x="CAST(o_custkey AS VARCHAR)")} AS h
  FROM orders
),
probe AS (
  SELECT o_orderkey, {pos} AS p FROM oh, ks
),
passed AS (
  SELECT p.o_orderkey
  FROM probe p LEFT JOIN bloom b ON b.word_idx = p.p // 32
  GROUP BY p.o_orderkey
  HAVING min(CASE WHEN ((b.word >> CAST(p.p % 32 AS INT)) & 1) = 1
             THEN 1 ELSE 0 END) = 1
),
audit AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM oh) AS n_orders_total,
         (SELECT CAST(count(*) AS BIGINT) FROM passed) AS n_after_bloom
)
SELECT d.c_nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(o.cents) AS BIGINT) AS revenue_cents,
       a.n_orders_total, a.n_after_bloom
FROM oh o
JOIN passed s ON s.o_orderkey = o.o_orderkey
JOIN dim d ON d.c_custkey = o.o_custkey
CROSS JOIN audit a
GROUP BY d.c_nationkey, a.n_orders_total, a.n_after_bloom
"""


@query("bloom_join_prune", oracle=_bloom_join_oracle())
def bloom_join_prune(spark, sf_dir):
    """Bloom-pruned dimension join: the filtered dim's keys collapse
    to a kilobyte Bloom word table that pre-filters the FACT side
    before the join — the runtime row-level filter (Spark's own
    bloom-pushdown / Iceberg bloom index shape) made explicit and
    measurable. No false negatives, so the post-prune join result
    PROVABLY equals the plain join (the gate checks it); false
    positives only cost the audit delta (n_after_bloom vs the true
    match count). At 100 TB the win is shuffle volume: fact rows that
    can't match never enter the exchange."""
    from advisorydatapipeline_spark.operators.dedup import (
        BLOOM_K,
        BLOOM_M_BITS,
        bloom_build,
        bloom_positions,
    )
    from advisorydatapipeline_spark.functions.text import hash64

    dim = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_nationkey")
    )
    bloom = bloom_build(
        dim.select(F.col("c_custkey").cast("string").alias("k")), "k"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    probe = o.select(
        "o_orderkey",
        F.explode(
            bloom_positions(
                hash64(F.col("o_custkey").cast("string")),
                BLOOM_M_BITS,
                BLOOM_K,
            )
        ).alias("p"),
    )
    passed = (
        probe.join(
            F.broadcast(bloom),
            F.shiftright(F.col("p"), 5) == F.col("word_idx"),
            "left",
        )
        .groupBy("o_orderkey")
        .agg(
            F.min(
                F.when(
                    F.expr(
                        "((word >> CAST(p % 32 AS INT)) & 1) = 1"
                    ),
                    1,
                ).otherwise(0)
            ).alias("all_set")
        )
        .filter(F.col("all_set") == 1)
        .select("o_orderkey")
    )
    audit = (
        o.agg(F.count(F.lit(1)).cast("long").alias("n_orders_total"))
        .crossJoin(
            F.broadcast(
                passed.agg(
                    F.count(F.lit(1)).cast("long").alias("n_after_bloom")
                )
            )
        )
    )
    return (
        o.join(passed, "o_orderkey", "left_semi")
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .crossJoin(F.broadcast(audit))
        .groupBy("c_nationkey", "n_orders_total", "n_after_bloom")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .select(
            "c_nationkey",
            "n_orders",
            "revenue_cents",
            "n_orders_total",
            "n_after_bloom",
        )
    )
