"""Data-quality queries with DuckDB oracles (reference TODO at
ingest/ingestion_pipeline.py:71, delivered as an engine feature)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.quality import (
    Rule,
    duplicate_key_rows,
    in_range,
    non_empty,
    not_null,
    quality_report,
    referential_violations,
)
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query


@query(
    "quality_report_docs",
    oracle="""
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN text IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS v_text,
         CAST(SUM(CASE WHEN lang IS NOT NULL AND trim(lang) <> ''
                       THEN 0 ELSE 1 END) AS BIGINT) AS v_lang,
         CAST(SUM(CASE WHEN n_chars BETWEEN 1 AND 100000
                       THEN 0 ELSE 1 END) AS BIGINT) AS v_chars
  FROM documents
)
SELECT 'text_not_null' AS rule, n_rows, v_text AS n_violations,
       v_text / CAST(n_rows AS DOUBLE) AS violation_rate FROM base
UNION ALL
SELECT 'lang_non_empty', n_rows, v_lang,
       v_lang / CAST(n_rows AS DOUBLE) FROM base
UNION ALL
SELECT 'n_chars_in_range', n_rows, v_chars,
       v_chars / CAST(n_rows AS DOUBLE) FROM base
""",
)
def quality_report_docs(spark, sf_dir):
    """Per-rule violation counts in one aggregate pass."""
    docs = load(spark, sf_dir, "documents")
    return quality_report(
        docs,
        [
            not_null("text"),
            non_empty("lang"),
            in_range("n_chars", 1, 100_000),
        ],
    )


@query(
    "referential_orphans",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber
FROM lineitem l
LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders
           WHERE o_orderstatus <> 'O') o
  ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
""",
)
def referential_orphans(spark, sf_dir):
    """FK-integrity check as a left-anti join (open orders removed
    from the parent set to guarantee a non-empty violation sample)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    parents = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "O")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return referential_violations(li, parents, ["l_orderkey"])


K_ANON = 5


@query(
    "k_anonymity_audit",
    oracle=f"""
WITH g AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(count(*) AS BIGINT) AS grp_n
  FROM customer GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (WHERE grp_n < {K_ANON}) AS BIGINT)
         AS n_small_groups,
       CAST(COALESCE(SUM(grp_n) FILTER (WHERE grp_n < {K_ANON}), 0)
            AS BIGINT) AS n_rows_at_risk,
       CAST(min(grp_n) AS BIGINT) AS min_group_size
FROM g
""",
)
def k_anonymity_audit(spark, sf_dir):
    """Privacy-release audit: group sizes over the quasi-identifier
    tuple (segment, nation) — any group under k is re-identifiable
    and must be suppressed or generalized before release. The audit
    is one partial-agg shuffle on the quasi-identifiers plus a scalar
    reduce; rows never leave the executors. Complements pii_scrub
    (column-level redaction) and user_erasure_rewrite (row-level
    deletion) with the release-level guarantee."""
    c = load(spark, sf_dir, "customer")
    g = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").cast("long").alias("grp_n")
    )
    small = F.col("grp_n") < K_ANON
    return g.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.count(F.when(small, 1)).cast("long").alias("n_small_groups"),
        F.coalesce(F.sum(F.when(small, F.col("grp_n"))), F.lit(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.min("grp_n").cast("long").alias("min_group_size"),
    )


SKEW_TOP_N = 5


@query(
    "key_skew_profile",
    oracle=f"""
WITH k AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(c) AS BIGINT) AS max_c
  FROM k
)
SELECT k.o_custkey AS key, k.c AS n_rows_for_key,
       CAST(t.n_rows AS BIGINT) AS total_rows,
       CAST(t.n_keys AS BIGINT) AS distinct_keys,
       k.c * {10 ** 6} // t.n_rows AS share_ppm
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY c DESC, o_custkey ASC) AS rn
  FROM k
) k, tot t
WHERE k.rn <= {SKEW_TOP_N}
""",
)
def key_skew_profile(spark, sf_dir):
    """Shuffle-planning diagnostic: the heaviest join/agg keys with
    their integer parts-per-million share of the table — the number
    that decides whether a key needs salting or AQE skew handling
    before a 100 TB join. Per-key counts are one partial-agg shuffle;
    the top-N is a TakeOrdered (no global sort); totals ride a 1-row
    broadcast."""
    o = load(spark, sf_dir, "orders")
    # persisted: both the 1-row total and the top-N branch read this
    # aggregate — without the cache the orders scan + groupBy shuffle
    # would run twice in one action
    k = (
        o.groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count("*").cast("long").alias("n_rows_for_key"))
        .persist()
    )
    tot = k.agg(
        F.sum("n_rows_for_key").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("distinct_keys"),
    )
    top = k.orderBy(
        F.col("n_rows_for_key").desc(), F.col("key").asc()
    ).limit(SKEW_TOP_N)
    return top.crossJoin(F.broadcast(tot)).select(
        "key",
        "n_rows_for_key",
        "total_rows",
        "distinct_keys",
        F.expr(f"(n_rows_for_key * {10 ** 6}) DIV total_rows").alias(
            "share_ppm"
        ),
    )


_PROFILE_COLS = (
    # (name, min/max rendered to engine-identical VARCHAR)
    ("o_orderkey", "CAST({m} AS VARCHAR)"),
    ("o_custkey", "CAST({m} AS VARCHAR)"),
    ("o_orderstatus", "{m}"),
    ("o_totalprice", "CAST(CAST({m} AS DECIMAL(18,2)) AS VARCHAR)"),
    ("o_orderpriority", "{m}"),
)


def _profile_oracle() -> str:
    arms = []
    for c, fmt in _PROFILE_COLS:
        arms.append(f"""
SELECT '{c}' AS col_name,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {fmt.format(m=f'min({c})')} AS min_val,
       {fmt.format(m=f'max({c})')} AS max_val
FROM orders""")
    arms.append("""
SELECT 'o_orderdate' AS col_name,
       CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(count(DISTINCT o_orderdate) AS BIGINT) AS n_distinct,
       strftime(min(o_orderdate), '%Y-%m-%d') AS min_val,
       strftime(max(o_orderdate), '%Y-%m-%d') AS max_val
FROM orders""")
    return "\nUNION ALL\n".join(arms)


@query("column_profile_orders", oracle=_profile_oracle())
def column_profile_orders(spark, sf_dir):
    """Whole-table column profile (null count, exact distinct count,
    rendered min/max) in ONE scan: all 18 aggregates ride a single
    pass — Catalyst plans the multi-column DISTINCTs as one Expand
    (rows x #distinct-columns) feeding a partial agg, so a 100 TB
    profile is one read + one shuffle of expanded KEYS (values never
    move). The oracle recomputes per-column with six scans — same
    values, deliberately different plan. Min/max are rendered to
    engine-identical VARCHAR per type (BIGINT digits, DECIMAL(18,2)
    for the monetary double, yyyy-MM-dd for the date); exact distinct
    is the verifiable twin of the approx_count_distinct profile you'd
    ship at petabyte scale.

    The pre-agg repartition is the bytes-vs-CPU guard: a small table
    arrives as ONE split, and the Expand multiplies rows x7 into a
    single task's sort-aggregate; spreading the scan first puts the
    partial aggregation on every core (4.7s -> sub-second at sf0.1).
    At real scale the table has thousands of splits and the exchange
    is a no-op-sized rebalance."""
    o = load(spark, sf_dir, "orders")
    o = o.repartition(o.sparkSession.sparkContext.defaultParallelism)
    aggs = []
    for c, fmt in _PROFILE_COLS:
        # Spark spells the string type STRING where DuckDB says
        # VARCHAR; both render BIGINT/DECIMAL identically
        sfmt = fmt.replace("AS VARCHAR", "AS STRING")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.expr(sfmt.format(m=f"min({c})")).alias(f"mn_{c}"),
            F.expr(sfmt.format(m=f"max({c})")).alias(f"mx_{c}"),
        ]
    aggs += [
        F.sum(F.col("o_orderdate").isNull().cast("long")).alias("nn_d"),
        F.countDistinct("o_orderdate").alias("nd_d"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("mn_d"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("mx_d"),
    ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c, _ in _PROFILE_COLS
    ) + ", 'o_orderdate', nn_d, nd_d, mn_d, mx_d"
    return wide.select(
        F.expr(
            f"stack(6, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_val, max_val)"
        )
    )


KS_BUCKET_CENTS = 5_000  # $50-wide value buckets


@query(
    "ks_value_drift",
    oracle=f"""
WITH b AS (
  SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
  FROM events WHERE ts IS NOT NULL
),
e AS (
  SELECT CAST(floor(value * 100) AS BIGINT) // {KS_BUCKET_CENTS} AS bucket,
         CASE WHEN epoch_ns(ts) * 2 <= mn + mx THEN 1 ELSE 0 END AS early
  FROM events, b WHERE ts IS NOT NULL
),
g AS (
  SELECT bucket,
         CAST(sum(early) AS BIGINT) AS n_early,
         CAST(count(*) - sum(early) AS BIGINT) AS n_late
  FROM e GROUP BY 1
),
c AS (
  SELECT bucket, n_early, n_late,
         CAST(sum(n_early) OVER (ORDER BY bucket
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ce,
         CAST(sum(n_late) OVER (ORDER BY bucket
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cl,
         CAST(sum(n_early) OVER () AS BIGINT) AS te,
         CAST(sum(n_late) OVER () AS BIGINT) AS tl
  FROM g
)
SELECT bucket, n_early, n_late,
       CAST(ce * 1000000 // te AS BIGINT) AS cdf_early_ppm,
       CAST(cl * 1000000 // tl AS BIGINT) AS cdf_late_ppm,
       CAST(abs(ce * 1000000 // te - cl * 1000000 // tl) AS BIGINT)
         AS gap_ppm
FROM c
""",
)
def ks_value_drift(spark, sf_dir):
    """Distribution-drift monitor: two-sample KS profile of the event
    value distribution, first time-half vs second (the max gap_ppm
    row IS the KS statistic in ppm). All integer: floor-cents
    buckets, ppm CDFs, midpoint split via the doubled-epoch trick
    (no float halving). Plan: a 2-value bounds agg broadcast into
    the scan pass, ONE partial-agg shuffle to the ~10-row bucket
    table; the cumulative windows run on that tiny table — a
    single-partition window is fine there and never touches event-
    scale data. This is the shape of every production drift check:
    heavy scan -> tiny sketch -> driver-free comparison."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    bounds = ev.agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    )
    e = ev.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            f"CAST(floor(value * 100) AS BIGINT) DIV {KS_BUCKET_CENTS}"
        ).alias("bucket"),
        F.expr("CASE WHEN ts * 2 <= mn + mx THEN 1 ELSE 0 END").alias(
            "early"
        ),
    )
    g = e.groupBy("bucket").agg(
        F.sum("early").alias("n_early"),
        (F.count(F.lit(1)) - F.sum("early")).alias("n_late"),
    )
    return g.selectExpr(
        "bucket",
        "n_early",
        "n_late",
        "sum(n_early) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)"
        " * 1000000 DIV sum(n_early) OVER () AS cdf_early_ppm",
        "sum(n_late) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)"
        " * 1000000 DIV sum(n_late) OVER () AS cdf_late_ppm",
        "abs(sum(n_early) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)"
        " * 1000000 DIV sum(n_early) OVER ()"
        " - sum(n_late) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)"
        " * 1000000 DIV sum(n_late) OVER ()) AS gap_ppm",
    )


DIFF_BUCKETS = 64
_ROWSTR = (
    "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)"
    " || '|' || o_orderstatus || '|' ||"
    " CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR)"
)
_RH = f"(('0x' || substr(md5({_ROWSTR}), 1, 15))::BIGINT)"


@query(
    "table_diff_fingerprints",
    oracle=f"""
WITH a AS (SELECT *, {_RH} AS rh FROM orders),
b AS (
  SELECT *, {_RH} AS rh FROM (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 0.01
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 97 <> 0
  )
),
fa AS (
  SELECT o_orderkey % {DIFF_BUCKETS} AS bucket,
         CAST(count(*) AS BIGINT) AS n_a,
         CAST(bit_xor(rh) AS BIGINT) AS fp_a
  FROM a GROUP BY 1
),
fb AS (
  SELECT o_orderkey % {DIFF_BUCKETS} AS bucket,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(bit_xor(rh) AS BIGINT) AS fp_b
  FROM b GROUP BY 1
)
SELECT bucket, n_a, n_b,
       CASE WHEN fp_a = fp_b THEN 1 ELSE 0 END AS fp_match
FROM fa JOIN fb USING (bucket)
WHERE n_a <> n_b OR fp_a <> fp_b
""",
)
def table_diff_fingerprints(spark, sf_dir):
    """Merkle-style table diff: both table versions collapse to
    {64} bucket fingerprints (row-hash XOR + count — XOR is the
    order-free, mergeable combiner), and only mismatched buckets
    surface for row-level investigation. This is how you reconcile
    a replicated 100 TB table WITHOUT shuffling rows: each side
    ships 64 (count, fingerprint) pairs however large the data. The
    'other version' is derived in-plan with deterministic deletes
    (keys % 97) and cent-level updates (keys % 89) so the diff has
    known ground truth; row hashes ride the portable md5-60bit."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    b = o.filter(F.expr("o_orderkey % 97 <> 0")).withColumn(
        "o_totalprice",
        F.expr(
            "CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 0.01"
            " ELSE o_totalprice END"
        ),
    )
    rowstr = F.expr(_ROWSTR.replace("AS VARCHAR", "AS STRING"))
    from advisorydatapipeline_spark.functions.text import hash64

    def fingerprint(df, n_alias, fp_alias):
        return (
            df.withColumn("_rh", hash64(rowstr))
            .groupBy(
                F.expr(f"o_orderkey % {DIFF_BUCKETS}").alias("bucket")
            )
            .agg(
                F.count(F.lit(1)).alias(n_alias),
                F.expr("bit_xor(_rh)").alias(fp_alias),
            )
        )

    fa = fingerprint(o, "n_a", "fp_a")
    fb = fingerprint(b, "n_b", "fp_b")
    return (
        fa.join(fb, "bucket")
        .filter(
            (F.col("n_a") != F.col("n_b"))
            | (F.col("fp_a") != F.col("fp_b"))
        )
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.when(F.col("fp_a") == F.col("fp_b"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("fp_match"),
        )
    )


EMD_BUCKET_CENTS = 5_000


@query(
    "emd_value_distributions",
    oracle=f"""
WITH e AS (
  SELECT CAST(floor(value * 100) AS BIGINT) // {EMD_BUCKET_CENTS}
           AS bucket,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events WHERE event_type IN ('view', 'purchase')
),
g AS (
  SELECT bucket,
         CAST(sum(is_p) AS BIGINT) AS n_p,
         CAST(count(*) - sum(is_p) AS BIGINT) AS n_v
  FROM e GROUP BY 1
),
c AS (
  SELECT bucket, n_p, n_v,
         CAST(sum(n_p) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cp,
         CAST(sum(n_v) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cv,
         CAST(sum(n_p) OVER () AS BIGINT) AS tp,
         CAST(sum(n_v) OVER () AS BIGINT) AS tv
  FROM g
)
SELECT bucket, n_p, n_v,
       CAST(abs(cp * 1000000 // tp - cv * 1000000 // tv) AS BIGINT)
         AS cum_gap_ppm,
       CAST(sum(abs(cp * 1000000 // tp - cv * 1000000 // tv))
              OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS emd_running_ppm
FROM c
""",
)
def emd_value_distributions(spark, sf_dir):
    """Earth-mover's distance (1-D, integer) between the purchase and
    view value distributions: on ordered buckets EMD is the SUM of
    |CDF gaps| (where KS takes the max — the two entries together
    give both classic distribution distances). The final row's
    emd_running_ppm IS the EMD in ppm-bucket units. Same
    heavy-scan -> tiny-bucket-sketch shape as ks_value_drift; all
    integer."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    e = ev.select(
        F.expr(
            f"CAST(floor(value * 100) AS BIGINT) DIV {EMD_BUCKET_CENTS}"
        ).alias("bucket"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("is_p"),
    )
    g = e.groupBy("bucket").agg(
        F.sum("is_p").alias("n_p"),
        (F.count(F.lit(1)) - F.sum("is_p")).alias("n_v"),
    )
    return g.selectExpr(
        "bucket",
        "n_p",
        "n_v",
        "abs(sum(n_p) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)"
        " * 1000000 DIV sum(n_p) OVER ()"
        " - sum(n_v) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)"
        " * 1000000 DIV sum(n_v) OVER ()) AS cum_gap_ppm",
    ).selectExpr(
        "bucket",
        "n_p",
        "n_v",
        "cum_gap_ppm",
        "sum(cum_gap_ppm) OVER (ORDER BY bucket ROWS UNBOUNDED"
        " PRECEDING) AS emd_running_ppm",
    )


SKEW_WHATIF_N = (8, 32, 128)


@query(
    "shuffle_skew_whatif",
    oracle=f"""
WITH b AS (
  SELECT u.n AS n_partitions,
         (('0x' || substr(md5('skew:' || CAST(user_id AS VARCHAR)), 1, 15))
          ::BIGINT) % u.n AS bucket
  FROM events, unnest([{', '.join(str(n) for n in SKEW_WHATIF_N)}])
         AS u(n)
),
g AS (
  SELECT n_partitions, bucket, CAST(count(*) AS BIGINT) AS rows_in
  FROM b GROUP BY 1, 2
)
SELECT n_partitions,
       CAST(count(*) AS BIGINT) AS buckets_used,
       CAST(max(rows_in) AS BIGINT) AS max_bucket_rows,
       CAST(max(rows_in) * CAST(n_partitions AS BIGINT) * 1000000
            // CAST(sum(rows_in) AS BIGINT) AS BIGINT)
         AS max_over_even_ppm
FROM g GROUP BY n_partitions
""",
)
def shuffle_skew_whatif(spark, sf_dir):
    """Shuffle-skew what-if: for candidate partition counts
    {8, 32, 128}, how uneven would a hash shuffle on user_id land?
    max_over_even_ppm = heaviest bucket / perfectly-even share (1e6
    = balanced; 3e6 = one reducer does 3x the average — the straggler
    predictor you consult BEFORE picking spark.sql.shuffle.partitions
    or deciding to salt). One scan with a 3-way config explode,
    partial-agg to (config, bucket) cells, and the verdict windows
    run on those cells. Companion to key_skew_profile (which ranks
    the hot KEYS; this scores the hash LAYOUT)."""
    from advisorydatapipeline_spark.functions.text import hash64

    ev = load(spark, sf_dir, "events")
    b = ev.select(
        F.explode(
            F.array(*[F.lit(n) for n in SKEW_WHATIF_N])
        ).alias("n_partitions"),
        hash64(
            F.concat(F.lit("skew:"), F.col("user_id").cast("string"))
        ).alias("h"),
    ).select(
        "n_partitions", (F.col("h") % F.col("n_partitions")).alias("bucket")
    )
    g = b.groupBy("n_partitions", "bucket").agg(
        F.count(F.lit(1)).alias("rows_in")
    )
    return g.groupBy("n_partitions").agg(
        F.count(F.lit(1)).alias("buckets_used"),
        F.max("rows_in").alias("max_bucket_rows"),
        F.expr(
            "CAST(max(rows_in) * CAST(n_partitions AS BIGINT) * 1000000"
            " DIV sum(rows_in) AS BIGINT)"
        ).alias("max_over_even_ppm"),
    )


JOINCARD_TOPK = 5


@query(
    "join_cardinality_whatif",
    oracle=f"""
WITH la AS (
  SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n_left
  FROM events GROUP BY 1
),
ra AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_right
  FROM orders GROUP BY 1
),
prof AS (
  SELECT la.k, n_left, n_right,
         CAST(n_left * n_right AS BIGINT) AS pairs
  FROM la JOIN ra ON la.k = ra.k
),
tot AS (SELECT CAST(sum(pairs) AS BIGINT) AS total_pairs FROM prof)
SELECT k AS join_key, n_left, n_right, pairs, total_pairs,
       CAST(pairs * 1000000 // total_pairs AS BIGINT) AS share_ppm
FROM prof, tot
ORDER BY pairs DESC, join_key ASC LIMIT {JOINCARD_TOPK}
""",
)
def join_cardinality_whatif(spark, sf_dir):
    """Join-cardinality what-if (planner dry run, companion to
    shuffle_skew_whatif): EXACT output size of events-x-orders on
    user_id = o_custkey from per-key count histograms — without
    running the join. Emits the top-5 contributing keys with their
    exact pair counts and ppm share of the total, i.e. the decision
    inputs for broadcast vs salt vs split before a 100 TB join. Cost:
    two partial-agg shuffles on the key + a distinct-key join; the
    1-row total joins back via broadcast (scalar nested-loop, not a
    data-sized cross)."""
    from advisorydatapipeline_spark.operators.skew import (
        join_cardinality_profile,
    )

    ev = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    prof = join_cardinality_profile(ev, orders, "user_id", "o_custkey")
    total = prof.agg(
        F.sum("pairs").cast("long").alias("total_pairs")
    )
    top = prof.orderBy(
        F.col("pairs").desc(), F.col("k").asc()
    ).limit(JOINCARD_TOPK)
    return top.crossJoin(F.broadcast(total)).select(
        F.col("k").alias("join_key"),
        "n_left",
        "n_right",
        "pairs",
        "total_pairs",
        F.expr(
            "CAST(pairs * 1000000 DIV total_pairs AS BIGINT)"
        ).alias("share_ppm"),
    )


# --- Deequ-style constraint suite: analyzer metrics + verdicts ------

_PRIORITY_RE = "^[1-5]-[A-Z ]+$"


@query(
    "constraint_suite_orders",
    oracle=f"""
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(o_custkey) AS BIGINT) AS n_cust,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd_key,
         CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_status,
         CAST(SUM(CASE WHEN o_orderstatus IN ('P','O','F')
                       THEN 1 ELSE 0 END) AS BIGINT) AS ok_status,
         CAST(SUM(CASE WHEN regexp_matches(o_orderpriority,
                       '{_PRIORITY_RE}')
                       THEN 1 ELSE 0 END) AS BIGINT) AS ok_prio,
         min(o_totalprice) AS min_price,
         max(o_totalprice) AS max_price
  FROM orders
)
SELECT 'size_min_1' AS constraint, CAST(n AS DOUBLE) AS metric,
       n >= 1 AS passed FROM base
UNION ALL SELECT 'completeness_o_custkey',
       n_cust / CAST(n AS DOUBLE), n_cust = n FROM base
UNION ALL SELECT 'uniqueness_o_orderkey',
       nd_key / CAST(n AS DOUBLE), nd_key = n FROM base
UNION ALL SELECT 'distinctness_o_orderstatus',
       nd_status / CAST(n AS DOUBLE), nd_status <= 10 FROM base
UNION ALL SELECT 'compliance_status_domain',
       ok_status / CAST(n AS DOUBLE), ok_status = n FROM base
UNION ALL SELECT 'compliance_priority_pattern',
       ok_prio / CAST(n AS DOUBLE), ok_prio = n FROM base
UNION ALL SELECT 'min_o_totalprice', min_price,
       min_price >= 0 FROM base
UNION ALL SELECT 'max_o_totalprice', max_price,
       max_price <= 1000000 FROM base
""",
)
def constraint_suite_orders(spark, sf_dir):
    """Deequ-style declarative data-quality suite: ANALYZER metrics
    (size, completeness, uniqueness, distinctness, compliance,
    min/max) plus a pass/fail verdict per constraint — the
    publish-gate shape (block the table version when `passed` has a
    false) that quality_report_docs' violation listing does not give.

    One aggregation pass over the table computes every metric
    (map-side partial aggs; two distinct-counts expand via Spark's
    native EXPAND, still one scan), then a one-row -> eight-row
    in-memory unpivot. At 100 TB this is the cheapest full-table
    audit shape: no joins, no window, one shuffle of partial aggs.
    Every ratio is a single division of two exact counts, so the
    doubles are engine-portable.
    """
    o = load(spark, sf_dir, "orders")
    base = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("o_custkey").cast("long").alias("n_cust"),
        F.countDistinct("o_orderkey").cast("long").alias("nd_key"),
        F.countDistinct("o_orderstatus").cast("long").alias("nd_status"),
        F.sum(
            F.col("o_orderstatus").isin("P", "O", "F").cast("long")
        ).cast("long").alias("ok_status"),
        F.sum(
            F.col("o_orderpriority").rlike(_PRIORITY_RE).cast("long")
        ).cast("long").alias("ok_prio"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    n_d = F.col("n").cast("double")
    checks = [
        ("size_min_1", n_d, F.col("n") >= 1),
        (
            "completeness_o_custkey",
            F.col("n_cust") / n_d,
            F.col("n_cust") == F.col("n"),
        ),
        (
            "uniqueness_o_orderkey",
            F.col("nd_key") / n_d,
            F.col("nd_key") == F.col("n"),
        ),
        (
            "distinctness_o_orderstatus",
            F.col("nd_status") / n_d,
            F.col("nd_status") <= 10,
        ),
        (
            "compliance_status_domain",
            F.col("ok_status") / n_d,
            F.col("ok_status") == F.col("n"),
        ),
        (
            "compliance_priority_pattern",
            F.col("ok_prio") / n_d,
            F.col("ok_prio") == F.col("n"),
        ),
        (
            "min_o_totalprice",
            F.col("min_price"),
            F.col("min_price") >= 0,
        ),
        (
            "max_o_totalprice",
            F.col("max_price"),
            F.col("max_price") <= 1000000,
        ),
    ]
    # one stack() over the single agg row — NOT a union of per-check
    # selects, which would plan (and at 100 TB, run) the scan+agg once
    # per constraint
    stack_args: list[F.Column] = [F.lit(len(checks))]
    for name, metric, passed in checks:
        stack_args += [F.lit(name), metric.cast("double"), passed]
    return base.select(
        F.stack(*stack_args).alias("constraint", "metric", "passed")
    )


# --- l-diversity audit (sensitive-attribute diversity) --------------

L_DIVERSITY = 3
T_CLOSENESS_PPM = 350_000  # pass when TVD(group, corpus) <= 0.35
_BAND_SQL = (
    "CASE WHEN c_acctbal < 0 THEN 'debt' "
    "WHEN c_acctbal < 3000 THEN 'low' "
    "WHEN c_acctbal < 7000 THEN 'mid' ELSE 'high' END"
)


@query(
    "l_diversity_audit",
    oracle=f"""
WITH s AS (
  SELECT c_mktsegment, c_nationkey, {_BAND_SQL} AS band
  FROM customer
),
per_band AS (
  SELECT c_mktsegment, c_nationkey, band,
         CAST(count(*) AS BIGINT) AS band_n
  FROM s GROUP BY 1, 2, 3
),
g AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(sum(band_n) AS BIGINT) AS grp_n,
         CAST(count(*) AS BIGINT) AS n_bands,
         CAST(max(band_n) AS BIGINT) AS max_band_n
  FROM per_band GROUP BY 1, 2
)
SELECT c_mktsegment, c_nationkey, grp_n, n_bands,
       CAST(max_band_n * 1000000 // grp_n AS BIGINT)
         AS worst_share_ppm,
       n_bands >= {L_DIVERSITY} AS passes
FROM g
""",
)
def l_diversity_audit(spark, sf_dir):
    """l-diversity audit over the same quasi-identifier groups as
    k_anonymity_audit: a group can be large enough for k-anonymity
    yet still leak — if nearly everyone in (segment, nation) shares
    one balance band, membership alone discloses it. Per group:
    distinct sensitive values (must reach l), and the dominant
    value's share in ppm (the homogeneity-attack signal). Two
    stacked partial-agg shuffles, quasi-identifier keys only —
    sensitive values aggregate away before anything leaves the
    executors."""
    c = load(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    per_band = (
        c.select("c_mktsegment", "c_nationkey", band.alias("band"))
        .groupBy("c_mktsegment", "c_nationkey", "band")
        .agg(F.count(F.lit(1)).cast("long").alias("band_n"))
    )
    return (
        per_band.groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.sum("band_n").cast("long").alias("grp_n"),
            F.count(F.lit(1)).cast("long").alias("n_bands"),
            F.max("band_n").cast("long").alias("max_band_n"),
        )
        .select(
            "c_mktsegment",
            "c_nationkey",
            "grp_n",
            "n_bands",
            F.expr("max_band_n * 1000000 DIV grp_n").alias(
                "worst_share_ppm"
            ),
            (F.col("n_bands") >= L_DIVERSITY).alias("passes"),
        )
    )


@query(
    "t_closeness_audit",
    oracle=f"""
WITH s AS (
  SELECT c_mktsegment, c_nationkey, {_BAND_SQL} AS band
  FROM customer
),
per_band AS (
  SELECT c_mktsegment, c_nationkey, band,
         CAST(count(*) AS BIGINT) AS band_n
  FROM s GROUP BY 1, 2, 3
),
overall AS (
  SELECT band, CAST(count(*) AS BIGINT) AS g_n,
         CAST(sum(count(*)) OVER () AS BIGINT) AS n_total
  FROM s GROUP BY 1
),
grps AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(sum(band_n) AS BIGINT) AS grp_n
  FROM per_band GROUP BY 1, 2
),
grid AS (
  SELECT gr.c_mktsegment, gr.c_nationkey, gr.grp_n,
         gl.band, gl.g_n, gl.n_total,
         COALESCE(pb.band_n, 0) AS band_n
  FROM grps gr CROSS JOIN overall gl
  LEFT JOIN per_band pb
    ON pb.c_mktsegment = gr.c_mktsegment
   AND pb.c_nationkey = gr.c_nationkey
   AND pb.band = gl.band
)
SELECT c_mktsegment, c_nationkey, grp_n,
       CAST(sum(abs(band_n * 1000000 // grp_n
                    - g_n * 1000000 // n_total)) // 2 AS BIGINT)
         AS tvd_ppm,
       CAST(sum(abs(band_n * 1000000 // grp_n
                    - g_n * 1000000 // n_total)) // 2 AS BIGINT)
         <= {T_CLOSENESS_PPM} AS passes
FROM grid GROUP BY 1, 2, 3
""",
)
def t_closeness_audit(spark, sf_dir):
    """t-closeness audit (Li et al. 2007) over the same
    quasi-identifier groups and sensitive bands as
    k_anonymity_audit / l_diversity_audit — the third rung of the
    anonymization ladder: a group can be k-anonymous AND l-diverse
    yet still leak when its sensitive-value DISTRIBUTION deviates
    from the corpus (skew attack). Per group: total-variation
    distance (the categorical EMD with unit ground distance) between
    the group's band distribution and the global one, in ppm —
    shares are quantized to integer ppm FIRST (band_n*1e6 DIV grp_n)
    so the arithmetic never forms n^2-sized products and both
    engines replay it exactly at any corpus size.

    Absent bands count: the group x band grid is densified (groups
    CROSS JOIN the 4-row global band table, zero-filled) before the
    |p - q| sum — TVD over only-present bands would understate the
    distance exactly where the leak is worst.

    Plan: two partial-agg shuffles on quasi-id keys (sensitive
    values aggregate away executor-side), a broadcast 4-row global
    table, and the final per-group agg on the tiny dense grid."""
    c = load(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    s = c.select("c_mktsegment", "c_nationkey", band.alias("band"))
    per_band = s.groupBy("c_mktsegment", "c_nationkey", "band").agg(
        F.count(F.lit(1)).cast("long").alias("band_n")
    )
    glob = (
        s.groupBy("band")
        .agg(F.count(F.lit(1)).cast("long").alias("g_n"))
        .select(
            "band",
            "g_n",
            F.expr("sum(g_n) OVER ()").alias("n_total"),
        )
    )
    grps = per_band.groupBy("c_mktsegment", "c_nationkey").agg(
        F.sum("band_n").cast("long").alias("grp_n")
    )
    grid = (
        grps.crossJoin(F.broadcast(glob))
        .join(
            per_band,
            ["c_mktsegment", "c_nationkey", "band"],
            "left",
        )
        .select(
            "c_mktsegment",
            "c_nationkey",
            "grp_n",
            "g_n",
            "n_total",
            F.coalesce(F.col("band_n"), F.lit(0)).alias("band_n"),
        )
    )
    tvd = F.expr(
        "CAST(sum(abs(band_n * 1000000 DIV grp_n"
        " - g_n * 1000000 DIV n_total)) DIV 2 AS BIGINT)"
    )
    return grid.groupBy("c_mktsegment", "c_nationkey", "grp_n").agg(
        tvd.alias("tvd_ppm"),
        (tvd <= T_CLOSENESS_PPM).alias("passes"),
    )


@query(
    "mannwhitney_value_drift",
    oracle="""
WITH b AS (
  SELECT min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
  FROM events WHERE ts IS NOT NULL
),
e AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
         CASE WHEN epoch_ns(ts) * 2 <= mn + mx THEN 1 ELSE 0 END AS early
  FROM events, b WHERE ts IS NOT NULL
),
g AS (
  SELECT cents,
         CAST(sum(early) AS BIGINT) AS n_e,
         CAST(count(*) - sum(early) AS BIGINT) AS n_l
  FROM e GROUP BY 1
),
c AS (
  SELECT cents, n_e, n_l,
         CAST(COALESCE(sum(n_l) OVER (ORDER BY cents
              ROWS UNBOUNDED PRECEDING), 0) - n_l AS BIGINT) AS cl_below,
         CAST(COALESCE(sum(n_e) OVER (ORDER BY cents
              ROWS UNBOUNDED PRECEDING), 0) - n_e AS BIGINT) AS ce_below
  FROM g
)
SELECT CAST(sum(n_e) AS BIGINT) AS n_early,
       CAST(sum(n_l) AS BIGINT) AS n_late,
       CAST(sum(2 * n_e * cl_below + n_e * n_l) AS BIGINT) AS u2_early,
       CAST(sum(2 * n_l * ce_below + n_e * n_l) AS BIGINT) AS u2_late,
       CAST(sum(n_e * n_l) AS BIGINT) AS tie_pairs
FROM c
""",
)
def mannwhitney_value_drift(spark, sf_dir):
    """Mann-Whitney U drift test beside ks_value_drift: the rank-sum
    two-sample test (early time-half vs late) computed EXACTLY and
    distributively — no all-pairs comparison and no fractional
    midranks. Group values to exact cents, one partial-agg shuffle to
    the distinct-value table, cumulative windows on that tiny table;
    then 2U = sum(2 * n_e(v) * #late-below(v) + ties(v)) stays in
    BIGINT (doubling absorbs the tie half-credit). The symmetric pair
    satisfies u2_early + u2_late = 2 * n_early * n_late — an internal
    identity the oracle replays; perfect agreement of both engines on
    all five scalars pins ordering, tie handling, and the midpoint
    split. U's magnitude bounds BIGINT at ~3e9 rows per side; beyond
    that, pre-bucket values (the KS entry's bucket trick) before
    ranking."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    bounds = ev.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
    e = ev.crossJoin(F.broadcast(bounds)).select(
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        F.expr("CASE WHEN ts * 2 <= mn + mx THEN 1 ELSE 0 END").alias(
            "early"
        ),
    )
    g = e.groupBy("cents").agg(
        F.sum("early").cast("long").alias("n_e"),
        (F.count(F.lit(1)) - F.sum("early")).cast("long").alias("n_l"),
    )
    c = g.selectExpr(
        "cents",
        "n_e",
        "n_l",
        "COALESCE(sum(n_l) OVER (ORDER BY cents"
        " ROWS UNBOUNDED PRECEDING), 0) - n_l AS cl_below",
        "COALESCE(sum(n_e) OVER (ORDER BY cents"
        " ROWS UNBOUNDED PRECEDING), 0) - n_e AS ce_below",
    )
    return c.agg(
        F.sum("n_e").cast("long").alias("n_early"),
        F.sum("n_l").cast("long").alias("n_late"),
        F.expr(
            "CAST(sum(2 * n_e * cl_below + n_e * n_l) AS BIGINT)"
        ).alias("u2_early"),
        F.expr(
            "CAST(sum(2 * n_l * ce_below + n_e * n_l) AS BIGINT)"
        ).alias("u2_late"),
        F.expr("CAST(sum(n_e * n_l) AS BIGINT)").alias("tie_pairs"),
    )


# --- consistent pseudonymization (referential integrity kept) -------

_PSEUDO_SALT = "pseudo#2024"


@query(
    "pseudonymize_join_consistency",
    oracle=f"""
WITH c AS (
  SELECT md5('{_PSEUDO_SALT}' || CAST(c_custkey AS VARCHAR)) AS token,
         c_mktsegment
  FROM customer
),
o AS (
  SELECT md5('{_PSEUDO_SALT}' || CAST(o_custkey AS VARCHAR)) AS token,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT c.c_mktsegment,
       CAST(count(DISTINCT c.token) AS BIGINT) AS n_tokens,
       CAST(count(o.token) AS BIGINT) AS n_orders,
       CAST(COALESCE(sum(o.cents), 0) AS BIGINT) AS revenue_cents
FROM c LEFT JOIN o ON o.token = c.token
GROUP BY 1
""",
)
def pseudonymize_join_consistency(spark, sf_dir):
    """Deterministic salted-hash pseudonymization applied to BOTH
    sides of a foreign key, then joined on the tokens — the release
    pattern where raw ids never leave the trust boundary but
    referential analytics still work (same salt => same token =>
    joins survive; rotate the salt per release to kill cross-release
    linkability). The segment rollup proves the token join produces
    the same aggregate as the raw-key join would. Tokenization is
    in-row md5 (codegen); the join keys just got longer, nothing
    else changed shape."""
    c = load(spark, sf_dir, "customer").select(
        F.md5(
            F.concat(
                F.lit(_PSEUDO_SALT), F.col("c_custkey").cast("string")
            )
        ).alias("token"),
        "c_mktsegment",
    )
    o = load(spark, sf_dir, "orders").select(
        F.md5(
            F.concat(
                F.lit(_PSEUDO_SALT), F.col("o_custkey").cast("string")
            )
        ).alias("token"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (
        c.join(o, "token", "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("token").cast("long").alias("n_tokens"),
            F.count("cents").cast("long").alias("n_orders"),
            F.coalesce(F.sum("cents"), F.lit(0))
            .cast("long")
            .alias("revenue_cents"),
        )
    )
