"""MERGE INTO parity query: the full ANSI clause matrix, value-gated.

The reference's risk register aspires to Iceberg MERGE
(/root/reference/README.md:64) but implements only an overwrite-style
upsert (state_machine/pipeline.py:72-95; covered by
``upsert_anti_union`` / ``ttl_cache_merge``). This entry exercises
:func:`operators.merge.merge_into` — all four clause kinds with
first-match-wins ordering — and gates the post-merge state against a
DuckDB replay of the same semantics in set algebra (JOIN /
NOT-IN-split branches), an intentionally independent formulation.

Scenario (deterministic, integer-exact):
  target  customers (bal in cents, BIGINT)
  source  per-customer order stats, plus a shifted-key slice
          (c_custkey + 1_000_000 for c_custkey % 97 == 0) so the
          NOT MATCHED insert path has rows to fire on
  WHEN MATCHED AND n_ord >= 20    -> UPDATE bal += spend DIV 100,
                                     segment = 'VIP'
  WHEN MATCHED AND bal < 0        -> DELETE   (only if clause 1 missed)
  WHEN NOT MATCHED                -> INSERT ('acct-<k>', 'NEW',
                                     spend DIV 1000)
  WHEN NOT MATCHED BY SOURCE
       AND bal < -50000           -> DELETE

All arithmetic is non-negative-dividend integer DIV, exact in both
engines; sums are cast to BIGINT before any reuse (HUGEINT guard).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.merge import MergeClause, merge_into
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

_MERGE_ORACLE = """
WITH tgt AS (
  SELECT c_custkey, c_name, c_mktsegment,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
base AS (
  SELECT o_custkey AS c_custkey,
         CAST(count(*) AS BIGINT) AS n_ord,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY o_custkey
),
src AS (
  SELECT * FROM base
  UNION ALL
  SELECT c_custkey + 1000000, n_ord, spend_cents
  FROM base WHERE c_custkey % 97 = 0
),
m_out AS (
  SELECT t.c_custkey,
         t.c_name,
         CASE WHEN s.n_ord >= 20 THEN 'VIP' ELSE t.c_mktsegment END
           AS c_mktsegment,
         CASE WHEN s.n_ord >= 20
              THEN t.bal_cents + s.spend_cents // 100
              ELSE t.bal_cents END AS bal_cents
  FROM tgt t JOIN src s ON t.c_custkey = s.c_custkey
  WHERE s.n_ord >= 20 OR t.bal_cents >= 0
),
t_only AS (
  SELECT c_custkey, c_name, c_mktsegment, bal_cents
  FROM tgt
  WHERE c_custkey NOT IN (SELECT c_custkey FROM src)
    AND bal_cents >= -50000
),
s_only AS (
  SELECT s.c_custkey,
         'acct-' || CAST(s.c_custkey AS VARCHAR) AS c_name,
         'NEW' AS c_mktsegment,
         s.spend_cents // 1000 AS bal_cents
  FROM src s
  WHERE s.c_custkey NOT IN (SELECT c_custkey FROM tgt)
)
SELECT * FROM m_out
UNION ALL SELECT * FROM t_only
UNION ALL SELECT * FROM s_only
"""


@query("merge_into_customers", oracle=_MERGE_ORACLE)
def merge_into_customers(spark, sf_dir):
    """Post-merge customer state via the merge_into operator."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    base = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count("*").cast("long").alias("n_ord"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("spend_cents"),
        )
    )
    src = base.unionByName(
        base.filter(F.col("c_custkey") % 97 == 0).withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(1_000_000)
        )
    )
    return merge_into(
        cust,
        src,
        ["c_custkey"],
        when_matched=[
            MergeClause(
                "update",
                "s.n_ord >= 20",
                {
                    "bal_cents": "t.bal_cents + s.spend_cents DIV 100",
                    "c_mktsegment": "'VIP'",
                },
            ),
            MergeClause("delete", "t.bal_cents < 0"),
        ],
        when_not_matched=[
            MergeClause(
                "insert",
                None,
                {
                    "c_name": "concat('acct-', cast(s.c_custkey as string))",
                    "c_mktsegment": "'NEW'",
                    "bal_cents": "s.spend_cents DIV 1000",
                },
            )
        ],
        when_not_matched_by_source=[
            MergeClause("delete", "t.bal_cents < -50000"),
        ],
    )


_CDC_ORACLE = """
WITH net AS (
  SELECT user_id, event_id, op, value_cents, n_ops FROM (
    SELECT user_id, event_id,
           CASE event_type WHEN 'error' THEN 'D'
                WHEN 'signup' THEN 'I' ELSE 'U' END AS op,
           CAST(floor(value * 100) AS BIGINT) AS value_cents,
           COUNT(*) OVER (PARTITION BY user_id) AS n_ops,
           ROW_NUMBER() OVER (
             PARTITION BY user_id
             ORDER BY epoch_ns(ts) DESC, event_id DESC
           ) AS rn
    FROM events
  ) WHERE rn = 1
),
base AS (
  SELECT c_custkey, c_name,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
)
SELECT
  COALESCE(b.c_custkey, n.user_id) AS c_custkey,
  CASE WHEN b.c_custkey IS NULL
       THEN concat('cdc-', CAST(n.user_id AS VARCHAR))
       ELSE b.c_name END AS c_name,
  CASE WHEN n.user_id IS NULL THEN b.bal_cents
       ELSE n.value_cents END AS bal_cents,
  CASE WHEN b.c_custkey IS NULL THEN 'inserted'
       WHEN n.user_id IS NULL THEN 'base'
       ELSE 'updated' END AS src,
  COALESCE(n.n_ops, 0) AS n_ops
FROM base b
FULL OUTER JOIN net n ON b.c_custkey = n.user_id
WHERE n.op IS NULL OR n.op <> 'D'
"""


@query("cdc_apply_changelog", oracle=_CDC_ORACLE)
def cdc_apply_changelog(spark, sf_dir):
    """Net-then-apply CDC materialization (Debezium-to-warehouse
    shape): an out-of-order changelog is first NETTED per key (latest
    op by event time wins; one window shuffle over the changelog only)
    and the compacted net — one row per touched key, tombstones
    included — is applied to the base snapshot with a single full
    outer join. Beyond-reference op: the reference's upsert
    (state_machine/pipeline.py:72-95) has no delete semantics; CDC
    tombstones are the missing third verb.

    100 TB: netting shuffles only the changelog (days of deltas, not
    the snapshot); the apply join shuffles base+net once on the key —
    the minimum possible for a full-snapshot rewrite. With a bucketed
    base table the apply is shuffle-free on the base side.

    Op mapping over events: signup=I, error=D (tombstone), else U;
    payload is the op's value in cents (integer-exact floor)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    net = (
        ev.select(
            "user_id",
            "event_id",
            F.when(F.col("event_type") == "error", "D")
            .when(F.col("event_type") == "signup", "I")
            .otherwise("U")
            .alias("op"),
            F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
            F.col("ts"),
        )
        .withColumn("n_ops", F.count("*").over(Window.partitionBy("user_id")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "ts")
    )
    base = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    applied = base.join(
        net, base["c_custkey"] == net["user_id"], "full_outer"
    ).filter(F.col("op").isNull() | (F.col("op") != "D"))
    return applied.select(
        F.coalesce(base["c_custkey"], net["user_id"]).alias("c_custkey"),
        F.when(
            base["c_custkey"].isNull(),
            F.concat(F.lit("cdc-"), net["user_id"].cast("string")),
        )
        .otherwise(base["c_name"])
        .alias("c_name"),
        F.when(net["user_id"].isNull(), base["bal_cents"])
        .otherwise(net["value_cents"])
        .alias("bal_cents"),
        F.when(base["c_custkey"].isNull(), "inserted")
        .when(net["user_id"].isNull(), "base")
        .otherwise("updated")
        .alias("src"),
        F.coalesce(net["n_ops"], F.lit(0)).cast("long").alias("n_ops"),
    )


# --- incremental view maintenance: join delta identity --------------

_IVM_CUT = "2001-01-01"  # old view ~92% of rows, deltas the sliver


@query(
    "ivm_join_delta",
    oracle=f"""
SELECT o.o_orderkey, c.c_custkey, c.c_nationkey,
       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
""",
)
def ivm_join_delta(spark, sf_dir):
    """Incremental view maintenance for a JOIN view, the textbook
    delta identity: with base snapshots A,B and deltas dA,dB,

        (A+dA) JOIN (B+dB) = A JOIN B          (the materialized view)
                           + dA JOIN B
                           + A  JOIN dB
                           + dA JOIN dB        (the term people forget)

    Here dA = orders after a cutoff date and dB = a late-arriving
    customer slice (custkey % 10 == 0); the query materializes the
    old view and the three delta terms and unions them — the ORACLE
    is the full recompute, so the gate proves the identity holds on
    real data. At 100 TB this is the difference between joining two
    deltas against snapshots and re-joining two snapshots: the delta
    terms are each proportional to the CHANGES (dA JOIN B broadcast
    or DPP-pruned), and the view updates in place.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    cut = F.lit(_IVM_CUT).cast("timestamp_ntz")
    a_old = o.filter(F.col("o_orderdate") < cut)
    da = o.filter(F.col("o_orderdate") >= cut)
    b_old = c.filter(F.col("c_custkey") % 10 != 0)
    db = c.filter(F.col("c_custkey") % 10 == 0)

    def j(left, right):
        return left.join(
            right, left.o_custkey == right.c_custkey
        ).select("o_orderkey", "c_custkey", "c_nationkey", "cents")

    view_old = j(a_old, b_old)  # the materialized view
    delta = (
        j(da, b_old)
        .unionByName(j(a_old, db))
        .unionByName(j(da, db))
    )
    return view_old.unionByName(delta)
