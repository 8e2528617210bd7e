"""Classic warehouse query shapes (TPC-H Q17/Q11/Q4/Q19 analogues).

These stress the planner patterns a 100 TB deployment lives on:
aggregate-then-rejoin on the same key (exchange reuse), global-scalar
thresholds via broadcast 1-row aggregates (never a collect), semi-
joins that never materialize the probe side, and disjunctive
predicates that Catalyst must split into pushable conjuncts.

All money math goes through DECIMAL casts (exact, order-independent)
before summing — the repo-wide oracle-portability rule.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


@query(
    "small_qty_brand_revenue",
    oracle=f"""
WITH avg_qty AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(count(*) AS BIGINT) AS avg_q
  FROM lineitem GROUP BY 1
)
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_small,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM lineitem l
JOIN avg_qty a ON l.l_partkey = a.l_partkey
JOIN part p    ON l.l_partkey = p.p_partkey
WHERE l.l_quantity < 0.5 * a.avg_q
GROUP BY p.p_brand
""",
)
def small_qty_brand_revenue(spark, sf_dir):
    """TPC-H Q17 shape: per-part average quantity computed once, then
    rejoined to lineitem to pick below-average rows. Both rejoin
    sides hash-partition on ``l_partkey`` (one shuffle each, then a
    co-partitioned merge join — never a nested loop; pinned by
    tests/test_explain_plans.py); the part dim is broadcast. No
    scalar ever touches the driver."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    avg_q = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_q")
    )
    return (
        li.join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_q"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_small"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


SHARE_THRESHOLD = 0.0102  # suppliers above ~102% of the mean share


@query(
    "supplier_value_share",
    oracle=f"""
WITH sval AS (
  SELECT l_suppkey, CAST(SUM({_REV}) AS DOUBLE) AS value
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(SUM({_REV}) AS DOUBLE) AS total FROM lineitem)
SELECT s.l_suppkey AS suppkey, s.value, s.value / t.total AS share
FROM sval s, tot t
WHERE s.value > {SHARE_THRESHOLD} * t.total
""",
)
def supplier_value_share(spark, sf_dir):
    """TPC-H Q11 shape: per-group value vs a global-total threshold.
    The total is a broadcast 1-row aggregate cross-joined in — the
    distributed replacement for the reference pattern of collecting a
    scalar to the driver. One shuffle (supplier key), exact decimal
    sums on both levels."""
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    sval = li.groupBy("l_suppkey").agg(F.sum(rev).cast("double").alias("value"))
    tot = li.agg(F.sum(rev).cast("double").alias("total"))
    return (
        sval.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > SHARE_THRESHOLD * F.col("total"))
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "value",
            (F.col("value") / F.col("total")).alias("share"),
        )
    )


@query(
    "priority_semi_join",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY 1
""",
)
def priority_semi_join(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS as a LEFT SEMI join — the probe side is
    never materialized into the output, duplicates on the build side
    cost nothing, and the filter on the inner table pushes into its
    scan before the shuffle."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )


@query(
    "disjunctive_filter_revenue",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 15 AND l.l_quantity >= 1
       AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size <= 30 AND l.l_quantity >= 10
       AND l.l_quantity <= 40)
""",
)
def disjunctive_filter_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides.
    Catalyst extracts the common sub-predicates per side (brand/size
    -> part scan, quantity bounds -> lineitem scan) so the disjunction
    filters before the broadcast join, not after."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size") <= 15)
        & F.col("l_quantity").between(1, 20)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size") <= 30)
        & F.col("l_quantity").between(10, 40)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    return joined.filter(cond1 | cond2).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(rev).cast("double").alias("revenue"),
    )
