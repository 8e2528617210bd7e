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
from pyspark.sql.window import Window

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


@query(
    "sole_fault_supplier",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R'
                             THEN l_suppkey END) AS n_fault_supp
  FROM lineitem GROUP BY 1
)
SELECT l.l_suppkey AS suppkey,
       CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l
JOIN per_order o ON l.l_orderkey = o.l_orderkey
WHERE l.l_returnflag = 'R'
  AND o.n_supp >= 2
  AND o.n_fault_supp = 1
GROUP BY 1
""",
)
def sole_fault_supplier(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    classic EXISTS-other-supplier AND NOT-EXISTS-other-faulting-
    supplier pair, rewritten as ONE per-order aggregate that is
    rejoined to the fact — `n_supp >= 2` encodes the EXISTS and
    `n_fault_supp = 1` (with the row itself faulting) encodes the NOT
    EXISTS. Two correlated self-joins collapse into a single
    `l_orderkey` shuffle shared by the aggregate and the rejoin; at
    100 TB that's one exchange instead of three full lineitem scans.
    Return-flag 'R' stands in for the receipt-after-commit fault
    (this dataset carries no commit/receipt dates)."""
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_fault_supp"),
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_fault_supp") == 1))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count("*").cast("long").alias("numwait"))
    )


IDLE_DAYS = 180


@query(
    "idle_customer_balance",
    oracle=f"""
WITH thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(count(*) AS BIGINT) AS avg_bal
  FROM customer WHERE c_acctbal > 0
),
recent AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= (
    SELECT max(o_orderdate) - INTERVAL {IDLE_DAYS} DAY FROM orders
  )
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         AS total_bal
FROM customer c, thr t
WHERE c.c_acctbal > t.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM recent r WHERE r.o_custkey = c.c_custkey
  )
GROUP BY 1
""",
)
def idle_customer_balance(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no
    recent orders (none in the trailing {IDLE_DAYS} days of the
    dataset — every customer has SOME order, so strict never-ordered
    is vacuous here). Two global scalars — the balance mean and the
    recency cutoff — are exact 1-row aggregates broadcast in, never
    collected; the NOT EXISTS is a LEFT ANTI join on `c_custkey`.
    Market segment stands in for Q22's phone country code. At scale:
    the anti join shuffles the customer key once, and the orders side
    is filtered by the cutoff and projected to the single join column
    before the exchange."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    thr = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(bal).cast("double") / F.count("*")).alias("avg_bal"))
    )
    cutoff = o.agg(
        F.expr(f"max(o_orderdate) - INTERVAL {IDLE_DAYS} DAYS").alias(
            "cutoff"
        )
    )
    recent = (
        o.crossJoin(F.broadcast(cutoff))
        .filter(F.col("o_orderdate") >= F.col("cutoff"))
        .select("o_custkey")
    )
    return (
        c.join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            F.sum(bal).cast("double").alias("total_bal"),
        )
    )


@query(
    "customer_order_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey,
         CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY 1
""",
)
def customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: the order-count histogram must keep
    customers with ZERO qualifying orders, so the filter lives in the
    JOIN CONDITION of a left outer join (a WHERE would silently drop
    them) and `count(o_orderkey)` counts only matched rows. Two
    cascaded aggregations: the first shuffles on the customer key the
    join already partitioned by (no extra exchange), the second
    reduces to a tiny histogram keyed by count. At scale the orders
    side is pre-filtered and projected to one column before its
    exchange."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = c.join(
        o,
        (o.o_custkey == c.c_custkey)
        & (o.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").cast("long").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


LARGE_QTY = 150


@query(
    "large_order_customers",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {LARGE_QTY}
)
SELECT c.c_name, o.o_orderkey,
       CAST(o.o_totalprice AS DOUBLE) AS total_price,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_qty
FROM orders o
JOIN big b ON b.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3
""",
)
def large_order_customers(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total quantity clears a HAVING
    threshold, rejoined to fetch customer detail. The aggregate-
    filtered key set joins LEFT SEMI onto orders (the driver never
    sees it), and the lineitem rejoin reuses the same `l_orderkey`
    hash partitioning as the HAVING aggregate — at scale that is one
    lineitem shuffle feeding both the threshold and the final sum.
    Customer is broadcast."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("q"))
        .filter(F.col("q") > LARGE_QTY)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("total_price"),
        )
        .agg(F.sum(qty).cast("double").alias("sum_qty"))
    )


@query(
    "forecast_revenue_band",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def forecast_revenue_band(spark, sf_dir):
    """TPC-H Q6 shape: the pure-scan aggregate every columnar engine
    is benchmarked on — all four predicates (date range, discount
    band, quantity cap) must reach PushedFilters, the projection
    prunes to three columns, and the sum is one partial-agg reduce
    with no shuffle of row data. Decimal product keeps the money math
    exact on both engines."""
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("long").alias("n"),
        )
    )


@query(
    "returned_item_ranking",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def returned_item_ranking(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most revenue — fact-to-fact
    join (orders x lineitem) hash-shuffled on the order key with the
    returnflag filter pushed into the lineitem scan, dimension joins
    (customer, nation) broadcast, then a grouped top-20. The revenue
    sort has the custkey tiebreak both engines share."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    dec = lambda x: F.col(x).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "promo_revenue_share",
    oracle="""
SELECT CAST(100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
             THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(18,2)) END)
       / SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS promo_pct,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01'
""",
)
def promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional-share aggregate — promo revenue
    over total revenue for one month. The part dimension broadcasts;
    the month filter prunes the fact scan; both sums ride one
    partial-agg reduce and the division happens once on the single
    result row. Decimal sums keep the ratio bit-stable; the final
    divide is one IEEE op, deterministic on both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    dec = lambda x: F.col(x).cast("decimal(18,2)")  # noqa: E731
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero)
            )
            / F.sum(rev)
        )
        .cast("double")
        .alias("promo_pct"),
        F.count("*").cast("long").alias("n"),
    )


@query(
    "nation_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS volume
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
""",
)
def nation_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume — a six-table join where
    the disjunctive nation-pair predicate can only be applied AFTER
    both dimension joins. The two fact tables hash-join on the order
    key; supplier/customer/nation dims broadcast; the date band is
    pushed into the fact scan. The classic join-ORDER stress: filters
    that live on opposite branches of the join tree."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    dec = lambda x: F.col(x).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("volume")
        )
    )


@query(
    "regional_market_share",
    oracle="""
WITH all_orders AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n1.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
  JOIN part p     ON p.p_partkey = l.l_partkey
  WHERE r.r_name = 'ASIA' AND p.p_type LIKE 'ECO%'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         AS nation_volume,
       CAST(SUM(volume) AS DOUBLE) AS total_volume
FROM all_orders
GROUP BY o_year
""",
)
def regional_market_share(spark, sf_dir):
    """TPC-H Q8 shape: a nation's share of regional trade in one part
    segment — eight tables, two roles for nation (customer-side
    region filter, supplier-side share tag). Dims broadcast; the two
    facts hash-join once; the share is two conditional decimal sums
    in one reduce (the oracle-portable form of sum(case)/sum)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load(spark, sf_dir, "part").filter(F.col("p_type").like("ECO%"))
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    dec = lambda x: F.col(x).cast("decimal(18,2)")  # noqa: E731
    vol = dec("l_extendedprice") * (1 - dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(zero)
            ).cast("double").alias("nation_volume"),
            F.sum("volume").cast("double").alias("total_volume"),
        )
    )


@query(
    "percent_of_parent_rollup",
    oracle="""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS nation_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, nation_cents,
       CAST(sum(nation_cents) OVER (PARTITION BY region) AS BIGINT)
         AS region_cents,
       CAST(nation_cents * 1000000
            // CAST(sum(nation_cents) OVER (PARTITION BY region)
                    AS BIGINT) AS BIGINT) AS share_ppm
FROM rev
""",
)
def percent_of_parent_rollup(spark, sf_dir):
    """Percent-of-parent hierarchical rollup: nation revenue as an
    integer-ppm share of its region (the drill-down tree every BI
    tool renders). Revenue rides as floor-cents — the per-row double
    product is IEEE-identical in both engines, and everything after
    it is integer. One star-join pass (nation/region dims broadcast)
    to a |nations|-row rollup; the percent-of-parent window runs on
    that tiny table only."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100)"
            " AS BIGINT)"
        ).alias("_c"),
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("region", "nation")
        .agg(F.sum("_c").alias("nation_cents"))
    )
    wr = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        "nation_cents",
        F.sum("nation_cents").over(wr).alias("region_cents"),
        F.expr(
            "nation_cents * 1000000 DIV "
            "sum(nation_cents) OVER (PARTITION BY region)"
        ).alias("share_ppm"),
    )


@query(
    "ship_latency_percentiles",
    oracle="""
WITH lat AS (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(quantile_disc(days, 0.5) AS BIGINT) AS p50_days,
       CAST(quantile_disc(days, 0.9) AS BIGINT) AS p90_days,
       CAST(quantile_disc(days, 0.99) AS BIGINT) AS p99_days,
       CAST(max(days) AS BIGINT) AS max_days
FROM lat GROUP BY o_orderpriority
""",
)
def ship_latency_percentiles(spark, sf_dir):
    """Order-to-ship latency SLA report: exact discrete percentiles
    of ship delay (days) per order priority — the ops-latency shape
    (p50/p90/p99) every SLA dashboard renders, computed EXACTLY
    (discrete percentile of integer days dodges both engines'
    interpolation differences). One fact join with the dim broadcast
    and a grouped percentile agg; at petabyte scale swap the exact
    percentile for the mergeable histogram sketch entry — the
    contract here is the exact twin."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).cast("long").alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile_approx(days, 0.5, 2147483647)")
        .cast("long")
        .alias("p50_days"),
        F.expr("percentile_approx(days, 0.9, 2147483647)")
        .cast("long")
        .alias("p90_days"),
        F.expr("percentile_approx(days, 0.99, 2147483647)")
        .cast("long")
        .alias("p99_days"),
        F.max("days").alias("max_days"),
    )
