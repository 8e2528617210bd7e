"""Window / sort / top-k parity queries (SURVEY.md §2.5–2.6).

Covers: W1 row_number top-1 dedup, its shuffle-light max_by twin
(A4), top-k per group, O1 CASE-ranked ordering, O2 multi-column sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.registry import query
from advisorydatapipeline_spark.operators.window_ops import (
    max_by_per_key,
    top_k_per_key,
)
from advisorydatapipeline_spark.queries.helpers import load


@query(
    "window_top1_per_key",
    oracle="""
SELECT user_id, event_id, event_type, value
FROM (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY value DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
""",
)
def window_top1_per_key(spark, sf_dir):
    """W1: the reference's priority-dedup window
    (map_new_info_with_udf.py:41-50) as a reusable operator."""
    ev = load(spark, sf_dir, "events")
    return top_k_per_key(
        ev, ["user_id"], [F.col("value").desc(), F.col("event_id").desc()], k=1
    ).select("user_id", "event_id", "event_type", "value")


@query(
    "topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC
         ) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def topk_per_group(spark, sf_dir):
    """Top-K generalization of W1."""
    o = load(spark, sf_dir, "orders")
    return top_k_per_key(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").desc()],
        k=3,
    ).select("o_custkey", "o_orderkey", "o_totalprice")


@query(
    "grouped_max_by",
    oracle="""
SELECT o_custkey AS cust_key, o_orderkey AS best_orderkey,
       o_totalprice AS best_total
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC
         ) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def grouped_max_by(spark, sf_dir):
    """A4: top-1 via groupBy(max(struct)) — partial aggregation sends
    one row per key per mapper to the shuffle, strictly less IO than
    the window at 100 TB. Equivalent semantics proven by sharing the
    window oracle."""
    o = load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "cust_key")
    out = max_by_per_key(
        o, ["cust_key"], ["o_totalprice", "o_orderkey"], ["o_orderkey", "o_totalprice"]
    )
    return out.select(
        "cust_key",
        F.col("o_orderkey").alias("best_orderkey"),
        F.col("o_totalprice").alias("best_total"),
    )


@query(
    "case_ranked_order",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                 WHEN o_orderpriority = '2-HIGH' THEN 2
                 WHEN o_orderpriority = '3-MEDIUM' THEN 3
                 WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 4
                 ELSE 5 END AS INT) AS sort_rank
FROM orders
ORDER BY sort_rank, o_orderkey
""",
)
def case_ranked_order(spark, sf_dir):
    """O1/O2: custom CASE-expression rank ordering
    (map_new_info_with_udf.py:170-178)."""
    o = load(spark, sf_dir, "orders")
    rank = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 3)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 4)
        .otherwise(5)
        .cast("int")
    )
    return (
        o.select("o_orderkey", "o_orderpriority", rank.alias("sort_rank"))
        .orderBy("sort_rank", "o_orderkey")
    )


@query(
    "window_running_metrics",
    oracle="""
SELECT user_id, event_id,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_value,
       CAST(row_number() OVER w AS INT) AS seq
FROM events
WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_running_metrics(spark, sf_dir):
    """Analytic-window suite: lag/lead neighbors, an exact running
    total (per-value DECIMAL cast — a raw double running sum is
    ulp-unstable across engines), and a sequence number, all over one
    (user, time) window — so Spark plans a single sort-within-
    partition pass, no extra shuffles per function. Tiebreak on
    event_id keeps every frame deterministic."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(run)
        .cast("double")
        .alias("running_value"),
        F.row_number().over(w).cast("int").alias("seq"),
    )


@query(
    "ntile_length_quartiles",
    oracle="""
SELECT lang, doc_id, n_chars,
       CAST(ntile(4) OVER (
         PARTITION BY lang ORDER BY n_chars, doc_id
       ) AS INT) AS quartile
FROM documents
""",
)
def ntile_length_quartiles(spark, sf_dir):
    """NTILE bucketing: per-language length quartiles — the split key
    for curriculum/stratified sampling by document size. One window
    shuffle on the shard key; deterministic tiebreak on doc_id."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "lang",
        "doc_id",
        "n_chars",
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@query(
    "limit_offset_page",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50 OFFSET 100
""",
)
def limit_offset_page(spark, sf_dir):
    """Keyset-less pagination (ORDER BY ... LIMIT/OFFSET, Spark 3.4+):
    page 3 of the price-ranked orders with a unique tiebreak so the
    page content is deterministic. (At scale, OFFSET still sorts and
    skips — real APIs should keyset-paginate on (price, orderkey);
    this entry pins the operator itself.)"""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .offset(100)
        .limit(50)
    )


@query(
    "window_value_functions",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       first_value(o_orderkey) OVER w AS cheapest_key,
       last_value(o_orderkey) OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS priciest_key,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_cheapest_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
""",
)
def window_value_functions(spark, sf_dir):
    """first_value / last_value / nth_value — the value-extraction
    window family. last/nth use an explicit unbounded frame: the
    default frame ends at CURRENT ROW, the classic silent-wrong-answer
    trap this oracle entry pins down in both engines."""
    from pyspark.sql.window import Window

    order = [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    w = Window.partitionBy("o_orderpriority").orderBy(*order)
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(w_full).alias("priciest_key"),
        F.nth_value("o_orderkey", 2).over(w_full).alias(
            "second_cheapest_key"
        ),
    )
