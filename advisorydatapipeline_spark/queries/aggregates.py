"""Beyond-reference aggregation queries.

The reference has no groupBy at all (SURVEY.md §2.4) — an analytics
engine needs one. These cover grouped multi-aggregation (TPC-H-Q1
shape), join+agg+top-N (Q3 shape), and sessionization (the batch
analogue of the streaming session window).

Oracle-safety: double sums go through DECIMAL (exact, order-
independent); averages are DOUBLE(sum_dec)/count so both engines do
one identical IEEE division.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

SESSION_GAP_US = 3_600 * 1_000_000  # 1 hour in microseconds


@query(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: grouped 7-aggregate scan. Partial aggregation
    (map-side combine) means the shuffle carries |groups|×|mappers|
    rows regardless of input scale."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
        (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "revenue_topn",
    oracle="""
SELECT o.o_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       c.c_mktsegment
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, c.c_mktsegment
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def revenue_topn(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> join -> grouped sum ->
    global top-N. The customer dim is broadcast; lineitem and orders
    shuffle once on the join key; top-N is a TakeOrdered, no full
    sort."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "c_mktsegment")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "c_mktsegment")
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "sessionization",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                OR lag(epoch_us(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), sess AS (
  SELECT user_id, event_id, ts_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
FROM sess
GROUP BY user_id, session_id
""",
)
def sessionization(spark, sf_dir):
    """Sessionization: lag -> gap flag -> running sum -> grouped agg.
    The batch analogue of a streaming session window (see
    streaming/); one shuffle on user_id serves both windows and the
    final aggregation. Times are truncated to microseconds on both
    sides (DuckDB reads parquet TIMESTAMP_NS at us precision)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts DIV 1000").alias("ts_us"),  # integer division: exact
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.withColumn(
        "is_new",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US)
            | F.lag("ts_us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )


@query(
    "local_supplier_revenue",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def local_supplier_revenue(spark, sf_dir):
    """TPC-H Q5 shape: six-table star join with the local-supplier
    condition (customer and supplier in the same nation). The deep-
    join stress test for join ordering: region->nation->supplier
    collapse into one broadcast dim; the only shuffles are
    lineitem><orders on the order key and the customer join on the
    customer key — the date filter pushes into the orders scan."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    # dim collapse: supplier + nation + region -> one broadcast side
    sdim = s.join(
        F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sdim), li.l_suppkey == F.col("s_suppkey"))
        .join(
            c,
            (o.o_custkey == c.c_custkey)
            & (c.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_lineitems"),
        )
    )


@query(
    "price_qty_regression",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       (n * sxy - sx * sy)
         / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n
         AS intercept
FROM m
""",
)
def price_qty_regression(spark, sf_dir):
    """Correlation + least-squares fit per group, from EXACT decimal
    moments (n, Sx, Sy, Sxx, Syy, Sxy) — the repo's reproducibility
    rule applied to second-order statistics. Built-in corr()/
    regr_slope() accumulate in floats and are association-order-
    dependent (different answers per partitioning, unverifiable
    across engines); one partial-agg shuffle of six exact sums gives
    bit-stable statistics at any cluster size."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        "n",
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("corr"),
        slope.alias("slope"),
        ((sy - sx * slope) / n).alias("intercept"),
    )


@query(
    "sorted_event_type_sets",
    oracle="""
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events
WHERE event_type IS NOT NULL
GROUP BY 1
""",
)
def sorted_event_type_sets(spark, sf_dir):
    """Deterministic array aggregation: ``collect_set`` is unordered
    (and collect_list is partition-order-dependent), so the array is
    sorted before it leaves the aggregate — the only way an
    array-valued result can be value-compared across engines or
    reruns. Serialized to a joined string because the external
    driver's comparator only hashes scalar cells. One partial-agg
    shuffle; the set is bounded by the event-type vocabulary, not the
    row count."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_set("event_type")), "|"
        ).alias("types"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


@query(
    "session_window_api",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {SESSION_GAP_US}
                OR lag(epoch_us(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), sess AS (
  SELECT user_id, ts_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
)
SELECT user_id,
       min(ts_us) AS session_start_us,
       max(ts_us) + {SESSION_GAP_US} AS session_end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess
GROUP BY user_id, sid
""",
)
def session_window_api(spark, sf_dir):
    """`F.session_window` — the declarative twin of the manual
    lag/flag/running-sum sessionization: Spark merges events whose
    gap is STRICTLY under the timeout (a gap exactly equal to the
    timeout starts a new session — note the `>=` in the oracle's
    island flag, vs `>` in the manual twin) and reports the window as
    [first_event, last_event + gap). One shuffle on the grouping
    keys; the same operator runs unchanged over a watermarked stream
    (streaming_session_windows)."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ev = ev.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts DIV 1000"))
    )
    gap_s = SESSION_GAP_US // 1_000_000
    return (
        ev.groupBy(
            F.session_window("event_time", f"{gap_s} seconds").alias("w"),
            "user_id",
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )
