"""Physical-plan assertions: the 100 TB scale contract.

Correctness is gated by the DuckDB oracles; these tests gate the
*plan*. Each assertion pins a property that keeps the operator viable
at 1000-executor scale — filters reaching the parquet scan, column
pruning, broadcast joins for small dims, partial (map-side)
aggregation, and — critically — that the temporal joins stay hash
joins instead of degrading to BroadcastNestedLoopJoin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advisorydatapipeline_spark.registry import QUERIES


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def full_plan(df) -> str:
    # includes AQE's final plan after .explain-style formatting
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = QUERIES["scan_filter_pushdown"](spark, sf_dir)
    p = full_plan(df)
    assert "PushedFilters: [" in p
    assert "l_quantity" in p.split("PushedFilters:")[1].split("]")[0]
    # column pruning: untouched wide columns never leave the scan
    assert "l_comment" not in p and "l_tax" not in p


def test_cast_projection_prunes_columns(spark, sf_dir):
    df = QUERIES["cast_projection"](spark, sf_dir)
    p = full_plan(df)
    schema_part = p.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" not in schema_part and "o_custkey" not in schema_part


def test_revenue_topn_broadcasts_dim_and_takeordered(spark, sf_dir):
    df = QUERIES["revenue_topn"](spark, sf_dir)
    p = plan(df)
    assert "BroadcastHashJoin" in p  # customer dim broadcast
    assert "TakeOrderedAndProject" in p  # top-N without a global sort


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    df = QUERIES["pricing_summary"](spark, sf_dir)
    p = plan(df)
    # map-side combine: partial_ aggregate functions before the shuffle
    assert "partial_sum" in p


def test_temporal_joins_never_nested_loop(spark, sf_dir):
    for name in ("asof_join_last_view", "range_join_views_before_purchase"):
        p = plan(QUERIES[name](spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "CartesianProduct" not in p, name


def test_asof_join_single_shuffle(spark, sf_dir):
    # union + window plan: exactly one Exchange on the join keys
    # feeding the window sort (plus AQE reads); a second shuffle would
    # mean the operator re-partitions needlessly
    df = QUERIES["asof_join_last_view"](spark, sf_dir)
    p = plan(df)
    n_exchange = p.count("Exchange hashpartitioning")
    assert n_exchange == 1, f"expected 1 shuffle, got {n_exchange}:\n{p}"


def test_left_anti_stays_hash_join(spark, sf_dir):
    p = plan(QUERIES["left_anti_cache_skip"](spark, sf_dir))
    assert "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_dedup_exact_partial_agg_no_text_shuffle(spark, sf_dir):
    df = QUERIES["dedup_exact"](spark, sf_dir)
    p = plan(df)
    assert "partial_min" in p or "partial_count" in p
    # the shuffle carries the 16-byte key, never the document text
    exchange_section = p[p.index("Exchange"):] if "Exchange" in p else ""
    assert "text#" not in exchange_section.split("\n")[0]


def test_q17_rejoin_is_copartitioned_hash_join(spark, sf_dir):
    """The Q17 shape aggregates lineitem on l_partkey then rejoins the
    result to lineitem on the same key. At scale (broadcast disabled)
    this must stay a co-partitioned sort-merge/hash join — one shuffle
    per side on the shared key, never a nested loop."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale AQE broadcasts the tiny aggregate side;
        # disabling broadcast exposes the at-scale join strategy
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = QUERIES["small_qty_brand_revenue"](spark, sf_dir)
        df.collect()  # finalize AQE
        p = full_plan(df)
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        # both rejoin sides partition on the same key
        assert p.count("hashpartitioning(l_partkey") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_semi_join_stays_semi(spark, sf_dir):
    df = QUERIES["priority_semi_join"](spark, sf_dir)
    df.collect()
    p = full_plan(df)
    assert "LeftSemi" in p
    # the probe-side filter must reach the lineitem scan
    pushed = [
        seg.split("]")[0]
        for seg in p.split("PushedFilters: [")[1:]
    ]
    assert any("l_returnflag" in s for s in pushed)


def test_range_frame_is_single_window_shuffle(spark, sf_dir):
    df = QUERIES["range_frame_rolling_sum"](spark, sf_dir)
    p = plan(df)
    # one Window operator evaluating a RANGE frame; no extra exchanges
    # beyond the user_id hash partitioning
    assert p.count("Window") >= 1
    assert "specifiedwindowframe(RangeFrame" in p or "RANGE" in p


def test_tfidf_scalar_is_broadcast_not_collect(spark, sf_dir):
    """The corpus-size scalar must arrive via a broadcast join — the
    plan proves no driver-side collect feeds a literal."""
    df = QUERIES["tfidf_top_terms"](spark, sf_dir)
    p = plan(df)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_q21_shape_single_orderkey_exchange_family(spark, sf_dir):
    """Q21's two correlated self-joins are rewritten as one per-order
    aggregate + rejoin; with broadcast off it must stay a
    co-partitioned hash/merge join on l_orderkey, never a loop."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = QUERIES["sole_fault_supplier"](spark, sf_dir)
        df.collect()
        p = full_plan(df)
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        assert p.count("hashpartitioning(l_orderkey") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_q22_shape_anti_join_and_broadcast_scalars(spark, sf_dir):
    df = QUERIES["idle_customer_balance"](spark, sf_dir)
    df.collect()
    p = full_plan(df)
    assert "LeftAnti" in p
    # any BNLJ must build its 1-row scalar side (BuildRight). Tree
    # lines carry the build side; detail-section headers don't — so
    # the check is "no BNLJ line declares BuildLeft" (a plan-wide
    # "BuildRight in p" would be satisfied by the anti join's own
    # build side and prove nothing)
    for ln in p.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "BuildLeft" not in ln, ln
    assert "CartesianProduct" not in p
    # the two global scalars arrive as broadcast 1-row sides
    assert p.count("BroadcastExchange") >= 2


def test_contrastive_triplets_semantics(spark, sf_dir):
    rows = QUERIES["contrastive_triplets"](spark, sf_dir).collect()
    assert rows, "expected at least one mined triplet"
    from advisorydatapipeline_spark.queries.helpers import load

    labels = {
        r["vec_id"]: r["label"]
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    for r in rows:
        assert r.positive_id != r.anchor_id
        assert r.negative_id != r.anchor_id
        assert labels[r.positive_id] == labels[r.anchor_id]
        assert labels[r.negative_id] != labels[r.anchor_id]
        assert -1.0 <= r.neg_cosine <= 1.0 and -1.0 <= r.pos_cosine <= 1.0


def test_group_normalization_bounds_and_broadcast(spark, sf_dir):
    df = QUERIES["group_normalized_features"](spark, sf_dir)
    p = plan(df)
    # stats dim broadcasts back onto the fact scan; map-side combine
    assert "BroadcastHashJoin" in p
    assert "partial_sum" in p
    agg = df.groupBy("l_returnflag").agg(
        F.min("qty_minmax").alias("lo"),
        F.max("qty_minmax").alias("hi"),
        F.max(F.abs(F.col("qty_z"))).alias("zmax"),
    )
    for r in agg.collect():
        assert r.lo == 0.0 and r.hi == 1.0
        assert r.zmax < 10


def test_q13_shape_keeps_zero_order_customers(spark, sf_dir):
    df = QUERIES["customer_order_distribution"](spark, sf_dir)
    p = plan(df)
    assert "LeftOuter" in p or "BroadcastHashJoin" in p
    total = df.agg(F.sum("custdist").alias("s")).collect()[0].s
    from advisorydatapipeline_spark.queries.helpers import load

    n_cust = load(spark, sf_dir, "customer").count()
    # every customer lands in exactly one histogram bucket —
    # zero-order customers included (the Q13 trap)
    assert total == n_cust


def test_parameterized_sql_binds_and_pushes_down(spark, sf_dir):
    df = QUERIES["parameterized_sql_filter"](spark, sf_dir)
    p = full_plan(df)
    pushed = "".join(
        seg.split("]")[0] for seg in p.split("PushedFilters: [")[1:]
    )
    # bound :min_qty / :flag params reach the parquet scan as literals
    assert "l_quantity" in pushed and "l_returnflag" in pushed


def test_sql_udf_inlines_no_python_worker(spark, sf_dir):
    df = QUERIES["sql_udf_revenue"](spark, sf_dir)
    p = plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "partial_sum" in p  # map-side combine over the inlined expr


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """The partitioned fact scan must carry a dynamic-pruning
    expression seeded by the broadcast dim — reading only the
    partitions the dim's filter selects."""
    df = QUERIES["dpp_partitioned_join"](spark, sf_dir)
    df.collect()
    p = full_plan(df)
    assert "dynamicpruning" in p.lower(), p[:2000]


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """At 100 TB the selective-dim join can't broadcast (dim too big);
    Spark's runtime bloom filter then pre-prunes the fact side before
    the shuffle. Pin that the optimizer injects bloom_filter_agg /
    might_contain when broadcast is off — the shape this engine relies
    on for selective dim joins at scale. (Threshold confs are lowered
    because the creation-side heuristics are sized for real clusters,
    not sf0.001 test files.)"""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pt = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
            F.col("p_size") == 1
        )
        j = li.join(pt, li.l_partkey == pt.p_partkey).groupBy(
            "p_brand"
        ).count()
        p = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in p and "might_contain" in p
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_zorder_layout_single_range_exchange(spark):
    """The z-order rewrite costs exactly one range-partition exchange
    (what any compaction rewrite pays) — no extra shuffles."""
    from advisorydatapipeline_spark.operators.layout import zorder_layout

    df = spark.range(1000).select(
        (F.col("id") % 97).alias("a"), (F.col("id") % 89).alias("b")
    )
    out = zorder_layout(df, F.col("a"), F.col("b"), partitions=4)
    p = plan(out)
    assert p.count("Exchange rangepartitioning") == 1
    assert p.count("Exchange hashpartitioning") == 0


def test_merge_into_single_join_no_extra_shuffle(spark):
    """merge_into is ONE outer join plus row-local projection: no
    window, no second join, no re-shuffle after the join."""
    from advisorydatapipeline_spark.operators.merge import (
        MergeClause,
        merge_into,
    )

    t = spark.range(100).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    s = spark.range(50).select(
        F.col("id").alias("k"), F.lit(2).alias("v")
    )
    out = merge_into(
        t, s, ["k"],
        when_matched=[MergeClause("update")],
        when_not_matched=[MergeClause("insert")],
    )
    p = plan(out)
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") == 1
    assert "Window" not in p


def test_duplicate_span_plan_shape(spark, sf_dir):
    """The r14 span extractor's scale contract: every window is
    PARTITIONED (seed-rank prefix intervals / per-doc), the two
    rank-neighbor windows (lead + lag) share one sort order so
    Catalyst plans them back-to-back without a second exchange, and
    nothing degrades to a cartesian product."""
    from advisorydatapipeline_spark.operators.suffix import (
        duplicate_span_plan,
    )
    from advisorydatapipeline_spark.queries.helpers import load

    out, dup = duplicate_span_plan(load(spark, sf_dir, "documents"))
    try:
        p = plan(out)
        assert "CartesianProduct" not in p
        # the lead and lag windows over the rank order appear as
        # adjacent Window nodes with NO exchange between them
        import re

        segs = re.split(r"Exchange", p)
        assert any(seg.count("Window") >= 2 for seg in segs)
        # plan_audit's detector agrees every window is partitioned
        import sys

        sys.path.insert(0, "tools")
        from plan_audit import global_window_count

        out.collect()
        from plan_audit import plan_of

        assert global_window_count(plan_of(out)) == 0
    finally:
        dup.unpersist()


def test_kn_trigram_plan_shape(spark, sf_dir):
    """KN trigram scale contract: the two count-of-counts model rows
    ride broadcast nested-loop joins (1-row frames), the apply join
    on (w1,w2,w3) stays a hash/sort-merge join, and no window exists
    anywhere (the per-doc n-gram slide is a map-side transform)."""
    from advisorydatapipeline_spark.operators.lm import (
        kneser_ney_trigram_plan,
    )
    from advisorydatapipeline_spark.queries.helpers import load

    out, handles = kneser_ney_trigram_plan(
        load(spark, sf_dir, "documents")
    )
    try:
        p = plan(out)
        # m3 + m2 model rows + mt3 + mt2 max_t rows (r15 tight guard)
        assert p.count("BroadcastNestedLoopJoin") == 4
        assert (
            p.count("SortMergeJoin") + p.count("ShuffledHashJoin")
            + p.count("BroadcastHashJoin") >= 5
        )
        assert "Window" not in p
        assert "CartesianProduct" not in p
    finally:
        for h in handles:
            h.unpersist()


def test_kn_bigram_plan_shape(spark, sf_dir):
    """KN bigram scale contract (r15, closing the r14 ADVICE plan
    blind spot): the count-of-counts model row rides ONE broadcast
    nested-loop join (1-row frame), the apply join on (w1,w2) stays a
    hash/sort-merge join, and no window exists anywhere — the per-doc
    bigram slide is a map-side transform. The eager localCheckpoint
    in the registry entry makes its plan a Scan ExistingRDD; THIS
    lazy seam is where the real plan stays pinned (plan_audit's
    CHECKPOINTED table audits the same seam)."""
    from advisorydatapipeline_spark.operators.lm import (
        kneser_ney_bigram_plan,
    )
    from advisorydatapipeline_spark.queries.helpers import load

    out, handles = kneser_ney_bigram_plan(
        load(spark, sf_dir, "documents")
    )
    try:
        p = plan(out)
        # model row + max_t bound row (r15 tight guard)
        assert p.count("BroadcastNestedLoopJoin") == 2
        assert (
            p.count("SortMergeJoin") + p.count("ShuffledHashJoin")
            + p.count("BroadcastHashJoin") >= 3
        )
        assert "Window" not in p
        assert "CartesianProduct" not in p
        # plan_audit's detector agrees no window is global
        import sys

        sys.path.insert(0, "tools")
        from plan_audit import global_window_count, plan_of

        out.collect()
        assert global_window_count(plan_of(out)) == 0
    finally:
        for h in handles:
            h.unpersist()


def test_global_window_detector_calibrated(spark, sf_dir):
    """Pin tools/plan_audit.global_window_count against known plans:
    a partition-less rank must count > 0, a partitioned window must
    count 0, and the bm25 TakeOrdered rewrite must still show its
    bounded k-row global rank (the allowlisted survivor). If a Spark
    upgrade changes the formatted-plan Arguments shape, this fails
    loudly instead of the audit silently reporting zero."""
    import sys

    sys.path.insert(0, "tools")
    from plan_audit import global_window_count, plan_of
    from pyspark.sql import Window

    df = spark.range(100).toDF("v")
    g = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v"))
    )
    g.collect()
    assert global_window_count(plan_of(g)) > 0
    p = df.withColumn("k", F.col("v") % 5).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("k").orderBy("v")
        ),
    )
    p.collect()
    assert global_window_count(plan_of(p)) == 0


def test_kn_5gram_plan_shape(spark, sf_dir):
    """KN order-5 scale contract (r15 window restructure, guide
    §2.4): each level's context totals / per-context type counts are
    PARTITIONED windows over that level's own frame (no groupBy-ctx +
    join-back pair), so the scoring chain is exactly 3 level
    equi-joins + the apply join on (w1..w5); the four count-of-counts
    model rows (which now carry their level's max_t bound — one pass,
    no separate mt crossJoin tower) ride broadcast nested-loop joins
    on 1-row frames; every window is partitioned (plan_audit's
    global-window detector agrees); nothing degrades to a cartesian
    product."""
    from advisorydatapipeline_spark.operators.lm import (
        kneser_ney_5gram_plan,
    )
    from advisorydatapipeline_spark.queries.helpers import load

    out, handles = kneser_ney_5gram_plan(
        load(spark, sf_dir, "documents")
    )
    try:
        p = plan(out)
        # m5+m4+m3+m2 model rows only (mt merged into them)
        assert p.count("BroadcastNestedLoopJoin") == 4
        assert (
            p.count("SortMergeJoin") + p.count("ShuffledHashJoin")
            + p.count("BroadcastHashJoin") >= 4
        )
        # 5 ctx windows: ctx5/ctx4/ctx3/ctx2 + the cc2-frame ncw5
        assert p.count("Window") >= 5
        assert "CartesianProduct" not in p
        import sys

        sys.path.insert(0, "tools")
        from plan_audit import global_window_count, plan_of

        out.collect()
        assert global_window_count(plan_of(out)) == 0
    finally:
        for h in handles:
            h.unpersist()
