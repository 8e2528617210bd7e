"""Bucketed tables must join without any Exchange (co-location)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)


def test_bucketed_join_has_no_shuffle_and_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])

    # at test scale the planner would broadcast (which also skips the
    # shuffle but proves nothing about bucketing); force the fact-to-
    # fact path the operator exists for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan

        want = orders.join(li, "o_orderkey").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
