"""Salted aggregation / join must equal their unsalted twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "n": ("1", "count"),
            "qty": ("CAST(l_quantity AS DECIMAL(18,2))", "sum"),
            "min_ship": ("l_shipdate", "min"),
            "max_ship": ("l_shipdate", "max"),
        },
        salt_buckets=8,
        salt_on="l_orderkey",
    )
    want = li.groupBy("l_returnflag").agg(
        F.count(F.expr("1")).alias("n"),
        F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,2))")).alias("qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    g = {r.l_returnflag: (r.n, r.qty, r.min_ship, r.max_ship)
         for r in got.collect()}
    w = {r.l_returnflag: (r.n, r.qty, r.min_ship, r.max_ship)
         for r in want.collect()}
    assert g == w


def test_salted_aggregate_random_salt_still_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = salted_aggregate(
        li, ["l_linestatus"], {"n": ("1", "count")}, salt_buckets=4
    )
    want = dict(li.groupBy("l_linestatus").count().collect())
    assert {r.l_linestatus: r.n for r in got.collect()} == want


def test_salted_join_equals_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    dim = orders.select("o_orderkey", "o_orderstatus").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    got = salted_join(
        li, dim, ["l_orderkey"], salt_buckets=4, salt_on="l_linenumber"
    )
    want = li.join(dim, "l_orderkey")
    assert got.count() == want.count()
    g = {(r.l_orderkey, r.l_linenumber, r.o_orderstatus)
         for r in got.collect()}
    w = {(r.l_orderkey, r.l_linenumber, r.o_orderstatus)
         for r in want.collect()}
    assert g == w


def test_salted_join_left_keeps_unmatched(spark):
    f = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    d = spark.createDataFrame([(1, "X")], "k long, w string")
    out = salted_join(f, d, ["k"], salt_buckets=3, salt_on="v", how="left")
    rows = {r.k: r.w for r in out.collect()}
    assert rows == {1: "X", 2: None}


def test_join_cardinality_profile_exact(spark):
    from pyspark.sql import functions as F

    from advisorydatapipeline_spark.operators.skew import (
        join_cardinality_profile,
    )

    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (3,)], "k long"
    )
    right = spark.createDataFrame(
        [(1,), (1,), (3,), (4,)], "r long"
    )
    prof = join_cardinality_profile(left, right, "k", "r")
    rows = {r.k: (r.n_left, r.n_right, r.pairs) for r in prof.collect()}
    # key 2 (no right match) and 4 (no left match) are absent
    assert rows == {1: (3, 2, 6), 3: (2, 1, 2)}
    # profile total equals the actual join cardinality
    total = prof.agg(F.sum("pairs")).collect()[0][0]
    actual = left.join(right, left.k == right.r).count()
    assert total == actual == 8
