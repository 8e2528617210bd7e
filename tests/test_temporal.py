"""Unit tests for the temporal join operators (asof + binned range)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "k"), (2, 205, "k"), (3, 50, "k"), (4, 100, "z")],
        "lid long, ts long, key string",
    )
    right = spark.createDataFrame(
        [
            (10, 100, "k", 1.0),   # exact tie with lid=1 -> inclusive match
            (11, 200, "k", 2.0),
            (12, 205, "k", 3.0),   # wins for lid=2 (most recent <=)
            (13, 205, "k", 4.0),   # same ts, higher rid -> tiebreak winner
            (14, 999, "z", 5.0),   # after every left z row -> no match
        ],
        "rid long, rts long, key string, rv double",
    )
    return left, right


def test_asof_join_backward_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, ["key"], "ts", "rts", ["rid", "rv"], tiebreak="rid"
    )
    got = {r.lid: (r.rid_r, r.rv_r, r.rts_r) for r in out.collect()}
    assert got[1] == (10, 1.0, 100)      # equal ts matches (inclusive)
    assert got[2] == (13, 4.0, 205)      # tie on rts -> max tiebreak wins
    assert got[3] == (None, None, None)  # nothing at-or-before
    assert got[4] == (None, None, None)  # key isolation + future right row
    assert out.count() == left.count()   # left join: every left row kept


def test_range_join_binned_matches_naive(spark):
    left, right = _frames(spark)
    l2 = left.select(F.col("lid"), F.col("ts").alias("lts"), "key")
    r2 = right.select(F.col("rid"), F.col("rts"), F.col("key").alias("rkey"))
    width = 100
    binned = range_join_binned(
        l2, r2.withColumnRenamed("rkey", "key"), ["key"], "lts", "rts", width
    )
    got = {(r.lid, r.rid) for r in binned.collect()}
    naive = (
        l2.join(r2.withColumnRenamed("rkey", "key"), "key")
        .filter((F.col("lts") - F.col("rts")).between(0, width))
    )
    want = {(r.lid, r.rid) for r in naive.collect()}
    assert got == want
    assert (1, 10) in got and (2, 11) in got and (2, 12) in got


def test_range_join_binned_boundary_inclusive(spark):
    left = spark.createDataFrame([(1, 1000, "k")], "lid long, lts long, key string")
    right = spark.createDataFrame(
        [(20, 900, "k"), (21, 899, "k"), (22, 1000, "k"), (23, 1001, "k")],
        "rid long, rts long, key string",
    )
    out = range_join_binned(left, right, ["key"], "lts", "rts", 100)
    got = {r.rid for r in out.collect()}
    assert got == {20, 22}  # [lts-width, lts] inclusive both ends


# --- interval_cover_join -----------------------------------------------------


def test_interval_cover_join_boundaries_and_spans(spark):
    from advisorydatapipeline_spark.operators.temporal import (
        interval_cover_join,
    )

    # width 100; intervals deliberately: shorter than a bin, exactly a
    # bin, spanning many bins, and duplicated key-space
    intervals = spark.createDataFrame(
        [
            ("k", 1, 100, 200),   # one bin
            ("k", 2, 150, 165),   # sub-bin span, straddles nothing
            ("k", 3, 90, 410),    # spans bins 0..4
            ("z", 4, 100, 200),   # other key, same range as iid=1
        ],
        "key string, iid long, s long, e long",
    )
    points = spark.createDataFrame(
        [
            ("k", 10, 100),   # == start of iid=1 -> included; in iid=3
            ("k", 11, 200),   # == end of iid=1 -> EXCLUDED; in iid=3
            ("k", 12, 160),   # in iid=1, iid=2, iid=3
            ("k", 13, 409),   # last instant of iid=3
            ("k", 14, 410),   # == end of iid=3 -> excluded entirely
            ("z", 15, 150),   # key isolation: only iid=4
        ],
        "key string, pid long, p long",
    )
    got = {
        (r.pid, r.iid)
        for r in interval_cover_join(
            points, intervals, ["key"], "p", "s", "e", 100
        ).collect()
    }
    want = {
        (10, 1), (10, 3),
        (11, 3),
        (12, 1), (12, 2), (12, 3),
        (13, 3),
        (15, 4),
    }
    assert got == want


def test_interval_cover_join_no_duplicate_pairs(spark):
    from advisorydatapipeline_spark.operators.temporal import (
        interval_cover_join,
    )

    # an interval spanning many bins must still meet each point ONCE
    intervals = spark.createDataFrame(
        [("k", 1, 0, 1000)], "key string, iid long, s long, e long"
    )
    points = spark.createDataFrame(
        [("k", 10, 500)], "key string, pid long, p long"
    )
    rows = interval_cover_join(
        points, intervals, ["key"], "p", "s", "e", 10
    ).collect()
    assert len(rows) == 1


def _islands(spark, rows):
    from advisorydatapipeline_spark.operators.temporal import merge_intervals

    df = spark.createDataFrame(rows, "k long, s long, e long, tb long")
    out = merge_intervals(df, ["k"], "s", "e", ["tb"]).collect()
    return sorted(
        (r.k, r.island_id, r.isl_start, r.isl_end, r.n_intervals)
        for r in out
    )


def test_merge_overlap_touch_and_gap(spark):
    got = _islands(
        spark,
        [
            (1, 0, 5, 1),   # |-- island A
            (1, 3, 8, 2),   # overlaps
            (1, 8, 10, 3),  # touches (start == running max end) -> merges
            (1, 12, 14, 4), # gap -> island B
            (2, 0, 1, 5),   # other key unaffected
        ],
    )
    assert got == [
        (1, 1, 0, 10, 3),
        (1, 2, 12, 14, 1),
        (2, 1, 0, 1, 1),
    ]


def test_merge_contained_and_duplicate_intervals(spark):
    got = _islands(
        spark,
        [(1, 0, 10, 1), (1, 2, 3, 2), (1, 2, 3, 3), (1, 9, 11, 4)],
    )
    assert got == [(1, 1, 0, 11, 4)]


def test_merge_island_spans_beyond_first_interval_end(spark):
    # chained overlaps: each start is inside the PREVIOUS max end only
    got = _islands(spark, [(1, 0, 4, 1), (1, 3, 6, 2), (1, 5, 9, 3)])
    assert got == [(1, 1, 0, 9, 3)]


def test_asof_forward_inclusive_and_tiebreak(spark):
    from advisorydatapipeline_spark.operators.temporal import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(1, 100), (1, 250), (1, 400), (2, 50)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 100, 10, 1.0),   # equal ts -> forward-inclusive match
         (1, 100, 11, 2.0),   # tied ts: max tiebreak (11) wins
         (1, 300, 12, 3.0)],
        "k long, ts long, rid long, val double",
    )
    out = asof_join_forward(
        left, right, ["k"], "ts", "ts", ["rid", "val"], tiebreak="rid"
    ).collect()
    got = {(r.k, r.ts): (r.rid_r, r.ts_r) for r in out}
    assert got == {
        (1, 100): (11, 100),   # inclusive + max-tiebreak at tie
        (1, 250): (12, 300),   # next future event
        (1, 400): (None, None),  # nothing ahead
        (2, 50): (None, None),   # no right rows for key
    }


def test_ewma_bucketed_groups_match_per_user_reference(spark, sf_dir):
    """r15: the EWMA Arrow group key is a hash bucket, not the raw
    user_id — the body must reset the recurrence at every user
    boundary. Pin the whole output against an independent per-user
    pandas replay."""
    from advisorydatapipeline_spark.queries.sequence_queries import (
        ewma_user_values,
    )
    from advisorydatapipeline_spark.queries.helpers import load
    from pyspark.sql import functions as F

    got = {
        (r.user_id, r.event_id): (r.ts_us, r.cents, r.ewma)
        for r in ewma_user_values(spark, sf_dir).collect()
    }
    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.expr("ts DIV 1000").alias("ts_us"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    want = {}
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r.ts_us, r.event_id))
        acc = 0
        for i, r in enumerate(evs):
            acc = r.cents if i == 0 else (7 * acc + 3 * r.cents) // 10
            want[(uid, r.event_id)] = (r.ts_us, r.cents, acc)
    assert got == want
