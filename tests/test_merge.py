"""merge_into: full ANSI MERGE clause matrix on tiny crafted frames."""

from __future__ import annotations

import pytest

from advisorydatapipeline_spark.operators.merge import MergeClause, merge_into

TGT = "k long, name string, bal long"
SRC = "k long, amt long, n long"


def _tgt(spark):
    return spark.createDataFrame(
        [(1, "a", 100), (2, "b", -5), (3, "c", 7), (4, "d", -999)], TGT
    )


def _src(spark):
    #            matched       matched      new key
    return spark.createDataFrame(
        [(1, 50, 30), (2, 10, 1), (9, 77, 2)], SRC
    )


def _rows(df):
    return {r.k: (r.name, r.bal) for r in df.collect()}


def test_all_four_clause_kinds(spark):
    out = merge_into(
        _tgt(spark),
        _src(spark),
        ["k"],
        when_matched=[
            MergeClause("update", "s.n >= 20", {"bal": "t.bal + s.amt"}),
            MergeClause("delete", "t.bal < 0"),
        ],
        when_not_matched=[
            MergeClause(
                "insert",
                None,
                {"name": "concat('new-', cast(s.k as string))", "bal": "s.amt"},
            )
        ],
        when_not_matched_by_source=[
            MergeClause("delete", "t.bal < -100"),
        ],
    )
    assert out.schema.simpleString() == _tgt(spark).schema.simpleString()
    got = _rows(out)
    assert got == {
        1: ("a", 150),   # matched, n>=20 -> update
        # 2: matched, first clause fails (n=1), second deletes (bal<0)
        3: ("c", 7),     # not matched by source, bal >= -100 -> keep
        # 4: not matched by source, bal < -100 -> delete
        9: ("new-9", 77),  # not matched -> insert
    }


def test_clause_order_first_match_wins(spark):
    # key 2: bal<0 AND n<20; swap clause order so DELETE fires first
    out = merge_into(
        _tgt(spark),
        _src(spark),
        ["k"],
        when_matched=[
            MergeClause("delete", "t.bal < 0"),
            MergeClause("update", None, {"bal": "t.bal + s.amt"}),
        ],
    )
    got = _rows(out)
    assert 2 not in got          # deleted by the first clause
    assert got[1] == ("a", 150)  # falls through to unconditional update
    assert got[3] == ("c", 7)    # untouched (no source row)
    assert got[4] == ("d", -999)
    assert 9 not in got          # no insert clause -> source-only dropped


def test_update_default_assignments_take_source_columns(spark):
    # default update: shared columns (k only, here) come from source;
    # use a source that shares 'bal' to see the overwrite
    src = spark.createDataFrame([(1, 42)], "k long, bal long")
    out = merge_into(
        _tgt(spark), src, ["k"], when_matched=[MergeClause("update")]
    )
    got = _rows(out)
    assert got[1] == ("a", 42)  # bal from source, name kept
    assert got[2] == ("b", -5)


def test_insert_default_null_for_target_only_columns(spark):
    src = spark.createDataFrame([(99, 5)], "k long, bal long")
    out = merge_into(
        _tgt(spark), src, ["k"], when_not_matched=[MergeClause("insert")]
    )
    got = _rows(out)
    assert got[99] == (None, 5)
    assert len(got) == 5


def test_conditional_insert(spark):
    out = merge_into(
        _tgt(spark),
        _src(spark),
        ["k"],
        when_not_matched=[MergeClause("insert", "s.amt > 1000")],
    )
    assert 9 not in _rows(out)  # condition fails -> dropped, not inserted


def test_validate_unique_match_raises(spark):
    dup = spark.createDataFrame([(1, 5, 1), (1, 6, 1)], SRC)
    out = merge_into(
        _tgt(spark),
        dup,
        ["k"],
        when_matched=[MergeClause("update", None, {"bal": "s.amt"})],
        validate_unique_match=True,
    )
    with pytest.raises(Exception, match="more than one source row"):
        out.collect()
    # without validation the duplicate silently fans out (documented)
    out2 = merge_into(
        _tgt(spark),
        dup,
        ["k"],
        when_matched=[MergeClause("update", None, {"bal": "s.amt"})],
    )
    assert out2.filter("k = 1").count() == 2


def test_invalid_clause_combinations_rejected(spark):
    with pytest.raises(ValueError, match="INSERT is only valid"):
        merge_into(
            _tgt(spark), _src(spark), ["k"],
            when_matched=[MergeClause("insert")],
        )
    with pytest.raises(ValueError, match="only INSERT"):
        merge_into(
            _tgt(spark), _src(spark), ["k"],
            when_not_matched=[MergeClause("update")],
        )
    with pytest.raises(ValueError, match="no assignments"):
        MergeClause("delete", None, {"bal": "1"})
    with pytest.raises(ValueError, match="requires explicit"):
        merge_into(
            _tgt(spark), _src(spark), ["k"],
            when_not_matched_by_source=[MergeClause("update")],
        )
    with pytest.raises(ValueError, match="at least one key"):
        merge_into(_tgt(spark), _src(spark), [])


def test_by_source_update_with_explicit_assignments(spark):
    out = merge_into(
        _tgt(spark),
        _src(spark),
        ["k"],
        when_not_matched_by_source=[
            MergeClause("update", "t.bal > 0", {"name": "'stale'"})
        ],
    )
    got = _rows(out)
    assert got[3] == ("stale", 7)    # no source row, bal > 0 -> tagged
    assert got[4] == ("d", -999)     # condition fails -> kept as-is
    assert got[1] == ("a", 100)      # matched -> untouched (no clauses)


def test_left_join_without_insert_clauses(spark):
    """No insert clauses -> the plan must use a left (not full) join,
    which stays broadcast-able for a small source batch."""
    out = merge_into(
        _tgt(spark), _src(spark), ["k"],
        when_matched=[MergeClause("update")],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "FullOuter" not in plan
