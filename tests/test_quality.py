"""Unit tests for the data-quality operators."""

from __future__ import annotations

from advisorydatapipeline_spark.operators.quality import (
    duplicate_key_rows,
    in_range,
    non_empty,
    not_null,
    quality_report,
    referential_violations,
    violating_rows,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "ok", 10),
            (2, None, 5),       # name null
            (3, "  ", 200),     # name blank + size out of range
            (3, "dup", 20),     # duplicate id
        ],
        "id long, name string, size long",
    )


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return [not_null("name"), non_empty("name"), in_range("size", 1, 100)]


def test_quality_report_counts(spark):
    rep = {r.rule: (r.n_rows, r.n_violations)
           for r in quality_report(_df(spark), _rules()).collect()}
    assert rep == {
        "name_not_null": (4, 1),
        "name_non_empty": (4, 2),
        "size_in_range": (4, 1),
    }


def test_violating_rows_tags_failed_rules(spark):
    rows = {r.id: sorted(r.failed_rules)
            for r in violating_rows(_df(spark), _rules()).collect()
            if r.name != "dup"}
    assert rows[2] == ["name_non_empty", "name_not_null"]
    assert rows[3] == ["name_non_empty", "size_in_range"]
    assert 1 not in rows


def test_duplicate_and_referential(spark):
    df = _df(spark)
    dups = {(r.id, r.n_rows) for r in duplicate_key_rows(df, ["id"]).collect()}
    assert dups == {(3, 2)}
    parent = spark.createDataFrame([(1,), (3,)], "id long")
    orphans = {r.id for r in
               referential_violations(df, parent, ["id"]).collect()}
    assert orphans == {2}
