"""Distributed suffix ranking / duplicated-window analysis
(operators/suffix.py): the rank helper, the general prefix-doubling
API, and the bounded-depth counting plan, each against brute
pure-Python ground truth.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.suffix import (
    DUP_DEPTHS,
    corpus_positions,
    order_preserving_ids,
    prefix_doubling_ranks,
    suffix_dup_depth_counts,
)

DOCS = [
    (0, "the cat sat on the mat and the cat sat again"),
    (1, "the cat sat on the mat and then left quietly"),
    (2, "completely different content with zero overlap here"),
    (3, "the cat"),          # shorter than depth 8 everywhere but p=0? no: len 7 < 8
    (4, "the cat sat on the mat and the cat sat again"),  # exact clone of 0
    (5, "xy"),
    (6, ""),  # zero-length doc must still surface as an all-zero row
]


def _brute_dup(docs, depth):
    from collections import Counter

    wins = Counter()
    for _d, t in docs:
        for p in range(len(t) - depth + 1):
            wins[t[p : p + depth]] += 1
    out = {}
    for d, t in docs:
        n_pos = max(0, len(t) - depth + 1)
        dup = sum(
            1
            for p in range(n_pos)
            if wins[t[p : p + depth]] >= 2
        )
        out[d] = (n_pos, dup)
    return out


def test_order_preserving_ids(spark):
    df = spark.createDataFrame(
        [(w,) for w in "banana apple cherry apple date banana".split()],
        "k string",
    )
    rows = order_preserving_ids(df, ["k"]).collect()
    got = {r["k"]: r["_opid"] for r in rows}
    assert len(rows) == 4  # distinct
    order = sorted(got, key=lambda k: got[k])
    assert order == sorted(got)  # monotone in key order
    assert len(set(got.values())) == 4  # injective


def test_prefix_doubling_matches_string_compare(spark):
    """Depth-d rank equality must equal first-d-characters equality
    for EVERY suffix pair, at every depth the API returns."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pos = corpus_positions(docs)
    tables = prefix_doubling_ranks(pos.select("doc_id", "p", "w"))
    texts = dict(DOCS)
    for depth, ranks in tables.items():
        got = {
            (r["doc_id"], r["p"]): r["r"] for r in ranks.collect()
        }
        suffixes = [
            (d, p) for d, t in DOCS for p in range(len(t))
        ]
        for a in suffixes:
            for b in suffixes:
                want = (
                    texts[a[0]][a[1] : a[1] + depth]
                    == texts[b[0]][b[1] : b[1] + depth]
                )
                assert (got[a] == got[b]) == want, (a, b, depth)


def test_dup_depth_counts_match_brute(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {
        r["doc_id"]: r.asDict()
        for r in suffix_dup_depth_counts(docs).collect()
    }
    assert set(rows) == {d for d, _ in DOCS}
    for d, t in DOCS:
        assert rows[d]["n_chars"] == len(t)
        assert rows[d]["n_pos"] == len(t)
    for depth in DUP_DEPTHS:
        brute = _brute_dup(DOCS, depth)
        for d, _t in DOCS:
            assert rows[d][f"n_pos{depth}"] == brute[d][0], (d, depth)
            assert rows[d][f"dup{depth}"] == brute[d][1], (d, depth)
    # the exact clone pair must be fully duplicated at every depth
    assert rows[0]["dup32"] == rows[0]["n_pos32"] > 0
    assert rows[4]["dup32"] == rows[4]["n_pos32"] > 0
    # the short docs contribute nothing at depths beyond their length
    assert rows[5]["n_pos8"] == 0 and rows[5]["dup8"] == 0
    # the zero-length doc surfaces as an all-zero row, not a missing
    # one (r13 ADVICE item 3: per-position aggregates left-join onto
    # the per-document base)
    assert rows[6]["n_chars"] == 0 and rows[6]["n_pos"] == 0
    assert all(
        rows[6][f"n_pos{d}"] == 0 and rows[6][f"dup{d}"] == 0
        for d in DUP_DEPTHS
    )


def test_no_cross_document_bleed(spark):
    """A window must never match across a document boundary: two docs
    that concatenate into a duplicated stream share no 8-window."""
    docs = spark.createDataFrame(
        [(0, "abcd"), (1, "efgh"), (2, "abcdefgh")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in suffix_dup_depth_counts(docs).collect()
    }
    # doc2's single 8-window 'abcdefgh' exists nowhere else as a
    # FULL window (docs 0/1 are too short), so nothing is duplicated
    assert rows[2]["n_pos8"] == 1 and rows[2]["dup8"] == 0
    assert rows[0]["n_pos8"] == 0
