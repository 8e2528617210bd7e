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


def test_radix_seed_expr_order_consistent(spark):
    """The r15 map-side seed: base-129 block encoding must be
    injective over distinct <= 8-char ASCII windows and sort exactly
    as the strings do (incl. a short window before every extension —
    the end-of-document sentinel), and refuse non-ASCII in-plan."""
    import pytest
    from pyspark.errors import PySparkException

    from advisorydatapipeline_spark.operators.suffix import (
        radix_seed_expr,
    )

    wins = [
        "", "a", "ab", "abc", "abcdefgh", "abcdefgi", "abcdefg",
        "zzzzzzzz", " lead sp", "~tilde~!", "b", "aa",
    ]
    df = spark.createDataFrame([(w,) for w in wins], "w string")
    got = {
        r["w"]: r["s"]
        for r in df.select(
            "w", radix_seed_expr("w").alias("s")
        ).collect()
    }
    assert len(set(got.values())) == len(wins)  # injective
    assert sorted(wins) == sorted(wins, key=lambda w: got[w])
    assert all(v >= 0 for v in got.values())  # above the -1 sentinel
    bad = spark.createDataFrame([("caféxyz",)], "w string")
    with pytest.raises(PySparkException, match="non-ASCII"):
        bad.select(radix_seed_expr("w").alias("s")).collect()


def test_corpus_positions_preserve_doc_window_partitioning(spark):
    """corpus_positions repartitions DOC rows by doc_id before the
    explode (r15), so a per-doc window over the positions must not
    insert a second exchange of the exploded rows."""
    from pyspark.sql.window import Window

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pos = corpus_positions(docs)
    w = Window.partitionBy("doc_id").orderBy("p")
    out = pos.select("doc_id", "p", F.lead("w", 8).over(w).alias("l"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    import re

    # one physical Exchange node (each node appears once in the tree
    # and once in the numbered details list)
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


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


def _brute_span_stats(docs, span_depth=16, cap=32, floor=8):
    """Pure-Python ground truth for duplicate_span_stats: per-position
    max duplicated full-window depth (capped), threshold flags,
    interval merge."""
    from collections import Counter

    wins: dict[int, Counter] = {d: Counter() for d in range(1, cap + 1)}
    for _i, t in docs:
        for d in range(1, cap + 1):
            for p in range(len(t) - d + 1):
                wins[d][t[p : p + d]] += 1
    out = {}
    for i, t in docs:
        dup_len = {}
        for p in range(len(t)):
            best = 0
            for d in range(floor, cap + 1):
                if p + d <= len(t) and wins[d][t[p : p + d]] >= 2:
                    best = d
            dup_len[p] = best
        flagged = sorted(p for p in dup_len if dup_len[p] >= span_depth)
        # islands: break when p > prev + span_depth
        spans = []
        prev = None
        for p in flagged:
            if prev is None or p > prev + span_depth:
                spans.append([p, p + span_depth])
            else:
                spans[-1][1] = p + span_depth
            prev = p
        lens = [e - s for s, e in spans]
        out[i] = {
            "n_chars": len(t),
            "n_dup_pos": len(flagged),
            "n_spans": len(spans),
            "dup_chars": sum(lens),
            "max_span": max(lens) if lens else 0,
            "max_lcp": max(dup_len.values(), default=0),
        }
    return out


def test_duplicate_spans_match_brute(spark):
    docs = [
        (0, "the cat sat on the mat and the cat sat again today ok"),
        (1, "the cat sat on the mat and then it left very quietly"),
        (2, "completely different content with zero overlap at all"),
        (3, "the cat"),
        (4, "the cat sat on the mat and the cat sat again today ok"),
        (5, "xy"),
        (6, ""),
        # two docs sharing a long interior block -> one maximal span
        (7, "AAAA shared-long-duplicated-block-here BBBB tail one x"),
        (8, "CCCC shared-long-duplicated-block-here DDDD tail two y"),
    ]
    from advisorydatapipeline_spark.operators.suffix import (
        duplicate_span_stats,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {
        r["doc_id"]: r.asDict() for r in duplicate_span_stats(df).collect()
    }
    brute = _brute_span_stats(docs)
    assert set(rows) == set(brute)
    for d in brute:
        got = {k: rows[d][k] for k in brute[d]}
        assert got == brute[d], (d, got, brute[d])
    # the exact clone pair is one full-document span
    assert rows[0]["n_spans"] == 1
    assert rows[0]["dup_chars"] == rows[0]["n_chars"]
    # the shared interior block merges into ONE maximal span that
    # ends exactly at the block boundary (+ window overhang is capped
    # by the brute model too)
    assert rows[7]["n_spans"] == 1 and rows[8]["n_spans"] == 1
    # max_lcp caps at 32 on the clone pair
    assert rows[0]["max_lcp"] == 32


def test_duplicate_spans_oracle_matches_brute_duckdb():
    """The DuckDB span oracle (structurally different algorithm) must
    agree with the pure-Python brute model, including docs longer
    than any fixed series bound."""
    import duckdb

    from advisorydatapipeline_spark.operators.suffix import (
        duck_span_oracle,
    )

    docs = [
        (0, "the cat sat on the mat and the cat sat again today ok"),
        (1, "the cat sat on the mat and then it left very quietly"),
        (2, ""),
        (3, "ab" * 1300),  # 2600 chars
        (4, "ab" * 1300),
        (5, "zq"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    cols = ["doc_id", "n_chars", "n_dup_pos", "n_spans", "dup_chars",
            "max_span", "max_lcp"]
    got = {
        r[0]: dict(zip(cols, r))
        for r in con.execute(duck_span_oracle()).fetchall()
    }
    brute = _brute_span_stats(docs)
    assert set(got) == set(brute)
    for d in brute:
        for k in brute[d]:
            assert got[d][k] == brute[d][k], (d, k, got[d][k], brute[d][k])


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


def _skewed_fixture():
    """One 8-gram ('QQQQQQQQ') repeated 10,000x corpus-wide (100 docs
    x 100 blocks), each occurrence followed by one of 64 distinct
    8-digit continuations — the classic hot-prefix-interval skew the
    r14 verdict asked to make executable. Plus unrelated cold docs."""
    docs = []
    for i in range(100):
        parts = []
        for j in range(100):
            parts.append("QQQQQQQQ" + f"{(i * 37 + j * 11) % 64:08d}")
        docs.append((i, "".join(parts)))
    docs += [
        (1000, "a quiet cold document with no hot prefix at all"),
        (1001, "another cold one, text differs completely here"),
        (1002, ""),
        (1003, "xy"),
    ]
    return docs


def test_duplicate_spans_hot_seed_escalation(spark):
    """r14 verdict item 2: with hot_seed_threshold set, (a) the hot
    seed interval really is above threshold and really splits below
    it one doubling round deeper (data-level proof on the fixture),
    (b) the escalated plan's rank window is partitioned by the
    sub-interval key, and (c) results are IDENTICAL to the
    unescalated plan — the stitch window recovers every cross-sub
    rank-adjacent pair."""
    from advisorydatapipeline_spark.operators.suffix import (
        duplicate_span_plan,
        duplicate_span_stats,
    )

    docs = _skewed_fixture()
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # (a) data-level skew proof: literal window counts stand in for
    # seed ranks (rank equality == string equality)
    from collections import Counter

    g8: Counter = Counter()
    g16: Counter = Counter()
    for _i, t in docs:
        for p in range(len(t) - 7):
            g8[t[p : p + 8]] += 1
        for p in range(len(t) - 15):
            g16[t[p : p + 16]] += 1
    threshold = 1000
    hot8 = g8["QQQQQQQQ"]
    assert hot8 == 10_000 and hot8 > threshold
    hot_subs = {w: n for w, n in g16.items() if w.startswith("QQQQQQQQ")}
    assert len(hot_subs) == 64  # the continuations split the interval
    assert max(hot_subs.values()) < threshold  # every sub is cold

    # (b) the escalated rank window partitions by (s0, sub)
    out, dup = duplicate_span_plan(
        df, hot_seed_threshold=threshold
    )
    try:
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        assert "sub" in buf.getvalue()
    finally:
        dup.unpersist()

    # (c) escalated == unescalated, field by field
    base = {
        r["doc_id"]: r.asDict()
        for r in duplicate_span_stats(df).collect()
    }
    esc = {
        r["doc_id"]: r.asDict()
        for r in duplicate_span_stats(
            df, hot_seed_threshold=threshold
        ).collect()
    }
    assert base == esc
    # the hot prefix genuinely produced duplicated spans to compare
    assert any(v["n_spans"] > 0 for v in base.values())


def test_duplicate_spans_escalation_adversarial_tiny_threshold(spark):
    """Threshold 2 on the mixed small fixture forces almost every
    seed group hot and almost every rank-adjacent pair through the
    boundary stitch (singleton sub-intervals, short suffixes, empty
    docs) — escalated results must still match the pure-Python brute
    truth exactly."""
    from advisorydatapipeline_spark.operators.suffix import (
        duplicate_span_stats,
    )

    docs = [
        (0, "the cat sat on the mat and the cat sat again today ok"),
        (1, "the cat sat on the mat and then it left very quietly"),
        (2, "completely different content with zero overlap at all"),
        (3, "the cat"),
        (4, "the cat sat on the mat and the cat sat again today ok"),
        (5, "xy"),
        (6, ""),
        (7, "AAAA shared-long-duplicated-block-here BBBB tail one x"),
        (8, "CCCC shared-long-duplicated-block-here DDDD tail two y"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {
        r["doc_id"]: r.asDict()
        for r in duplicate_span_stats(
            df, hot_seed_threshold=2
        ).collect()
    }
    brute = _brute_span_stats(docs)
    assert set(rows) == set(brute)
    for d in brute:
        got = {k: rows[d][k] for k in brute[d]}
        assert got == brute[d], (d, got, brute[d])
