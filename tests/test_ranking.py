"""Unit tests for operators/ranking.py (TF-IDF, span-dup profile)."""

from __future__ import annotations

from pyspark.sql import Row

from advisorydatapipeline_spark.operators.ranking import (
    IDF_SCALE,
    span_dup_profile,
    tfidf_topk,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta beta gamma"),
            Row(doc_id=2, text="alpha beta delta delta delta"),
            Row(doc_id=3, text="alpha epsilon"),
        ]
    )


def test_tfidf_rare_terms_outrank_common(spark):
    out = tfidf_topk(_docs(spark), "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 'alpha' is in all 3 docs (df=3, idf=N/df=1x) — never the top term
    # when a rarer term exists with any tf.
    top1 = {d: rows[0].term for d, rows in by_doc.items()}
    assert top1[1] == "beta"  # tf=2, df=2
    assert top1[2] == "delta"  # tf=3, df=1
    assert top1[3] == "epsilon"  # tf=1, df=1
    # integer-scaled score: tf * ((N*SCALE) DIV df)
    r = next(x for x in by_doc[2] if x.term == "delta")
    assert r.score == 3 * ((3 * IDF_SCALE) // 1)
    # rn is dense from 1 and capped at k
    assert all(rows[0].rn == 1 and len(rows) <= 2 for rows in by_doc.values())


def test_tfidf_tiebreak_is_term_order(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="zeta yota"), Row(doc_id=2, text="other words")]
    )
    out = tfidf_topk(df, "doc_id", "text", k=2).collect()
    d1 = sorted((r.rn, r.term) for r in out if r.doc_id == 1)
    # identical tf/df -> alphabetical term order decides rank
    assert d1 == [(1, "yota"), (2, "zeta")]


def test_span_dup_profile_flags_boilerplate(spark):
    boiler = "the quick brown fox jumps"
    rows = [Row(doc_id=i, text=boiler) for i in range(4)]
    rows.append(Row(doc_id=99, text="completely unrelated words here now"))
    out = {
        r.doc_id: r
        for r in span_dup_profile(
            spark.createDataFrame(rows), "doc_id", "text", n=3, hot_df=4
        ).collect()
    }
    # 4 identical docs: every shingle has doc_freq 4 -> fully hot
    assert out[0].hot_frac == 1.0 and out[0].n_hot == out[0].n_shingles
    # the unique doc has zero hot shingles
    assert out[99].n_hot == 0 and out[99].hot_frac == 0.0
    # 5-token doc => 3 distinct 3-gram shingles
    assert out[0].n_shingles == 3


def test_tfidf_handles_empty_and_tokenless_docs(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="real words here"),
            Row(doc_id=2, text="!!! ... ###"),  # tokenless
            Row(doc_id=3, text=""),
        ]
    )
    out = tfidf_topk(df, "doc_id", "text", k=3).collect()
    # tokenless/empty docs simply produce no rows — never nulls/crash
    assert {r.doc_id for r in out} == {1}


def test_span_dup_profile_short_docs_drop_out(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="one two"),  # < n tokens: no shingles
            Row(doc_id=2, text="one two three four"),
        ]
    )
    out = span_dup_profile(df, "doc_id", "text", n=3, hot_df=2).collect()
    assert {r.doc_id for r in out} == {2}


def test_bm25_ranks_high_tf_short_docs_first(spark):
    from advisorydatapipeline_spark.operators.ranking import (
        BM25_IDF_SCALE,
        BM25_K1_S,
        BM25_S,
        bm25_topk,
    )
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="query query query"),          # tf=3, dl=3
            Row(doc_id=2, text="query filler filler filler"), # tf=1, dl=4
            Row(doc_id=3, text="filler filler"),              # no match
            Row(doc_id=4, text="query query filler filler filler filler"),
        ]
    )
    out = bm25_topk(docs, "doc_id", "text", ["query"], k=10).collect()
    ids = [r.doc_id for r in out]
    # only matching docs appear, ordered by score desc
    assert set(ids) == {1, 2, 4}
    assert ids[0] == 1  # highest tf, shortest doc
    assert [r.rn for r in out] == [1, 2, 3]
    # replay the fixed-point formula for the winner: tf=3, dl=3,
    # df=3, N=4, sumdl=15
    avgdl_s = (15 * BM25_S) // 4
    idf = (4 * BM25_IDF_SCALE) // 3
    lnorm = (BM25_S - 750) + (750 * 3 * BM25_S) // avgdl_s
    expect = (3 * (BM25_K1_S + BM25_S) * idf) // (
        3 * BM25_S + (BM25_K1_S * lnorm) // BM25_S
    )
    assert out[0].score == expect


def test_bm25_tiebreak_and_k_cap(spark):
    from advisorydatapipeline_spark.operators.ranking import bm25_topk
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="same same other") for i in range(5)]
    )
    out = bm25_topk(docs, "doc_id", "text", ["same"], k=3).collect()
    # identical scores -> doc_id ascending, capped at k
    assert [r.doc_id for r in out] == [0, 1, 2]
