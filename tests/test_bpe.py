"""Unit tests for operators/bpe.py — the distributed BPE learner
checked against a pure-Python reference implementation."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row
from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.bpe import (
    bpe_apply_merge,
    bpe_learn,
    bpe_pair_counts,
    word_symbol_table,
)

END = "</w>"


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference BPE (Sennrich): dict-based, same tiebreak."""
    vocab = {tuple(w) + (END,): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = n
        vocab = new_vocab
    return merges, vocab


def test_bpe_learn_matches_reference(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "widest widest widest",
    ]
    df = spark.createDataFrame([Row(text=t) for t in texts])
    merges, words = bpe_learn(df, "text", 6)
    wc = Counter(w for t in texts for w in t.split())
    ref_merges, ref_vocab = _ref_bpe(dict(wc), 6)
    assert merges == ref_merges
    got = {
        (tuple(r.syms), r.n) for r in words.select("syms", "n").collect()
    }
    assert got == {(syms, n) for syms, n in ref_vocab.items()}


def test_bpe_apply_merge_leftmost_nonoverlapping(spark):
    df = spark.createDataFrame(
        [Row(word="aaa", n=1, syms=["a", "a", "a"])]
    )
    out = bpe_apply_merge(df, "a", "a").collect()
    assert out[0].syms == ["aa", "a"]  # not ["a","aa"], not ["aa","aa"]


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    df = spark.createDataFrame([Row(text="ab ab ab cd")])
    words = word_symbol_table(df, "text")
    counts = {
        (r.sym_a, r.sym_b): r.cnt for r in bpe_pair_counts(words).collect()
    }
    assert counts[("a", "b")] == 3
    assert counts[("c", "d")] == 1
    assert counts[("b", END)] == 3


def _py_bpe_fold(word: str, merges, end_mark="</w>"):
    """Pure-Python reference: standard BPE apply — for each merge in
    order, one leftmost-first non-overlapping pass over the symbols
    (the same semantics as operators/bpe.bpe_apply_merge's fold)."""
    syms = list(word) + [end_mark]
    for a, b in merges:
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def _py_replace_chain(word: str, merges, end_mark="</w>", sep="|"):
    from advisorydatapipeline_spark.operators.bpe import bpe_replace_pairs

    s = sep + sep.join(word) + sep + end_mark + sep
    for search, repl in bpe_replace_pairs(merges, sep=sep):
        s = s.replace(search, repl)
        s = s.replace(search, repl)
    return [t for t in s.split(sep) if t]


def test_replace_chain_equals_fold_pretrained():
    from advisorydatapipeline_spark.operators.bpe import PRETRAINED_MERGES

    words = [
        "the", "then", "there", "thethe", "ththth", "ingoing",
        "singing", "raining", "arrear", "inn", "noon", "and",
        "sands", "es", "e", "x", "rere", "erer", "ererer",
        "thththth", "anand", "bananas", "rering", "you", "young",
    ]
    for w in words:
        assert _py_replace_chain(w, PRETRAINED_MERGES) == _py_bpe_fold(
            w, PRETRAINED_MERGES
        ), w


def test_replace_chain_equals_fold_property():
    import random

    from advisorydatapipeline_spark.operators.bpe import PRETRAINED_MERGES

    rng = random.Random(7)
    # biased alphabet so merge pairs actually occur often
    alpha = "theinagrous" + "thethering"
    for _ in range(2000):
        w = "".join(
            rng.choice(alpha) for _ in range(rng.randint(1, 12))
        )
        assert _py_replace_chain(w, PRETRAINED_MERGES) == _py_bpe_fold(
            w, PRETRAINED_MERGES
        ), w


def test_replace_chain_rejects_self_pair():
    import pytest

    from advisorydatapipeline_spark.operators.bpe import bpe_replace_pairs

    with pytest.raises(ValueError):
        bpe_replace_pairs([("a", "a")])


def test_spark_encode_matches_python_fold(spark):
    from pyspark.sql import functions as F

    from advisorydatapipeline_spark.operators.bpe import (
        PRETRAINED_MERGES,
        bpe_encoded_string,
        bpe_token_count_expr,
    )

    words = ["the", "singing", "thethe", "and", "rerere", "x", "noon"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: (r["enc"], r["cnt"])
        for r in df.select(
            "w",
            bpe_encoded_string("w", PRETRAINED_MERGES).alias("enc"),
            bpe_token_count_expr("w", PRETRAINED_MERGES).alias("cnt"),
        ).collect()
    }
    for w in words:
        syms = _py_bpe_fold(w, PRETRAINED_MERGES)
        assert got[w][0] == "|" + "|".join(syms) + "|", w
        assert got[w][1] == len(syms), w
