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
