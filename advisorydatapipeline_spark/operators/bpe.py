"""Distributed BPE (byte-pair-encoding) vocabulary learning
(beyond-reference) — the tokenizer-training half of a training-data
pipeline, expressed as DataFrame ops.

Classic word-level BPE (Sennrich et al. 2016): start from the corpus
WORD-COUNT table with each word split into characters, then repeatedly
(1) count adjacent symbol pairs weighted by word frequency and
(2) merge the most frequent pair everywhere it occurs.

Scale design (100 TB corpora):
- The corpus collapses to the word-count table FIRST (one partial-agg
  shuffle of (word, n) — the only pass over raw text); every merge
  iteration then works on |vocab| rows, not |corpus| rows. This is
  the property that makes distributed BPE tractable: web-scale text
  has ~10^7 distinct words regardless of corpus size.
- Pair counting is explode + partial-agg (map-side combined); the
  argmax pair is ONE top-1 row — the driver reads a single scalar per
  iteration to steer the loop (control decision, like the k-means
  centroid seed or PageRank iteration count; corpus data is never
  collected).
- The merge rewrite is a per-row left-to-right fold over the symbol
  array — narrow, shuffle-free, deterministic (non-overlapping,
  leftmost-first: 'aaa' under ('a','a') -> ['aa','a']).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from advisorydatapipeline_spark.functions.text import tokens


def word_symbol_table(
    df: DataFrame, text_col: str, *, end_mark: str = "</w>"
) -> DataFrame:
    """(word, n, syms): corpus word counts with each word exploded
    into its initial character symbols plus the end-of-word marker
    (the marker is what lets BPE learn suffixes — standard setup)."""
    toks = df.select(F.explode(tokens(text_col)).alias("word"))
    wc = toks.groupBy("word").agg(F.count("*").cast("long").alias("n"))
    syms = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(end_mark))
    )
    return wc.select("word", "n", syms.alias("syms"))


def bpe_pair_counts(words: DataFrame) -> DataFrame:
    """(sym_a, sym_b, cnt): adjacent-symbol pair counts weighted by
    word frequency — the statistic each BPE merge step maximizes."""
    pair = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at("syms", i.cast("int")).alias("sym_a"),
            F.element_at("syms", (i + 1).cast("int")).alias("sym_b"),
        ),
    )
    exploded = words.filter(F.size("syms") >= 2).select(
        "n", F.explode(pair).alias("p")
    )
    return exploded.groupBy(
        F.col("p.sym_a").alias("sym_a"), F.col("p.sym_b").alias("sym_b")
    ).agg(F.sum("n").cast("long").alias("cnt"))


def bpe_apply_merge(words: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every non-overlapping, leftmost-first occurrence of the
    adjacent pair (a, b) into one symbol a+b, as a per-row fold —
    no Python, no shuffle."""
    merged = F.lit(a + b)

    def step(acc, s):
        can = (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b))
        # leftmost-first, non-overlapping: only merge when the tail
        # element is a *raw* `a` (slice off tail, append merged)
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    folded = F.aggregate(
        F.slice("syms", 2, F.size("syms") - 1),
        F.slice("syms", 1, 1),
        step,
    )
    # fold caveat: once a merge lands, element_at(acc,-1) is `a+b`,
    # not `a`, so the next `b` can't over-merge — matching the
    # reference BPE left-to-right semantics exactly (when a+b == a,
    # e.g. merging ('a','') degenerates — excluded because tokens are
    # nonempty and the end mark is distinct)
    out = words.withColumn(
        "syms",
        F.when(F.size("syms") >= 2, folded).otherwise(F.col("syms")),
    )
    return out


# A small "pretrained" ordered merge table for the ENCODE path — in
# production this artifact comes from bpe_learn (or a published
# tokenizer's merges.txt); it is a static plan literal, never data.
PRETRAINED_MERGES: list[tuple[str, str]] = [
    ("e", "</w>"),
    ("s", "</w>"),
    ("t", "h"),
    ("th", "e</w>"),
    ("d", "</w>"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("t", "</w>"),
    ("in", "g"),
    ("ing", "</w>"),
    ("o", "u"),
    ("a", "r"),
    ("y", "</w>"),
]

BPE_SEP = "|"  # not in the token alphabet [a-z0-9] nor in "</w>"


def bpe_replace_pairs(
    merges: list[tuple[str, str]], *, sep: str = BPE_SEP
) -> list[tuple[str, str]]:
    """Render an ordered merge list as (search, replace) string pairs
    over the boundary-delimited symbol encoding ``|s1|s2|...|``.

    Each merge (a, b) becomes ``|a|b| -> |ab|``: the surrounding
    delimiters force FULL-symbol matches (``xa|b`` must not merge),
    and SQL ``replace`` scans leftmost-first non-overlapping — the
    within-pass BPE semantics of :func:`bpe_apply_merge`'s fold.
    Because a replaced occurrence consumes its trailing delimiter, an
    immediately-following occurrence is skipped in that scan; ONE
    second pass catches every skipped occurrence (merged symbols can
    never re-create a lone ``|a|b|`` when a != b), so the caller
    applies each pair TWICE. Self-pairs (a == b) can chain-overlap
    and are rejected — segmentation for those needs the fold form.
    """
    out = []
    for a, b in merges:
        if a == b:
            raise ValueError(
                f"self-pair merge {(a, b)} not supported by the "
                "replace-chain encoder; use bpe_apply_merge"
            )
        out.append((f"{sep}{a}{sep}{b}{sep}", f"{sep}{a}{b}{sep}"))
    return out


def bpe_encoded_string(
    word_col,
    merges: list[tuple[str, str]],
    *,
    end_mark: str = "</w>",
    sep: str = BPE_SEP,
):
    """Boundary-delimited BPE symbol string for a word under an
    ORDERED merge list — a pure whole-stage-codegen expression chain
    (regexp char split + 2 ``replace`` calls per merge), no UDF, no
    shuffle. ``"the"`` -> ``"|th|e</w>|"`` under the pretrained table.

    The same (search, replace) pairs render to a DuckDB expression via
    :func:`duck_bpe_encoded_string`, making tokenizer-apply exactly
    oracle-checkable cross-engine."""
    c = F.col(word_col) if isinstance(word_col, str) else word_col
    s = F.concat(
        F.lit(sep),
        F.regexp_replace(c, "(.)", "$1" + sep),
        F.lit(end_mark + sep),
    )
    for search, repl in bpe_replace_pairs(merges, sep=sep):
        s = F.replace(s, F.lit(search), F.lit(repl))
        s = F.replace(s, F.lit(search), F.lit(repl))  # catch skipped
    return s


def bpe_token_count_expr(
    word_col,
    merges: list[tuple[str, str]],
    *,
    end_mark: str = "</w>",
    sep: str = BPE_SEP,
):
    """BPE token count for a word: delimiter count minus one over the
    encoded string — stays fully codegen'd."""
    s = bpe_encoded_string(word_col, merges, end_mark=end_mark, sep=sep)
    return (
        F.length(s) - F.length(F.replace(s, F.lit(sep), F.lit("")))
    ).cast("long") - 1


def duck_bpe_token_count(
    word_expr: str,
    merges: list[tuple[str, str]],
    *,
    end_mark: str = "</w>",
    sep: str = BPE_SEP,
) -> str:
    """DuckDB SQL twin of :func:`bpe_token_count_expr`, built from the
    SAME (search, replace) pairs so both engines execute the identical
    merge chain."""
    s = (
        f"'{sep}' || regexp_replace({word_expr}, '(.)', '\\1{sep}', 'g')"
        f" || '{end_mark}{sep}'"
    )
    for search, repl in bpe_replace_pairs(merges, sep=sep):
        s = f"replace({s}, '{search}', '{repl}')"
        s = f"replace({s}, '{search}', '{repl}')"
    return (
        f"CAST(length({s}) - length(replace({s}, '{sep}', '')) AS BIGINT)"
        " - 1"
    )


def bpe_learn(
    df: DataFrame, text_col: str, n_merges: int
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the
    ordered merge list and the final (word, n, syms) table.

    Each iteration: one partial-agg pair count, a 1-ROW top-1 read on
    the driver (ties broken (cnt desc, sym_a, sym_b) so the learned
    vocabulary is deterministic), then a narrow fold rewrite. The
    word table itself stays distributed — only the single argmax row
    ever reaches the driver; lineage is cut per iteration with
    ``localCheckpoint`` exactly like the graph fixed-point loops.
    Stops early when no pair occurs at least twice."""
    words = word_symbol_table(df, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            bpe_pair_counts(words)
            .orderBy(
                F.col("cnt").desc(), F.col("sym_a").asc(), F.col("sym_b").asc()
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["sym_a"], top[0]["sym_b"]
        merges.append((a, b))
        words = bpe_apply_merge(words, a, b).localCheckpoint()
    return merges, words
