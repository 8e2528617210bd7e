"""Text-analysis column functions (beyond-reference, north-star ops).

All built-in ``pyspark.sql.functions`` expressions — JVM-side,
whole-stage-codegen'd, no Python in the hot path. Every function here
has a DuckDB-expressible twin used by the oracle queries, keyed on
md5 (bit-identical across engines) rather than engine-private hashes.

Design for 100 TB: these are all narrow (per-row) transformations —
they pipeline inside the scan stage with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# tiny per-language stopword lists for the n-gram/stopword lang-id
# heuristic; alphabetical language order is the deterministic tiebreak
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "zu"],
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "it", "a"],
    "es": ["el", "los", "de", "que", "y", "en", "un", "para", "es", "una"],
    "fr": ["le", "la", "les", "et", "est", "pour", "que", "dans", "du", "au"],
}


def norm_text(col: Column | str) -> Column:
    """Whitespace-collapsed, trimmed, lowercased text — the canonical
    form for exact-dup keys."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens (no empties).

    Implemented as regexp_replace -> trim -> split on a single space
    instead of split + a higher-order ``filter`` lambda: HOFs are
    interpreted (outside whole-stage codegen) and measured ~5x slower
    on the tokenize hot path; this form stays fully codegen'd.
    Semantics are identical (nonempty [a-z0-9]+ runs, in order).
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(F.regexp_replace(F.lower(c), TOKEN_SPLIT_RE, " "))
    return F.when(t != "", F.split(t, " ")).otherwise(
        F.array().cast("array<string>")
    )


def hash64(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5, as BIGINT.
    md5 is bit-identical in Spark, DuckDB, and Python's hashlib, which
    makes every hash-keyed operator oracle-checkable (engine-native
    hashes like Spark's murmur3 are not portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are .,!?;: punctuation (computed by
    length difference — portable across regex dialects)."""
    c = F.col(col) if isinstance(col, str) else col
    kept = F.length(F.regexp_replace(c, r"[.,!?;:]", ""))
    return (F.length(c) - kept) / F.length(c)


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords (multiset semantics)."""
    toks = tokens(col)
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs
    and normal stopword density, penalizes punctuation soup. Mirrors
    the shape of C4/Gopher-style quality rules; per-row arithmetic
    only, so it is exact on both engines."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    punct_pen = F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    return len_score * 0.5 + stop_score * 0.3 + (1.0 - punct_pen) * 0.2


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Distinct-stopword hit count per language."""
    toks = F.array_distinct(tokens(col))
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        stop = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.array_intersect(toks, stop))
    return out


def lang_id(col: Column | str) -> Column:
    """Argmax language by stopword hits, alphabetical tiebreak;
    'und' (undetermined) when nothing matches."""
    scores = lang_scores(col)
    langs = sorted(scores)  # alphabetical priority = deterministic ties
    expr = F.lit("und")
    best = F.greatest(*[scores[lg] for lg in langs])
    for lg in reversed(langs):
        expr = F.when(scores[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def fingerprint(col: Column | str) -> Column:
    """OpenRefine-style key-collision fingerprint: md5 of the sorted
    distinct token set. Word-order-insensitive duplicate key."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def fingerprint64(col: Column | str) -> Column:
    return hash64(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))
