"""Text-analysis queries with DuckDB oracles (north-star ops):
language ID, quality scoring, token counting, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.functions.text import (
    LANG_STOPWORDS,
    char_count,
    fingerprint,
    fingerprint64,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from advisorydatapipeline_spark.queries.dedup_queries import (
    DUCK_HASH64,
    DUCK_TOKENS,
)
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

_T = DUCK_TOKENS.format(x="text")


def _duck_stop_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"


@query(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len({_T}) AS INT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS INT)
         AS n_tokens_bpe
FROM documents
""",
)
def text_token_stats(spark, sf_dir):
    """Token counting: whitespace/word tokens + a BPE-ish regex
    pre-tokenizer count (letters-run | digit | symbol)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        char_count("text").cast("long").alias("n_chars"),
        token_count("text").cast("int").alias("n_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), F.lit(0)
            )
        ).cast("int").alias("n_tokens_bpe"),
    )


@query(
    "text_quality",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         len({_T}) AS n_tok,
         len(list_filter({_T}, t -> list_contains({_duck_stop_list('en')}, t)))
           AS stop_hits,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
           AS n_punct
  FROM documents
)
SELECT doc_id,
       (n_punct / CAST(n_chars AS DOUBLE)) AS punct_ratio,
       (stop_hits / CAST(greatest(n_tok, 1) AS DOUBLE)) AS stop_ratio,
       least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5
         + least((stop_hits / CAST(greatest(n_tok, 1) AS DOUBLE)) * 4.0, 1.0) * 0.3
         + (1.0 - least((n_punct / CAST(n_chars AS DOUBLE)) * 5.0, 1.0)) * 0.2
         AS quality
FROM m
""",
)
def text_quality(spark, sf_dir):
    """Heuristic quality scoring (length / stopword-density /
    punctuation), C4-style."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        punct_ratio("text").alias("punct_ratio"),
        stopword_ratio("text").alias("stop_ratio"),
        quality_score("text").alias("quality"),
    )


def _duck_lang_oracle() -> str:
    scores = {
        lg: f"len(list_intersect(list_distinct({_T}), {_duck_stop_list(lg)}))"
        for lg in sorted(LANG_STOPWORDS)
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    arms = " ".join(
        f"WHEN {scores[lg]} = {best} THEN '{lg}'" for lg in sorted(scores)
    )
    return f"""
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN {best} > 0 THEN CASE {arms} ELSE 'und' END
            ELSE 'und' END AS lang_pred
FROM documents
"""


@query("text_lang_id", oracle=_duck_lang_oracle())
def text_lang_id(spark, sf_dir):
    """Stopword-profile language ID (n-gram heuristic): argmax of
    per-language distinct-stopword hits, alphabetical tiebreak."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id("text").alias("lang_pred"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_T})), ' ')) AS fp,
       {DUCK_HASH64.format(x=f"array_to_string(list_sort(list_distinct({_T})), ' ')")}
         AS fp64
FROM documents
""",
)
def text_fingerprint(spark, sf_dir):
    """Key-collision document fingerprint (sorted distinct token set
    -> md5 / 60-bit int)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        fingerprint64("text").alias("fp64"),
    )
