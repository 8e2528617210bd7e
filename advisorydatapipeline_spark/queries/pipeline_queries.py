"""End-to-end corpus-curation pipeline as ONE composed query.

quality-score -> threshold filter -> token-length band -> exact-dedup
keep-first -> per-(lang, source) corpus stats. This is the showcase
composition: every stage is an operator that also ships standalone
(functions/text.py, operators/dedup.py), and the whole chain stays a
single Catalyst plan — narrow per-row scoring pipelines inside the
scan, the only shuffles are the dedup key and the final stats key.

At 100 TB: filters run before the dedup shuffle (the expensive
stage sees only survivors), the dedup exchanges 16-byte md5 keys
(never text), and the final agg is partial (map-side combined).
The per-group quality summary uses min/max — order-independent —
rather than a float mean, which is association-order-dependent and
would not be reproducible across partitionings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.functions.text import (
    norm_text,
    quality_score,
    token_count,
)
from advisorydatapipeline_spark.queries.dedup_queries import DUCK_NORM
from advisorydatapipeline_spark.queries.text_analysis import _T, _duck_stop_list
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

Q_MIN, TOK_MIN, TOK_MAX = 0.6, 20, 90


@query(
    "curation_pipeline",
    oracle=f"""
WITH m AS (
  SELECT doc_id, lang, source,
         len({_T}) AS n_tok,
         len(list_filter({_T}, t -> list_contains({_duck_stop_list('en')}, t)))
           AS stop_hits,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
           AS n_punct,
         md5({DUCK_NORM.format(x='text')}) AS content_key
  FROM documents
),
scored AS (
  SELECT doc_id, lang, source, n_tok, content_key,
         least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5
           + least((stop_hits / CAST(greatest(n_tok, 1) AS DOUBLE)) * 4.0, 1.0)
             * 0.3
           + (1.0 - least((n_punct / CAST(n_chars AS DOUBLE)) * 5.0, 1.0)) * 0.2
           AS quality
  FROM m
),
kept AS (
  SELECT * FROM scored
  WHERE quality >= {Q_MIN} AND n_tok BETWEEN {TOK_MIN} AND {TOK_MAX}
  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY content_key)
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       min(quality) AS min_q,
       max(quality) AS max_q
FROM kept
GROUP BY 1, 2
""",
)
def curation_pipeline(spark, sf_dir):
    """Full curation chain in one plan: score -> filter -> dedup ->
    stats. See module docstring for the 100 TB shuffle budget."""
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        token_count("text").alias("n_tok"),
        quality_score("text").alias("quality"),
        F.md5(norm_text("text")).alias("content_key"),
    )
    kept = scored.filter(
        (F.col("quality") >= Q_MIN)
        & F.col("n_tok").between(TOK_MIN, TOK_MAX)
    )
    winners = kept.groupBy("content_key").agg(F.min("doc_id").alias("doc_id"))
    deduped = kept.join(winners, ["content_key", "doc_id"], "left_semi")
    return deduped.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_tokens"),
        F.min("quality").alias("min_q"),
        F.max("quality").alias("max_q"),
    )
