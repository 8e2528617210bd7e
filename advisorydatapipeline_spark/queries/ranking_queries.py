"""Corpus ranking / profiling queries with DuckDB oracles.

TF-IDF term extraction, span-duplication profiling, deterministic
train/val/test splitting, and length histograms over ``documents`` —
the statistics half of a training-data curation stack.

Oracle-portability notes:
- IDF is integer-scaled (BIGINT ``DIV``) — float ``log()`` differs in
  the last ulp across engines and can flip top-k ranks.
- The split hash is the portable md5-derived ``hash64`` (same as the
  stratified sampler), never engine-private murmur/xxhash.
- Histogram buckets are pure integer division.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.ranking import (
    IDF_SCALE,
    span_dup_profile,
    tfidf_topk,
)
from advisorydatapipeline_spark.functions.text import hash64
from advisorydatapipeline_spark.queries.dedup_queries import (
    DUCK_HASH64,
    DUCK_SHINGLES,
    DUCK_TOKENS,
)
from advisorydatapipeline_spark.queries.helpers import load
from advisorydatapipeline_spark.registry import query

TFIDF_K = 5


@query(
    "tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_TOKENS.format(x='text')}) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         t.tf * ((n.n * {IDF_SCALE}) // d.df) AS score
  FROM tf t JOIN dfreq d USING (term), n
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rn
  FROM scored
)
SELECT doc_id, term, tf, df, score, rn
FROM ranked WHERE rn <= {TFIDF_K}
""",
)
def tfidf_top_terms(spark, sf_dir):
    """Top-5 TF-IDF terms per doc. Integer-scaled idf
    (``tf * ((N*1e6) DIV df)``) keeps ranking bit-identical across
    engines; the corpus-size scalar arrives via a broadcast 1-row
    aggregate, not a collect."""
    return tfidf_topk(
        load(spark, sf_dir, "documents"), "doc_id", "text", k=TFIDF_K
    )


HOT_DF = 4


@query(
    "dup_span_fraction",
    oracle=f"""
WITH {DUCK_SHINGLES},
dfreq AS (
  SELECT shingle, CAST(count(*) AS BIGINT) AS doc_freq FROM sh GROUP BY 1
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN d.doc_freq >= {HOT_DF} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hot,
       CAST(sum(CASE WHEN d.doc_freq >= {HOT_DF} THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS hot_frac
FROM sh s JOIN dfreq d USING (shingle)
GROUP BY s.doc_id
""",
)
def dup_span_fraction(spark, sf_dir):
    """Per-doc duplicated-span profile: fraction of distinct 3-gram
    shingles shared with >=4 docs corpus-wide (Lee et al. span-dup
    detection). Flags boilerplate that exact/near dedup misses."""
    return span_dup_profile(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=3, hot_df=HOT_DF
    )


_SPLIT_SALT = "split#1"
TRAIN_PCT, VAL_PCT = 80, 10  # test gets the remainder


@query(
    "split_assignment",
    oracle=f"""
WITH assigned AS (
  SELECT lang, n_chars,
         CASE
           WHEN {DUCK_HASH64.format(x=f"'{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")} % 100
                < {TRAIN_PCT} THEN 'train'
           WHEN {DUCK_HASH64.format(x=f"'{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")} % 100
                < {TRAIN_PCT + VAL_PCT} THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM assigned GROUP BY 1, 2
""",
)
def split_assignment(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by portable
    md5-hash bucket (reproducible across runs, partitionings, and
    engines — rand() is none of those), validated by per-split
    per-language counts. Filter+agg only: the assignment itself is a
    narrow per-row expression that pipelines inside the scan."""
    docs = load(spark, sf_dir, "documents")
    b = hash64(
        F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string"))
    ) % 100
    split = (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


BUCKET_CHARS, MAX_BUCKET = 64, 15


@query(
    "length_histogram",
    oracle=f"""
SELECT lang,
       LEAST(n_chars // {BUCKET_CHARS}, {MAX_BUCKET}) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY 1, 2
""",
)
def length_histogram(spark, sf_dir):
    """Doc-length histogram per language (64-char integer buckets,
    clamped tail) — the length-filter calibration step of a curation
    pipeline. Single partial-aggregated shuffle on (lang, bucket)."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.expr(f"LEAST(n_chars DIV {BUCKET_CHARS}, {MAX_BUCKET})")
    return (
        docs.select("lang", bucket.alias("bucket"), "n_chars")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )
