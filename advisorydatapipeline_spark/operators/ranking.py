"""Term-ranking and corpus-statistics operators (beyond-reference).

TF-IDF term extraction and span-duplication profiling over a document
corpus — the relevance/contamination half of a training-data curation
stack (reference has no counterpart; companions to operators/dedup.py
and operators/curation.py).

Scale design (100 TB):
- TF-IDF is two hash-shuffled partial aggregations (doc-term, then
  term) plus one big-big hash join on ``term`` and one windowed top-k
  partitioned on the *same* doc key the tf aggregation used — AQE can
  reuse the exchange. The corpus-size scalar joins in via a broadcast
  of a 1-row aggregate, never a driver collect.
- IDF is *integer-scaled* (``(N * 1_000_000) DIV df``): pure BIGINT
  arithmetic is bit-identical across Spark, DuckDB, and any engine,
  so ranking is reproducible — float ``log()`` differs in the last
  ulp between runtimes and can flip ranks.
- Span-dup profiling reuses the distinct shingle inverted index from
  operators/dedup.shingle_index: one doc-freq aggregation over the
  shingle key, one join back, one per-doc aggregation. Text itself
  never shuffles — only (id, shingle) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from advisorydatapipeline_spark.functions.text import tokens
from advisorydatapipeline_spark.operators.dedup import shingle_index

IDF_SCALE = 1_000_000


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (id, term) with its in-document count."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    return toks.groupBy(id_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )


def tfidf_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Top-k terms per document by integer-scaled TF-IDF.

    score = tf * ((N * IDF_SCALE) DIV df)  — all BIGINT, portable.
    Ties break on the term string, so the top-k set is deterministic.
    """
    tf = term_frequencies(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n = df.agg(F.count("*").cast("long").alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.expr(f"tf * ((n * {IDF_SCALE}) DIV df)"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tf", "df", "score", "rn")
    )


def span_dup_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    hot_df: int = 4,
) -> DataFrame:
    """Per-document duplicated-span profile (Lee et al., "Deduplicating
    Training Data Makes Language Models Better" — detection half).

    For each doc: how many of its distinct n-gram shingles occur in
    >= ``hot_df`` documents corpus-wide, and the hot fraction. High
    fractions mark boilerplate/templated docs that exact- and
    near-dedup both miss.
    """
    idx = shingle_index(df, id_col, text_col, n=n)
    dfreq = idx.groupBy("shingle").agg(
        F.count("*").cast("long").alias("doc_freq")
    )
    joined = idx.join(dfreq, "shingle")
    hot = F.when(F.col("doc_freq") >= hot_df, F.lit(1)).otherwise(F.lit(0))
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.sum(hot).cast("long").alias("n_hot"),
    ).withColumn(
        "hot_frac",
        F.col("n_hot").cast("double") / F.col("n_shingles").cast("double"),
    )
