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


BM25_S = 1000          # fixed-point scale for k1/b/length-norm
BM25_K1_S = 1200       # k1 = 1.2
BM25_B_S = 750         # b  = 0.75
BM25_IDF_SCALE = 1000  # smaller than IDF_SCALE: leaves BIGINT headroom
                       # for tf * (k1+1)*S * idf at billion-doc N


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k documents per query term by integer-scaled BM25.

    Classic BM25 with k1=1.2, b=0.75, in pure BIGINT fixed-point so
    ranking is bit-identical across engines (same rule as tfidf_topk;
    the idf is the linear ``(N*scale) DIV df`` proxy for the same
    portability reason — float log() can flip ranks in the last ulp):

        lnorm_s = (S - bS) + (bS * dl * S) DIV avgdl_s
        denom_s = tf * S + (k1S * lnorm_s) DIV S
        score   = (tf * (k1S + S) * idf) DIV denom_s

    Scale shape: the token filter keeps only query-term rows BEFORE
    the (doc, term) aggregation, so tf is tiny; df-per-term and the
    corpus (N, sum dl) scalars are broadcast 1-row/short aggregates;
    the only wide ops are the tf partial-agg and one per-term top-k
    window over already-filtered rows. Document text never shuffles.
    """
    tokd = df.select(F.col(id_col), tokens(text_col).alias("ts"))
    dl = tokd.select(
        F.col(id_col), F.size("ts").cast("long").alias("dl")
    )
    tf = (
        tokd.select(F.col(id_col), F.explode("ts").alias("term"))
        .filter(F.col("term").isin(list(terms)))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    stats = df.agg(
        F.count("*").cast("long").alias("n"),
    ).crossJoin(
        dl.agg(F.sum("dl").cast("long").alias("sumdl"))
    )
    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl_s", F.expr(f"(sumdl * {BM25_S}) DIV n"))
        .withColumn("idf", F.expr(f"(n * {BM25_IDF_SCALE}) DIV df"))
        .withColumn(
            "lnorm_s",
            F.expr(
                f"({BM25_S} - {BM25_B_S})"
                f" + ({BM25_B_S} * dl * {BM25_S}) DIV avgdl_s"
            ),
        )
        .withColumn(
            "score",
            F.expr(
                f"(tf * ({BM25_K1_S} + {BM25_S}) * idf)"
                f" DIV (tf * {BM25_S} + ({BM25_K1_S} * lnorm_s) DIV {BM25_S})"
            ),
        )
    )
    w = Window.partitionBy("term").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("term", id_col, "tf", "dl", "df", "score", "rn")
    )
