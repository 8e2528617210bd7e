"""Similarity search over embedding columns (beyond-reference).

Brute-force cosine top-k as the exact baseline, and an IVF
(inverted-file) variant as the scale path. No Python in the hot path:
dot products are ``zip_with`` + ``aggregate`` over quantized integer
vectors — exact, order-independent arithmetic that the DuckDB oracle
reproduces bit-for-bit (raw float summation is association-order-
dependent and would hash-mismatch between engines).

Scale design (100 TB / billions of vectors):
- brute force: queries broadcast against the corpus; per-partition
  top-k then global top-k (TakeOrdered) — no full sort, corpus never
  shuffles.
- IVF: centroid assignment is a broadcast cross-join argmin; the
  corpus is then *partitioned by centroid id* so a query probes only
  ``nprobe`` partitions — the Spark-native analogue of an IVF index's
  posting lists. Residual refinement / PQ compression would slot in
  as additional narrow columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from advisorydatapipeline_spark.operators.window_ops import top_k_per_key

QUANT_SCALE = 1000


def quantize(col: Column | str, scale: int = QUANT_SCALE) -> Column:
    """float array -> exact integer array: floor(x * scale). floor is
    portable (both engines truncate downward); the integer dot product
    is then exact in 64-bit."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.floor(x * scale).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(dot: Column, na: Column, nb: Column) -> Column:
    """cosine from integer dot/norms — ONE double division over ONE
    sqrt so both engines evaluate the identical IEEE expression."""
    return dot.cast("double") / F.sqrt(na.cast("double") * nb.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self-match excluded).

    ``queries``: (query_id_col, vec_col). Broadcast; the corpus scans
    once, never shuffles, and only (query, candidate) score rows reach
    the per-key top-k."""
    c = corpus.select(
        F.col(id_col), quantize(vec_col).alias("cq"), norm_sq_q(quantize(vec_col)).alias("cn")
    )
    q = queries.select(
        F.col(query_id_col), quantize(vec_col).alias("qq"), norm_sq_q(quantize(vec_col)).alias("qn")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cosine",
            cosine_q(dot_q(F.col("cq"), F.col("qq")), F.col("cn"), F.col("qn")),
        )
    )
    return top_k_per_key(
        scored,
        [query_id_col],
        [F.col("cosine").desc(), F.col(id_col).asc()],
        k=k,
    ).select(query_id_col, F.col(id_col).alias("neighbor_id"), "cosine")


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2,
    deterministic centroid-id tiebreak). Centroids broadcast."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col), quantize(vec_col).alias("vq"),
        norm_sq_q(quantize(vec_col)).alias("vn"),
    )
    cent = centroids.select(
        F.col(centroid_id_col), quantize(vec_col).alias("kq"),
        norm_sq_q(quantize(vec_col)).alias("kn"),
    )
    scored = c.crossJoin(F.broadcast(cent)).withColumn(
        "dist_sq", F.col("vn") + F.col("kn") - 2 * dot_q(F.col("vq"), F.col("kq"))
    )
    return top_k_per_key(
        scored, [id_col], [F.col("dist_sq").asc(), F.col(centroid_id_col).asc()], k=1
    ).select(id_col, vec_col, centroid_id_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF approximate top-k: per query, probe the ``nprobe`` nearest
    centroids' clusters only. At scale the assigned corpus is written
    ``partitionBy(centroid_id)`` so probing prunes partitions."""
    assigned = ivf_assign(
        corpus, centroids, id_col=id_col, vec_col=vec_col,
        centroid_id_col=centroid_id_col,
    )
    q_probe = ivf_probe_lists(
        queries, centroids, nprobe,
        vec_col=vec_col, query_id_col=query_id_col,
        centroid_id_col=centroid_id_col,
    )
    c = assigned.select(
        F.col(id_col), F.col(centroid_id_col),
        quantize(vec_col).alias("cq"), norm_sq_q(quantize(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(query_id_col), quantize(vec_col).alias("qq"),
        norm_sq_q(quantize(vec_col)).alias("qn"),
    ).join(q_probe, query_id_col)
    scored = (
        c.join(F.broadcast(q), centroid_id_col)
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cosine",
            cosine_q(dot_q(F.col("cq"), F.col("qq")), F.col("cn"), F.col("qn")),
        )
    )
    return top_k_per_key(
        scored, [query_id_col], [F.col("cosine").desc(), F.col(id_col).asc()], k=k
    ).select(query_id_col, F.col(id_col).alias("neighbor_id"), "cosine")


def ivf_probe_lists(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    *,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """(query_id, centroid_id) rows for each query's nprobe nearest
    centroids."""
    q = queries.select(
        F.col(query_id_col), quantize(vec_col).alias("qq"),
        norm_sq_q(quantize(vec_col)).alias("qn"),
    )
    cent = centroids.select(
        F.col(centroid_id_col), quantize(vec_col).alias("kq"),
        norm_sq_q(quantize(vec_col)).alias("kn"),
    )
    scored = q.crossJoin(F.broadcast(cent)).withColumn(
        "dist_sq", F.col("qn") + F.col("kn") - 2 * dot_q(F.col("qq"), F.col("kq"))
    )
    return top_k_per_key(
        scored, [query_id_col],
        [F.col("dist_sq").asc(), F.col(centroid_id_col).asc()], k=nprobe,
    ).select(query_id_col, centroid_id_col)


def embedding_near_dupes(
    corpus: DataFrame,
    centroids: DataFrame,
    min_cosine: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via cluster-then-pair:
    vectors are bucketed to their nearest centroid (ivf_assign) and
    pairs are formed ONLY within a bucket, then exact-cosine filtered.

    The pair join is an equi-join on centroid_id — hash-join cost with
    ~n/k rows per bucket instead of the O(n^2) global cross join; the
    deliberate (and deterministic) approximation is that cross-bucket
    pairs are missed, which the oracle reproduces by replaying the
    same assignment. Returns (id_a, id_b, cosine).
    """
    assigned = ivf_assign(
        corpus, centroids, id_col=id_col, vec_col=vec_col,
        centroid_id_col=centroid_id_col,
    ).select(
        F.col(id_col), F.col(centroid_id_col),
        quantize(vec_col).alias("vq"),
        norm_sq_q(quantize(vec_col)).alias("vn"),
    )
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col(centroid_id_col),
        F.col("vq").alias("aq"), F.col("vn").alias("an"),
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col(centroid_id_col),
        F.col("vq").alias("bq"), F.col("vn").alias("bn"),
    )
    return (
        a.join(b, centroid_id_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            cosine_q(dot_q(F.col("aq"), F.col("bq")), F.col("an"), F.col("bn")),
        )
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dupes_pandas(
    corpus: DataFrame,
    centroids: DataFrame,
    min_cosine: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Vectorized twin of :func:`embedding_near_dupes`: same
    cluster-then-pair plan, but each centroid bucket's pairwise scores
    are one numpy int64 matmul inside ``applyInPandas`` instead of
    per-pair zip_with/aggregate expressions (interpreted HOFs).
    Quantized integer dots are exact in int64 and the cosine is the
    same single double division, so results are bit-identical to the
    expression version and to the DuckDB oracle.

    Scale: grouping by centroid_id bounds each Arrow batch to one
    bucket; within a bucket the score matrix is O(b^2) but vectorized
    — the same trade an IVF index makes. Skewed buckets would split
    via a sub-salt on the bucket id before the groupBy.
    """
    import numpy as np
    import pandas as pd

    assigned = ivf_assign(
        corpus, centroids, id_col=id_col, vec_col=vec_col,
        centroid_id_col=centroid_id_col,
    ).select(
        F.col(id_col), F.col(centroid_id_col),
        quantize(vec_col).alias("vq"),
    )

    out_schema = "id_a long, id_b long, cosine double"

    def score_bucket(pdf: pd.DataFrame):
        if len(pdf) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
        pdf = pdf.sort_values("vec_id" if id_col == "vec_id" else id_col)
        ids = pdf[id_col].to_numpy()
        m = np.stack(pdf["vq"].to_numpy()).astype(np.int64)
        dots = m @ m.T
        # sqrt(na*nb) — NOT sqrt(na)*sqrt(nb) — to stay bit-identical
        # with the cosine_q expression and the DuckDB oracle (the two
        # forms differ in the last ulp); na*nb <= (64*1e6)^2 < 2^53 so
        # the double product is exact
        nsq = np.diag(dots)
        cos = dots / np.sqrt(np.outer(nsq, nsq).astype(np.float64))
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = cos[iu, ju] >= min_cosine
        return pd.DataFrame(
            {
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "cosine": cos[iu, ju][keep],
            }
        )

    return assigned.groupBy(centroid_id_col).applyInPandas(
        score_bucket, out_schema
    )
