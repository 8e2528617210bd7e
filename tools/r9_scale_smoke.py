"""Round-9 scale points (same protocol as tools/scale_smoke.py):

- lm_perplexity (ngram_lm_doc_scores) x1/x2/x4 on the replicated
  near-dup document corpus — the judge's done-criterion for the new
  LM scorer;
- semantic_dedup x1/x2/x4 on a replicated embedding corpus where
  every vector gains R-1 near-identical clones (worst realistic
  semantic-dup load), reporting the per-cluster blocked candidate
  bound sum(|c| choose 2) against the all-pairs n choose 2 it
  replaces;
- PPJoin (jaccard_pairs_prefix, the demoted completeness plan)
  extended to x8/x16 — the one dedup family without an x16 row.

Usage: python tools/r9_scale_smoke.py [sf_dir] [sections]
  sections: comma list from {lm,sem,filters,ppjoin}, default all.
Prints markdown rows; SCALE.md extension sections are appended
manually from this output (scale_smoke.py owns the main table).
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from scale_smoke import MAX_DOC_FREQ, corpus  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from advisorydatapipeline_spark.operators.dedup import (  # noqa: E402
    jaccard_pairs_prefix,
    shingle_index,
)
from advisorydatapipeline_spark.operators.lm import (  # noqa: E402
    ngram_lm_doc_scores,
)
from advisorydatapipeline_spark.operators.similarity import (  # noqa: E402
    semantic_dedup,
)
from advisorydatapipeline_spark.session import get_spark  # noqa: E402


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def emb_corpus(spark, sf_dir: str, r: int, base: str) -> str:
    """Replicate embeddings r times with tiny deterministic
    perturbations: every vector gains r-1 near-identical clones, so
    dup-cluster size grows linearly with r."""
    path = f"{base}/emb_x{r}"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    big = emb.select(
        F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("_r"),
        "vec_id",
        "embedding",
        "label",
    ).select(
        (F.col("vec_id") + F.col("_r") * 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: (x + F.col("_r").cast("float") * F.lit(0.0003)),
        ).alias("embedding"),
        "label",
    )
    big.write.mode("overwrite").parquet(path)
    return path


def lm_section(spark, sf_dir: str, base: str) -> None:
    print("\n## lm_perplexity x1/x2/x4 (replicated near-dup docs)")
    print("| op | " + " | ".join(f"x{r}" for r in (1, 2, 4)) + " | t(x4)/t(x1) vs 4.0 |")
    print("|---|---|---|---|---|")
    ts = []
    for r in (1, 2, 4):
        path = corpus(spark, sf_dir, r, base)
        docs = spark.read.parquet(path)
        if r == 1:
            noop(ngram_lm_doc_scores(docs))  # warm-up
        spark.catalog.clearCache()
        ts.append(timed(lambda d=docs: noop(ngram_lm_doc_scores(d))))
        spark.catalog.clearCache()
    print(
        f"| lm_perplexity | {ts[0]}s | {ts[1]}s | {ts[2]}s |"
        f" {round(ts[2] / ts[0], 2)} |"
    )


def sem_section(spark, sf_dir: str, base: str) -> None:
    """Two protocols: fixed k=8 (clusters grow with the corpus — the
    naive deployment, expected quadratic pair growth) and k scaled
    with the corpus (k = 8r — SemDeDup's actual regime: cluster size
    stays ~constant, so blocked pairs stay ~linear in n)."""
    print("\n## semantic_dedup x1/x2/x4 (replicated near-clone embeddings)")
    print(
        "| r | k | n_vecs | time | blocked cand pairs sum(c*(c-1)/2) "
        "| all-pairs n*(n-1)/2 | blocked/all | dup pairs found |"
    )
    print("|---|---|---|---|---|---|---|---|")
    rows = []
    for r, scaled_k in [(1, False), (2, False), (4, False), (2, True), (4, True)]:
        path = emb_corpus(spark, sf_dir, r, base)
        emb = spark.read.parquet(path)
        k = 8 * r if scaled_k else 8
        # scaled-k seeds: one replica-0 vector per cluster plus their
        # first clones (near-identical seeds split clone clusters —
        # the realistic kmeans++-ish oversampling a production run
        # would use)
        cents = (
            emb.orderBy("vec_id")
            .limit(k)
            .select(
                F.monotonically_increasing_id().alias("centroid_id"),
                "embedding",
            )
            if scaled_k
            else emb.filter(F.col("vec_id") < 8).select(
                F.col("vec_id").alias("centroid_id"), "embedding"
            )
        )
        if r == 1:
            noop(semantic_dedup(emb, cents, 2, 5))  # warm-up
        spark.catalog.clearCache()
        t = timed(lambda e=emb, c=cents: noop(semantic_dedup(e, c, 2, 5)))
        out = semantic_dedup(emb, cents, 2, 5)
        stats = out.groupBy("centroid_id").count()
        cand = stats.agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("cand")
        ).collect()[0]["cand"]
        n = emb.count()
        dup_pairs = (
            out.agg(F.sum("n_dup_neighbors").alias("s")).collect()[0]["s"]
            // 2
        )
        allp = n * (n - 1) // 2
        rows.append(
            (r, k, n, t, int(cand), allp, round(cand / allp, 3), dup_pairs)
        )
        spark.catalog.clearCache()
    for r, k, n, t, cand, allp, ratio, dp in rows:
        print(f"| x{r} | {k} | {n} | {t}s | {cand} | {allp} | {ratio} | {dp} |")


def filters_section(spark, sf_dir: str, base: str) -> None:
    """Gopher / DSIR / perceptron x1-x4 on the replicated doc corpus."""
    from advisorydatapipeline_spark.registry import QUERIES

    print("\n## quality-filter family x1/x2/x4 (replicated near-dup docs)")
    print("| op | x1 | x2 | x4 | t(x4)/t(x1) vs 4.0 |")
    print("|---|---|---|---|---|")
    ops = (
        "gopher_quality_flags",
        "dsir_importance_weights",
        "perceptron_lang_step",
        "quality_gate_pipeline",
    )
    results = {op: [] for op in ops}
    for r in (1, 2, 4):
        path = corpus(spark, sf_dir, r, base)
        # registry entries read {dir}/documents.parquet: stage the
        # replicated corpus under that name
        docs_dir = f"{base}/as_sf_x{r}"
        spark.read.parquet(path).write.mode("overwrite").parquet(
            f"{docs_dir}/documents.parquet"
        )
        for op in ops:
            fn = QUERIES[op]
            if r == 1:
                noop(fn(spark, docs_dir))  # warm-up
            spark.catalog.clearCache()
            results[op].append(timed(lambda: noop(fn(spark, docs_dir))))
            spark.catalog.clearCache()
    for op in ops:
        ts = results[op]
        print(
            f"| {op} | {ts[0]}s | {ts[1]}s | {ts[2]}s |"
            f" {round(ts[2] / ts[0], 2)} |"
        )


def ppjoin_section(spark, sf_dir: str, base: str) -> None:
    print("\n## ppjoin (jaccard_pairs_prefix) x8/x16 extension")
    print("| op | " + " | ".join(f"x{r}" for r in (1, 8, 16)) + " | t(x16)/t(x1) vs 16.0 |")
    print("|---|---|---|---|---|")

    def run(path: str) -> float:
        docs = spark.read.parquet(path)

        def go():
            idx = shingle_index(
                docs, "doc_id", "text", 3, max_doc_freq=MAX_DOC_FREQ
            ).persist()
            # guard_max_docs=None: deliberate oversized baseline run
            noop(
                jaccard_pairs_prefix(
                    idx, "doc_id", 2, 5, guard_max_docs=None
                )
            )
            idx.unpersist()

        spark.catalog.clearCache()
        t = timed(go)
        spark.catalog.clearCache()
        return t

    ts = []
    for r in (1, 8, 16):
        path = corpus(spark, sf_dir, r, base)
        if r == 1:
            run(path)  # warm-up
        ts.append(run(path))
    print(
        f"| ppjoin | {ts[0]}s | {ts[1]}s | {ts[2]}s |"
        f" {round(ts[2] / ts[0], 2)} |"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sections = (
        set(sys.argv[2].split(","))
        if len(sys.argv) > 2
        else {"lm", "sem", "ppjoin", "filters"}
    )
    spark = get_spark("r9-scale-smoke")
    base = tempfile.mkdtemp(prefix="adp_r9smoke_")
    if "lm" in sections:
        lm_section(spark, sf_dir, base)
    if "sem" in sections:
        sem_section(spark, sf_dir, base)
    if "filters" in sections:
        filters_section(spark, sf_dir, base)
    if "ppjoin" in sections:
        ppjoin_section(spark, sf_dir, base)


if __name__ == "__main__":
    main()
