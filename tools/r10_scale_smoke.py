"""Round-10 scale points (same protocol as tools/scale_smoke.py /
r9_scale_smoke.py):

- image_phash_neardup x1/x2/x4/x8 on the replicated document corpus
  (every replica's doc ids shift by 1e6, so content-key groups stay
  intact and the planted near-dup structure scales linearly) — the
  judge's done-criterion for the new operator: banded (not all-pairs)
  growth, evidenced by the actual candidate-stream size
  sum_buckets(n*(n-1)/2) against the all-pairs bound;
- x8 extension points for the round-9 families (lm_perplexity,
  semantic_dedup scaled-k, quality-filter family) — the house
  standard for dedup/graph is x8-x16, r9 stopped at x4.

Usage: python tools/r10_scale_smoke.py [sf_dir] [sections]
  sections: comma list from {phash,lm8,sem8,filters8}, default all.
Prints markdown rows; SCALE.md sections are appended manually from
this output (scale_smoke.py owns the main table).
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from r9_scale_smoke import emb_corpus  # noqa: E402
from scale_smoke import corpus  # noqa: E402

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from advisorydatapipeline_spark.operators.lm import (  # noqa: E402
    ngram_lm_doc_scores,
)
from advisorydatapipeline_spark.operators.multimodal import (  # noqa: E402
    encode_bmp_cellgrid,
    image_dhash_blocks,
    image_phash_near_dupes,
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


def _media(spark, docs_path: str):
    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        encode_bmp_cellgrid(int(d))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    docs = spark.read.parquet(docs_path).select("doc_id")
    return docs.mapInPandas(encode, "media_id long, payload binary")


def phash_section(spark, sf_dir: str, base: str) -> None:
    print("\n## image_phash_neardup x1/x2/x4/x8 (replicated BMP corpus)")
    print(
        "| r | n_imgs | time | out pairs | candidate stream "
        "sum(n*(n-1)/2 per block bucket) | all-pairs bound | cand/all |"
    )
    print("|---|---|---|---|---|---|---|")
    for r in (1, 2, 4, 8):
        path = corpus(spark, sf_dir, r, base)
        media = _media(spark, path)
        if r == 1:
            noop(image_phash_near_dupes(media))  # warm-up
        spark.catalog.clearCache()
        t = timed(lambda m=media: noop(image_phash_near_dupes(m)))
        out_pairs = image_phash_near_dupes(media).count()
        # actual candidate-stream size: per classic-banding bucket
        # (block index, block value) with n members, n*(n-1)/2 pairs
        sig = image_dhash_blocks(media)
        n = sig.count()
        cand = 0
        for bd in range(4):
            cnt = sig.groupBy(F.col(f"block_{bd}")).count()
            cand += int(
                cnt.agg(
                    F.sum(
                        F.col("count") * (F.col("count") - 1) / 2
                    ).alias("c")
                ).collect()[0]["c"]
            )
        allp = n * (n - 1) // 2
        print(
            f"| x{r} | {n} | {t}s | {out_pairs} | {cand} | {allp} |"
            f" {round(cand / allp, 4)} |"
        )
        spark.catalog.clearCache()


def afp_jpeg_section(spark, sf_dir: str, base: str) -> None:
    """audio_fingerprint_neardup + jpeg_pixel_stats x1/x2/x4/x8 on
    the replicated doc corpus (registry entries read
    {dir}/documents.parquet; stage replicas under that name)."""
    from advisorydatapipeline_spark.registry import QUERIES

    print(
        "\n## audio_fingerprint_neardup / jpeg_pixel_stats x1-x8 "
        "(replicated corpus)"
    )
    print("| op | x1 | x2 | x4 | x8 | t(x8)/t(x1) vs 8.0 | out x8 |")
    print("|---|---|---|---|---|---|---|")
    ops = (
        "audio_fingerprint_neardup",
        "jpeg_pixel_stats",
        "avi_mjpeg_frame_sampling",
    )
    results = {op: [] for op in ops}
    outs = {}
    for r in (1, 2, 4, 8):
        path = corpus(spark, sf_dir, r, base)
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
            if r == 8:
                outs[op] = fn(spark, docs_dir).count()
                spark.catalog.clearCache()
    for op in ops:
        ts = results[op]
        print(
            f"| {op} | {ts[0]}s | {ts[1]}s | {ts[2]}s | {ts[3]}s |"
            f" {round(ts[3] / ts[0], 2)} | {outs[op]} |"
        )


def lm8_section(spark, sf_dir: str, base: str) -> None:
    print("\n## lm_perplexity x8 extension (x1 reference rerun)")
    print("| op | x1 | x8 | t(x8)/t(x1) vs 8.0 |")
    print("|---|---|---|---|")
    ts = []
    for r in (1, 8):
        path = corpus(spark, sf_dir, r, base)
        docs = spark.read.parquet(path)
        if r == 1:
            noop(ngram_lm_doc_scores(docs))  # warm-up
        spark.catalog.clearCache()
        ts.append(timed(lambda d=docs: noop(ngram_lm_doc_scores(d))))
        spark.catalog.clearCache()
    print(f"| lm_perplexity | {ts[0]}s | {ts[1]}s | {round(ts[1] / ts[0], 2)} |")


def sem8_section(spark, sf_dir: str, base: str) -> None:
    print("\n## semantic_dedup x8, k scaled with corpus (linear regime)")
    print(
        "| r | k | n_vecs | time | blocked cand pairs | all-pairs |"
        " blocked/all |"
    )
    print("|---|---|---|---|---|---|---|")
    for r, k in ((1, 8), (8, 64)):
        path = emb_corpus(spark, sf_dir, r, base)
        emb = spark.read.parquet(path)
        cents = (
            emb.orderBy("vec_id")
            .limit(k)
            .select(
                F.monotonically_increasing_id().alias("centroid_id"),
                "embedding",
            )
        )
        if r == 1:
            noop(semantic_dedup(emb, cents, 2, 5))  # warm-up
        spark.catalog.clearCache()
        t = timed(lambda e=emb, c=cents: noop(semantic_dedup(e, c, 2, 5)))
        out = semantic_dedup(emb, cents, 2, 5)
        stats = out.groupBy("centroid_id").count()
        cand = int(
            stats.agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c")
            ).collect()[0]["c"]
        )
        n = emb.count()
        allp = n * (n - 1) // 2
        print(
            f"| x{r} | {k} | {n} | {t}s | {cand} | {allp} |"
            f" {round(cand / allp, 4)} |"
        )
        spark.catalog.clearCache()


def filters8_section(spark, sf_dir: str, base: str) -> None:
    from advisorydatapipeline_spark.registry import QUERIES

    print("\n## quality-filter family x8 extension (x1 reference rerun)")
    print("| op | x1 | x8 | t(x8)/t(x1) vs 8.0 |")
    print("|---|---|---|---|")
    ops = (
        "gopher_quality_flags",
        "dsir_importance_weights",
        "perceptron_lang_step",
        "quality_gate_pipeline",
    )
    results = {op: [] for op in ops}
    for r in (1, 8):
        path = corpus(spark, sf_dir, r, base)
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
            f"| {op} | {ts[0]}s | {ts[1]}s | {round(ts[1] / ts[0], 2)} |"
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sections = (
        set(sys.argv[2].split(","))
        if len(sys.argv) > 2
        else {"phash", "afpjpeg", "lm8", "sem8", "filters8"}
    )
    spark = get_spark("r10-scale-smoke")
    with tempfile.TemporaryDirectory() as base:
        if "phash" in sections:
            phash_section(spark, sf_dir, base)
        if "afpjpeg" in sections:
            afp_jpeg_section(spark, sf_dir, base)
        if "lm8" in sections:
            lm8_section(spark, sf_dir, base)
        if "sem8" in sections:
            sem8_section(spark, sf_dir, base)
        if "filters8" in sections:
            filters8_section(spark, sf_dir, base)


if __name__ == "__main__":
    main()
