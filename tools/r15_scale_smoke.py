"""Round-15 scale points (same protocol as tools/r9-r14_scale_smoke):

- spans16: x1-x16 row for duplicate_spans_exact (r14 verdict item 2
  follow-through — it is now the biggest shuffle mover at 97 MB/sf0.1,
  so the sub-linear slope must be shown past x8 like suffix_dup_depths
  and the graph family were).
- rrfivf8: x1-x8 row for rrf_fusion_ivf + rrf_ivf_recall_eval
  (contiguous docs+embeddings), printing the DENSE-ARM CANDIDATE PAIR
  count next to wall — the done-criterion of r14 verdict item 1:
  pairs grow with the probed buckets' population (~corpus/4 per query
  at nprobe=2 of 8 uniform centroids), never corpus^2; the brute arm
  (rrf_fusion_topk) pairs are printed for contrast.
- spanskew: duplicate_spans_exact with hot_seed_threshold ON vs OFF
  at x4 — the escalated plan must stay within noise of the default on
  an unskewed corpus (the stitch overhead is boundary-rows only).
- kn5: x1-x8 row for kn_5gram_scores (documents) — KenLM-default
  order; each level is one hash partial-agg over the level above, so
  the slope should track the trigram's (3.39 @x8).
- moe8: x1-x8 row for moe_router_load (events) — constant per-token
  work, one 8-rows-per-token partial-agg shuffle; expect ~flat.
- gns8: x1-x8 row for gradient_noise_scale (embeddings) — map-side
  moments + (label, pos) partial agg; expect ~flat.
- pack8: x1-x8 row for packing_crossdoc_attention (documents) — the
  packing prefix-sum window + a ~1-row-per-doc segment explode.

Usage: python tools/r15_scale_smoke.py [sf_dir] [sections]
  sections: comma list from {spans16, rrfivf8, spanskew, kn5};
  default ALL.
Prints markdown rows; SCALE.md sections are appended manually from
this output (scale_smoke.py owns the main table).
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from advisorydatapipeline_spark.registry import QUERIES  # noqa: E402
from advisorydatapipeline_spark.session import get_spark  # noqa: E402

from r11_scale_smoke import noop, stage_contiguous, timed  # noqa: E402
from r14_scale_smoke import run_family_x16  # noqa: E402


def rrfivf_section(spark, sf_dir: str, base: str) -> None:
    from pyspark.sql import functions as F

    from advisorydatapipeline_spark.operators.similarity import (
        ivf_assign,
        ivf_probe_lists,
    )
    from advisorydatapipeline_spark.queries.helpers import load
    from advisorydatapipeline_spark.queries.ranking_queries import (
        _RRF_NCENT,
        _RRF_NPROBE,
        _RRF_QMOD,
    )

    print("\n## rrf_fusion_ivf / rrf_ivf_recall_eval x1-x8"
          " (contiguous docs+embeddings)")
    print("| r | corpus | queries | brute pairs | ivf cand pairs |"
          " fusion wall | recall-eval wall | recall_ppm |")
    print("|---|---|---|---|---|---|---|---|")
    fuse = QUERIES["rrf_fusion_ivf"]
    ev = QUERIES["rrf_ivf_recall_eval"]
    for r in (1, 2, 4, 8):
        path = stage_contiguous(spark, sf_dir, base, r)
        emb = load(spark, path, "embeddings")
        docs = load(spark, path, "documents")
        nc = emb.count()
        qs = (
            docs.filter(F.col("doc_id") % _RRF_QMOD == 0)
            .join(
                emb.select(F.col("vec_id").alias("doc_id")), "doc_id"
            )
            .select(F.col("doc_id").alias("query_id"))
        )
        nq = qs.count()
        centroids = emb.filter(F.col("vec_id") < _RRF_NCENT).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        assigned = ivf_assign(emb, centroids)
        probes = ivf_probe_lists(
            qs.join(
                emb.select(
                    F.col("vec_id").alias("query_id"), "embedding"
                ),
                "query_id",
            ),
            centroids,
            _RRF_NPROBE,
        )
        cand_pairs = (
            probes.join(
                assigned.select("vec_id", "centroid_id"), "centroid_id"
            )
            .filter(F.col("vec_id") != F.col("query_id"))
            .count()
        )
        if r == 1:
            noop(fuse(spark, path))  # warm-up
        spark.catalog.clearCache()
        t_fuse = timed(lambda p=path: noop(fuse(spark, p)))
        spark.catalog.clearCache()
        t_ev = timed(lambda p=path: noop(ev(spark, p)))
        recall = ev(spark, path).collect()[0]["recall_ppm"]
        spark.catalog.clearCache()
        print(
            f"| x{r} | {nc} | {nq} | {nq * (nc - 1)} | {cand_pairs} |"
            f" {t_fuse}s | {t_ev}s | {recall} |"
        )


def spanskew_section(spark, sf_dir: str, base: str) -> None:
    from r11_scale_smoke import stage_replicated

    from advisorydatapipeline_spark.operators.suffix import (
        duplicate_span_stats,
    )
    from advisorydatapipeline_spark.queries.helpers import load

    print("\n## duplicate_spans_exact escalation overhead at x4"
          " (unskewed corpus; threshold = 10k positions)")
    print("| variant | wall | rows |")
    print("|---|---|---|")
    path = stage_replicated(
        spark, sf_dir, base, 4, ("documents",)
    )
    docs = load(spark, path, "documents")
    noop(duplicate_span_stats(docs))  # warm-up
    spark.catalog.clearCache()
    t_off = timed(lambda: noop(duplicate_span_stats(docs)))
    n_off = duplicate_span_stats(docs).count()
    spark.catalog.clearCache()
    t_on = timed(
        lambda: noop(
            duplicate_span_stats(docs, hot_seed_threshold=10_000)
        )
    )
    n_on = duplicate_span_stats(docs, hot_seed_threshold=10_000).count()
    spark.catalog.clearCache()
    print(f"| threshold OFF (registry default) | {t_off}s | {n_off} |")
    print(f"| threshold 10k ON | {t_on}s | {n_on} |")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sections = (
        set(sys.argv[2].split(","))
        if len(sys.argv) > 2
        else {"spans16", "rrfivf8", "spanskew", "kn5", "moe8",
              "gns8", "pack8", "kl8", "ams8", "dist8", "jm8"}
    )
    spark = get_spark("r15-scale-smoke")
    with tempfile.TemporaryDirectory(dir="/tmp") as base:
        if "spans16" in sections:
            run_family_x16(
                spark,
                sf_dir,
                base,
                "duplicate_spans_exact (documents)",
                ("duplicate_spans_exact",),
                ("documents",),
            )
        if "rrfivf8" in sections:
            rrfivf_section(spark, sf_dir, base)
        if "spanskew" in sections:
            spanskew_section(spark, sf_dir, base)
        if "kn5" in sections:
            from r11_scale_smoke import run_family

            run_family(
                spark,
                sf_dir,
                base,
                "kn_5gram_scores (documents)",
                ("kn_5gram_scores",),
                ("documents",),
            )
        if "moe8" in sections:
            from r11_scale_smoke import run_family

            run_family(
                spark,
                sf_dir,
                base,
                "moe_router_load (events)",
                ("moe_router_load",),
                ("events",),
            )
        if "pack8" in sections:
            from r11_scale_smoke import run_family

            run_family(
                spark,
                sf_dir,
                base,
                "packing_crossdoc_attention (documents)",
                ("packing_crossdoc_attention",),
                ("documents",),
            )
        if "kl8" in sections:
            from r11_scale_smoke import run_family

            run_family(
                spark,
                sf_dir,
                base,
                "rlhf_kl_budget (events)",
                ("rlhf_kl_budget",),
                ("events",),
            )
        if "ams8" in sections:
            from r11_scale_smoke import run_family

            run_family(
                spark,
                sf_dir,
                base,
                "ams_f2_moment (documents)",
                ("ams_f2_moment",),
                ("documents",),
            )
        if "dist8" in sections:
            from r11_scale_smoke import run_family

            run_family(
                spark,
                sf_dir,
                base,
                "distill_disagreement_set (events)",
                ("distill_disagreement_set",),
                ("events",),
            )
        if "jm8" in sections:
            from r11_scale_smoke import run_family

            run_family(
                spark,
                sf_dir,
                base,
                "jm_lambda_em_step (documents)",
                ("jm_lambda_em_step",),
                ("documents",),
            )
        if "gns8" in sections:
            from r11_scale_smoke import run_family

            run_family(
                spark,
                sf_dir,
                base,
                "gradient_noise_scale (embeddings; row-replicated —"
                " per-label moment aggregates, vec_id uniqueness"
                " irrelevant)",
                ("gradient_noise_scale",),
                ("embeddings",),
            )


if __name__ == "__main__":
    main()
