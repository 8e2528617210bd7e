"""Round-14 scale points (same protocol as tools/r9-r13_scale_smoke):

- spans8: x1-x8 row for duplicate_spans_exact (documents) — the
  neighbor-LCP maximal-span extractor; done-criterion is the
  suffix_dup_depths shape (every shuffle O(corpus chars)
  fixed-width; the rank-neighbor window partitions by seed-rank
  prefix interval).
- suffix16: x1-x16 row for suffix_dup_depths (r13 verdict item 3 —
  it is the biggest shuffle mover; confirm the sub-linear slope
  holds past x8 the way the graph family was pushed to x16).
- kn3: x1-x8 row for kn_trigram_scores (documents) — one more
  self-join depth than kn_bigram_scores (2.44 @x8); hash
  partial-aggs on n-gram keys.
- ipv8: x1-x8 row for video_pframe_decode (documents) — zero-shuffle
  mapInPandas codec hop (IPV1 encode + reference-chain decode);
  tracks input like the other per-doc codec hops.
- rl8: x1-x8 rows for grpo_advantage_baseline /
  rejection_sampling_keep (events) — per-prompt windows, one
  prompt-keyed shuffle each; ~flat like the dpo family.
- carto8: x1-x8 row for dataset_cartography (documents) — map-side
  epoch explode + one hash agg; tracks rows.

Usage: python tools/r14_scale_smoke.py [sf_dir] [sections]
  sections: comma list from {spans8, suffix16, kn3, ipv8, rl8,
  carto8}; default ALL.
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

from r11_scale_smoke import noop, run_family, stage_replicated, timed  # noqa: E402


def run_family_x16(spark, sf_dir, base, title, ops, tables) -> None:
    """run_family extended to x16 (the r13 graph-family protocol):
    per-doubling ratios printed so a super-linear knee past x8 is
    visible, not averaged away."""
    print(f"\n## {title} x1-x16 (replicated corpus)")
    print("| op | x1 | x2 | x4 | x8 | x16 | t(x16)/t(x8) vs 2.0 |"
          " out x16 |")
    print("|---|---|---|---|---|---|---|---|")
    results = {op: [] for op in ops}
    outs = {}
    for r in (1, 2, 4, 8, 16):
        path = stage_replicated(spark, sf_dir, base, r, tables)
        for op in ops:
            fn = QUERIES[op]
            if r == 1:
                noop(fn(spark, path))  # warm-up
            spark.catalog.clearCache()
            results[op].append(timed(lambda f=fn, p=path: noop(f(spark, p))))
            if r == 16:
                outs[op] = fn(spark, path).count()
            spark.catalog.clearCache()
    for op in ops:
        t = results[op]
        knee = round(t[4] / t[3], 2) if t[3] else float("nan")
        print(
            f"| {op} | {t[0]}s | {t[1]}s | {t[2]}s | {t[3]}s |"
            f" {t[4]}s | {knee} | {outs[op]} |"
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sections = (
        set(sys.argv[2].split(","))
        if len(sys.argv) > 2
        else {"spans8", "suffix16", "kn3", "ipv8", "rl8", "carto8",
              "infl8", "fuse8", "mink8"}
    )
    spark = get_spark("r14-scale-smoke")
    with tempfile.TemporaryDirectory(dir="/tmp") as base:
        if "spans8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "duplicate_spans_exact (documents)",
                ("duplicate_spans_exact",),
                ("documents",),
            )
        if "suffix16" in sections:
            run_family_x16(
                spark,
                sf_dir,
                base,
                "suffix_dup_depths (documents)",
                ("suffix_dup_depths",),
                ("documents",),
            )
        if "kn3" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "kn_trigram_scores (documents)",
                ("kn_trigram_scores",),
                ("documents",),
            )
        if "ipv8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "video_pframe_decode (documents)",
                ("video_pframe_decode",),
                ("documents",),
            )
        if "rl8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "grpo_advantage_baseline / rejection_sampling_keep"
                " (events)",
                ("grpo_advantage_baseline", "rejection_sampling_keep"),
                ("events",),
            )
        if "carto8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "dataset_cartography (documents)",
                ("dataset_cartography",),
                ("documents",),
            )
        if "infl8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "speculative_decode_accept (documents)",
                ("speculative_decode_accept",),
                ("documents",),
            )
            # embeddings need CONTIGUOUS replica ids (the vec_id
            # candidate map moduluses by count; row-copy replication
            # would duplicate keys and change the join semantics)
            from r11_scale_smoke import stage_contiguous

            print("\n## tracin_influence_topk x1-x8 (contiguous"
                  " embeddings)")
            print("| op | x1 | x2 | x4 | x8 | t(x8)/t(x1) vs 8.0 |"
                  " out x8 |")
            print("|---|---|---|---|---|---|---|")
            fn = QUERIES["tracin_influence_topk"]
            ts = []
            out8 = None
            for r in (1, 2, 4, 8):
                path = stage_contiguous(spark, sf_dir, base, r)
                if r == 1:
                    noop(fn(spark, path))
                spark.catalog.clearCache()
                ts.append(timed(lambda p=path: noop(fn(spark, p))))
                if r == 8:
                    out8 = fn(spark, path).count()
                spark.catalog.clearCache()
            slope = round(ts[3] / ts[0], 2) if ts[0] else float("nan")
            print(f"| tracin_influence_topk | {ts[0]}s | {ts[1]}s |"
                  f" {ts[2]}s | {ts[3]}s | {slope} | {out8} |")
        if "mink8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "mink_prob_membership (documents) /"
                " ema_checkpoint_average (embeddings; row-replicated"
                " — the op is per-row map-side, key uniqueness"
                " irrelevant)",
                ("mink_prob_membership", "ema_checkpoint_average"),
                ("documents", "embeddings"),
            )
        if "fuse8" in sections:
            from r11_scale_smoke import stage_contiguous

            print("\n## matryoshka_recall_eval / rrf_fusion_topk"
                  " x1-x8 (contiguous docs+embeddings)")
            print("| op | x1 | x2 | x4 | x8 | t(x8)/t(x1) vs 8.0 |"
                  " out x8 |")
            print("|---|---|---|---|---|---|---|")
            for op in ("matryoshka_recall_eval", "rrf_fusion_topk"):
                fn = QUERIES[op]
                ts = []
                out8 = None
                for r in (1, 2, 4, 8):
                    path = stage_contiguous(spark, sf_dir, base, r)
                    if r == 1:
                        noop(fn(spark, path))
                    spark.catalog.clearCache()
                    ts.append(
                        timed(lambda p=path: noop(fn(spark, p)))
                    )
                    if r == 8:
                        out8 = fn(spark, path).count()
                    spark.catalog.clearCache()
                slope = (
                    round(ts[3] / ts[0], 2) if ts[0] else float("nan")
                )
                print(f"| {op} | {ts[0]}s | {ts[1]}s | {ts[2]}s |"
                      f" {ts[3]}s | {slope} | {out8} |")


if __name__ == "__main__":
    main()
