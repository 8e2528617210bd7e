"""Round-11 scale points (same protocol as tools/scale_smoke.py /
r9/r10_scale_smoke.py):

- x8 rows for the three late round-10 operators that landed with
  gates but no SCALE evidence (r10 verdict item 6):
  t_closeness_audit (customer), mannwhitney_value_drift (events),
  epoch_shard_plan (documents);
- x1-x8 rows for every round-11 operator: url_canonical_dedup,
  domain_quota_retention, decontaminate_longest_span,
  mp3_frame_stats (replicated documents corpus) and clip_pair_gate
  (contiguously replicated documents+embeddings, with the pair-join
  strategy printed — the done-criterion is broadcast, not shuffled,
  pair evaluation).

Usage: python tools/r11_scale_smoke.py [sf_dir] [sections]
  sections: comma list from {r10x8,r11docs,clip8}, default all.
Prints markdown rows; SCALE.md sections are appended manually from
this output (scale_smoke.py owns the main table).
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F  # noqa: E402

from advisorydatapipeline_spark.registry import QUERIES  # noqa: E402
from advisorydatapipeline_spark.session import get_spark  # noqa: E402


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def stage_replicated(spark, sf_dir: str, base: str, r: int, tables) -> str:
    """Stage an x{r} sf-dir: documents get the id-shift replication
    (content-key groups intact, like scale_smoke.corpus); customer /
    events replicate rows as-is (same key groups, r-fold group
    sizes — the realistic growth mode for audits and drift tests)."""
    out = f"{base}/x{r}"
    rep = F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("_r")
    for t in tables:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        big = df.select(rep, "*")
        if t == "documents":
            big = big.withColumn(
                "doc_id", F.col("doc_id") + F.col("_r") * 1_000_000
            )
        big.drop("_r").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    return out


def stage_contiguous(spark, sf_dir: str, base: str, r: int) -> str:
    """Stage documents + embeddings with CONTIGUOUS replica ids
    (id + _r * base_count) so clip_pair_gate's modular pair map
    (doc_id*7+13) % n keeps hitting existing vec_ids at every r."""
    out = f"{base}/contig_x{r}"
    for t, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        n = df.count()
        big = df.select(
            F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("_r"), "*"
        ).withColumn(key, F.col(key) + F.col("_r") * n)
        big.drop("_r").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    return out


def run_family(spark, sf_dir, base, title, ops, tables) -> None:
    print(f"\n## {title} x1-x8 (replicated corpus)")
    print("| op | x1 | x2 | x4 | x8 | t(x8)/t(x1) vs 8.0 | out x8 |")
    print("|---|---|---|---|---|---|---|")
    results = {op: [] for op in ops}
    outs = {}
    for r in (1, 2, 4, 8):
        path = stage_replicated(spark, sf_dir, base, r, tables)
        for op in ops:
            fn = QUERIES[op]
            if r == 1:
                noop(fn(spark, path))  # warm-up
            spark.catalog.clearCache()
            results[op].append(timed(lambda f=fn, p=path: noop(f(spark, p))))
            if r == 8:
                outs[op] = fn(spark, path).count()
            spark.catalog.clearCache()
    for op in ops:
        t = results[op]
        slope = round(t[3] / t[0], 2) if t[0] else float("nan")
        print(
            f"| {op} | {t[0]}s | {t[1]}s | {t[2]}s | {t[3]}s |"
            f" {slope} | {outs[op]} |"
        )


def clip_section(spark, sf_dir: str, base: str) -> None:
    print("\n## clip_pair_gate x1-x8 (contiguous docs+embeddings)")
    print(
        "| r | n_pairs | time | pair-join strategy"
        " (both vec_id joins) |"
    )
    print("|---|---|---|---|")
    fn = QUERIES["clip_pair_gate"]
    for r in (1, 2, 4, 8):
        path = stage_contiguous(spark, sf_dir, base, r)
        if r == 1:
            noop(fn(spark, path))  # warm-up
        spark.catalog.clearCache()
        t = timed(lambda p=path: noop(fn(spark, p)))
        df = fn(spark, path)
        n = df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        shj = plan.count("ShuffledHashJoin")
        strat = f"{bhj} broadcast / {smj + shj} shuffled"
        print(f"| x{r} | {n} | {t}s | {strat} |")
        spark.catalog.clearCache()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sections = (
        set(sys.argv[2].split(","))
        if len(sys.argv) > 2
        else {"r10x8", "r11docs", "clip8"}
    )
    spark = get_spark("r11-scale-smoke")
    with tempfile.TemporaryDirectory(dir="/tmp") as base:
        if "r10x8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "t_closeness_audit / mannwhitney_value_drift /"
                " epoch_shard_plan (r10 verdict item 6)",
                (
                    "t_closeness_audit",
                    "mannwhitney_value_drift",
                    "epoch_shard_plan",
                ),
                ("customer", "events", "documents"),
            )
        if "r11docs" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "round-11 document operators",
                (
                    "url_canonical_dedup",
                    "domain_quota_retention",
                    "decontaminate_longest_span",
                    "mp3_frame_stats",
                ),
                ("documents",),
            )
        if "clip8" in sections:
            clip_section(spark, sf_dir, base)


if __name__ == "__main__":
    main()
