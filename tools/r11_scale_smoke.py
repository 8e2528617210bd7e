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

- x1-x8 rows for the late-round-11 families: the web-corpus /
  datasheet / PII / C4-line / classifier document operators
  (r11web), brute-baseline bitext margin mining on contiguously
  replicated embeddings plus the stateful streaming URL dedup with
  state-row accounting (r11misc).

Usage: python tools/r11_scale_smoke.py [sf_dir] [sections]
  sections: comma list from {r10x8, r11docs, clip8, r11web,
  r11misc, r11stream, cap8, refresh8, flac8, r11c}; default runs
  ALL of them.
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


def bitext_section(spark, sf_dir: str, base: str) -> None:
    """Brute-baseline bitext mining on contiguous embeddings: pairs
    grow quadratically BY DESIGN (the docstring's ANN drop-in is the
    corpus-scale path), so the honest row reports the pair count next
    to the wall time — the reader sees wall tracking pairs, not
    rows."""
    print("\n## bitext_margin_mining x1-x4 (contiguous embeddings;"
          " brute all-pairs baseline)")
    print("| r | n_pairs scored | time | accepted |")
    print("|---|---|---|---|")
    fn = QUERIES["bitext_margin_mining"]
    # x4 suffices: pairs grow exactly 4x per point (1e6 -> 4e6 ->
    # 16e6) and wall tracks pairs; the x8 point would spend ~40 min
    # re-proving the same quadratic the ANN drop-in exists to avoid
    for r in (1, 2, 4):
        path = stage_contiguous(spark, sf_dir, base, r)
        if r == 1:
            noop(fn(spark, path))  # warm-up
        spark.catalog.clearCache()
        t = timed(lambda p=path: noop(fn(spark, p)))
        df = fn(spark, path)
        n_vec = 2000 * r
        pairs = (n_vec // 2) * (n_vec - n_vec // 2)
        acc = df.filter(F.col("accepted")).count()
        print(f"| x{r} | {pairs} | {t}s | {acc} |")
        spark.catalog.clearCache()


def stream_dedup_section(spark, sf_dir: str, base: str) -> None:
    """streaming_url_dedup on the disjoint-user replicated event
    stream (scale_smoke.event_stream_corpus protocol): wall, batch
    count, max per-batch latency, max dedup-state rows. The synth URL
    keys on event_id % 997, so the canonical-URL universe — and
    therefore the dropDuplicates state — is BOUNDED while the input
    stream grows r-fold: the state-ratio column is the done
    criterion (~1.0), wall grows with rows scanned."""
    from scale_smoke import event_stream_corpus

    from advisorydatapipeline_spark.operators.curation import (
        canonicalize_urls,
    )
    from advisorydatapipeline_spark.queries.curation_queries import (
        _url_fixture_sql,
    )
    from advisorydatapipeline_spark.streaming.pipeline import (
        read_event_stream,
    )

    print("\n## streaming_url_dedup x1-x8 (replicated event stream)")
    print("| r | input rows | wall | batches | max batch | "
          "max state rows |")
    print("|---|---|---|---|---|---|")
    synth = _url_fixture_sql("DIV", "STRING").replace(
        "doc_id", "(event_id % 997)"
    )
    for r in (1, 2, 4, 8):
        path = event_stream_corpus(spark, sf_dir, r, base)
        ev = read_event_stream(spark, path, max_files_per_trigger=1)
        urls = ev.selectExpr(f"{synth} AS url")
        dedup = (
            canonicalize_urls(urls).select("canonical_url")
            .dropDuplicates()
        )
        t0 = time.time()
        q = (
            dedup.writeStream.format("noop")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        wall = round(time.time() - t0, 2)
        import json as _json

        progresses = [
            p if isinstance(p, dict) else _json.loads(p.json)
            for p in (q.recentProgress or [])
        ]
        q.stop()
        batches = [p for p in progresses if p.get("numInputRows", 0) > 0]
        rows = sum(p.get("numInputRows", 0) for p in batches)
        lat = max(
            (p.get("durationMs", {}).get("triggerExecution", 0)
             for p in batches),
            default=0,
        )
        state = max(
            (s.get("numRowsTotal", 0)
             for p in batches
             for s in (p.get("stateOperators") or [])),
            default=0,
        )
        print(f"| x{r} | {rows} | {wall}s | {len(batches)} |"
              f" {lat}ms | {state} |")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sections = (
        set(sys.argv[2].split(","))
        if len(sys.argv) > 2
        else {
            "r10x8",
            "r11docs",
            "clip8",
            "r11web",
            "r11misc",
            "cap8",
            "refresh8",
            "flac8",
            "r11c",
        }
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
        if "r11web" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "late round-11 document operators (web-corpus /"
                " datasheet / PII / C4-line / classifier)",
                (
                    "html_text_extract",
                    "html_block_link_density",
                    "robots_txt_gate",
                    "corpus_datasheet",
                    "pii_multiclass_scrub",
                    "unicode_normalize_stats",
                    "c4_line_filters",
                    "line_global_dedup",
                    "hashed_ngram_classifier",
                ),
                ("documents",),
            )
        if "r11misc" in sections:
            bitext_section(spark, sf_dir, base)
            stream_dedup_section(spark, sf_dir, base)
        if "r11stream" in sections:
            stream_dedup_section(spark, sf_dir, base)
        if "cap8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "web_corpus_pipeline capstone + governance/frontier",
                ("web_corpus_pipeline", "license_compat_audit"),
                ("documents",),
            )
        if "refresh8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "crawl_frontier_refresh (events history)",
                ("crawl_frontier_refresh",),
                ("events",),
            )
        if "flac8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "flac_stream_stats / warc_record_stats (codec hops)",
                ("flac_stream_stats", "warc_record_stats"),
                ("documents",),
            )
        if "r11c" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "r11c operators (frontier / secrets / preference /"
                " eval / mixing / templates)",
                (
                    "crawl_politeness_plan",
                    "secret_entropy_scrub",
                    "bradley_terry_mm_step",
                    "roc_pr_calibration",
                    "doremi_domain_reweight",
                    "template_slot_fingerprint",
                    "ndcg_ranking_eval",
                    "source_diversity_loo",
                ),
                ("documents",),
            )


if __name__ == "__main__":
    main()
