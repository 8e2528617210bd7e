"""Round-12 scale points (same protocol as tools/scale_smoke.py /
r9-r11_scale_smoke.py):

- bitext8: x1-x8 rows for the candidate-bounded bitext arm
  (bitext_margin_mining_ivf) and the blocked brute baseline
  (bitext_margin_mining) on CONTIGUOUSLY replicated embeddings —
  the r11 verdict item-1 done-criterion: the IVF arm must track
  input, not pairs, while the brute row honestly shows the
  quadratic it is the labeled baseline for. The recall gauge
  (bitext_ivf_recall) gets x1-x2 only: it contains the brute truth
  by design and is a sample-scale gauge, never a production path.
- synth8: x1-x8 row for mp3_granule_synthesis (documents) — a
  zero-shuffle mapInPandas einsum hop; the done-criterion is a
  slope tracking input (~<= 2 at x8 given fixed per-batch setup).
- flacprof: wall-clock split of flac_stream_stats' encode vs decode
  halves at x1/x4 (r11 verdict item 5: attribute the steep slope).

Usage: python tools/r12_scale_smoke.py [sf_dir] [sections]
  sections: comma list from {bitext8, synth8, flacprof};
  default runs ALL of them.
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

from r11_scale_smoke import (  # noqa: E402
    noop,
    run_family,
    stage_contiguous,
    timed,
)


def bitext_section(spark, sf_dir: str, base: str) -> None:
    print("\n## bitext mining (contiguous embeddings)")
    print(
        "| op | x1 | x2 | x4 | x8 | t(x8 or x4)/t(x1) | out (last) |"
    )
    print("|---|---|---|---|---|---|---|")
    # the brute baseline stops at x4 BY DESIGN (r11 precedent: it is
    # the labeled quadratic — x8 is ~400M pair rows through four
    # windows, measured only to show the curve the IVF arm escapes)
    plans = {
        "bitext_margin_mining_ivf": (1, 2, 4, 8),
        "bitext_margin_mining": (1, 2, 4),
    }
    results = {op: [] for op in plans}
    outs = {}
    for r in (1, 2, 4, 8):
        path = stage_contiguous(spark, sf_dir, base, r)
        for op, rs in plans.items():
            if r not in rs:
                continue
            fn = QUERIES[op]
            if r == 1:
                noop(fn(spark, path))  # warm-up
            spark.catalog.clearCache()
            results[op].append(
                timed(lambda f=fn, p=path: noop(f(spark, p)))
            )
            if r == rs[-1]:
                outs[op] = fn(spark, path).count()
            spark.catalog.clearCache()
    for op, rs in plans.items():
        t = results[op]
        slope = round(t[-1] / t[0], 2) if t[0] else float("nan")
        cells = [f"{x}s" for x in t] + ["—"] * (4 - len(t))
        print(
            f"| {op} | {cells[0]} | {cells[1]} | {cells[2]} |"
            f" {cells[3]} | {slope} | {outs[op]} |"
        )
    # recall gauge: sample-scale only (contains the brute truth arm)
    print("\n| gauge | x1 | x2 | row (x2) |")
    print("|---|---|---|---|")
    fn = QUERIES["bitext_ivf_recall"]
    ts, row = [], None
    for r in (1, 2):
        path = stage_contiguous(spark, sf_dir, base, r)
        spark.catalog.clearCache()
        ts.append(timed(lambda p=path: noop(fn(spark, p))))
        if r == 2:
            row = fn(spark, path).collect()[0].asDict()
        spark.catalog.clearCache()
    print(f"| bitext_ivf_recall | {ts[0]}s | {ts[1]}s | {row} |")


def flac_profile_section(spark, sf_dir: str, base: str) -> None:
    """Split flac_stream_stats wall time into its encode and decode
    mapInPandas halves by timing (a) the full entry and (b) an
    encode-only variant, at x1 and x4."""
    import pandas as pd

    from advisorydatapipeline_spark.operators.flac_codec import (
        encode_flac_fixture,
    )
    from r11_scale_smoke import stage_replicated

    def encode_only(spark_, path):
        docs = (
            spark_.read.parquet(f"{path}/documents.parquet")
            .select("doc_id")
            .repartition(spark_.sparkContext.defaultParallelism)
        )

        def enc(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["doc_id"],
                        "n_bytes": [
                            len(encode_flac_fixture(int(d)))
                            for d in pdf["doc_id"]
                        ],
                    }
                )

        return docs.mapInPandas(enc, "media_id long, n_bytes long")

    print("\n## flac_stream_stats encode/decode attribution")
    print("| r | full entry | encode-only | decode share |")
    print("|---|---|---|---|")
    fn = QUERIES["flac_stream_stats"]
    for r in (1, 4):
        path = stage_replicated(spark, sf_dir, base, r, ("documents",))
        noop(fn(spark, path))  # warm-up
        spark.catalog.clearCache()
        t_full = timed(lambda p=path: noop(fn(spark, p)))
        spark.catalog.clearCache()
        t_enc = timed(lambda p=path: noop(encode_only(spark, p)))
        spark.catalog.clearCache()
        share = round((t_full - t_enc) / t_full * 100, 1)
        print(f"| x{r} | {t_full}s | {t_enc}s | ~{share}% |")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sections = (
        set(sys.argv[2].split(","))
        if len(sys.argv) > 2
        else {"bitext8", "synth8", "flacprof"}
    )
    spark = get_spark("r12-scale-smoke")
    with tempfile.TemporaryDirectory(dir="/tmp") as base:
        if "bitext8" in sections:
            bitext_section(spark, sf_dir, base)
        if "synth8" in sections:
            run_family(
                spark,
                sf_dir,
                base,
                "mp3_granule_synthesis / wav_dft_bands (documents)",
                ("mp3_granule_synthesis", "wav_dft_bands"),
                ("documents",),
            )
        if "flacprof" in sections:
            flac_profile_section(spark, sf_dir, base)


if __name__ == "__main__":
    main()
