"""MinHash-LSH-only scale smoke with an x8 point (r7 verdict stretch
item: one more doubling past the x1/x2/x4 table pins the steady-state
slope). Reuses tools/scale_smoke.py's clone-cluster corpus builder
and measurement protocol; also times jaccard_cc (shingle index + CC)
at the same scales since both ride the same df-capped candidate
index and CC's per-round plan changed in round 8.

Usage: python tools/minhash_smoke.py [sf_dir] [--x16]
Prints per-op markdown rows; does NOT rewrite SCALE.md.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from scale_smoke import MAX_DOC_FREQ, MIN_JACCARD, corpus  # noqa: E402

from advisorydatapipeline_spark.operators.dedup import (  # noqa: E402
    jaccard_pairs,
    minhash_near_dupes,
    shingle_index,
)
from advisorydatapipeline_spark.operators.graph import (  # noqa: E402
    connected_components,
)
from advisorydatapipeline_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run(spark, path: str) -> dict[str, float]:
    docs = spark.read.parquet(path)
    out: dict[str, float] = {}
    t0 = time.time()
    noop(minhash_near_dupes(docs, "doc_id", "text", max_doc_freq=MAX_DOC_FREQ))
    out["minhash_lsh"] = round(time.time() - t0, 2)
    t0 = time.time()
    idx = shingle_index(
        docs, "doc_id", "text", 3, max_doc_freq=MAX_DOC_FREQ
    ).persist()
    noop(connected_components(jaccard_pairs(idx, "doc_id", MIN_JACCARD),
                              "id_a", "id_b"))
    idx.unpersist()
    out["jaccard_cc"] = round(time.time() - t0, 2)
    spark.catalog.clearCache()
    return out


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--x16"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    reps = [1, 2, 4, 8] + ([16] if "--x16" in sys.argv else [])
    spark = get_spark("minhash-smoke")
    base = tempfile.mkdtemp(prefix="adp_mhsmoke_")
    times: dict[int, dict[str, float]] = {}
    ndocs: dict[int, int] = {}
    for r in reps:
        path = corpus(spark, sf_dir, r, base)
        ndocs[r] = spark.read.parquet(path).count()
        if r == reps[0]:
            run(spark, path)  # JIT warm-up
        times[r] = run(spark, path)
        print(f"x{r} ({ndocs[r]} docs): {times[r]}", flush=True)
    ops = list(times[reps[0]].keys())
    hdr = " | ".join(f"x{r} ({ndocs[r]}d)" for r in reps)
    print(f"\n| op | {hdr} | t(max)/t(x1) vs {reps[-1]}.0 |")
    print("|---|" + "---|" * (len(reps) + 1))
    for op in ops:
        ts = [times[r][op] for r in reps]
        tr = round(ts[-1] / ts[0], 2) if ts[0] else float("nan")
        print(f"| {op} | " + " | ".join(f"{t}s" for t in ts) + f" | {tr} |")


if __name__ == "__main__":
    main()
