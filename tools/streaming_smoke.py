"""Streaming-family-only scale smoke (replicas configurable,
default x1/x2/x4), reusing
tools/scale_smoke.py's corpus builder and measurement protocol —
exists so the streaming state/latency scaling can be re-measured in
minutes without the full dedup/ANN/graph smoke.

Usage: python tools/streaming_smoke.py [sf_dir] [replicas_csv]
Prints per-query rows; does NOT rewrite SCALE.md (scale_smoke.py
owns that file).
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from scale_smoke import REPLICAS, event_stream_corpus, run_streaming  # noqa: E402

from advisorydatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else list(REPLICAS)
    )
    spark = get_spark("streaming-smoke")
    base = tempfile.mkdtemp(prefix="adp_ssmoke_")
    res: dict[int, dict[str, dict]] = {}
    for r in replicas:
        spath = event_stream_corpus(spark, sf_dir, r, base)
        if r == replicas[0]:
            run_streaming(spark, spath)  # warm-up
        res[r] = run_streaming(spark, spath)
        print(f"streaming x{r}: {res[r]}", flush=True)
    ops = list(res[replicas[0]].keys())
    print("\n| query | " + " | ".join(f"x{r}" for r in replicas)
          + " | state ratio | maxbatch ratio |")
    print("|---|" + "---|" * (len(replicas) + 2))
    for op in ops:
        cells = [
            f"{res[r][op]['wall']}s/{res[r][op]['batches']}b/"
            f"{res[r][op]['max_batch_ms']}ms/"
            f"{res[r][op]['max_state_rows']}rows"
            for r in replicas
        ]
        s1 = res[replicas[0]][op]["max_state_rows"]
        s4 = res[replicas[-1]][op]["max_state_rows"]
        l1 = res[replicas[0]][op]["max_batch_ms"]
        l4 = res[replicas[-1]][op]["max_batch_ms"]
        print(
            f"| {op} | " + " | ".join(cells)
            + f" | {round(s4 / s1, 2) if s1 else 'n/a'}"
            + f" | {round(l4 / l1, 2) if l1 else 'n/a'} |"
        )


if __name__ == "__main__":
    main()
