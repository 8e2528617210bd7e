"""Graph-family-only scale smoke (x1/x2/x4 [x8]): wall time + shuffle
bytes per op, reusing tools/scale_smoke.py's corpus builders and the
same measurement protocol. Exists so the broadcast-pin policy in
operators/graph.py (GRAPH_BROADCAST_MAX_ROWS / _iter_side) can be
re-measured in minutes without paying the full dedup/ANN smoke.

Usage: python tools/graph_smoke.py [sf_dir] [--x8] [--x16]
Prints per-op markdown rows; does NOT rewrite SCALE.md (the full
scale_smoke.py owns that file).
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from scale_smoke import edge_corpus, run_graph  # noqa: E402

from advisorydatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = [a for a in sys.argv[1:] if a not in ("--x8", "--x16")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    reps = (
        [1, 2, 4]
        + ([8] if "--x8" in sys.argv else [])
        + ([16] if "--x16" in sys.argv else [])
    )
    spark = get_spark(
        "graph-smoke", extra_conf={"spark.ui.enabled": "true"}
    )
    base = tempfile.mkdtemp(prefix="adp_gsmoke_")
    times: dict[int, dict[str, float]] = {}
    shuf: dict[int, dict[str, float | None]] = {}
    edges: dict[int, int] = {}
    for r in reps:
        gpath = edge_corpus(spark, sf_dir, r, base)
        edges[r] = spark.read.parquet(gpath).count()
        if r == reps[0]:
            run_graph(spark, gpath)  # JIT warm-up
        times[r], shuf[r] = run_graph(spark, gpath)
        print(
            f"graph x{r} ({edges[r]} edges): {times[r]} "
            f"shuffleMB={shuf[r]}",
            flush=True,
        )
    ops = list(times[reps[0]].keys())
    hdr = " | ".join(f"x{r} ({edges[r]}e)" for r in reps)
    print(f"\n| op | {hdr} | t(max)/t(x1) | shufMB | shuf ratio |")
    print("|---|" + "---|" * (len(reps) + 3))
    for op in ops:
        ts = [times[r][op] for r in reps]
        sws = [shuf[r][op] for r in reps]
        tr = round(ts[-1] / ts[0], 2) if ts[0] else float("nan")
        sr = (
            round(sws[-1] / sws[0], 2)
            if sws[0] and sws[-1] is not None
            else None
        )
        tcell = " | ".join(f"{t}s" for t in ts)
        scell = "/".join("?" if s is None else str(s) for s in sws)
        print(f"| {op} | {tcell} | {tr} | {scell} | {sr} |")


if __name__ == "__main__":
    main()
