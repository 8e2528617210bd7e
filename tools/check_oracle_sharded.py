#!/usr/bin/env python
"""Sharded full-registry oracle gate (r11 verdict item 8): split the
registry across N worker processes, each running check_oracle.py on
its slice with a private Spark session, then merge the per-shard
``--out`` maps into one artifact identical in shape to a single-
process run. The entries are independent by construction (each builds
its own inputs from the sf_dir parquet; per-process mkdtemp scratch
dirs isolate the format/JDBC fixtures; SPARK_GRAFT_WAREHOUSE is
pointed at a per-shard dir so bucketed saveAsTable targets never
collide).

Cores are divided between shards (SPARK_GRAFT_CPUS = total/N), so
this trades per-query parallelism for pipeline parallelism — a win
because most gate entries are small-data and dominated by fixed
per-query overhead (planning, Python startup, DuckDB replay), not by
32-way scans. Measured on the 346-entry r11 registry: ~10 min solo
-> ~3.5 min with 4 shards.

CORRECTNESS-ONLY tool: never run it while benchmarking (the freeze
protocol's solo-bench rule); the per-query `sec` fields in a sharded
artifact reflect contended cores and are not comparable to solo runs
(the artifact is stamped ``"sharded": N`` so a reader can tell).

Usage: python tools/check_oracle_sharded.py [--shards N] [--out FILE]
       [sf_dir]
Exit code: nonzero if any shard failed any entry.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def main() -> int:
    argv = sys.argv[1:]
    shards = 4
    out_path = None
    if "--shards" in argv:
        i = argv.index("--shards")
        shards = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    sys.path.insert(0, ".")
    import __spark_entry__ as e

    names = sorted(e.queries().keys())
    slices = _plan_slices(names, shards, sf_dir)

    total_cpus = os.cpu_count() or 8
    per = max(2, total_cpus // shards)
    t0 = time.time()
    # Removed in the finally block below — shard JSONs plus per-shard
    # Spark warehouses otherwise accumulate disk per gate run (r12
    # ADVICE item 4).
    tmp = tempfile.mkdtemp(prefix="adp_gate_shards_")
    try:
        return _run(tmp, slices, names, shards, per, out_path, sf_dir, t0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _plan_slices(names, shards, sf_dir):
    """Weighted LPT shard assignment (r14): round-robin by name left
    the r13 sf0.1 wall at 1.7x the per-shard average (459 s vs 269 s
    — one shard drew duplicate_spans_exact AND the asof/mp3 heavies).
    Weights come from the PREVIOUS same-sf gate artifact's per-entry
    ``sec`` (read before this run overwrites it); entries without a
    prior reading weigh 1.0. Falls back to round-robin when no
    artifact exists. Greedy longest-processing-time onto the least
    loaded shard — the classic 4/3-optimal makespan heuristic."""
    prev_path = (
        "LOCAL_GATE_SF01_FULL.json"
        if sf_dir.rstrip("/").endswith("sf0.1")
        else "LOCAL_GATE.json"
    )
    weights: dict[str, float] = {}
    try:
        with open(prev_path) as f:
            prev = json.load(f)
        rows = prev.get("results", prev)
        for k, v in rows.items():
            if isinstance(v, dict) and isinstance(
                v.get("sec"), (int, float)
            ):
                weights[k] = max(float(v["sec"]), 0.2)
    except (OSError, ValueError):
        pass
    if not weights:
        return [names[i::shards] for i in range(shards)]
    loads = [0.0] * shards
    slices: list[list[str]] = [[] for _ in range(shards)]
    for n in sorted(names, key=lambda n: -weights.get(n, 1.0)):
        i = loads.index(min(loads))
        slices[i].append(n)
        loads[i] += weights.get(n, 1.0)
    return slices


def _run(tmp, slices, names, shards, per, out_path, sf_dir, t0) -> int:
    rc = 0
    procs = []
    for i, sl in enumerate(slices):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(per)
        env["SPARK_GRAFT_SHUFFLE"] = str(per)
        env["SPARK_GRAFT_WAREHOUSE"] = f"{tmp}/warehouse_{i}"
        env["SPARK_GRAFT_DRIVER_MEM"] = "8g"
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "tools/check_oracle.py",
                    "--out",
                    f"{tmp}/shard_{i}.json",
                    sf_dir,
                    *sl,
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    for i, p in enumerate(procs):
        out, _ = p.communicate()
        tail = [ln for ln in out.splitlines() if ln.strip()][-1:]
        print(f"shard {i}: rc={p.returncode} {tail[0] if tail else ''}")
        if p.returncode:
            rc = p.returncode
            for ln in out.splitlines():
                if "✗" in ln or "FAIL" in ln:
                    print("   ", ln.strip())
    merged: dict[str, dict] = {}
    for i in range(shards):
        path = f"{tmp}/shard_{i}.json"
        if os.path.exists(path):
            with open(path) as f:
                merged.update(json.load(f)["results"])
    n_fail = sum(1 for v in merged.values() if v["status"] == "fail")
    n_ro = sum(
        1 for v in merged.values() if v["status"] == "rows-only"
    )
    print(
        f"\n{len(merged) - n_fail - n_ro} ok, {n_ro} rows-only, "
        f"{n_fail} FAILED ({shards} shards, "
        f"{round(time.time() - t0, 1)}s wall)"
    )
    missing = [n for n in names if n not in merged]
    if missing:
        print(f"MISSING from shard outputs: {missing}")
        rc = rc or 1
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "sharded": shards,
                    "results": merged,
                },
                f,
                indent=1,
            )
            f.write("\n")
    return rc or (1 if n_fail else 0)


if __name__ == "__main__":
    sys.exit(main())
