#!/usr/bin/env python
"""Driver-style compare over a ROUND DELTA — the entries added or
code-touched this round (r15 extension of the ROTATION_FULL_r14
pattern): every entry whose behavior could have changed gets a
committed field-by-field driver-shape verdict the same session,
instead of waiting for the driver's sampler or the rotation cursor to
reach it.

Usage: python tools/delta_sweep.py --round N [--out FILE] [sf_dir]
       name1 name2 ...
Writes ROTATION_DELTA_r{N}.json (driver CORRECTNESS shape + a
``delta_reason`` provenance field per entry). Exits nonzero if any
entry is not green.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from check_oracle import connect_duck  # noqa: E402
from stale_recheck import _is_green, driver_style_compare  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    if "--round" not in argv:
        raise SystemExit("--round N required")
    i = argv.index("--round")
    rnd = int(argv[i + 1])
    argv = argv[:i] + argv[i + 2 :]
    out_path = f"ROTATION_DELTA_r{rnd:02d}.json"
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = "/root/testdata/sf0.01"
    names = []
    for a in argv:
        if a.startswith("/"):
            sf_dir = a
        else:
            names.append(a)
    if not names:
        raise SystemExit("no entry names given")

    import __spark_entry__ as e
    from advisorydatapipeline_spark.session import get_spark

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")
    spark = get_spark("delta-sweep")
    con = connect_duck(sf_dir)
    results: dict[str, dict] = {}
    n_green = 0
    for name in names:
        t0 = time.time()
        row = driver_style_compare(
            spark, con, qs[name], oracles.get(name), sf_dir
        )
        spark.catalog.clearCache()
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        green = _is_green(row)
        n_green += bool(green)
        print(f"  {'✓' if green else '✗'} {name} ({row['sec']}s)")
    artifact = {
        "round": rnd,
        "sf_dir": sf_dir,
        "kind": "round-delta driver-style sweep (new + code-touched)",
        "n": len(names),
        "n_green": n_green,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"\n{n_green}/{len(names)} green -> {out_path}")
    return 0 if n_green == len(names) else 1


if __name__ == "__main__":
    sys.exit(main())
