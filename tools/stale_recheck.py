#!/usr/bin/env python
"""Adjudicate stale driver-red rows with a committed artifact.

The external driver samples ~50 entries per round; a row that was red
in r01-r03 (pre-implementation) stays red in the record until the
driver happens to re-sample it, which has cost every judge since a
manual re-verification pass (r11 verdict item 4). This one-shot runs
EXACTLY the latest-driver-verdict-red entries through the same
comparison the driver performs and writes
``STALE_RECHECK_r{N}.json`` in the driver's CORRECTNESS shape —
per-entry ``rows_match`` / ``schema_match`` / ``hash_match`` /
``spark_rows`` / ``oracle_rows`` / ``err`` — plus provenance
(``driver_red_round``, ``sf_dir``). ``tools/sample_gap.py`` consumes
the newest artifact so SAMPLEGAP.md reports red rows as
"adjudicated green (stale)" or "UNEXPLAINED", and the freeze fails
loudly while any unexplained red exists.

Usage: python tools/stale_recheck.py --round N [sf_dir]
       (sf_dir defaults to /root/testdata/sf0.01 — the driver's scale)
"""

from __future__ import annotations

import glob
import json
import re
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from check_oracle import connect_duck, row_multiset  # noqa: E402


def latest_driver_verdicts() -> dict[str, tuple[int, str]]:
    driver: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if row.get("err"):
                verdict = "err"
            elif row.get("hash_match") is True:
                verdict = "pass"
            elif row.get("rows_match") and row.get("hash_match") is None:
                verdict = "rows-only"
            else:
                verdict = "fail"
            prev = driver.get(name)
            if prev is None or rnd >= prev[0]:
                driver[name] = (rnd, verdict)
    return driver


def driver_style_compare(spark, con, fn, oracle, sf_dir: str) -> dict:
    """The driver's comparison, reported field by field (check_oracle
    collapses it to a problems list; the artifact needs the driver's
    own shape)."""
    out = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        sdf = fn(spark, sf_dir)
        scols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
        out["spark_rows"] = len(srows)
        if oracle is None:
            # Explicit provenance: hash_match stays None ONLY because
            # there is no oracle — consumers (sample_gap) must not
            # treat a bare None as green (r12 ADVICE item 5).
            out["rows_match"] = True
            out["oracle"] = "absent"
            return out
        res = con.execute(oracle)
        ocols = [d[0].lower() for d in res.description]
        orows = res.fetchall()
        out["oracle_rows"] = len(orows)
        out["rows_match"] = len(srows) == len(orows)
        out["schema_match"] = sorted(scols) == sorted(ocols)
        if out["rows_match"] and out["schema_match"]:
            s_ix = sorted(range(len(scols)), key=lambda i: scols[i])
            o_ix = sorted(range(len(ocols)), key=lambda i: ocols[i])
            out["hash_match"] = row_multiset(
                [tuple(r[i] for i in s_ix) for r in srows]
            ) == row_multiset([tuple(r[i] for i in o_ix) for r in orows])
        else:
            out["hash_match"] = False
    except Exception as exc:  # noqa: BLE001 — artifact records the error
        out["err"] = f"{type(exc).__name__}: {exc}"[:400]
    return out


def _is_green(row: dict) -> bool:
    """A recheck row is green only on an explicit value-hash match —
    hash_match=None counts only with recorded oracle-absent
    provenance (r12 ADVICE item 5)."""
    if row.get("err") is not None:
        return False
    if row.get("hash_match") is True:
        return True
    return (
        row.get("hash_match") is None
        and row.get("oracle") == "absent"
        and row.get("rows_match") is True
    )


def main() -> int:
    argv = sys.argv[1:]
    if "--round" not in argv:
        print("usage: stale_recheck.py --round N [sf_dir]")
        return 2
    i = argv.index("--round")
    rnd = int(argv[i + 1])
    rest = argv[:i] + argv[i + 2 :]
    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"

    import __spark_entry__ as e

    from advisorydatapipeline_spark.session import get_spark

    qs, oracles = e.queries(), e.oracle_sql()
    driver = latest_driver_verdicts()
    stale = sorted(
        n for n, (_, v) in driver.items()
        if v in ("fail", "err") and n in qs
    )
    if not stale:
        print("no latest-driver-verdict-red entries; nothing to do")
    spark = get_spark("stale-recheck")
    con = connect_duck(sf_dir)
    results: dict[str, dict] = {}
    n_green = 0
    for name in stale:
        t0 = time.time()
        row = driver_style_compare(
            spark, con, qs[name], oracles.get(name), sf_dir
        )
        spark.catalog.clearCache()
        row["driver_red_round"] = driver[name][0]
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        green = _is_green(row)
        n_green += bool(green)
        print(f"  {'✓' if green else '✗'} {name} "
              f"(driver-red since r{driver[name][0]:02d}, "
              f"{row['sec']}s)")

    # Rotating never-sampled slice (r12 verdict item 5; widened to 60
    # per r13 verdict item 1): most registry entries have never seen a
    # driver verdict; run a deterministic 60-entry rotation of that
    # set through the same driver-style compare each round so the
    # whole registry cycles through driver-shape verification over
    # time. The cursor CHAINS from the previous round's artifact
    # (start = prev_start + prev_size over the sorted never-sampled
    # list, wrapping) so widening the slice never re-covers or skips
    # a stretch; first round falls back to round*width.
    never = sorted(n for n in qs if n not in driver)
    rot_width = 60
    rot_n = min(rot_width, len(never))
    rot_start = (rnd * rot_width) % len(never) if never else 0
    # sort priors by PARSED round number, not filename — lexicographic
    # order breaks at round 100+ where "r100" < "r99" would chain the
    # cursor from the wrong artifact (r14 ADVICE item 3)
    prior = sorted(
        (
            p
            for p in glob.glob("STALE_RECHECK_r*.json")
            if int(re.search(r"r(\d+)\.json$", p).group(1)) < rnd
        ),
        key=lambda p: int(re.search(r"r(\d+)\.json$", p).group(1)),
    )
    if prior and never:
        with open(prior[-1]) as f:
            prev = json.load(f)
        if "rotation_start" in prev and "rotation_size" in prev:
            rot_start = (
                prev["rotation_start"] + prev["rotation_size"]
            ) % len(never)
    rotation = [never[(rot_start + i) % len(never)] for i in range(rot_n)]
    n_rot_green = 0
    for name in rotation:
        t0 = time.time()
        row = driver_style_compare(
            spark, con, qs[name], oracles.get(name), sf_dir
        )
        spark.catalog.clearCache()
        row["rotation"] = True
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        green = _is_green(row)
        n_rot_green += bool(green)
        print(f"  {'✓' if green else '✗'} {name} "
              f"(rotation, {row['sec']}s)")

    out_path = f"STALE_RECHECK_r{rnd:02d}.json"
    with open(out_path, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "round": rnd,
                "rotation_start": rot_start,
                "rotation_size": rot_n,
                "never_sampled_total": len(never),
                "results": results,
            },
            f, indent=1)
        f.write("\n")
    print(f"{out_path}: {n_green}/{len(stale)} stale adjudicated green, "
          f"{n_rot_green}/{rot_n} rotation green "
          f"(cursor {rot_start}->{rot_start + rot_n}/{len(never)})")
    return 0 if (n_green == len(stale) and n_rot_green == rot_n) else 1


if __name__ == "__main__":
    sys.exit(main())
