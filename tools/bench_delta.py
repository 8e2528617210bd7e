#!/usr/bin/env python
"""Round-over-round per-query bench delta, reps/spread-aware.

Usage: python tools/bench_delta.py PREV CURR

PREV: a driver BENCH_r{N}.json (its ``tail`` fragment is scanned for
"name": sec pairs — the driver keeps only the last ~2000 chars) OR a
committed BENCH_LOCAL_r{N}.json (full per-query dicts).
CURR: a BENCH_LOCAL_r{N}.json.

Flagging policy (r7 verdict item 8 / ADVICE r7):

- When PREV carries a per-query ``spread`` envelope (bench.py
  --reps >= 2 records [min, max] across reps), a query is flagged
  only when CURR's median falls OUTSIDE prev's envelope widened by
  ENVELOPE_SLACK — the box's measured noise adjudicates the drift,
  not a fixed ratio.
- Otherwise the coarse 1.5x ratio flag applies (sf0.1 singles swing
  ±40% run-to-run from AQE + gc; treat single-round flags as
  re-baseline candidates, not verdicts).
- Artifacts with DIFFERENT recorded reps mix cold (reps=1) and warm
  (median-of-N) measurements; the comparison still prints but every
  flag is downgraded to informational and the header says so.
"""

from __future__ import annotations

import json
import re
import sys

ENVELOPE_SLACK = 1.15  # widen prev's [min,max] by ±15% box noise

# Sub-second entries are dominated by ±0.1-0.2 s harness jitter (JVM
# gc, Arrow worker reuse, AQE re-plan): r9's delta had 17 of 23
# envelope exits under 1 s, pure flapping. A sub-second query is
# flagged only when the drift is ALSO big in absolute terms.
SUBSEC_ABS_FLOOR = 0.3  # seconds; applies when prev median < 1.0 s


def load_artifact(path: str) -> tuple[dict[str, float], dict, int | None]:
    """(timings, spread, reps) from any known bench artifact shape."""
    with open(path) as f:
        d = json.load(f)
    out: dict[str, float] = {}
    if "core" in d or "extended" in d:  # BENCH_LOCAL format
        out.update(d.get("core", {}))
        out.update(d.get("extended", {}))
        return out, d.get("spread", {}), d.get("reps")
    if "results" in d and "sf_dir" in d:  # LOCAL_GATE format (r15)
        # gate artifacts carry a per-entry spark_sec/oracle_sec split
        # (tools/check_oracle.py): the Spark-side walls give every
        # bench-tier-less entry a longitudinal timing record. Gate
        # runs are sharded (contended cores), so compare gate-vs-gate
        # only, never gate-vs-bench; reps=None keeps the mixed-reps
        # downgrade active against bench artifacts.
        for k, v in d["results"].items():
            if isinstance(v, dict) and isinstance(
                v.get("spark_sec"), (int, float)
            ):
                out[k] = float(v["spark_sec"])
        return out, {}, None
    if isinstance(d.get("parsed"), dict):
        q = d["parsed"].get("queries")
        if isinstance(q, dict):
            return dict(q), {}, d["parsed"].get("reps")
    if isinstance(d.get("queries"), dict):
        return dict(d["queries"]), {}, d.get("reps")
    # driver tail fragment: regex out complete "name": float pairs
    tail = d.get("tail", "")
    for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail):
        name, val = m.group(1), float(m.group(2))
        if name not in ("sf", "value"):
            out[name] = val
    return out, {}, None


def main() -> int:
    if len(sys.argv) < 3:
        print(
            "usage: python tools/bench_delta.py PREV_BENCH.json "
            "CURR_BENCH.json\n"
            "Compares per-query times between two bench artifacts "
            "and flags regressions outside the noise envelope."
        )
        return 2
    prev_path, curr_path = sys.argv[1], sys.argv[2]
    prev, prev_spread, prev_reps = load_artifact(prev_path)
    curr, _, curr_reps = load_artifact(curr_path)
    shared = sorted(set(prev) & set(curr))
    if not shared:
        print(f"no shared queries between {prev_path} and {curr_path}")
        return 1
    # artifacts predating the --reps flag (no "reps" key) are single
    # cold shots — treat absent as 1 so the cold-vs-warm downgrade
    # fires against them too
    mixed = (prev_reps or 1) != (curr_reps or 1)
    rows, flagged = [], []
    for n in shared:
        a, b = prev[n], curr[n]
        ratio = round(b / a, 2) if a else float("inf")
        if n in prev_spread:
            lo, hi = prev_spread[n]
            inside = lo / ENVELOPE_SLACK <= b <= hi * ENVELOPE_SLACK
            flag = "" if inside else " ⚠ outside-envelope"
            env = f"[{lo},{hi}]"
        else:
            flag = "" if 1 / 1.5 <= (ratio or 1) <= 1.5 else " ⚠"
            env = "—"
        if flag and a < 1.0 and abs(b - a) < SUBSEC_ABS_FLOOR:
            flag = " (info: sub-second jitter)"
        if flag and mixed:
            flag = " (info: mixed reps)"
        if flag.startswith(" ⚠"):
            flagged.append(n)
        rows.append(f"| {n} | {a} | {env} | {b} | {ratio}{flag} |")
    print(f"### Bench delta: {prev_path} → {curr_path}")
    if mixed:
        print(
            f"**MIXED REPS ({prev_reps or 1} vs {curr_reps or 1}): cold single-shot "
            "and warm median-of-N measurements are not comparable — all "
            "flags downgraded to informational. Re-run one side with "
            "matching --reps to adjudicate.**"
        )
    print(
        f"{len(shared)} shared queries; prev-total {round(sum(prev[n] for n in shared), 1)}s"
        f" → curr-total {round(sum(curr[n] for n in shared), 1)}s;"
        f" {len(flagged)} flagged: {flagged or '—'}"
        + (
            " (envelope rule: curr median outside prev [min,max]"
            f"±{round((ENVELOPE_SLACK - 1) * 100)}%)"
            if prev_spread
            else " (coarse 1.5x rule — prev has no spread envelope)"
        )
        + f"; sub-1s entries need ≥{SUBSEC_ABS_FLOOR}s absolute drift"
    )
    print("\n| query | prev s | prev envelope | curr s | ratio |")
    print("|---|---|---|---|---|")
    print("\n".join(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
