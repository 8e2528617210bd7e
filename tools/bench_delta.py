#!/usr/bin/env python
"""Round-over-round per-query bench delta.

Usage: python tools/bench_delta.py PREV CURR

PREV: a driver BENCH_r{N}.json (its ``tail`` fragment is scanned for
"name": sec pairs — the driver keeps only the last ~2000 chars) OR a
committed BENCH_LOCAL_r{N}.json (full per-query dicts).
CURR: a BENCH_LOCAL_r{N}.json.

Prints a markdown table of every query visible in BOTH files with the
time ratio, flagging >=1.5x moves in either direction. Ratios at
sf0.1 swing ±40% run-to-run (AQE + gc) — treat single-round flags as
re-baseline candidates, not verdicts.
"""

from __future__ import annotations

import json
import re
import sys


def load_timings(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    out: dict[str, float] = {}
    if "core" in d or "extended" in d:  # BENCH_LOCAL format
        out.update(d.get("core", {}))
        out.update(d.get("extended", {}))
        return out
    if isinstance(d.get("parsed"), dict):
        q = d["parsed"].get("queries")
        if isinstance(q, dict):
            return dict(q)
    if isinstance(d.get("queries"), dict):
        return dict(d["queries"])
    # driver tail fragment: regex out complete "name": float pairs
    tail = d.get("tail", "")
    for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail):
        name, val = m.group(1), float(m.group(2))
        if name not in ("sf", "value"):
            out[name] = val
    return out


def main() -> int:
    prev_path, curr_path = sys.argv[1], sys.argv[2]
    prev, curr = load_timings(prev_path), load_timings(curr_path)
    shared = sorted(set(prev) & set(curr))
    if not shared:
        print(f"no shared queries between {prev_path} and {curr_path}")
        return 1
    rows, flagged = [], []
    for n in shared:
        a, b = prev[n], curr[n]
        ratio = round(b / a, 2) if a else float("inf")
        flag = "" if 1 / 1.5 <= (ratio or 1) <= 1.5 else " ⚠"
        if flag:
            flagged.append(n)
        rows.append(f"| {n} | {a} | {b} | {ratio}{flag} |")
    print(f"### Bench delta: {prev_path} → {curr_path}")
    print(
        f"{len(shared)} shared queries; prev-total {round(sum(prev[n] for n in shared), 1)}s"
        f" → curr-total {round(sum(curr[n] for n in shared), 1)}s;"
        f" {len(flagged)} outside 1.5x: {flagged or '—'}"
    )
    print("\n| query | prev s | curr s | ratio |")
    print("|---|---|---|---|")
    print("\n".join(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
