#!/usr/bin/env python
"""Pre-commit smoke for the driver's stale-red rows.

Twelve registry entries were last driver-sampled in r01/r02 while
they still errored; they have been green in every local full gate
since, but the driver record keeps showing the old red until it
happens to re-sample them (SAMPLEGAP.md). Because those rows cover
core SURVEY §2 operators (W1 window top-1, U1/U2 unions, J3/J4
anti-joins, A1/A2 distinct, P4 TTL cutoff, S2 multipath scan), this
smoke runs EXACTLY that set through the oracle gate so they cannot
silently rot while their driver rows still say r01-error.

Usage:
    python tools/stale_smoke.py [sf_dir]     # default sf0.01 (driver gate scale)

Exit code is check_oracle's: nonzero on any failure.
"""

from __future__ import annotations

import subprocess
import sys

STALE_RED = [
    "asof_join_last_view",
    "distinct_pairs",
    "intersect_except_keys",
    "left_anti_cache_skip",
    "multipath_partitioned_scan",
    "range_join_views_before_purchase",
    "sequence_packing",
    "time_rollup",
    "ttl_cutoff_filter",
    "union_by_name",
    "upsert_anti_union",
    "window_top1_per_key",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    return subprocess.call(
        [sys.executable, "tools/check_oracle.py", sf_dir, *STALE_RED]
    )


if __name__ == "__main__":
    sys.exit(main())
