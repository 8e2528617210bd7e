"""blocked_fuzzy_pairs must equal plain in-block levenshtein <= 2.

The optimized plan strips the shared block prefix before computing
the edit distance. ADVICE r03 flagged the single-token edge: when a
name IS its block token ('promo' vs 'promo xy'), stripping "blk + a
space" from the longer side dropped the separating space and
undercounted the distance by 1. The fix strips exactly len(blk)
chars, keeping the space in the remainder; this test pins the edge
with names TPC-H never generates (single-token p_name)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from advisorydatapipeline_spark.queries.analytics_queries import (
    blocked_fuzzy_pairs,
)

NAMES = [
    "promo",           # single-token: rest == ''
    "promo xy",        # true dist to 'promo' is 3 (space + x + y)
    "promo ab",
    "promo ac",        # dist 1 to 'promo ab'
    "promo a",         # dist to 'promo' is 2 -> must be counted
    "steel",
    "steel rod",
    "steelx",          # same block? no: block 'steelx' != 'steel'
]


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def test_blocked_fuzzy_pairs_matches_plain_levenshtein(spark):
    parts = spark.createDataFrame(
        [(i, n) for i, n in enumerate(NAMES)], "p_partkey long, p_name string"
    )
    got = {
        (r.blk, r.dist): r.n_pairs
        for r in blocked_fuzzy_pairs(parts).collect()
    }
    want: dict[tuple[str, int], int] = {}
    rows = [(i, n.lower(), n.lower().split(" ")[0]) for i, n in enumerate(NAMES)]
    for (ia, na, ba), (ib, nb, bb) in itertools.combinations(rows, 2):
        if ba != bb:
            continue
        d = _lev(na, nb)
        if d <= 2:
            want[(ba, d)] = want.get((ba, d), 0) + 1
    assert got == want
    # the specific ADVICE example: 'promo' vs 'promo a' is distance 2
    # and must appear; 'promo' vs 'promo xy' is 3 and must not
    assert ("promo", 2) in want
