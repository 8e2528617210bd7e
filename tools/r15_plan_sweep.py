#!/usr/bin/env python
"""Optimization-round plan sweep: for every registry entry, build the
lazy plan and count structural cost signals — parquet scans per
table, Exchange / ReusedExchange, Python-boundary nodes, join
strategies. The jm_lambda_em_step lesson: a multiply-referenced
lineage with no persist shows up as N identical scans and 0 reuse.

Writes tools/../plans/r15/SWEEP.json. Plan-only (no execution).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, ".")

from advisorydatapipeline_spark.registry import QUERIES  # noqa: E402
from advisorydatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[1:]
    spark = get_spark("plan-sweep")
    out = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df.queryExecution() if hasattr(df, "queryExecution")
                else df._jdf.queryExecution(),
                "formatted",
            )
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            spark.catalog.clearCache()
            continue
        scans = re.findall(r"Scan parquet[^\n]*\n[^\n]*\n[^\n]*"
                           r"Location: InMemoryFileIndex \[[^\]]*/"
                           r"(\w+)\.parquet\]", plan)
        scan_counts: dict[str, int] = {}
        for t in scans:
            scan_counts[t] = scan_counts.get(t, 0) + 1
        out[name] = {
            "build_sec": round(time.time() - t0, 2),
            "scans": scan_counts,
            "n_scan": plan.count("Scan parquet"),
            "exchange": plan.count("+- Exchange")
            + plan.count(":- Exchange"),
            "reused_exchange": plan.count("ReusedExchange"),
            "bcast_exchange": plan.count("BroadcastExchange"),
            "sort_merge_join": plan.count("SortMergeJoin"),
            "shuffled_hash_join": plan.count("ShuffledHashJoin"),
            "bcast_hash_join": plan.count("BroadcastHashJoin"),
            "bnl_join": plan.count("BroadcastNestedLoopJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "python_eval": plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython"),
            "map_in_arrow": plan.count("MapInArrow")
            + plan.count("MapInPandas")
            + plan.count("FlatMapCoGroupsInPandas")
            + plan.count("FlatMapGroupsInPandas"),
            "window": plan.count("+- Window") + plan.count(": Window"),
            "in_memory_scan": plan.count("InMemoryTableScan")
            + plan.count("Scan ExistingRDD"),
            "plan_chars": len(plan),
        }
        spark.catalog.clearCache()
    path = os.path.join(
        os.path.dirname(__file__), "..", "plans", "r15", "SWEEP.json"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    n_err = sum(1 for v in out.values() if "error" in v)
    print(f"swept {len(out)} plans, {n_err} errors -> {path}")


if __name__ == "__main__":
    main()
