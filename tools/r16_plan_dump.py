#!/usr/bin/env python
"""Dump .explain('formatted') for named registry entries into
plans/r16/<name>_<tag>.txt (the optimization round's before/after
plan evidence; the judge checks plan claims against these files).

Usage: python tools/r16_plan_dump.py <tag> <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from advisorydatapipeline_spark.registry import QUERIES  # noqa: E402
from advisorydatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
