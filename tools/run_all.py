"""Execute EVERY registry query at a given sf (default sf0.1) with a
noop sink — no oracle compare, just does-it-run-and-how-fast at 10x
the correctness gate's scale. Catches scale-only failures (OOM, state
blowups, quadratic joins) that sf0.01 can't.

Usage: python tools/run_all.py [sf_dir] [--slow N]  (flags queries > N sec)
"""

from __future__ import annotations

import gc
import sys
import time

sys.path.insert(0, ".")

from advisorydatapipeline_spark.session import get_spark  # noqa: E402
from advisorydatapipeline_spark.registry import QUERIES  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    slow = 10.0
    for a in sys.argv[1:]:
        if a.startswith("--slow="):
            slow = float(a.split("=", 1)[1])
    spark = get_spark("run-all")
    failures, laggards = [], []
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            flag = "  << SLOW" if dt > slow else ""
            print(f"  ✓ {name}: {dt:.1f}s{flag}")
            if dt > slow:
                laggards.append((name, dt))
        except Exception as ex:  # noqa: BLE001
            print(f"  ✗ {name}: {type(ex).__name__}: {str(ex)[:160]}")
            failures.append(name)
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    print(f"\n{len(QUERIES) - len(failures)} ran, {len(failures)} failed, "
          f"{len(laggards)} over {slow}s: {laggards}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
