#!/usr/bin/env python
"""Isolated per-entry timing probe for the r11 optimization round.

Usage:
  python tools/r11_probe.py [--conf k=v ...] [--reps N] entry [entry ...]

Times bench entries (EXTRA_BENCH / CALL_TIMED / declared queries) with the
same protocol as bench.py (clearCache + System.gc + untimed warm-up, then
best-of-N noop writes), but in a fresh session that can carry experimental
conf overrides. Prints one line per entry: name, best, spread, reps.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    conf: dict[str, str] = {}
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--conf":
            k, v = args[i + 1].split("=", 1)
            conf[k] = v
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    import bench
    import __spark_entry__ as entry
    from gridmet_etl_spark.session import get_spark

    spark = get_spark(app_name="r11_probe", extra_conf=conf or None)
    spark.range(1000).selectExpr("sum(id)").collect()
    queries = entry.queries()

    def _quiesce():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    for name in names:
        call_timed = name in bench.CALL_TIMED

        def build():
            if name in bench.EXTRA_BENCH:
                return bench.EXTRA_BENCH[name](spark)
            if name in bench.CALL_TIMED:
                return bench.CALL_TIMED[name](spark)
            return queries[name](spark, SF_DIR)

        spark.sparkContext.setJobDescription(f"r11_probe:{name}")
        _quiesce()
        if call_timed:
            build().write.format("noop").mode("overwrite").save()  # warm
            ts = []
            for _ in range(reps):
                _quiesce()
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
        else:
            df = build()
            df.write.format("noop").mode("overwrite").save()  # warm
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
        best = min(ts)
        spread = (max(ts) - best) / best if best else 0.0
        print(f"PROBE {name} best={best:.3f}s spread={spread:.3f} reps={ts}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
