#!/usr/bin/env python
"""Capture the EXECUTED (post-AQE) plan of a bench entry or declared query.

VERDICT r11 item 2: the static explain of permutation_test shows two
repartition exchanges with no ReusedExchange; whether AQE reuses the
materialized stage at runtime decides if the two-pass design pays one
shuffle or two. ``df.explain()`` before execution prints
``isFinalPlan=false``; this tool runs the query (noop sink), then prints
``df._jdf.queryExecution().executedPlan()`` — the final adaptive plan with
ReusedExchange / ReusedSubquery / AQEShuffleRead nodes resolved.

Usage: python tools/r12_executed_plan.py <name> [outfile]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else None

    import bench
    import __spark_entry__ as entry
    from gridmet_etl_spark.session import get_spark

    spark = get_spark(app_name="r12_executed_plan")
    queries = entry.queries()
    if name in bench.EXTRA_BENCH:
        df = bench.EXTRA_BENCH[name](spark)
    elif name in bench.CALL_TIMED:
        df = bench.CALL_TIMED[name](spark)
    elif name in queries:
        df = queries[name](spark, SF_DIR)
    else:
        raise SystemExit(f"{name}: not a bench entry or declared query")

    # collect() (not a noop write) so THIS DataFrame's QueryExecution is the
    # one that runs — a write spawns a separate QueryExecution and leaves
    # this plan unfinalized (isFinalPlan=false, no ReusedExchange resolved)
    n = len(df.collect())
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = f"-- executed via collect(), {n} rows --\n" + plan
    if out:
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} chars)")
    else:
        print(plan)


if __name__ == "__main__":
    main()
