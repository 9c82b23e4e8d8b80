#!/usr/bin/env python
"""Dump .explain('formatted') plans for the round-11 optimization targets.

Usage: python tools/r12_plans.py <before|after> [name ...]

Writes plans/r12/<name>_<tag>.txt for each target: bench EXTRA_BENCH /
CALL_TIMED builders and declared contract queries both resolve by name.
Explain is driver-only (no job runs), so this is cheap to re-run after
every change.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Default target set: the top idle-lock bench entries (BENCH_LOCAL_FULL) +
# the declared queries they exercise.
DEFAULT_TARGETS = [
    "cfsv2_scale_stress_398M",
    "permutation_test",
    "pq_adc_400k_vecs",
    "cms_join_size_14M_keys",
    "session_windows_hub20_12M",
    "minhash_lsh_100k_docs",
    "asof_hub20_12M_single_task",
    "asof_hub20_12M_bucketed",
    "kmv_setops_24M_keys",
    "item_similarity_sf",
    "bootstrap_38M_draws",
    "mood_median",
    "qte_quartiles",
    "mcv_24M_values",
    "tpch_q18ish",
    "tpch_q9ish",
    "weighted_mean",
    "gridmet_pipeline",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_TARGETS

    import bench
    import __spark_entry__ as entry
    from gridmet_etl_spark.session import get_spark

    spark = get_spark(app_name="r12_plans")
    queries = entry.queries()
    out_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        if name in bench.EXTRA_BENCH:
            df = bench.EXTRA_BENCH[name](spark)
        elif name in bench.CALL_TIMED:
            df = bench.CALL_TIMED[name](spark)
        elif name in queries:
            df = queries[name](spark, SF_DIR)
        else:
            print(f"SKIP {name}: not a bench entry or declared query")
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
