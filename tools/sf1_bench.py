#!/usr/bin/env python
"""sf1.0 scaling spot-bench (VERDICT r7 item 2): time the flagship
queries at sf0.1 AND the derived sf1.0 (tools/sf_scale.py, 10x rows) and
report t(sf1)/t(sf0.1) per flagship — the measured check on the SCALE.md
shuffle-budget arguments.

Protocol: per (query, sf_dir) the DataFrame is REBUILT for every
execution (so lazy localCheckpoints inside corpus_pipeline_v3 /
window_funnel are re-materialized and paid each run — honest totals),
one untimed warm-up, then best-of-3 noop-sink executions.

Usage: python tools/sf1_bench.py [--reps 3]
Prints one JSON line {"queries": {name: {"sf01": s, "sf1": s,
"ratio": r}}, "loadavg1": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FLAGSHIPS = [
    "tpch_q1",
    "tpch_q9ish",
    "exact_dedup",
    "minhash_lsh_star_full",  # builder override below
    "line_dedup",
    "corpus_pipeline_v3",
    "kmv_set_ops",
    "window_funnel",
    # round-8 session-2 additions: the two scale-relevant new operators
    # (clustering_coeff's co-part edge build is the graph-shaped join;
    # slope_one's deviation matrix is the |items|²-bounded CF shape)
    "clustering_coeff",
    "slope_one",
]


def _minhash_star_full(spark, sf_dir):
    """The contract q_minhash_lsh_star keeps an absolute doc_id < 300
    oracle scope, which SHRINKS under the x10 key remap — scale-true form
    is the star operator over the dir's WHOLE corpus (5k -> 50k docs),
    production hash."""
    from gridmet_etl_spark.operators.dedup import minhash_lsh_star

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return minhash_lsh_star(docs, hash_fn="xxhash64")


def _bench_builder(name):
    """Reuse bench.py's heavy-tail builders (VERDICT r8 item 3): each takes
    sf_dir, so pointing the SAME shape at the x10 tables gives the x10 row
    (the x20/x200 replication factors inside multiply both dirs equally)."""
    import bench

    return lambda spark, sf_dir: getattr(bench, name)(spark, sf_dir=sf_dir)


OVERRIDES = {
    "minhash_lsh_star_full": _minhash_star_full,
    # heavy tail (r8 verdict item 3): the five most expensive bench entries
    # with no prior scaling row, + the whole TPC-H suite pass
    "minhash_lsh_100k_docs": _bench_builder("_minhash_lsh_100k"),
    "pq_adc_400k_vecs": _bench_builder("_pq_adc_400k"),
    "cms_join_size_14M_keys": _bench_builder("_cms_join_size_14m"),
    "bootstrap_38M_draws": _bench_builder("_bootstrap_38m_draws"),
    "entity_resolution_part": _bench_builder("_entity_resolution_sf"),
    "tpch_suite_22": _bench_builder("_tpch_suite_22"),
}

# entries whose BUILD call performs eager work (per-round collects, eager
# localCheckpoints, or — for tpch_suite_22 — executing 21 of the 22
# queries): the timer must wrap the whole call, as bench.py's CALL_TIMED
# protocol does, or the measurement misses most of the work
CALL_TIMED = {"pq_adc_400k_vecs", "entity_resolution_part", "tpch_suite_22"}

HEAVY_TAIL = [
    "minhash_lsh_100k_docs",
    "pq_adc_400k_vecs",
    "cms_join_size_14M_keys",
    "bootstrap_38M_draws",
    "entity_resolution_part",
    "tpch_suite_22",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".sfscale", "sf1")


def main() -> int:
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    names = FLAGSHIPS
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")
    elif "--heavy" in sys.argv:
        names = HEAVY_TAIL
    if not os.path.isdir(SF1):
        print("run tools/sf_scale.py first", file=sys.stderr)
        return 1

    import __spark_entry__ as entry

    from gridmet_etl_spark.session import get_spark

    qs = entry.queries()
    spark = get_spark(app_name="sf1_bench")
    spark.range(1000).selectExpr("sum(id)").collect()

    def timed(name: str, sf_dir: str) -> float:
        build = OVERRIDES.get(name) or qs[name]
        call_timed = name in CALL_TIMED
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(reps):
            if call_timed:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                df = build(spark, sf_dir)  # rebuild: checkpoints re-pay
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    out = {}
    for name in names:
        t01 = timed(name, SF01)
        t1 = timed(name, SF1)
        out[name] = {
            "sf01": t01,
            "sf1": t1,
            "ratio": round(t1 / t01, 2) if t01 > 0 else None,
        }
        print(f"# {name}: {t01}s -> {t1}s  ratio {out[name]['ratio']}",
              file=sys.stderr)
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    print(json.dumps({"queries": out, "reps": reps, "loadavg1": load1}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
