#!/usr/bin/env python
"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the noop sink (full compute, no driver collect
overhead, no output files) after a shared session warm-up.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gridmet_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship domain pipelines + the relational/extension
# surface that stresses joins, aggs, windows, and text ops at sf scale.
BENCH_QUERIES = [
    "gridmet_pipeline",
    "cfsv2_ensemble_pipeline",
    "tpch_q1",
    "tpch_weighted_mean",
    "tpch_join3",
    "tpch_window_topk",
    "events_daily",
    "text_analysis",
    "exact_dedup",
    "minhash_lsh",
    "simhash",
    "cosine_topk",
    "cosine_topk_lsh",
]


def main() -> None:
    from gridmet_etl_spark.contract import DOMAIN_QUERIES as _CORE
    from gridmet_etl_spark.contract_ext import EXT_QUERIES as _EXT

    DOMAIN_QUERIES = {**_CORE, **_EXT}

    spark = get_spark(app_name="gridmet_etl_spark_bench")
    # warm-up: JVM + parquet footer caches
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn, _sql = DOMAIN_QUERIES[name]
        df = fn(spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
