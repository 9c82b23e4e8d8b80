#!/usr/bin/env python
"""Derived scale-up of the driver's sf0.1 tables (VERDICT r7 item 2).

Writes sf1.0-shaped parquet (x10 replication of /root/testdata/sf0.1,
primary/foreign keys remapped CONSISTENTLY: key -> key*10 + rep, so every
replica joins its own replica and TPC-H-ish join semantics hold) into
.sfscale/sf1.0/ under the repo root. The driver's testdata is read-only
and provides no sf1.0 — this derives one from its own bytes rather than
inventing a new generator, so the scaling curve compares the same data
distribution at 10x.

Usage: python tools/sf_scale.py [factor]   (default 10)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"

# per-table key columns remapped as key*factor + rep (FK-consistent)
REMAP = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = os.path.join(REPO, ".sfscale", f"sf{factor / 10:g}")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from gridmet_etl_spark.session import get_spark

    spark = get_spark(app_name="sf_scale")
    for table, keys in REMAP.items():
        src = os.path.join(SRC, f"{table}.parquet")
        dst = os.path.join(out_dir, f"{table}.parquet")
        if table == "events":
            # TIMESTAMP(NANOS) parquet: only readable via read_events
            from gridmet_etl_spark.sources.readers import read_events

            df = read_events(spark, src)
        else:
            df = spark.read.parquet(src)
        if not keys:  # fixed dimensions copy through
            df.write.mode("overwrite").parquet(dst)
            continue
        types = dict(df.dtypes)
        rep = spark.range(0, factor, 1, factor).withColumnRenamed("id", "_rep")
        big = rep.crossJoin(F.broadcast(df)).select(
            *[
                (F.col(c) * factor + F.col("_rep")).cast(types[c]).alias(c)
                if c in keys
                else F.col(c)
                for c in df.columns
            ]
        )
        big.write.mode("overwrite").parquet(dst)
        print(f"{table}: x{factor} -> {dst}")
    print(out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
