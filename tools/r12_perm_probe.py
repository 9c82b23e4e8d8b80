#!/usr/bin/env python
"""VERDICT r11 item 2: paired probe of permutation_test — the committed
two-level bucket-histogram rewrite (a4946cd) vs the r10 per-perm Window
sort it replaced — in ONE session, alternating reps, same inputs as the
declared query. The runtime ReusedExchange evidence lives in
plans/r12/permutation_test_executed.txt; this settles the time claim the
r11 driver bench (13.39 s, noisy box) could not.

Usage: python tools/r12_perm_probe.py [--reps 3]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _old_permutation_test(df, id_col, treat_col, value_col, n_perm=48, ndigits=6):
    """The r10 implementation (git a4946cd^), reproduced verbatim for A/B."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = df.select(
        F.col(id_col).alias("_rid"),
        F.col(treat_col).cast("int").alias("_t"),
        F.col(value_col).cast("long").alias("_v"),
    )
    obs = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_t").cast("long").alias("n1"),
        F.sum(F.col("_v") * F.col("_t")).cast("long").alias("s1"),
        F.sum("_v").cast("long").alias("s_tot"),
    )
    n_spread = rows.sparkSession.sparkContext.defaultParallelism
    perms = rows.repartition(n_spread).crossJoin(
        F.broadcast(rows.sparkSession.range(n_perm).select(F.col("id").alias("_p")))
    ).select(
        "_p", "_rid", "_v",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("_rid"), F.col("_p"))), 1, 12),
            16, 10,
        ).cast("long").alias("_h"),
    )
    w = Window.partitionBy("_p").orderBy("_h", "_rid")
    per_p = (
        perms.withColumn("_rn", F.row_number().over(w))
        .crossJoin(F.broadcast(obs.select("n1")))
        .groupBy("_p")
        .agg(F.sum(F.when(F.col("_rn") <= F.col("n1"), F.col("_v"))).cast("long").alias("s1p"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    joined = per_p.crossJoin(F.broadcast(obs))
    n0 = F.col("n") - F.col("n1")
    s0p = F.col("s_tot") - F.col("s1p")
    s0 = F.col("s_tot") - F.col("s1")
    extreme = F.abs(dec(F.col("s1p")) * dec(n0) - dec(s0p) * dec(F.col("n1"))) >= F.abs(
        dec(F.col("s1")) * dec(n0) - dec(s0) * dec(F.col("n1"))
    )
    acc = joined.agg(
        F.sum(extreme.cast("long")).cast("long").alias("n_extreme"),
        F.first("n").alias("n"),
        F.first("n1").alias("n1"),
        F.first("s1").alias("s1"),
        F.first("s_tot").alias("s_tot"),
    )
    mean_diff = F.col("s1").cast("double") / F.col("n1") - (
        F.col("s_tot") - F.col("s1")
    ).cast("double") / (F.col("n") - F.col("n1"))
    return acc.select(
        "n", "n1",
        F.lit(n_perm).cast("int").alias("n_perm"),
        "n_extreme",
        (F.round(mean_diff, ndigits) + F.lit(0.0)).alias("mean_diff"),
        (F.round((1 + F.col("n_extreme")).cast("double") / (1 + n_perm), ndigits) + F.lit(0.0)).alias("p_value"),
    )


def main() -> None:
    reps = 3
    if len(sys.argv) > 2 and sys.argv[1] == "--reps":
        reps = int(sys.argv[2])

    from pyspark.sql import functions as F

    from gridmet_etl_spark.operators.stats import permutation_test
    from gridmet_etl_spark.session import get_spark

    spark = get_spark(app_name="r12_perm_probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    def li():
        return spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("rid"),
            (F.col("l_returnflag") == "R").cast("int").alias("t"),
            F.col("l_quantity").cast("long").alias("v"),
        )

    new_df = permutation_test(li(), "rid", "t", "v", n_perm=48)
    old_df = _old_permutation_test(li(), "rid", "t", "v", n_perm=48)

    # identical output check first
    a, b = new_df.collect(), old_df.collect()
    print("outputs_match:", [tuple(r) for r in a] == [tuple(r) for r in b], a)

    new_best = old_best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        new_df.write.format("noop").mode("overwrite").save()
        d_new = time.perf_counter() - t0
        t0 = time.perf_counter()
        old_df.write.format("noop").mode("overwrite").save()
        d_old = time.perf_counter() - t0
        new_best, old_best = min(new_best, d_new), min(old_best, d_old)
        print(f"rep {i}: new={d_new:.3f}s old={d_old:.3f}s")
    print(f"BEST new(bucket-histogram)={new_best:.3f}s old(per-perm sort)={old_best:.3f}s ratio={old_best / new_best:.2f}x")


if __name__ == "__main__":
    main()
