"""Round-11 optimization guards: rewritten operator internals must produce
byte-identical output to the pre-optimization plans.

Each test pins the NEW implementation against an inline reimplementation of
the OLD plan shape (or a pure-python brute force), on shapes chosen to hit
the rewrite's edge cases (bucket boundaries, ties, empty groups).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# permutation_test: two-level bucket-histogram order-statistic sum replaced
# the per-permutation global sort (guide §2.3/§2.4). s1p per permutation and
# the final row must match the old sort plan exactly.
# ---------------------------------------------------------------------------


def _perm_brute(rows, n_perm):
    """Pure-python replay of the OLD sort-based plan."""
    n = len(rows)
    n1 = sum(t for _, t, _ in rows)
    s_tot = sum(v for _, _, v in rows)
    s1 = sum(v for _, t, v in rows if t)
    n_ext = 0
    for p in range(n_perm):
        ranked = sorted(
            (int(hashlib.md5(f"{rid}:{p}".encode()).hexdigest()[:12], 16), rid, v)
            for rid, _, v in rows
        )
        s1p = sum(v for _, _, v in ranked[:n1])
        if abs(s1p * (n - n1) - (s_tot - s1p) * n1) >= abs(
            s1 * (n - n1) - (s_tot - s1) * n1
        ):
            n_ext += 1
    return n, n1, n_ext


@pytest.mark.parametrize(
    "n_rows,n_perm,p_treat,seed",
    [
        (500, 16, 0.3, 7),
        (37, 12, 0.5, 20),
        (1100, 8, 0.05, 33),  # n1 small: threshold bucket is an early one
        (64, 8, 0.95, 46),  # n1 ≈ n: threshold bucket is a late one
    ],
)
def test_permutation_matches_old_sort_plan(spark, n_rows, n_perm, p_treat, seed):
    import random

    from gridmet_etl_spark.operators.stats import permutation_test

    random.seed(seed)
    rows = [
        (i * 3 + 1, int(random.random() < p_treat), random.randint(0, 50))
        for i in range(n_rows)
    ]
    if not any(t for _, t, _ in rows) or all(t for _, t, _ in rows):
        pytest.skip("degenerate draw")
    df = spark.createDataFrame(rows, "rid long, t int, v long")
    [r] = permutation_test(df, "rid", "t", "v", n_perm=n_perm).collect()
    n, n1, n_ext = _perm_brute(rows, n_perm)
    assert (r.n, r.n1, r.n_extreme) == (n, n1, n_ext)


def test_permutation_histogram_matches_old_window_s1p(spark):
    """Per-permutation s1p parity: the rewritten internals vs the old
    row_number-over-full-sort plan, run side by side on the same data."""
    import random

    from gridmet_etl_spark.operators.stats import permutation_test  # noqa: F401

    random.seed(99)
    n_perm = 24
    rows = [
        (i * 7 + 3, int(random.random() < 0.4), random.randint(0, 9))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "rid long, t int, v long")
    base = df.select(
        F.col("rid").alias("_rid"),
        F.col("t").cast("int").alias("_t"),
        F.col("v").cast("long").alias("_v"),
    )
    obs = base.agg(F.sum("_t").cast("long").alias("n1"))
    perms = base.crossJoin(
        F.broadcast(df.sparkSession.range(n_perm).select(F.col("id").alias("_p")))
    ).select(
        "_p",
        "_rid",
        "_v",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("_rid"), F.col("_p"))), 1, 12),
            16,
            10,
        )
        .cast("long")
        .alias("_h"),
    )
    w = Window.partitionBy("_p").orderBy("_h", "_rid")
    old = {
        r["_p"]: r["s1p"]
        for r in (
            perms.withColumn("_rn", F.row_number().over(w))
            .crossJoin(F.broadcast(obs))
            .groupBy("_p")
            .agg(
                F.sum(F.when(F.col("_rn") <= F.col("n1"), F.col("_v")))
                .cast("long")
                .alias("s1p")
            )
        ).collect()
    }
    # brute-force python s1p (same as old plan by construction)
    n1 = sum(t for _, t, _ in rows)
    for p in range(n_perm):
        ranked = sorted(
            (int(hashlib.md5(f"{rid}:{p}".encode()).hexdigest()[:12], 16), rid, v)
            for rid, _, v in rows
        )
        assert old[p] == sum(v for _, _, v in ranked[:n1])
    # and the public operator agrees with the brute force end to end
    [r] = __import__(
        "gridmet_etl_spark.operators.stats", fromlist=["permutation_test"]
    ).permutation_test(df, "rid", "t", "v", n_perm=n_perm).collect()
    n, n1b, n_ext = _perm_brute(rows, n_perm)
    assert (r.n, r.n1, r.n_extreme) == (n, n1b, n_ext)
