"""Round-8 ext18 operator tests: brute-force/numpy references for
cliffs_delta, odds_ratio, km_median_survival, and seasonal_strength.
"""

import datetime as dt

import numpy as np
import pytest


def test_cliffs_delta_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.stats import cliffs_delta

    rng = np.random.RandomState(5)
    xa = rng.randint(0, 50, 300)
    yb = rng.randint(10, 60, 400)
    rows = [(int(v), "A") for v in xa] + [(int(v), "B") for v in yb]
    df = spark.createDataFrame(rows, "v long, g string")
    r = cliffs_delta(df, "v", "g").collect()[0]
    gt = sum(1 for x in xa for y in yb if x > y)
    lt = sum(1 for x in xa for y in yb if x < y)
    eq = sum(1 for x in xa for y in yb if x == y)
    assert (r["n_gt"], r["n_lt"], r["n_eq"]) == (gt, lt, eq)
    assert abs(r["delta"] - (gt - lt) / (300 * 400)) < 1e-6
    assert r["magnitude"] == "medium"


def test_cliffs_delta_disjoint_supports(spark):
    from gridmet_etl_spark.operators.stats import cliffs_delta

    rows = [(v, "A") for v in range(100, 110)] + [
        (v, "B") for v in range(0, 10)
    ]
    df = spark.createDataFrame(rows, "v long, g string")
    r = cliffs_delta(df, "v", "g").collect()[0]
    assert r["delta"] == 1.0 and r["magnitude"] == "large"
    # swap group labels -> delta flips sign
    df2 = spark.createDataFrame(
        [(v, {"A": "B", "B": "A"}[g]) for v, g in rows], "v long, g string"
    )
    assert cliffs_delta(df2, "v", "g").collect()[0]["delta"] == -1.0


def test_cliffs_delta_identical_zero(spark):
    from gridmet_etl_spark.operators.stats import cliffs_delta

    rows = [(v, g) for g in ("A", "B") for v in range(30)]
    df = spark.createDataFrame(rows, "v long, g string")
    r = cliffs_delta(df, "v", "g").collect()[0]
    assert r["delta"] == 0.0 and r["magnitude"] == "negligible"
    assert r["n_eq"] == 30


def test_odds_ratio_matches_numpy(spark):
    from gridmet_etl_spark.operators.stats import odds_ratio

    rng = np.random.RandomState(5)
    e = rng.rand(5000) < 0.4
    y = rng.rand(5000) < (0.3 + 0.2 * e)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(e, y)], "e int, y int"
    )
    r = odds_ratio(df, "e", "y").collect()[0]
    a = int((e & y).sum())
    b = int((e & ~y).sum())
    c = int((~e & y).sum())
    d = int((~e & ~y).sum())
    orr = a * d / (b * c)
    se = np.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert abs(r["odds_ratio"] - orr) < 1e-4
    assert abs(r["or_ci_lo"] - np.exp(np.log(orr) - 1.959963984540054 * se)) < 1e-4
    assert abs(r["or_ci_hi"] - np.exp(np.log(orr) + 1.959963984540054 * se)) < 1e-4
    assert abs(r["relative_risk"] - (a / (a + b)) / (c / (c + d))) < 1e-4
    assert r["or_ci_lo"] < r["odds_ratio"] < r["or_ci_hi"]


def test_odds_ratio_zero_cell_null(spark):
    from gridmet_etl_spark.operators.stats import odds_ratio

    rows = [(1, 1)] * 5 + [(0, 0)] * 5  # b = c = 0
    df = spark.createDataFrame(rows, "e int, y int")
    r = odds_ratio(df, "e", "y").collect()[0]
    assert r["odds_ratio"] is None and r["relative_risk"] is None


def test_km_median_matches_manual(spark):
    from gridmet_etl_spark.operators.stats import km_median_survival

    rng = np.random.RandomState(5)
    dur = rng.randint(1, 40, 600)
    ev = (rng.rand(600) < 0.9).astype(int)
    df = spark.createDataFrame(
        [(int(d), int(e)) for d, e in zip(dur, ev)], "d long, e int"
    )
    r = km_median_survival(df, [], "d", "e").collect()[0]
    surv, med, last = 1.0, None, None
    for t in sorted(set(dur.tolist())):
        n_risk = int((dur >= t).sum())
        d = int(ev[dur == t].sum())
        if d > 0:
            surv *= 1 - d / n_risk
            s6 = round(surv, 6)
            if med is None and s6 <= 0.5:
                med = t
            last = s6
    assert r["median_t"] == med
    assert abs(r["final_surv"] - last) < 2e-6


def test_km_median_never_crosses_null(spark):
    from gridmet_etl_spark.operators.stats import km_median_survival

    # 10% events: survival stays far above 0.5 -> NULL median
    rows = [(10, 1)] * 5 + [(20, 0)] * 95
    df = spark.createDataFrame(rows, "d long, e int")
    r = km_median_survival(df, [], "d", "e").collect()[0]
    assert r["median_t"] is None
    assert r["final_surv"] > 0.9


def test_seasonal_strength_planted_structure(spark):
    from gridmet_etl_spark.operators.timeseries import (
        seasonal_decompose,
        seasonal_strength,
    )

    rng = np.random.RandomState(5)
    n = 210
    days = [dt.date(2020, 1, 1) + dt.timedelta(days=i) for i in range(n)]
    seas = np.tile([10, -5, 3, 0, -8, 12, -12], 30)
    v = np.arange(n) * 0.5 + seas + rng.randn(n)
    df = spark.createDataFrame(
        [("s", d, float(x)) for d, x in zip(days, v)],
        "k string, day date, v double",
    )
    dec = seasonal_decompose(df, ["k"], "day", "v", period=7)
    st = seasonal_strength(dec, ["k"]).collect()[0]
    rows = dec.collect()
    res = np.array([r["resid"] for r in rows])
    sea = np.array([r["seasonal"] for r in rows])
    tr = np.array([r["trend"] for r in rows])
    fs_ref = max(0.0, 1 - res.var() / (sea + res).var())
    ft_ref = max(0.0, 1 - res.var() / (tr + res).var())
    assert abs(st["f_seasonal"] - fs_ref) < 1e-4
    assert abs(st["f_trend"] - ft_ref) < 1e-4
    assert st["f_seasonal"] > 0.9 and st["f_trend"] > 0.9


def test_seasonal_strength_noise_low(spark):
    from gridmet_etl_spark.operators.timeseries import (
        seasonal_decompose,
        seasonal_strength,
    )

    rng = np.random.RandomState(11)
    n = 210
    days = [dt.date(2020, 1, 1) + dt.timedelta(days=i) for i in range(n)]
    df = spark.createDataFrame(
        [("s", d, float(x)) for d, x in zip(days, rng.randn(n))],
        "k string, day date, v double",
    )
    st = seasonal_strength(
        seasonal_decompose(df, ["k"], "day", "v", period=7), ["k"]
    ).collect()[0]
    assert st["f_trend"] < 0.5
    assert 0.0 <= st["f_seasonal"] <= 1.0
