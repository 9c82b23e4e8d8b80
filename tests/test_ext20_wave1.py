"""Round-9 wave-1 operators: exact_quantiles (distributed order statistic),
Mood's median, sign test, Page's L, turning points, Durbin–Watson —
textbook/numpy goldens + the two-level-quantile vs sorted-list identity."""

import math
import random

import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.stats import (
    exact_quantiles,
    mood_median_test,
    page_trend_test,
    pinball_eval,
    sign_test,
)
from gridmet_etl_spark.operators.timeseries import (
    durbin_watson,
    turning_point_test,
)


def _df(spark, vals, schema="x long"):
    return spark.createDataFrame([(v,) for v in vals], schema)


def test_exact_quantiles_matches_sorted_list(spark):
    rnd = random.Random(20)
    vals = [rnd.randint(0, 5_000_000) for _ in range(999)]
    taus = [0.1, 0.25, 0.5, 0.9, 1.0]
    got = {
        r.tau: r.value
        for r in exact_quantiles(_df(spark, vals), "x", taus).collect()
    }
    s = sorted(vals)
    for t in taus:
        want = s[math.ceil(len(vals) * t) - 1]  # lower discrete quantile
        assert got[t] == want, t


def test_exact_quantiles_bucket_div_invariance(spark):
    vals = [v * 997 for v in range(500)]
    for div in (10, 1000, 10**9):
        got = {
            r.tau: r.value
            for r in exact_quantiles(
                _df(spark, vals), "x", [0.5, 0.95], bucket_div=div
            ).collect()
        }
        s = sorted(vals)
        assert got[0.5] == s[math.ceil(500 * 0.5) - 1]
        assert got[0.95] == s[math.ceil(500 * 0.95) - 1]


def test_mood_median_textbook(spark):
    # two groups; grand median of 1..10 (lower) = 5
    # g1 = {1,2,3,4,8}: above = 1; g2 = {5,6,7,9,10}: above = 4 (5 <= 5)
    rows = [("a", v) for v in [1, 2, 3, 4, 8]] + [
        ("b", v) for v in [5, 6, 7, 9, 10]
    ]
    df = spark.createDataFrame(rows, "g string, x long")
    r = mood_median_test(df, "x", "g").collect()[0]
    assert (r.k, r.n, r.median, r.df) == (2, 10, 5, 1)
    # chi2 = sum over cells (O-E)^2/E with A=5, B=5, E=2.5 everywhere:
    # cells a:(1,4), b:(4,1) -> 4 * (1.5^2/2.5) = 3.6
    assert r.chi2 == pytest.approx(3.6, abs=1e-6)


def test_sign_test_counts_and_z(spark):
    rows = [(1.0, 2.0)] * 6 + [(2.0, 1.0)] * 2 + [(3.0, 3.0)] * 4
    df = spark.createDataFrame(rows, "pre double, post double")
    r = sign_test(df, "pre", "post").collect()[0]
    assert (r.n_pos, r.n_neg, r.n_tie) == (6, 2, 4)
    assert r.z == pytest.approx((6 - 2) / math.sqrt(8), abs=1e-6)


def test_page_trend_perfect_monotone(spark):
    # b=4 blocks, k=3 treatments, values strictly increasing with j:
    # every block ranks (1,2,3) -> L = 1*4 + 2*8 + 3*12 = 56 (max)
    rows = [(b, j, 10 * j + b) for b in range(4) for j in (1, 2, 3)]
    df = spark.createDataFrame(rows, "blk long, j long, v long")
    r = page_trend_test(df, "blk", "j", "v").collect()[0]
    assert (r.b, r.k, r.l_stat) == (4, 3, 56)
    b, k, L = 4.0, 3.0, 56.0
    z = (12 * L - 3 * b * k * (k + 1) ** 2) / (
        k * (k + 1) * math.sqrt(b * (k - 1))
    )
    assert r.z == pytest.approx(z, abs=1e-6)


def test_page_trend_drops_incomplete_blocks(spark):
    rows = [(b, j, 10 * j + b) for b in range(3) for j in (1, 2, 3)]
    rows.append((99, 1, 5))  # block 99 has only one treatment -> dropped
    df = spark.createDataFrame(rows, "blk long, j long, v long")
    r = page_trend_test(df, "blk", "j", "v").collect()[0]
    assert r.b == 3


def test_turning_points_hand_counted(spark):
    # series 1,3,2,4,1,5: interior points 3(peak),2(trough),4(peak),1(trough)
    vals = [1, 3, 2, 4, 1, 5]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t long, v long"
    )
    r = turning_point_test(df, "t", "v").collect()[0]
    assert (r.n, r.n_turning) == (6, 4)
    n = 6.0
    exp, var = 2 * (n - 2) / 3, (16 * n - 29) / 90
    assert r.expected == pytest.approx(exp, abs=1e-6)
    assert r.z == pytest.approx((4 - exp) / math.sqrt(var), abs=1e-6)


def test_turning_points_ties_not_extrema(spark):
    vals = [1, 2, 2, 1]  # plateau: no strict peak anywhere
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t long, v long"
    )
    assert turning_point_test(df, "t", "v").collect()[0].n_turning == 0


def test_durbin_watson_vs_numpy(spark):
    import numpy as np

    rnd = random.Random(7)
    vals = [rnd.randint(0, 10_000) for _ in range(200)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t long, v long"
    )
    r = durbin_watson(df, "t", "v").collect()[0]
    e = np.array(vals, dtype=float) - np.mean(vals)
    want = np.sum(np.diff(e) ** 2) / np.sum(e**2)
    assert r.n == 200
    assert r.dw == pytest.approx(want, abs=1e-5)


def test_durbin_watson_alternating_near_four(spark):
    vals = [0, 100] * 50
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t long, v long"
    )
    assert durbin_watson(df, "t", "v").collect()[0].dw > 3.9


def test_pinball_eval_hand_computed(spark):
    train = _df(spark, list(range(1, 101)), "v long")  # q50=50, q90=90
    test = _df(spark, [40, 60, 100], "v long")
    out = {
        r.tau: (r.forecast, r.pinball)
        for r in pinball_eval(train, test, "v", [0.5, 0.9]).collect()
    }
    # tau=.5, f=50: losses .5*|40-50|=5, .5*10=5, .5*50=25 -> mean 35/3
    assert out[0.5][0] == 50
    assert out[0.5][1] == pytest.approx(35 / 3, abs=1e-6)
    # tau=.9, f=90: y=40 -> .1*50=5, y=60 -> .1*30=3, y=100 -> .9*10=9
    assert out[0.9][0] == 90
    assert out[0.9][1] == pytest.approx(17 / 3, abs=1e-6)
