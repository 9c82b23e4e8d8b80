"""Round-8 ext16 operator tests: numpy references and degenerate guards
for grubbs_stat, ljung_box, gumbel_return_levels, and page_hinkley.
"""

import datetime as dt

import numpy as np


def _days(n, start=dt.date(2015, 1, 1)):
    return [start + dt.timedelta(days=i) for i in range(n)]


def test_grubbs_matches_numpy(spark):
    from gridmet_etl_spark.operators.stats import grubbs_stat

    rng = np.random.RandomState(5)
    x = rng.randint(0, 100, 1000)
    x[500] = 900
    df = spark.createDataFrame([(int(v),) for v in x], "v long")
    row = grubbs_stat(df, "v").collect()[0]
    m, s = x.mean(), x.std(ddof=1)
    assert row["outlier_value"] == 900
    assert abs(row["g_stat"] - abs(900 - m) / s) < 1e-4
    assert abs(row["mean"] - m) < 1e-6


def test_grubbs_low_side_outlier_and_tiebreak(spark):
    from gridmet_etl_spark.operators.stats import grubbs_stat

    # symmetric deviations: -50 and +50 tie on |n·x − S|; smaller value wins
    df = spark.createDataFrame(
        [(-50,), (50,)] + [(0,)] * 100, "v long"
    )
    row = grubbs_stat(df, "v").collect()[0]
    assert row["outlier_value"] == -50


def test_grubbs_constant_series(spark):
    from gridmet_etl_spark.operators.stats import grubbs_stat

    df = spark.createDataFrame([(7,)] * 20, "v long")
    row = grubbs_stat(df, "v").collect()[0]
    assert row["g_stat"] == 0.0 and row["sd"] == 0.0


def test_ljung_box_matches_numpy(spark):
    from gridmet_etl_spark.operators.timeseries import ljung_box

    rng = np.random.RandomState(5)
    y = rng.randint(50, 150, 400).astype(float)
    for i in range(1, 400):
        y[i] = 0.6 * y[i - 1] + 0.4 * y[i]
    yi = y.astype(int)
    df = spark.createDataFrame(
        [(d, int(v)) for d, v in zip(_days(400), yi)], "day date, v long"
    )
    got = {r["lag"]: r for r in ljung_box(df, "day", "v", lags=(1, 2, 3)).collect()}
    n, xb = 400, yi.mean()
    denom = ((yi - xb) ** 2).sum()
    rs = {k: ((yi[k:] - xb) * (yi[:-k] - xb)).sum() / denom for k in (1, 2, 3)}
    q = n * (n + 2) * sum(rs[k] ** 2 / (n - k) for k in (1, 2, 3))
    for k in (1, 2, 3):
        assert abs(got[k]["r"] - rs[k]) < 1e-5
        assert got[k]["n_pairs"] == n - k
    assert abs(got[1]["q_stat"] - q) < 1e-2
    # autocorrelated series: Q far beyond any chi-square(3) quantile
    assert got[1]["q_stat"] > 100


def test_ljung_box_white_noise_small_q(spark):
    from gridmet_etl_spark.operators.timeseries import ljung_box

    rng = np.random.RandomState(11)
    y = rng.randint(0, 1000, 500)
    df = spark.createDataFrame(
        [(d, int(v)) for d, v in zip(_days(500), y)], "day date, v long"
    )
    out = ljung_box(df, "day", "v", lags=(1, 2, 3, 7)).collect()
    # white noise: Q ~ chi2(4); 30 is far out in the tail
    assert out[0]["q_stat"] < 30


def test_gumbel_return_levels_matches_numpy(spark):
    from gridmet_etl_spark.operators.timeseries import gumbel_return_levels

    rng = np.random.RandomState(5)
    vals = rng.randint(0, 1000, 3650)
    blocks = np.arange(3650) // 365
    df = spark.createDataFrame(
        [(int(b), int(v)) for b, v in zip(blocks, vals)], "yr long, v long"
    )
    out = {
        r["return_period"]: r
        for r in gumbel_return_levels(df, "yr", "v").collect()
    }
    mx = np.array([vals[blocks == b].max() for b in range(10)])
    beta = mx.std(ddof=1) * np.sqrt(6) / np.pi
    mu = mx.mean() - 0.5772156649015329 * beta
    for t in (10, 50, 100):
        lvl = mu - beta * np.log(-np.log(1 - 1 / t))
        assert abs(out[t]["return_level"] - lvl) < 1e-4
        assert out[t]["n_blocks"] == 10
    # monotone: the 100-year level exceeds the 10-year level
    assert out[100]["return_level"] > out[10]["return_level"]


def test_gumbel_single_block_guard(spark):
    from gridmet_etl_spark.operators.timeseries import gumbel_return_levels

    df = spark.createDataFrame([(1, 5), (1, 9)], "yr long, v long")
    out = gumbel_return_levels(df, "yr", "v").collect()
    # one block: sd guard -> beta 0, every level equals mu equals the max
    for r in out:
        assert r["beta"] == 0.0 and r["return_level"] == r["mu"] == 9.0


def test_page_hinkley_matches_manual(spark):
    from gridmet_etl_spark.operators.timeseries import page_hinkley

    rng = np.random.RandomState(5)
    base = rng.randint(40, 60, 300)
    base[200:] += 30
    df = spark.createDataFrame(
        [(d, int(v)) for d, v in zip(_days(300), base)], "day date, v long"
    )
    alarms = page_hinkley(df, "day", "v", delta=0.0, lam=100.0).collect()
    s = 0
    u = minu = 0.0
    ref = []
    for i, v in enumerate(base, 1):
        s += v
        u += v - s / i
        minu = min(minu, u)
        if u - minu > 100.0:
            ref.append(i - 1)
    got = sorted((r["day"] - dt.date(2015, 1, 1)).days for r in alarms)
    assert got == ref
    assert got[0] >= 200  # fires only after the level shift


def test_page_hinkley_stationary_quiet(spark):
    from gridmet_etl_spark.operators.timeseries import page_hinkley

    # constant series: U_t == 0 forever, no alarms at any lambda
    df = spark.createDataFrame(
        [(d, 50) for d in _days(200)], "day date, v long"
    )
    assert page_hinkley(df, "day", "v", lam=1.0).count() == 0
