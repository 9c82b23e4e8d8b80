"""Round-9 ext31 anomaly/changepoint tests: brute-force references for
esd_outliers and binseg_split."""

import datetime

import numpy as np


def _series_df(spark, vals):
    d0 = datetime.date(2024, 1, 1)
    return spark.createDataFrame(
        [(d0 + datetime.timedelta(days=i), int(v)) for i, v in enumerate(vals)],
        "day date, v long",
    )


def test_esd_matches_bruteforce_and_unmasks(spark):
    from gridmet_etl_spark.operators.timeseries import esd_outliers

    rng = np.random.RandomState(3)
    vals = rng.randint(95, 106, 200).astype(np.int64)
    # two big outliers close together (each would inflate sd for the other)
    vals[50] = 500
    vals[51] = 480
    vals[120] = 5  # a low outlier
    out = esd_outliers(_series_df(spark, vals), "day", "v", k=3).collect()
    # brute-force replay
    rem = list(vals)
    days = list(range(200))
    flagged = []
    for step in range(3):
        arr = np.array(rem, float)
        n, mean, sd = len(arr), arr.mean(), arr.std(ddof=1)
        dev = np.abs(arr - mean)
        i = int(np.lexsort((days, rem, -dev * n))[0])  # dev desc, v asc, day asc
        flagged.append((days[i], rem[i], dev[i] / sd))
        del rem[i], days[i]
    got = [(r["step"], r["value"], r["studentized"]) for r in sorted(out, key=lambda r: r["step"])]
    assert [g[1] for g in got] == [f[1] for f in flagged]
    for g, f in zip(got, flagged):
        assert abs(g[2] - f[2]) < 1e-6
    # the three planted outliers are exactly the three flagged
    assert {g[1] for g in got} == {500, 480, 5}


def test_esd_n_at_step_decrements(spark):
    from gridmet_etl_spark.operators.timeseries import esd_outliers

    vals = list(range(100))
    out = sorted(
        esd_outliers(_series_df(spark, vals), "day", "v", k=4).collect(),
        key=lambda r: r["step"],
    )
    assert [r["n_at_step"] for r in out] == [100, 99, 98, 97]


def test_binseg_finds_planted_shift(spark):
    from gridmet_etl_spark.operators.timeseries import binseg_split

    rng = np.random.RandomState(5)
    vals = np.concatenate(
        [rng.randint(100, 110, 80), rng.randint(160, 170, 120)]
    )
    r = binseg_split(_series_df(spark, vals), "day", "v").collect()[0]
    d0 = datetime.date(2024, 1, 1)
    split_idx = (r["split_day"] - d0).days + 1  # n_left rows end at split_day
    assert abs(split_idx - 80) <= 2  # the planted change at index 80
    assert r["n_left"] + r["n_right"] == 200
    assert r["mean_right"] - r["mean_left"] > 40


def test_binseg_gain_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.timeseries import binseg_split

    rng = np.random.RandomState(8)
    vals = rng.randint(0, 1000, 60).astype(np.int64)
    r = binseg_split(_series_df(spark, vals), "day", "v", min_seg=5).collect()[0]
    x = vals.astype(float)
    n, s = len(x), x.sum()
    best_gain, best_t = -1, None
    for t in range(5, n - 5 + 1):
        sl = x[:t].sum()
        gain = sl * sl / t + (s - sl) ** 2 / (n - t) - s * s / n
        if gain > best_gain:
            best_gain, best_t = gain, t
    assert r["n_left"] == best_t
    assert abs(r["gain"] - best_gain) < 1e-4
    # gain equals the SSE reduction identity
    sse_tot = ((x - x.mean()) ** 2).sum()
    l, rr = x[:best_t], x[best_t:]
    sse_split = ((l - l.mean()) ** 2).sum() + ((rr - rr.mean()) ** 2).sum()
    assert abs(best_gain - (sse_tot - sse_split)) < 1e-6
