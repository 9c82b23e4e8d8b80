"""Round-9 ext22 finance/risk operator tests: numpy references for
historical_var, capm_beta, sharpe_sortino, stochastic_oscillator, and
obv_trend on synthetic keyed daily series.
"""

import numpy as np


def test_historical_var_matches_numpy(spark):
    from gridmet_etl_spark.operators.risk import historical_var

    rng = np.random.RandomState(4)
    losses = rng.randint(-5000, 8000, 400)
    df = spark.createDataFrame(
        [("A", int(v)) for v in losses], "k string, loss long"
    )
    r = historical_var(df, ["k"], "loss", alpha=0.95).collect()[0]
    srt = np.sort(losses)
    k = int(np.ceil(0.95 * len(losses)))
    var = srt[k - 1]
    tail = losses[losses >= var]
    assert r["n"] == 400
    assert abs(r["var"] - var / 100.0) < 1e-9
    assert abs(r["cvar"] - tail.mean() / 100.0) < 1e-6
    assert abs(r["worst"] - losses.max() / 100.0) < 1e-9
    assert r["cvar"] >= r["var"]


def test_historical_var_tie_heavy_deterministic(spark):
    from gridmet_etl_spark.operators.risk import historical_var

    # 100 identical losses: VaR = CVaR = the value, regardless of tie order
    df = spark.createDataFrame([("A", 250)] * 100, "k string, loss long")
    r = historical_var(df, ["k"], "loss").collect()[0]
    assert r["var"] == r["cvar"] == r["worst"] == 2.5


def test_capm_beta_matches_numpy(spark):
    from gridmet_etl_spark.operators.risk import capm_beta

    rng = np.random.RandomState(8)
    rm = rng.randint(-1000, 1000, 500)
    ra = (1.7 * rm + rng.randint(-200, 200, 500)).astype(int)
    df = spark.createDataFrame(
        [("A", int(a), int(m)) for a, m in zip(ra, rm)],
        "k string, r long, rm long",
    )
    out = capm_beta(df, ["k"], "r", "rm").collect()[0]
    beta_ref = np.cov(ra, rm, bias=True)[0, 1] / np.var(rm)
    alpha_ref = ra.mean() - beta_ref * rm.mean()
    corr_ref = np.corrcoef(ra, rm)[0, 1]
    assert abs(out["beta"] - beta_ref) < 1e-6
    assert abs(out["alpha_e6"] - alpha_ref) < 1e-4
    assert abs(out["corr"] - corr_ref) < 1e-6


def test_sharpe_sortino_matches_numpy(spark):
    from gridmet_etl_spark.operators.risk import sharpe_sortino

    rng = np.random.RandomState(2)
    r = rng.randint(-3000, 4000, 600)
    df = spark.createDataFrame([("A", int(v)) for v in r], "k string, r long")
    out = sharpe_sortino(df, ["k"], "r").collect()[0]
    mean = r.mean()
    sd = r.std(ddof=1)
    dd = np.sqrt((np.minimum(r, 0) ** 2).mean())
    assert abs(out["mean_e6"] - mean) < 1e-4
    assert abs(out["sharpe"] - mean / sd) < 1e-6
    assert abs(out["sortino"] - mean / dd) < 1e-6


def test_sharpe_constant_series_guard(spark):
    from gridmet_etl_spark.operators.risk import sharpe_sortino

    df = spark.createDataFrame([("A", 100)] * 50, "k string, r long")
    out = sharpe_sortino(df, ["k"], "r").collect()[0]
    assert out["sharpe"] == 0.0  # zero variance -> guard
    assert out["sortino"] == 0.0  # no downside -> guard


def test_stochastic_oscillator_matches_numpy(spark):
    from gridmet_etl_spark.operators.risk import stochastic_oscillator
    import datetime

    rng = np.random.RandomState(6)
    v = rng.randint(10, 1000, 120)
    d0 = datetime.date(2024, 1, 1)
    df = spark.createDataFrame(
        [("A", d0 + datetime.timedelta(days=i), int(x)) for i, x in enumerate(v)],
        "k string, day date, v long",
    )
    out = {
        r["day"]: r
        for r in stochastic_oscillator(df, ["k"], "day", "v").collect()
    }
    ks = {}
    for t in range(13, 120):
        w = v[t - 13 : t + 1]
        mn, mx = w.min(), w.max()
        k_e6 = 50_000_000 if mx == mn else round((v[t] - mn) * 1e8 / (mx - mn))
        ks[t] = k_e6
    for t in range(15, 120):
        if t - 2 not in ks:
            continue
        k_e6 = ks[t]
        if not (k_e6 > 80_000_000 or k_e6 < 20_000_000):
            assert (d0 + datetime.timedelta(days=t)) not in out
            continue
        row = out[d0 + datetime.timedelta(days=t)]
        d_ref = (ks[t] + ks[t - 1] + ks[t - 2]) / 3.0 / 1e6
        assert abs(row["k_pct"] - k_e6 / 1e6) < 1e-6
        assert abs(row["d_pct"] - d_ref) < 1e-6
        assert row["zone"] == (1 if k_e6 > 80_000_000 else -1)


def test_obv_matches_numpy(spark):
    from gridmet_etl_spark.operators.risk import obv_trend
    import datetime

    rng = np.random.RandomState(9)
    price = rng.randint(100, 10000, 200)
    vol = rng.randint(1, 50, 200)
    d0 = datetime.date(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("A", d0 + datetime.timedelta(days=i), int(p), int(q))
            for i, (p, q) in enumerate(zip(price, vol))
        ],
        "k string, day date, cents long, vol long",
    )
    out = obv_trend(df, ["k"], "day", "cents", "vol").collect()[0]
    obv = np.concatenate(
        [[0], np.cumsum(np.sign(np.diff(price.astype(float))) * vol[1:])]
    ) + 0.0
    # first element 0, cumulative thereafter; prepend handled: obv[0]=0
    full = np.zeros(200)
    acc = 0
    for t in range(1, 200):
        acc += int(np.sign(int(price[t]) - int(price[t - 1]))) * vol[t]
        full[t] = acc
    assert out["n_days"] == 200
    assert out["obv_final"] == full[-1]
    assert out["obv_max"] == full.max()
    assert out["obv_min"] == full.min()
    assert np.allclose(obv, full)
