"""Round-8 ext14 wave-1 operator tests: numpy/brute-force references and
degenerate-input guards for jarque_bera, brown_forsythe, partial_corr,
max_drawdown, bollinger_breakouts, theil_u_eval, fd_strength, and
decision_stump. References are textbook definitions, not engine output.
"""

import datetime as dt

import numpy as np
from pyspark.sql import functions as F


def _days(n, start=dt.date(2020, 1, 1)):
    return [start + dt.timedelta(days=i) for i in range(n)]


# ---------------------------------------------------------------- stats ----


def test_jarque_bera_matches_numpy(spark):
    from gridmet_etl_spark.operators.stats import jarque_bera

    rng = np.random.RandomState(7)
    x = rng.randint(-500, 2000, 3000)
    df = spark.createDataFrame([(int(v),) for v in x], "v long")
    row = jarque_bera(df, "v").collect()[0]
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    m4 = ((x - m) ** 4).mean()
    s = m3 / m2**1.5
    k = m4 / m2**2
    jb = len(x) / 6 * (s**2 + (k - 3) ** 2 / 4)
    assert abs(row["jb"] - jb) < 1e-3
    assert abs(row["skewness"] - s) < 1e-5
    assert abs(row["kurtosis"] - k) < 1e-5


def test_jarque_bera_normalish_small_vs_uniform_large(spark):
    # a symmetric triangular-ish sample scores far lower than one with a
    # planted heavy tail
    rng = np.random.RandomState(3)
    sym = rng.randint(0, 100, 2000) + rng.randint(0, 100, 2000)
    tail = np.concatenate([rng.randint(0, 100, 1900), np.full(100, 5000)])
    df = spark.createDataFrame(
        [("sym", int(v)) for v in sym] + [("tail", int(v)) for v in tail],
        "g string, v long",
    )
    out = {r["g"]: r["jb"] for r in
           __import__("gridmet_etl_spark.operators.stats",
                      fromlist=["jarque_bera"]).jarque_bera(
               df, "v", group_cols=("g",)).collect()}
    assert out["tail"] > 10 * out["sym"]


def test_jarque_bera_degenerate_constant(spark):
    from gridmet_etl_spark.operators.stats import jarque_bera

    df = spark.createDataFrame([(5,)] * 10, "v long")
    row = jarque_bera(df, "v").collect()[0]
    assert row["jb"] == 0.0 and row["skewness"] == 0.0


def test_brown_forsythe_matches_reference(spark):
    from gridmet_etl_spark.operators.stats import brown_forsythe

    rng = np.random.RandomState(11)
    g = rng.randint(0, 3, 3000)
    vals = np.where(
        g == 0,
        rng.randint(0, 100, 3000),
        np.where(g == 1, rng.randint(0, 200, 3000), rng.randint(50, 60, 3000)),
    )
    df = spark.createDataFrame(
        [(int(a), chr(65 + int(b))) for a, b in zip(vals, g)],
        "v long, g string",
    )
    row = brown_forsythe(df, "v", "g").collect()[0]
    zs = []
    for gg in range(3):
        xv = np.sort(vals[g == gg])
        n = len(xv)
        med2 = xv[(n + 1) // 2 - 1] + xv[n // 2]
        zs.append(np.abs(2 * xv - med2))
    allz = np.concatenate(zs)
    k, n_tot = 3, len(allz)
    gm = allz.mean()
    ssb = sum(len(z) * (z.mean() - gm) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    f_ref = (ssb / (k - 1)) / (ssw / (n_tot - k))
    assert abs(row["f_stat"] - f_ref) < 1e-3 * f_ref
    assert row["k"] == 3 and row["n"] == 3000
    assert row["df1"] == 2 and row["df2"] == 2997


def test_brown_forsythe_equal_spreads_small_f(spark):
    rng = np.random.RandomState(5)
    from gridmet_etl_spark.operators.stats import brown_forsythe

    rows = [(int(v), g) for g in "AB" for v in rng.randint(0, 100, 1000)]
    df = spark.createDataFrame(rows, "v long, g string")
    row = brown_forsythe(df, "v", "g").collect()[0]
    assert row["f_stat"] < 4.0  # same distribution -> F near 1


def test_brown_forsythe_single_group_guard(spark):
    from gridmet_etl_spark.operators.stats import brown_forsythe

    df = spark.createDataFrame([(1, "A"), (2, "A"), (9, "A")], "v long, g string")
    row = brown_forsythe(df, "v", "g").collect()[0]
    assert row["f_stat"] == 0.0 and row["k"] == 1


def test_partial_corr_matches_numpy(spark):
    from gridmet_etl_spark.operators.stats import partial_corr

    rng = np.random.RandomState(13)
    x = rng.randint(0, 100, 2000)
    z = rng.randint(0, 50, 2000)
    y = 2 * x + 3 * z + rng.randint(0, 40, 2000)
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(x, y, z)],
        "x long, y long, z long",
    )
    row = partial_corr(df, "x", "y", "z").collect()[0]

    def r(a, b):
        return np.corrcoef(a, b)[0, 1]

    rxy, rxz, ryz = r(x, y), r(x, z), r(y, z)
    ref = (rxy - rxz * ryz) / np.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert abs(row["r_xy_z"] - ref) < 1e-4
    assert abs(row["r_xy"] - rxy) < 1e-4


def test_partial_corr_confounder_only(spark):
    # x and y both driven by z alone -> raw corr positive, partial ~ 0
    from gridmet_etl_spark.operators.stats import partial_corr

    rng = np.random.RandomState(17)
    z = rng.randint(0, 1000, 4000)
    x = z + rng.randint(0, 200, 4000)
    y = z + rng.randint(0, 200, 4000)
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(x, y, z)],
        "x long, y long, z long",
    )
    row = partial_corr(df, "x", "y", "z").collect()[0]
    assert row["r_xy"] > 0.9
    assert abs(row["r_xy_z"]) < 0.05


# ----------------------------------------------------------- timeseries ----


def test_max_drawdown_matches_numpy(spark):
    from gridmet_etl_spark.operators.timeseries import max_drawdown

    rng = np.random.RandomState(11)
    vals = rng.randint(-100, 120, 200)
    days = _days(200)
    df = spark.createDataFrame(
        [("A", d, int(v)) for d, v in zip(days, vals)],
        "k string, day date, v long",
    )
    row = max_drawdown(df, ["k"], "day", "v").collect()[0]
    cum = np.cumsum(vals)
    peak = np.maximum.accumulate(cum)
    dd = peak - cum
    i = int(np.argmax(dd))
    assert row["max_drawdown"] == dd.max()
    assert row["trough"] == days[i]
    assert row["peak"] == peak[i]
    assert row["final_value"] == cum[-1]
    assert row["n_points"] == 200


def test_max_drawdown_monotone_series_zero(spark):
    from gridmet_etl_spark.operators.timeseries import max_drawdown

    df = spark.createDataFrame(
        [("A", d, 5) for d in _days(30)], "k string, day date, v long"
    )
    row = max_drawdown(df, ["k"], "day", "v").collect()[0]
    assert row["max_drawdown"] == 0
    # first row attains dd=0 -> trough is the first day
    assert row["trough"] == dt.date(2020, 1, 1)


def test_max_drawdown_per_key_isolation(spark):
    from gridmet_etl_spark.operators.timeseries import max_drawdown

    rows = [("U", d, v) for d, v in zip(_days(3), [10, -4, 8])] + [
        ("D", d, v) for d, v in zip(_days(3), [10, -9, -1])
    ]
    df = spark.createDataFrame(rows, "k string, day date, v long")
    out = {r["k"]: r for r in max_drawdown(df, ["k"], "day", "v").collect()}
    assert out["U"]["max_drawdown"] == 4
    assert out["D"]["max_drawdown"] == 10


def test_bollinger_breakouts_matches_numpy(spark):
    from gridmet_etl_spark.operators.timeseries import bollinger_breakouts

    rng = np.random.RandomState(11)
    x = rng.randint(1000, 1100, 300)
    x[50] = 2000
    x[120] = 200
    days = _days(300)
    df = spark.createDataFrame(
        [("A", d, int(v)) for d, v in zip(days, x)],
        "k string, day date, v long",
    )
    got = sorted(
        ((r["day"] - dt.date(2020, 1, 1)).days, r["direction"])
        for r in bollinger_breakouts(df, ["k"], "day", "v").collect()
    )
    ref = []
    for t in range(19, 300):
        wnd = x[t - 19 : t + 1]
        m, s = wnd.mean(), wnd.std(ddof=1)
        if abs(x[t] - m) > 2 * s:
            ref.append((t, 1 if x[t] > m else -1))
    assert got == ref
    assert (50, 1) in got and (120, -1) in got


def test_bollinger_warmup_excluded(spark):
    from gridmet_etl_spark.operators.timeseries import bollinger_breakouts

    # huge jump on day 5: inside the 20-row warm-up, must NOT emit
    vals = [100] * 5 + [9999] + [100] * 30
    df = spark.createDataFrame(
        [("A", d, v) for d, v in zip(_days(len(vals)), vals)],
        "k string, day date, v long",
    )
    out = bollinger_breakouts(df, ["k"], "day", "v").collect()
    assert all((r["day"] - dt.date(2020, 1, 1)).days >= 19 for r in out)


def test_theil_u_matches_numpy(spark):
    from gridmet_etl_spark.operators.timeseries import theil_u_eval

    rng = np.random.RandomState(11)
    y = rng.randint(50, 200, 100)
    df = spark.createDataFrame(
        [(d, int(v)) for d, v in zip(_days(100), y)], "day date, v long"
    )
    rows = {r["lag"]: r for r in theil_u_eval(df, "day", "v", lags=(1, 7)).collect()}
    for lag in (1, 7):
        f = y[:-lag].astype(float)
        yy = y[lag:].astype(float)
        u1 = np.sqrt(((f - yy) ** 2).mean()) / (
            np.sqrt((f**2).mean()) + np.sqrt((yy**2).mean())
        )
        assert abs(rows[lag]["u1"] - u1) < 1e-5
        assert abs(rows[lag]["mae"] - np.abs(f - yy).mean()) < 1e-5
        assert rows[lag]["n"] == 100 - lag


def test_theil_u_perfect_persistence_zero(spark):
    from gridmet_etl_spark.operators.timeseries import theil_u_eval

    df = spark.createDataFrame(
        [(d, 42) for d in _days(50)], "day date, v long"
    )
    row = theil_u_eval(df, "day", "v", lags=(1,)).collect()[0]
    assert row["u1"] == 0.0 and row["rmse"] == 0.0


# --------------------------------------------------------------- profile ----


def test_fd_strength_exact_and_approx(spark):
    from gridmet_etl_spark.operators.profile import fd_strength

    rng = np.random.RandomState(11)
    a = rng.randint(0, 10, 1000)
    b = a // 2  # exact FD a -> b
    c = rng.randint(0, 3, 1000)
    df = spark.createDataFrame(
        [(int(i), int(j), int(k)) for i, j, k in zip(a, b, c)],
        "a long, b long, c long",
    )
    out = {
        (r["determinant"], r["dependent"]): r
        for r in fd_strength(df, [("a", "b"), ("a", "c")]).collect()
    }
    assert out[("a", "b")]["is_exact"] and out[("a", "b")]["strength"] == 1.0
    kept = sum(
        int(np.bincount(c[a == v], minlength=3).max()) for v in range(10)
    )
    assert out[("a", "c")]["n_kept"] == kept
    assert not out[("a", "c")]["is_exact"]
    assert out[("a", "c")]["n_det_values"] == 10


def test_fd_strength_null_determinant_groups(spark):
    from gridmet_etl_spark.operators.profile import fd_strength

    df = spark.createDataFrame(
        [(None, 1), (None, 1), (None, 2), (1, 5)], "a int, b int"
    )
    row = fd_strength(df, [("a", "b")]).collect()[0]
    # NULL det groups like a value: best dep under NULL keeps 2 of 3
    assert row["n_rows"] == 4 and row["n_kept"] == 3
    assert row["n_det_values"] == 2


# ---------------------------------------------------------------- mlprep ----


def test_decision_stump_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.mlprep import decision_stump

    rng = np.random.RandomState(11)
    feat = rng.randint(0, 50, 2000)
    lab = (feat > 23).astype(int)
    flip = rng.rand(2000) < 0.1
    lab[flip] = 1 - lab[flip]
    df = spark.createDataFrame(
        [(int(f), int(lb)) for f, lb in zip(feat, lab)], "f long, y int"
    )
    row = decision_stump(df, "f", "y").collect()[0]

    def tfun(n, p):
        q = n - p
        out = n * np.log(n) if n > 0 else 0.0
        out -= p * np.log(p) if p > 0 else 0.0
        out -= q * np.log(q) if q > 0 else 0.0
        return out

    n_tot, p_tot = len(feat), lab.sum()
    troot = tfun(n_tot, p_tot)
    best = (-1.0, None)
    for v in sorted(set(feat)):
        nl = int((feat <= v).sum())
        pl = int(lab[feat <= v].sum())
        if nl == n_tot:
            continue
        gain = troot - tfun(nl, pl) - tfun(n_tot - nl, p_tot - pl)
        if gain > best[0] + 1e-12:
            best = (gain, v)
    assert row["threshold"] == best[1]
    assert abs(row["gain"] - best[0] / n_tot) < 1e-5
    # accuracy consistency: majority votes from the reported counts
    maj = max(row["pos_left"], row["n_left"] - row["pos_left"]) + max(
        row["pos_right"], row["n_right"] - row["pos_right"]
    )
    assert abs(row["stump_acc"] - maj / n_tot) < 1e-9


def test_decision_stump_pure_split(spark):
    from gridmet_etl_spark.operators.mlprep import decision_stump

    rows = [(i, 0) for i in range(10)] + [(i, 1) for i in range(10, 20)]
    df = spark.createDataFrame(rows, "f long, y int")
    row = decision_stump(df, "f", "y").collect()[0]
    assert row["threshold"] == 9
    assert row["stump_acc"] == 1.0


def test_decision_stump_uninformative_feature(spark):
    from gridmet_etl_spark.operators.mlprep import decision_stump

    # label independent of feature -> tiny gain, tie-break smallest v
    rows = [(v, y) for v in range(5) for y in (0, 1) for _ in range(20)]
    df = spark.createDataFrame(rows, "f long, y int")
    row = decision_stump(df, "f", "y").collect()[0]
    assert row["gain"] == 0.0
    assert row["threshold"] == 0  # deterministic tie-break
