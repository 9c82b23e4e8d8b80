"""Round-9 ext25 monitoring/eval operator tests: numpy references for
hdr_quantiles, control_chart_rules, err_at_k, and mcc_confusion.
"""

import datetime

import numpy as np


def test_hdr_quantiles_error_bound(spark):
    from gridmet_etl_spark.operators.sketch import hdr_quantiles

    rng = np.random.RandomState(3)
    # heavy-tailed positive ints across many octaves
    x = (np.exp(rng.rand(20000) * 12) + 1).astype(np.int64)
    df = spark.createDataFrame([(int(v),) for v in x], "v long")
    out = {r["q"]: r for r in hdr_quantiles(df, "v").collect()}
    for q in (0.5, 0.9, 0.99, 0.999):
        exact = np.sort(x)[int(np.ceil(q * len(x))) - 1]
        est = out[q]["est"]
        assert abs(est - exact) / exact <= 1.0 / 32 + 1e-9, (q, est, exact)
        assert out[q]["n"] == len(x)


def test_hdr_bucket_arithmetic_exact(spark):
    from gridmet_etl_spark.operators.sketch import hdr_quantiles

    # all mass in one known bucket: x = 48..49 -> e=5, s = floor(x*16/32)-16
    df = spark.createDataFrame([(48,)] * 10, "v long")
    r = hdr_quantiles(df, "v", qs=(0.5,)).collect()[0]
    assert r["bucket_e"] == 5
    assert r["bucket_s"] == 48 * 16 // 32 - 16  # = 8
    assert abs(r["est"] - 32 * (1 + 8.5 / 16)) < 1e-9


def test_control_chart_rule1_and_rule4(spark):
    from gridmet_etl_spark.operators.timeseries import control_chart_rules

    d0 = datetime.date(2024, 1, 1)
    # stable series with one huge spike and a sustained shift
    v = [100, 101, 99, 100, 102, 98, 100, 101, 99, 100,
         300,                                  # spike -> rule 1
         100, 99, 101, 100,
         110, 110, 110, 110, 110, 110, 110, 110]  # 8 same side -> rule 4
    rows = [("A", d0 + datetime.timedelta(days=i), int(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, "k string, day date, v long")
    out = {r["day"]: r for r in control_chart_rules(df, ["k"], "day", "v").collect()}
    spike_day = d0 + datetime.timedelta(days=10)
    assert out[spike_day]["r1"] == 1
    last_day = d0 + datetime.timedelta(days=22)
    assert out[last_day]["r4"] == 1


def test_control_chart_matches_numpy_z(spark):
    from gridmet_etl_spark.operators.timeseries import control_chart_rules

    rng = np.random.RandomState(7)
    v = rng.randint(80, 120, 60)
    v[30] = 400
    d0 = datetime.date(2024, 1, 1)
    rows = [("A", d0 + datetime.timedelta(days=i), int(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, "k string, day date, v long")
    out = {r["day"]: r for r in control_chart_rules(df, ["k"], "day", "v").collect()}
    mu, sd = v.mean(), v.std(ddof=1)
    day = d0 + datetime.timedelta(days=30)
    assert abs(out[day]["z"] - (v[30] - mu) / sd) < 1e-6
    assert out[day]["r1"] == 1


def test_err_at_k_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.scoring import err_at_k

    grades = {1: [2, 0, 1, 0, 2], 2: [0, 0, 0, 0, 0], 3: [2, 2, 2, 2, 2]}
    rows = [(q, r + 1, g) for q, gs in grades.items() for r, g in enumerate(gs)]
    df = spark.createDataFrame(rows, "q int, rank int, grade int")
    out = {r["q"]: r["err"] for r in err_at_k(df, "q", "rank", "grade").collect()}
    for q, gs in grades.items():
        err, prior = 0.0, 1.0
        for r, g in enumerate(gs, start=1):
            stop = (2**g - 1) / 4.0
            err += prior * stop / r
            prior *= 1 - stop
        assert abs(out[q] - err) < 1e-6
    assert out[2] == 0.0
    assert out[3] > out[1] > out[2]


def test_mcc_matches_numpy(spark):
    from gridmet_etl_spark.operators.scoring import mcc_confusion

    rng = np.random.RandomState(5)
    y = rng.randint(0, 2, 2000)
    p = np.where(rng.rand(2000) < 0.7, y, 1 - y)  # 70% agreement
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(y, p)], "y int, p int"
    )
    out = mcc_confusion(df, "y", "p").collect()[0]
    tp = int(((y == 1) & (p == 1)).sum())
    fp = int(((y == 0) & (p == 1)).sum())
    tn = int(((y == 0) & (p == 0)).sum())
    fn = int(((y == 1) & (p == 0)).sum())
    mcc_ref = (tp * tn - fp * fn) / np.sqrt(
        float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert (out["tp"], out["fp"], out["tn"], out["fn"]) == (tp, fp, tn, fn)
    assert abs(out["mcc"] - mcc_ref) < 1e-6
    assert abs(out["accuracy"] - (tp + tn) / 2000) < 1e-9


def test_mcc_perfect_and_inverted(spark):
    from gridmet_etl_spark.operators.scoring import mcc_confusion

    y = [0, 1] * 50
    df = spark.createDataFrame([(a, a) for a in y], "y int, p int")
    assert mcc_confusion(df, "y", "p").collect()[0]["mcc"] == 1.0
    df = spark.createDataFrame([(a, 1 - a) for a in y], "y int, p int")
    assert mcc_confusion(df, "y", "p").collect()[0]["mcc"] == -1.0
