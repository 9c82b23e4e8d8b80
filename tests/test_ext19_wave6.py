"""Round-8 ext19 operator tests: numpy references for anova_oneway,
bartlett_test, and morans_i.
"""

import numpy as np
import pytest


def test_anova_matches_numpy(spark):
    from gridmet_etl_spark.operators.stats import anova_oneway

    rng = np.random.RandomState(5)
    g = rng.randint(0, 3, 3000)
    vals = rng.randint(0, 100, 3000) + g * 5
    df = spark.createDataFrame(
        [(int(v), chr(65 + int(b))) for v, b in zip(vals, g)],
        "v long, g string",
    )
    r = anova_oneway(df, "v", "g").collect()[0]
    groups = [vals[g == i] for i in range(3)]
    gm = vals.mean()
    ssb = sum(len(x) * (x.mean() - gm) ** 2 for x in groups)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in groups)
    f_ref = (ssb / 2) / (ssw / (3000 - 3))
    assert abs(r["f_stat"] - f_ref) < 1e-3 * f_ref
    assert abs(r["eta_sq"] - ssb / (ssb + ssw)) < 1e-5
    assert (r["k"], r["df1"], r["df2"]) == (3, 2, 2997)


def test_anova_vs_scipy(spark):
    scipy_stats = pytest.importorskip("scipy.stats")
    from gridmet_etl_spark.operators.stats import anova_oneway

    rng = np.random.RandomState(9)
    g = rng.randint(0, 4, 2000)
    vals = rng.randint(0, 50, 2000) + g * 3
    df = spark.createDataFrame(
        [(int(v), int(b)) for v, b in zip(vals, g)], "v long, g int"
    )
    r = anova_oneway(df, "v", "g").collect()[0]
    ref = scipy_stats.f_oneway(*[vals[g == i] for i in range(4)]).statistic
    assert abs(r["f_stat"] - ref) < 1e-3 * ref


def test_anova_equal_means_small_f(spark):
    from gridmet_etl_spark.operators.stats import anova_oneway

    rng = np.random.RandomState(7)
    rows = [(int(v), g) for g in "ABC" for v in rng.randint(0, 100, 1000)]
    df = spark.createDataFrame(rows, "v long, g string")
    r = anova_oneway(df, "v", "g").collect()[0]
    assert r["f_stat"] < 5.0
    assert r["eta_sq"] < 0.01


def test_bartlett_matches_reference(spark):
    from gridmet_etl_spark.operators.stats import bartlett_test

    rng = np.random.RandomState(5)
    g = rng.randint(0, 3, 3000)
    vals = np.where(
        g == 0,
        rng.randint(0, 50, 3000),
        np.where(g == 1, rng.randint(0, 200, 3000), rng.randint(0, 100, 3000)),
    )
    df = spark.createDataFrame(
        [(int(v), chr(65 + int(b))) for v, b in zip(vals, g)],
        "v long, g string",
    )
    r = bartlett_test(df, "v", "g").collect()[0]
    groups = [vals[g == i] for i in range(3)]
    n_tot, k = 3000, 3
    sp2 = sum(((x - x.mean()) ** 2).sum() for x in groups) / (n_tot - k)
    num = (n_tot - k) * np.log(sp2) - sum(
        (len(x) - 1) * np.log(x.var(ddof=1)) for x in groups
    )
    corr = 1 + (sum(1 / (len(x) - 1) for x in groups) - 1 / (n_tot - k)) / (
        3 * (k - 1)
    )
    assert abs(r["chi2"] - num / corr) < 1e-3 * abs(num / corr)
    assert r["df"] == 2


def test_bartlett_vs_scipy(spark):
    scipy_stats = pytest.importorskip("scipy.stats")
    from gridmet_etl_spark.operators.stats import bartlett_test

    rng = np.random.RandomState(11)
    g = rng.randint(0, 3, 1500)
    vals = rng.randint(0, 100 + 0, 1500) * (1 + g)
    df = spark.createDataFrame(
        [(int(v), int(b)) for v, b in zip(vals, g)], "v long, g int"
    )
    r = bartlett_test(df, "v", "g").collect()[0]
    ref = scipy_stats.bartlett(*[vals[g == i] for i in range(3)]).statistic
    assert abs(r["chi2"] - ref) < 1e-3 * ref


def test_bartlett_equal_variances_small(spark):
    from gridmet_etl_spark.operators.stats import bartlett_test

    rng = np.random.RandomState(3)
    rows = [(int(v), g) for g in "AB" for v in rng.randint(0, 100, 1000)]
    df = spark.createDataFrame(rows, "v long, g string")
    r = bartlett_test(df, "v", "g").collect()[0]
    assert abs(r["chi2"]) < 6.0  # chi2(1), same distribution


def test_morans_i_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.geo import morans_i

    rng = np.random.RandomState(5)
    n = 20
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    field = (ii // 5 + jj // 5) * 100 + rng.randint(0, 20, (n, n))
    rows = [
        (int(a), int(b), int(field[a, b]))
        for a in range(n)
        for b in range(n)
    ]
    df = spark.createDataFrame(rows, "i int, j int, value long")
    r = morans_i(df).collect()[0]
    x = field.astype(float)
    m = x.mean()
    num, e_cnt = 0.0, 0
    for a in range(n):
        for b in range(n):
            if a + 1 < n:
                num += (x[a, b] - m) * (x[a + 1, b] - m)
                e_cnt += 1
            if b + 1 < n:
                num += (x[a, b] - m) * (x[a, b + 1] - m)
                e_cnt += 1
    i_ref = (n * n / (2 * e_cnt)) * (2 * num) / ((x - m) ** 2).sum()
    assert r["n_edges"] == e_cnt
    assert abs(r["i_moran"] - i_ref) < 1e-5
    assert r["i_moran"] > 0.8  # planted blocks -> strong clustering


def test_morans_i_checkerboard_negative(spark):
    from gridmet_etl_spark.operators.geo import morans_i

    n = 10
    rows = [
        (a, b, 100 if (a + b) % 2 == 0 else 0)
        for a in range(n)
        for b in range(n)
    ]
    df = spark.createDataFrame(rows, "i int, j int, value long")
    r = morans_i(df).collect()[0]
    assert r["i_moran"] == -1.0  # perfect alternation


def test_morans_i_missing_cells_drop_edges(spark):
    from gridmet_etl_spark.operators.geo import morans_i

    # 2x2 grid with one corner missing: only 2 rook edges remain
    rows = [(0, 0, 5), (0, 1, 7), (1, 0, 9)]
    df = spark.createDataFrame(rows, "i int, j int, value long")
    r = morans_i(df).collect()[0]
    assert r["n"] == 3 and r["n_edges"] == 2
