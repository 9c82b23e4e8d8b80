"""Round-8 ext17 operator tests: numpy/brute-force references for
mann_kendall, cramer_von_mises, and vocab_coverage.
"""

import datetime as dt
from collections import Counter

import numpy as np
import pytest


def _days(n, start=dt.date(2015, 1, 1)):
    return [start + dt.timedelta(days=i) for i in range(n)]


def test_mann_kendall_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.stats import mann_kendall

    rng = np.random.RandomState(5)
    x = rng.randint(0, 50, 200) + np.arange(200) // 10
    df = spark.createDataFrame(
        [(d, int(v)) for d, v in zip(_days(200), x)], "day date, v long"
    )
    row = mann_kendall(df, "day", "v").collect()[0]
    s = sum(
        int(np.sign(x[j] - x[i]))
        for i in range(200)
        for j in range(i + 1, 200)
    )
    ties = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(x.tolist()).values()
    )
    n = 200
    var = (n * (n - 1) * (2 * n + 5) - ties) / 18
    z = (s - 1) / np.sqrt(var) if s > 0 else (s + 1) / np.sqrt(var) if s < 0 else 0.0
    assert row["s"] == s
    assert abs(row["var_s"] - var) < 1e-3
    assert abs(row["z"] - z) < 1e-5


def test_mann_kendall_monotone_series(spark):
    from gridmet_etl_spark.operators.stats import mann_kendall

    n = 50
    df = spark.createDataFrame(
        [(d, i) for i, d in enumerate(_days(n))], "day date, v long"
    )
    row = mann_kendall(df, "day", "v").collect()[0]
    assert row["s"] == n * (n - 1) // 2  # every pair concordant
    assert row["z"] > 5.0


def test_mann_kendall_constant_series(spark):
    from gridmet_etl_spark.operators.stats import mann_kendall

    df = spark.createDataFrame(
        [(d, 7) for d in _days(30)], "day date, v long"
    )
    row = mann_kendall(df, "day", "v").collect()[0]
    assert row["s"] == 0 and row["z"] == 0.0 and row["var_s"] == 0.0


def test_cramer_von_mises_matches_reference(spark):
    from gridmet_etl_spark.operators.stats import cramer_von_mises

    rng = np.random.RandomState(5)
    xa = rng.randint(0, 100, 300)
    yb = rng.randint(10, 110, 400)
    rows = [(int(v), "A") for v in xa] + [(int(v), "B") for v in yb]
    df = spark.createDataFrame(rows, "v long, g string")
    row = cramer_von_mises(df, "v", "g").collect()[0]
    n, m = 300, 400
    u = 0
    for v in sorted(set(xa.tolist() + yb.tolist())):
        a = int((xa == v).sum())
        b = int((yb == v).sum())
        ca = int((xa <= v).sum())
        cb = int((yb <= v).sum())
        u += (a + b) * (ca * m - cb * n) ** 2
    t = u / (n * m * (n + m) ** 2)
    assert abs(row["t_stat"] - t) < 1e-6
    assert row["n"] == n and row["m"] == m


def test_cramer_von_mises_vs_scipy(spark):
    scipy_stats = pytest.importorskip("scipy.stats")
    from gridmet_etl_spark.operators.stats import cramer_von_mises

    rng = np.random.RandomState(9)
    # continuous-ish (few ties): the count form equals scipy's statistic
    xa = rng.randint(0, 100_000, 150)
    yb = rng.randint(20_000, 120_000, 200)
    rows = [(int(v), "A") for v in xa] + [(int(v), "B") for v in yb]
    df = spark.createDataFrame(rows, "v long, g string")
    row = cramer_von_mises(df, "v", "g").collect()[0]
    ref = scipy_stats.cramervonmises_2samp(
        xa, yb, method="asymptotic"
    ).statistic
    assert abs(row["t_stat"] - ref) < 2e-3  # scipy adds a -(4mn-1)/(6(m+n))-
    # style small-sample adjustment absent from the pure EDF form


def test_cramer_von_mises_identical_samples_zero(spark):
    from gridmet_etl_spark.operators.stats import cramer_von_mises

    rows = [(v, g) for g in ("A", "B") for v in range(50)]
    df = spark.createDataFrame(rows, "v long, g string")
    row = cramer_von_mises(df, "v", "g").collect()[0]
    assert row["t_stat"] == 0.0


def test_cramer_von_mises_rejects_bad_groups(spark):
    from gridmet_etl_spark.operators.stats import cramer_von_mises

    df = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "v long, g string"
    )
    with pytest.raises(ValueError, match="2 groups"):
        cramer_von_mises(df, "v", "g")


def test_vocab_coverage_matches_counter(spark):
    from gridmet_etl_spark.operators.textops import vocab_coverage

    docs = ["a b c a", "b d e", "f", "a g g h"]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    row = vocab_coverage(df).collect()[0]
    c = Counter(" ".join(docs).split())
    f1 = sum(1 for v in c.values() if v == 1)
    f2 = sum(1 for v in c.values() if v == 2)
    d_types, n = len(c), sum(c.values())
    assert row["n_types"] == d_types and row["n_tokens"] == n
    assert row["f1"] == f1 and row["f2"] == f2
    assert abs(row["chao1"] - (d_types + f1 * (f1 - 1) / (2 * (f2 + 1)))) < 1e-6
    assert abs(row["unseen_mass"] - f1 / n) < 1e-6
    assert abs(row["coverage"] - (1 - f1 / n)) < 1e-6


def test_vocab_coverage_saturated_corpus(spark):
    # every type seen many times: f1 = 0 -> chao1 = D, coverage = 1
    from gridmet_etl_spark.operators.textops import vocab_coverage

    df = spark.createDataFrame([("x y z x y z x y z",)] * 5, "text string")
    row = vocab_coverage(df).collect()[0]
    assert row["f1"] == 0
    assert row["chao1"] == row["n_types"] == 3
    assert row["coverage"] == 1.0 and row["unseen_mass"] == 0.0


def test_vocab_coverage_all_singletons(spark):
    # every type seen once: maximal unseen mass, chao1 explodes past D
    from gridmet_etl_spark.operators.textops import vocab_coverage

    df = spark.createDataFrame([("a b c d e f",)], "text string")
    row = vocab_coverage(df).collect()[0]
    assert row["f1"] == 6 and row["f2"] == 0
    assert row["unseen_mass"] == 1.0
    assert row["chao1"] == 6 + 6 * 5 / 2
