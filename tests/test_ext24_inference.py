"""Round-9 ext24 inference-completion tests: scipy/numpy references for
dunn_posthoc, kendall_w, cochran_armitage, and cohens_d.
"""

import numpy as np
import pytest


def _rankdata(x):
    # average ranks, numpy-only
    x = np.asarray(x)
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), float)
    sx = x[order]
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def test_dunn_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.stats import dunn_posthoc

    rng = np.random.RandomState(3)
    g = rng.randint(0, 3, 900)
    x = rng.randint(0, 60, 900) + g * 4
    df = spark.createDataFrame(
        [(int(v), chr(65 + int(b))) for v, b in zip(x, g)], "v long, g string"
    )
    out = {(r["g1"], r["g2"]): r for r in dunn_posthoc(df, "v", "g").collect()}
    ranks = _rankdata(x)
    n = len(x)
    _, t = np.unique(x, return_counts=True)
    var = n * (n + 1) / 12 - (t**3 - t).sum() / (12 * (n - 1))
    for a, b in [(0, 1), (0, 2), (1, 2)]:
        ra, rb = ranks[g == a].mean(), ranks[g == b].mean()
        na, nb = (g == a).sum(), (g == b).sum()
        z = (ra - rb) / np.sqrt(var * (1 / na + 1 / nb))
        row = out[(chr(65 + a), chr(65 + b))]
        assert row["n1"] == na and row["n2"] == nb
        assert abs(row["mean_rank_1"] - ra) < 1e-6
        assert abs(row["z_dunn"] - z) < 1e-6


def test_kendall_w_perfect_and_random(spark):
    from gridmet_etl_spark.operators.stats import kendall_w

    # perfect agreement: every rater gives identical item values -> W = 1
    rows = [(r, i, i * 10) for r in range(8) for i in range(5)]
    df = spark.createDataFrame(rows, "rater int, item int, v long")
    out = kendall_w(df, "rater", "item", "v").collect()[0]
    assert out["m"] == 8 and out["n"] == 5
    assert abs(out["w"] - 1.0) < 1e-9
    assert abs(out["chi2"] - 8 * 4 * 1.0) < 1e-6
    # rotating ranking (latin square): rank sums all equal -> W = 0
    rows = [(r, i, ((i + r) % 5) * 10) for r in range(5) for i in range(5)]
    df = spark.createDataFrame(rows, "rater int, item int, v long")
    out = kendall_w(df, "rater", "item", "v").collect()[0]
    assert abs(out["w"]) < 1e-9


def test_kendall_w_matches_formula_with_ties(spark):
    from gridmet_etl_spark.operators.stats import kendall_w

    rng = np.random.RandomState(9)
    m, n = 12, 6
    vals = rng.randint(0, 5, (m, n))  # heavy ties
    rows = [(r, i, int(vals[r, i])) for r in range(m) for i in range(n)]
    df = spark.createDataFrame(rows, "rater int, item int, v long")
    out = kendall_w(df, "rater", "item", "v").collect()[0]
    ranks = np.vstack([_rankdata(vals[r]) for r in range(m)])
    rsum = ranks.sum(axis=0)
    s = ((rsum - m * (n + 1) / 2) ** 2).sum()
    tt = 0.0
    for r in range(m):
        _, t = np.unique(vals[r], return_counts=True)
        tt += (t**3 - t).sum()
    w_ref = 12 * s / (m * m * (n**3 - n) - m * tt)
    assert abs(out["w"] - w_ref) < 1e-6


def test_cochran_armitage_matches_scipy_shape(spark):
    from gridmet_etl_spark.operators.stats import cochran_armitage

    rng = np.random.RandomState(4)
    score = rng.randint(1, 6, 3000)
    p = 0.2 + 0.1 * score  # real upward trend
    y = (rng.rand(3000) < p).astype(int)
    df = spark.createDataFrame(
        [(int(s), int(v)) for s, v in zip(score, y)], "s long, y long"
    )
    out = cochran_armitage(df, "s", "y").collect()[0]
    N, Rr = 3000, y.sum()
    ssr = (score * y).sum()
    ssn = score.sum()
    ss2n = (score * score).sum()
    num = N * ssr - Rr * ssn
    den = Rr * (N - Rr) * (N * ss2n - ssn * ssn)
    z_ref = np.sign(num) * np.sqrt(N * num * num / den)
    assert out["n"] == N and out["n_success"] == Rr
    assert abs(out["z"] - z_ref) < 1e-6
    assert out["z"] > 5  # the planted trend is strong


def test_cochran_armitage_no_trend_small_z(spark):
    from gridmet_etl_spark.operators.stats import cochran_armitage

    rng = np.random.RandomState(11)
    score = rng.randint(1, 6, 4000)
    y = (rng.rand(4000) < 0.4).astype(int)
    df = spark.createDataFrame(
        [(int(s), int(v)) for s, v in zip(score, y)], "s long, y long"
    )
    out = cochran_armitage(df, "s", "y").collect()[0]
    assert abs(out["z"]) < 3.5


def test_cohens_d_matches_numpy(spark):
    from gridmet_etl_spark.operators.stats import cohens_d

    rng = np.random.RandomState(6)
    a = rng.randint(100, 200, 500)
    b = rng.randint(120, 220, 700)
    rows = [(int(v), "A") for v in a] + [(int(v), "B") for v in b]
    df = spark.createDataFrame(rows, "v long, g string")
    out = cohens_d(df, "v", "g", "A", "B").collect()[0]
    sp2 = ((len(a) - 1) * a.var(ddof=1) + (len(b) - 1) * b.var(ddof=1)) / (
        len(a) + len(b) - 2
    )
    d_ref = (a.mean() - b.mean()) / np.sqrt(sp2)
    g_ref = d_ref * (1 - 3 / (4 * (len(a) + len(b)) - 9))
    assert out["n1"] == 500 and out["n2"] == 700
    assert abs(out["mean1"] - a.mean()) < 1e-6
    assert abs(out["d"] - d_ref) < 1e-6
    assert abs(out["hedges_g"] - g_ref) < 1e-6


def test_cohens_d_vs_scipy_pooled(spark):
    scipy_stats = pytest.importorskip("scipy.stats")
    from gridmet_etl_spark.operators.stats import cohens_d

    rng = np.random.RandomState(2)
    a = rng.randint(0, 100, 300)
    b = rng.randint(30, 130, 300)
    rows = [(int(v), "A") for v in a] + [(int(v), "B") for v in b]
    df = spark.createDataFrame(rows, "v long, g string")
    out = cohens_d(df, "v", "g", "A", "B").collect()[0]
    # equal-n: t = d * sqrt(n/2)
    t_ref = scipy_stats.ttest_ind(a, b).statistic
    assert abs(out["d"] * np.sqrt(300 / 2) - t_ref) < 1e-6
