"""Round-9 ext26 structure-discovery tests: numpy references for
granger_lag1, event_trigrams, ripley_k, abc_classification, herfindahl.
"""

import datetime

import numpy as np


def test_granger_detects_planted_lead(spark):
    from gridmet_etl_spark.operators.causal import granger_lag1

    rng = np.random.RandomState(5)
    n = 600
    w = rng.randint(-500, 500, n)  # the leading series
    v = np.empty(n, dtype=int)
    v[0] = 0
    for t in range(1, n):
        v[t] = int(0.3 * v[t - 1] + 0.8 * w[t - 1] + rng.randint(-50, 50))
    rows = [("A", int(v[t]), int(v[t - 1]), int(w[t - 1])) for t in range(1, n)]
    df = spark.createDataFrame(rows, "k string, v long, u long, w long")
    out = granger_lag1(df, ["k"], "v", "u", "w").collect()[0]
    assert out["f_stat"] > 50  # planted cross-lag must be detected
    assert abs(out["beta_cross"] - 0.8) < 0.1
    assert abs(out["beta_ar"] - 0.3) < 0.1


def test_granger_matches_numpy_ols(spark):
    from gridmet_etl_spark.operators.causal import granger_lag1

    rng = np.random.RandomState(8)
    n = 300
    u = rng.randint(-100, 100, n)
    w = rng.randint(-100, 100, n)
    v = rng.randint(-100, 100, n)
    df = spark.createDataFrame(
        [("A", int(a), int(b), int(c)) for a, b, c in zip(v, u, w)],
        "k string, v long, u long, w long",
    )
    out = granger_lag1(df, ["k"], "v", "u", "w").collect()[0]
    Xu = np.column_stack([np.ones(n), u])
    Xuw = np.column_stack([np.ones(n), u, w])
    sse_r = ((v - Xu @ np.linalg.lstsq(Xu, v, rcond=None)[0]) ** 2).sum()
    beta = np.linalg.lstsq(Xuw, v, rcond=None)[0]
    sse_u = ((v - Xuw @ beta) ** 2).sum()
    f_ref = (sse_r - sse_u) / (sse_u / (n - 3))
    assert abs(out["f_stat"] - f_ref) < max(1e-4, 1e-4 * abs(f_ref))
    assert abs(out["beta_ar"] - beta[1]) < 1e-4
    assert abs(out["beta_cross"] - beta[2]) < 1e-4


def test_event_trigrams_counts(spark):
    from gridmet_etl_spark.operators.funnel import event_trigrams

    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(30):
        for i, e in enumerate(["view", "cart", "buy", "view", "cart", "drop"]):
            rows.append((u, d0 + datetime.timedelta(minutes=i), e, eid))
            eid += 1
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, et string, eid long")
    out = {
        (r["e1"], r["e2"], r["e3"]): r["n_paths"]
        for r in event_trigrams(df, "user_id", "ts", "et", "eid").collect()
    }
    # each user contributes 4 trigrams
    assert out[("view", "cart", "buy")] == 30
    assert out[("cart", "buy", "view")] == 30
    assert out[("view", "cart", "drop")] == 30
    assert sum(out.values()) == 30 * 4


def test_ripley_k_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.geo import ripley_k

    rng = np.random.RandomState(4)
    pts = {(int(i), int(j)) for i, j in zip(rng.randint(0, 20, 60), rng.randint(0, 20, 60))}
    df = spark.createDataFrame([(i, j) for i, j in sorted(pts)], "i int, j int")
    out = {r["r"]: r for r in ripley_k(df, max_r=3).collect()}
    arr = sorted(pts)
    nmin_i = min(p[0] for p in pts); nmax_i = max(p[0] for p in pts)
    nmin_j = min(p[1] for p in pts); nmax_j = max(p[1] for p in pts)
    bbox = (nmax_i - nmin_i + 1) * (nmax_j - nmin_j + 1)
    n = len(pts)
    assert set(out) == {1, 2, 3}  # every ring emits a row, even empty ones
    for r in (1, 2, 3):
        pairs = sum(
            1
            for a in arr
            for b in arr
            if a != b and max(abs(a[0] - b[0]), abs(a[1] - b[1])) <= r
        )
        assert out[r]["n_pairs"] == pairs
        assert abs(out[r]["k_est"] - bbox * pairs / (n * n)) < 1e-6


def test_ripley_clustered_exceeds_dispersed(spark):
    from gridmet_etl_spark.operators.geo import ripley_k

    # tight 5x5 blob vs a 5-spaced lattice of the same 25 points
    blob = [(i, j) for i in range(5) for j in range(5)]
    latt = [(5 * i, 5 * j) for i in range(5) for j in range(5)]
    kb = {r["r"]: r["k_est"] for r in ripley_k(
        spark.createDataFrame(blob, "i int, j int"), max_r=2).collect()}
    kl = {r["r"]: r["k_est"] for r in ripley_k(
        spark.createDataFrame(latt, "i int, j int"), max_r=2).collect()}
    assert kb[2] > 0
    assert kl[2] == 0.0  # lattice has no pairs within Chebyshev 2
    assert kl[2] < kb[2]


def test_abc_classification_exact_cuts(spark):
    from gridmet_etl_spark.operators.profile import abc_classification

    # values 100, 50, 30, 10, 5, 5 (total 200): cum 100(50%) A, 150(75%) A,
    # 180(90%) B, 190(95%) B, 195 C, 200 C
    rows = [(1, 100), (2, 50), (3, 30), (4, 10), (5, 5), (6, 5)]
    df = spark.createDataFrame(rows, "k int, v long")
    out = {r["abc_class"]: r for r in abc_classification(df, "k", "v").collect()}
    assert out["A"]["n_keys"] == 2 and out["A"]["value_sum"] == 150.0
    assert out["B"]["n_keys"] == 2 and out["B"]["value_sum"] == 40.0
    assert out["C"]["n_keys"] == 2 and out["C"]["value_sum"] == 10.0
    assert abs(out["A"]["value_share"] - 0.75) < 1e-9


def test_herfindahl_matches_numpy(spark):
    from gridmet_etl_spark.operators.profile import herfindahl

    rng = np.random.RandomState(7)
    rows = [("g", int(m), int(v)) for m, v in zip(rng.randint(0, 40, 500), rng.randint(1, 1000, 500))]
    df = spark.createDataFrame(rows, "g string, m int, v long")
    out = herfindahl(df, ["g"], "m", "v").collect()[0]
    sums = {}
    for _, m, v in rows:
        sums[m] = sums.get(m, 0) + v
    vals = np.array(list(sums.values()), float)
    hhi_ref = (vals**2).sum() / vals.sum() ** 2
    assert out["n_members"] == len(sums)
    assert abs(out["hhi"] - hhi_ref) < 1e-6  # output rounds at 6 decimals
    assert abs(out["effective_n"] - 1 / hhi_ref) < 1e-4
    assert abs(out["top_share"] - vals.max() / vals.sum()) < 1e-6


def test_herfindahl_monopoly_is_one(spark):
    from gridmet_etl_spark.operators.profile import herfindahl

    df = spark.createDataFrame([("g", 1, 500)] * 3, "g string, m int, v long")
    out = herfindahl(df, ["g"], "m", "v").collect()[0]
    assert out["hhi"] == 1.0 and out["n_members"] == 1
