"""Round-8 ext15 operator tests: brute-force/numpy references and
degenerate-input guards for clustering_coefficient, slope_one,
rdd_estimate, iv_wald, nelson_aalen, hurst_exponent, and
brier_decomposition. References are textbook definitions.
"""

import datetime as dt

import numpy as np


def _days(n, start=dt.date(2015, 1, 1)):
    return [start + dt.timedelta(days=i) for i in range(n)]


# ----------------------------------------------------------------- graph ----


def test_clustering_coefficient_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.graph import clustering_coefficient

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        r["node"]: (r["degree"], r["n_triangles"], r["coeff"])
        for r in clustering_coefficient(df).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            assert v not in out  # degree-1 nodes excluded
            continue
        t = sum(1 for x in nb for y in nb if x < y and y in adj[x])
        assert out[v] == (d, t, round(2 * t / (d * (d - 1)), 6)), v


def test_clustering_coefficient_clique_and_star(spark):
    from gridmet_etl_spark.operators.graph import clustering_coefficient

    # K4: every node coeff 1.0; star S4 center: coeff 0.0
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    star = [(100, 101), (100, 102), (100, 103)]
    df = spark.createDataFrame(k4 + star, "src long, dst long")
    out = {r["node"]: r["coeff"] for r in clustering_coefficient(df).collect()}
    for i in range(4):
        assert out[i] == 1.0
    assert out[100] == 0.0  # star center, no closed wedges
    assert 101 not in out  # leaves have degree 1


def test_clustering_coefficient_random_graph(spark):
    from gridmet_etl_spark.operators.graph import clustering_coefficient

    rng = np.random.RandomState(7)
    n = 40
    edges = [
        (int(i), int(j))
        for i in range(n)
        for j in range(i + 1, n)
        if rng.rand() < 0.15
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        r["node"]: (r["degree"], r["n_triangles"], r["coeff"])
        for r in clustering_coefficient(df).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        t = sum(1 for x in nb for y in nb if x < y and y in adj[x])
        assert out[v] == (d, t, round(2 * t / (d * (d - 1)), 6)), v


# ------------------------------------------------------------- recommend ----


def test_slope_one_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.recommend import slope_one

    rng = np.random.RandomState(3)
    rows = []
    for u in range(12):
        for i in rng.choice(6, size=rng.randint(2, 5), replace=False):
            rows.append((u, int(i), int(rng.randint(1, 10))))
    rdf = spark.createDataFrame(rows, "u long, i long, r long")
    got = {
        (r["user"], r["item"]): (r["pred"], r["denom"], r["n_pairs"])
        for r in slope_one(rdf, "u", "i", "r").collect()
    }
    ratings = {(u, i): r for u, i, r in rows}
    users = sorted({u for u, _, _ in rows})
    items = sorted({i for _, i, _ in rows})

    def co(j, i):
        num = c = 0
        for u in users:
            if (u, j) in ratings and (u, i) in ratings:
                num += ratings[(u, j)] - ratings[(u, i)]
                c += 1
        return num, c

    ref = {}
    for u in users:
        rated = [i for i in items if (u, i) in ratings]
        for j in items:
            if (u, j) in ratings:
                continue
            numer = den = npair = 0
            for i in rated:
                num, c = co(j, i)
                if c == 0:
                    continue
                numer += num + c * ratings[(u, i)]
                den += c
                npair += 1
            if den > 0:
                ref[(u, j)] = (round(numer / den, 6), den, npair)
    assert got == ref


def test_slope_one_textbook_example(spark):
    # canonical Slope One example: users A(I:1, II:1.5->use ints x2),
    # here: A rates i1=2,i2=3; B rates i1=4; predict B's i2 = 4 + (3-2) = 5
    from gridmet_etl_spark.operators.recommend import slope_one

    df = spark.createDataFrame(
        [("A", 1, 2), ("A", 2, 3), ("B", 1, 4)], "u string, i long, r long"
    )
    out = slope_one(df, "u", "i", "r").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["user"], r["item"], r["pred"]) == ("B", 2, 5.0)


# ---------------------------------------------------------------- causal ----


def test_rdd_estimate_matches_numpy(spark):
    from gridmet_etl_spark.operators.causal import rdd_estimate

    rng = np.random.RandomState(3)
    x = rng.randint(-1000, 1000, 5000)
    y = (
        np.where(x >= 0, 50 + 0.02 * x, 20 + 0.01 * x)
        + rng.randint(0, 10, 5000)
    ).astype(int)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], "run long, y long"
    )
    row = rdd_estimate(df, "run", "y", cutoff=0, bandwidth=500).collect()[0]

    def fit(mask):
        xs, ys = x[mask].astype(float), y[mask].astype(float)
        return np.linalg.lstsq(
            np.vstack([np.ones_like(xs), xs]).T, ys, rcond=None
        )[0]

    bl, sl = fit((x >= -500) & (x < 0))
    br, sr = fit((x >= 0) & (x <= 500))
    assert abs(row["effect"] - (br - bl)) < 1e-4
    assert abs(row["slope_left"] - sl) < 1e-6
    assert abs(row["slope_right"] - sr) < 1e-6
    assert row["n_left"] == int(((x >= -500) & (x < 0)).sum())


def test_rdd_estimate_empty_side_guard(spark):
    from gridmet_etl_spark.operators.causal import rdd_estimate

    df = spark.createDataFrame([(5, 1), (10, 2), (20, 3)], "run long, y long")
    row = rdd_estimate(df, "run", "y", cutoff=0, bandwidth=100).collect()[0]
    assert row["n_left"] == 0
    assert row["intercept_left"] == 0.0 and row["slope_left"] == 0.0


def test_iv_wald_matches_numpy(spark):
    from gridmet_etl_spark.operators.causal import iv_wald

    rng = np.random.RandomState(5)
    z = rng.randint(0, 2, 4000)
    t = ((z == 1) & (rng.rand(4000) < 0.8)) | (
        (z == 0) & (rng.rand(4000) < 0.2)
    )
    y = 10 + 5 * t.astype(int) + rng.randint(0, 5, 4000)
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(z, t, y)],
        "z int, t int, y long",
    )
    row = iv_wald(df, "z", "t", "y").collect()[0]
    iy = y[z == 1].mean() - y[z == 0].mean()
    it = t[z == 1].mean() - t[z == 0].mean()
    assert abs(row["late"] - iy / it) < 1e-4
    assert abs(row["itt_y"] - iy) < 1e-5
    assert abs(row["itt_t"] - it) < 1e-5


def test_iv_wald_weak_instrument_null(spark):
    from gridmet_etl_spark.operators.causal import iv_wald

    # t independent of z with identical arm means -> first stage exactly 0
    rows = [(0, 0, 5), (0, 1, 7), (1, 0, 6), (1, 1, 8)]
    df = spark.createDataFrame(rows, "z int, t int, y long")
    row = iv_wald(df, "z", "t", "y").collect()[0]
    assert row["itt_t"] == 0.0 and row["late"] is None


def test_iv_wald_degenerate_single_arm(spark):
    from gridmet_etl_spark.operators.causal import iv_wald

    df = spark.createDataFrame([(1, 1, 5), (1, 0, 3)], "z int, t int, y long")
    row = iv_wald(df, "z", "t", "y").collect()[0]
    assert row["itt_y"] == 0.0 and row["itt_t"] == 0.0 and row["late"] is None


# ----------------------------------------------------------------- stats ----


def test_nelson_aalen_matches_manual(spark):
    from gridmet_etl_spark.operators.stats import nelson_aalen

    rng = np.random.RandomState(5)
    dur = rng.randint(1, 30, 500)
    ev = (rng.rand(500) < 0.7).astype(int)
    df = spark.createDataFrame(
        [(int(d), int(e)) for d, e in zip(dur, ev)], "d long, e int"
    )
    rows = nelson_aalen(df, [], "d", "e").orderBy("t").collect()
    h = v = 0.0
    ref = []
    for t in sorted(set(dur)):
        n_risk = int((dur >= t).sum())
        d = int(ev[dur == t].sum())
        h += d / n_risk
        v += d / n_risk**2
        if d > 0:
            ref.append((t, n_risk, d, round(h, 6), round(v, 6)))
    got = [(r["t"], r["n_risk"], r["d"], r["cumhaz"], r["var"]) for r in rows]
    assert got == ref


def test_nelson_aalen_vs_kaplan_meier_diagnostic(spark):
    # H(t) <= -ln S(t) pointwise: H sums d/n while -ln S sums -ln(1 - d/n),
    # and x <= -ln(1-x) termwise
    from gridmet_etl_spark.operators.stats import kaplan_meier, nelson_aalen

    rng = np.random.RandomState(9)
    dur = rng.randint(1, 20, 300)
    ev = (rng.rand(300) < 0.8).astype(int)
    df = spark.createDataFrame(
        [(int(d), int(e)) for d, e in zip(dur, ev)], "d long, e int"
    )
    na = {r["t"]: r["cumhaz"] for r in nelson_aalen(df, [], "d", "e").collect()}
    km = {r["t"]: r["surv"] for r in kaplan_meier(df, [], "d", "e").collect()}
    for t, s in km.items():
        if s > 0:
            assert na[t] <= -np.log(s) + 1e-6


# ------------------------------------------------------------- timeseries ----


def test_hurst_rs_matches_numpy_per_block(spark):
    from gridmet_etl_spark.operators.timeseries import hurst_exponent

    rng = np.random.RandomState(5)
    n = 2048
    x = rng.randint(-5, 6, n)
    days = _days(n)
    df = spark.createDataFrame(
        [(d, int(v)) for d, v in zip(days, x)], "day date, v long"
    )
    out = hurst_exponent(df, "day", "v").collect()
    by_size = {r["block_size"]: r for r in out}
    for m in (16, 64):
        blocks = x[: (n // m) * m].reshape(-1, m).astype(float)
        rs = []
        for blk in blocks:
            ycum = np.cumsum(blk - blk.mean())
            s = blk.std(ddof=0)
            if s > 0:
                rs.append((ycum.max() - ycum.min()) / s)
        assert abs(by_size[m]["rs_mean"] - np.mean(rs)) < 1e-3
        assert by_size[m]["n_blocks"] == len(rs)


def test_hurst_persistent_exceeds_iid(spark):
    from gridmet_etl_spark.operators.timeseries import hurst_exponent

    rng = np.random.RandomState(5)
    n = 2048
    days = _days(n)
    iid = rng.randint(-5, 6, n)
    runs = np.repeat(rng.choice([-3, 3], n // 64), 64) + rng.randint(
        -1, 2, n
    )
    h = {}
    for name, series in (("iid", iid), ("runs", runs)):
        df = spark.createDataFrame(
            [(d, int(v)) for d, v in zip(days, series)], "day date, v long"
        )
        h[name] = hurst_exponent(df, "day", "v").collect()[0]["hurst"]
    assert h["runs"] > h["iid"]
    assert 0.3 < h["iid"] < 0.75  # R/S on iid noise sits near 0.5-0.6


# ---------------------------------------------------------------- scoring ----


def test_brier_decomposition_matches_numpy(spark):
    from gridmet_etl_spark.operators.scoring import brier_decomposition

    rng = np.random.RandomState(5)
    p = rng.rand(5000)
    y = (rng.rand(5000) < p).astype(int)
    s6 = np.round(p * 1e6).astype(int)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(s6, y)], "s6 long, y int"
    )
    row = brier_decomposition(df, "s6", "y", n_bins=10).collect()[0]
    pq = s6 / 1e6
    bins = np.minimum((s6 * 10) // 1_000_000, 9)
    ybar = y.mean()
    rel = res = 0.0
    for b in range(10):
        msk = bins == b
        if not msk.any():
            continue
        pb, yb = pq[msk].mean(), y[msk].mean()
        rel += msk.sum() * (pb - yb) ** 2
        res += msk.sum() * (yb - ybar) ** 2
    rel /= len(y)
    res /= len(y)
    assert abs(row["brier_raw"] - ((pq - y) ** 2).mean()) < 1e-5
    assert abs(row["reliability"] - rel) < 1e-5
    assert abs(row["resolution"] - res) < 1e-5
    assert abs(row["uncertainty"] - ybar * (1 - ybar)) < 1e-5
    # Murphy identity holds exactly for the binned forecast
    assert (
        abs(
            row["brier_binned"]
            - (row["reliability"] - row["resolution"] + row["uncertainty"])
        )
        < 3e-6
    )


def test_brier_decomposition_perfect_forecaster(spark):
    from gridmet_etl_spark.operators.scoring import brier_decomposition

    # always predicts the truth with certainty: brier 0, rel 0, res = unc
    rows = [(1_000_000, 1)] * 30 + [(0, 0)] * 70
    df = spark.createDataFrame(rows, "s6 long, y int")
    row = brier_decomposition(df, "s6", "y", n_bins=10).collect()[0]
    assert row["brier_raw"] == 0.0
    assert row["reliability"] == 0.0
    assert abs(row["resolution"] - row["uncertainty"]) < 1e-9
    assert row["brier_binned"] == 0.0


def test_brier_decomposition_constant_base_rate(spark):
    from gridmet_etl_spark.operators.scoring import brier_decomposition

    # climatology forecaster (always predicts the base rate): res 0, rel 0,
    # brier = uncertainty
    rows = [(300_000, 1)] * 30 + [(300_000, 0)] * 70
    df = spark.createDataFrame(rows, "s6 long, y int")
    row = brier_decomposition(df, "s6", "y", n_bins=10).collect()[0]
    assert row["resolution"] == 0.0
    assert abs(row["reliability"]) < 1e-9
    assert abs(row["brier_raw"] - row["uncertainty"]) < 1e-9
