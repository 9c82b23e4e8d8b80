"""Round-9 ext21 spatial-statistics tests: numpy brute-force references
for gearys_c, getis_ord_gstar, and semivariogram on synthetic grids.
"""

import numpy as np


def _grid_df(spark, arr, mask=None):
    rows = []
    ni, nj = arr.shape
    for i in range(ni):
        for j in range(nj):
            if mask is not None and not mask[i, j]:
                continue
            rows.append((i, j, int(arr[i, j])))
    return spark.createDataFrame(rows, "i int, j int, x long")


def _brute_geary(arr):
    ni, nj = arr.shape
    x = arr.astype(float)
    n = ni * nj
    xbar = x.mean()
    ss = ((x - xbar) ** 2).sum()
    sdd = 0.0
    ne = 0
    for i in range(ni):
        for j in range(nj):
            if i + 1 < ni:
                sdd += (x[i, j] - x[i + 1, j]) ** 2
                ne += 1
            if j + 1 < nj:
                sdd += (x[i, j] - x[i, j + 1]) ** 2
                ne += 1
    return (n - 1) * sdd / (2 * (2 * ne) * ss) * 2  # W = 2*ne over ordered pairs


def test_gearys_c_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.geo import gearys_c

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 1000, (12, 9))
    r = gearys_c(_grid_df(spark, arr), value_col="x").collect()[0]
    ref = _brute_geary(arr)
    assert abs(r["c_geary"] - ref) < 1e-6
    assert r["n"] == 12 * 9
    assert r["n_edges"] == 11 * 9 + 12 * 8


def test_gearys_c_smooth_vs_checkerboard(spark):
    from gridmet_etl_spark.operators.geo import gearys_c

    # smooth gradient: C << 1; checkerboard: C -> max contrast (> 1)
    ii, jj = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    smooth = (ii * 10 + jj * 10).astype(int)
    board = ((ii + jj) % 2 * 1000).astype(int)
    c_s = gearys_c(_grid_df(spark, smooth), value_col="x").collect()[0]["c_geary"]
    c_b = gearys_c(_grid_df(spark, board), value_col="x").collect()[0]["c_geary"]
    assert c_s < 0.2
    assert c_b > 1.5


def test_getis_ord_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.geo import getis_ord_gstar

    rng = np.random.RandomState(11)
    arr = rng.randint(0, 500, (10, 10))
    out = {
        (r["i"], r["j"]): r
        for r in getis_ord_gstar(_grid_df(spark, arr), value_col="x").collect()
    }
    x = arr.astype(float)
    n = 100
    s = x.sum()
    q = (x * x).sum()
    for i, j in [(0, 0), (5, 5), (9, 3), (2, 9)]:
        nb = [(i, j)] + [
            (a, b)
            for a, b in [(i + 1, j), (i - 1, j), (i, j + 1), (i, j - 1)]
            if 0 <= a < 10 and 0 <= b < 10
        ]
        m = len(nb)
        lsum = sum(x[a, b] for a, b in nb)
        num = n * lsum - s * m
        den = np.sqrt(n * q - s * s) * np.sqrt((n * m - m * m) / (n - 1))
        row = out[(i, j)]
        assert row["m"] == m
        assert row["local_sum"] == int(lsum)
        assert abs(row["z_gstar"] - num / den) < 1e-6


def test_getis_ord_hotspot_found(spark):
    from gridmet_etl_spark.operators.geo import getis_ord_gstar

    arr = np.zeros((15, 15), dtype=int)
    arr[7, 7] = arr[6, 7] = arr[8, 7] = arr[7, 6] = arr[7, 8] = 1000
    out = getis_ord_gstar(_grid_df(spark, arr), value_col="x").collect()
    best = max(out, key=lambda r: r["z_gstar"])
    assert (best["i"], best["j"]) == (7, 7)
    assert best["z_gstar"] > 3.0


def test_getis_ord_missing_cells_shrink_m(spark):
    from gridmet_etl_spark.operators.geo import getis_ord_gstar

    arr = np.arange(25).reshape(5, 5)
    mask = np.ones((5, 5), bool)
    mask[2, 3] = False  # hole next to (2,2)
    out = {
        (r["i"], r["j"]): r
        for r in getis_ord_gstar(_grid_df(spark, arr, mask), value_col="x").collect()
    }
    assert (2, 3) not in out
    assert out[(2, 2)]["m"] == 4  # self + 3 surviving neighbors
    assert out[(0, 0)]["m"] == 3  # corner: self + 2


def test_semivariogram_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.geo import semivariogram

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 200, (14, 11))
    out = {
        r["lag"]: r
        for r in semivariogram(_grid_df(spark, arr), value_col="x", max_lag=4).collect()
    }
    x = arr.astype(float)
    for h in range(1, 5):
        di = x[h:, :] - x[:-h, :]
        dj = x[:, h:] - x[:, :-h]
        npairs = di.size + dj.size
        gamma = ((di * di).sum() + (dj * dj).sum()) / (2 * npairs)
        assert out[h]["n_pairs"] == npairs
        assert abs(out[h]["gamma"] - gamma) < 1e-6


def test_semivariogram_linear_field_quadratic_gamma(spark):
    from gridmet_etl_spark.operators.geo import semivariogram

    # pure gradient along i: gamma(h) proportional to h^2 exactly
    ii, _ = np.meshgrid(np.arange(20), np.arange(20), indexing="ij")
    arr = (ii * 6).astype(int)
    out = {
        r["lag"]: r["gamma"]
        for r in semivariogram(_grid_df(spark, arr), value_col="x", max_lag=3).collect()
    }
    # along-i pairs contribute (6h)^2 each, along-j pairs 0
    for h in (1, 2, 3):
        ni_pairs = (20 - h) * 20
        nj_pairs = 20 * (20 - h)
        expect = ni_pairs * (6 * h) ** 2 / (2 * (ni_pairs + nj_pairs))
        assert abs(out[h] - expect) < 1e-9
