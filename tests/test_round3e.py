"""Round-3 session-B additions: power-iteration PCA, haversine kNN join,
Bellman-Ford shortest paths."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# power_iteration
# ---------------------------------------------------------------------------


def _synthetic_emb(spark, n=200, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    # dominant direction along a fixed unit vector u with clear eigengap
    u = rng.normal(size=dim)
    u /= np.linalg.norm(u)
    x = rng.normal(size=(n, dim)) * 0.1 + np.outer(rng.normal(size=n) * 3.0, u)
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        x,
    )


def test_power_iteration_converges_to_eigh(spark):
    from gridmet_etl_spark.operators.linalg import embed_covariance, power_iteration

    emb, x = _synthetic_emb(spark)
    cov = embed_covariance(emb, dim=8, ndigits=9)
    out = power_iteration(cov, dim=8, rounds=30, ndigits=9).collect()
    got = np.zeros(8)
    eig = None
    for r in out:
        got[r["i"] - 1] = r["loading"]
        eig = r["eig"]
    c = np.cov(x.T, bias=True)
    w, v = np.linalg.eigh(c)
    top = v[:, np.argmax(w)]
    if top[np.argmax(np.abs(top))] < 0:
        top = -top
    assert np.allclose(got, top, atol=1e-4)
    assert eig == pytest.approx(float(np.max(w)), rel=1e-4)
    # loading is unit-norm
    assert np.linalg.norm(got) == pytest.approx(1.0, abs=1e-6)


def test_power_iteration_sign_pin(spark):
    """Flipping every vector's sign leaves the reported component
    unchanged (sign pinned by largest-|loading| coordinate)."""
    from gridmet_etl_spark.operators.linalg import embed_covariance, power_iteration

    emb, _ = _synthetic_emb(spark, n=80)
    neg = emb.select("vec_id", F.transform("embedding", lambda v: -v).alias("embedding"))
    a = power_iteration(embed_covariance(emb, dim=8), dim=8, rounds=10).collect()
    b = power_iteration(embed_covariance(neg, dim=8), dim=8, rounds=10).collect()
    assert sorted((r["i"], r["loading"]) for r in a) == sorted(
        (r["i"], r["loading"]) for r in b
    )


# ---------------------------------------------------------------------------
# geo_knn
# ---------------------------------------------------------------------------


def _brute_knn(pts, k, radius_km, rank_round=6):
    out = []
    for pid, la, lo in pts:
        cands = []
        for qid, la2, lo2 in pts:
            if qid == pid:
                continue
            dlat = math.radians(la2 - la)
            dlon = math.radians(lo2 - lo)
            a = (
                math.sin(dlat / 2) ** 2
                + math.cos(math.radians(la)) * math.cos(math.radians(la2)) * math.sin(dlon / 2) ** 2
            )
            d = round(2 * 6371.0 * math.asin(math.sqrt(a)), rank_round)
            if d <= radius_km:
                cands.append((d, qid))
        cands.sort()
        for rnk, (d, qid) in enumerate(cands[:k], start=1):
            out.append((pid, qid, d, rnk))
    return sorted(out)


def test_geo_knn_blocked_equals_bruteforce_across_cell_boundaries(spark):
    """Points deliberately straddling 1° cell boundaries (incl. negative
    lon cells) — the 3×3 blocked join must still find every pair."""
    from gridmet_etl_spark.operators.geo import geo_knn

    pts = [
        (1, 44.999, -120.001),
        (2, 45.001, -119.999),  # across both cell edges from 1
        (3, 45.0, -120.0),      # exactly on the corner
        (4, 45.3, -120.3),
        (5, 44.7, -119.7),
        (6, 47.0, -120.0),      # far: outside 50 km of all others
        (7, 45.001, -120.001),
    ]
    df = spark.createDataFrame(pts, "point_id long, lat double, lon double")
    got = sorted(
        (r["point_id"], r["neighbor_id"], r["dist_km"], r["rnk"])
        for r in geo_knn(df, k=3, radius_km=50.0, cell_deg=1.0, max_abs_lat=55.0).collect()
    )
    assert got == _brute_knn(pts, 3, 50.0)
    assert all(pid != 6 for pid, *_ in got)


def test_geo_knn_duplicate_coordinates_tiebreak(spark):
    from gridmet_etl_spark.operators.geo import geo_knn

    pts = [(1, 45.0, -120.0), (2, 45.0, -120.0), (3, 45.0, -120.0)]
    df = spark.createDataFrame(pts, "point_id long, lat double, lon double")
    got = sorted(
        (r["point_id"], r["neighbor_id"], r["rnk"])
        for r in geo_knn(df, k=2, radius_km=50.0, cell_deg=1.0).collect()
    )
    # zero-distance ties rank by neighbor id
    assert got == [
        (1, 2, 1), (1, 3, 2),
        (2, 1, 1), (2, 3, 2),
        (3, 1, 1), (3, 2, 2),
    ]


def test_geo_knn_rejects_undersized_cell():
    from gridmet_etl_spark.operators.geo import geo_knn

    with pytest.raises(ValueError):
        geo_knn(None, k=3, radius_km=200.0, cell_deg=1.0)


# ---------------------------------------------------------------------------
# sssp
# ---------------------------------------------------------------------------


def _py_bellman_ford(edges, seed, rounds):
    dist = {seed: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    return dist


def test_sssp_matches_python_golden(spark):
    from gridmet_etl_spark.operators.graph import sssp

    edges = [
        (1, 2, 4), (1, 3, 1), (3, 2, 1), (2, 4, 1), (3, 4, 7),
        (4, 5, 1), (5, 1, 1), (6, 7, 2),  # 6,7 unreachable from 1
    ]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"] for r in sssp(e, seeds, rounds=6).collect()}
    assert got == _py_bellman_ford(edges, 1, 6)
    assert 6 not in got and 7 not in got
    # shorter path through 3 beats the direct edge: dist(2) = 2, dist(4) = 3
    assert got[2] == 2 and got[4] == 3


def test_sssp_converged_distances_stable(spark):
    from gridmet_etl_spark.operators.graph import sssp

    edges = [(1, 2, 1), (2, 3, 1), (3, 1, 1)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    a = {r["node"]: r["dist"] for r in sssp(e, seeds, rounds=3).collect()}
    b = {r["node"]: r["dist"] for r in sssp(e, seeds, rounds=5).collect()}
    assert a == b == {1: 0, 2: 1, 3: 2}


def test_sssp_multi_seed_takes_min(spark):
    from gridmet_etl_spark.operators.graph import sssp

    edges = [(1, 3, 10), (2, 3, 1)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,), (2,)], "node long")
    got = {r["node"]: r["dist"] for r in sssp(e, seeds, rounds=2).collect()}
    assert got == {1: 0, 2: 0, 3: 1}
