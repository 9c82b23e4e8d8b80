"""Tests for normalization (z-score, winsorize), profiling (histogram,
column profile), and CDC upsert."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.merge import upsert_by_key
from gridmet_etl_spark.operators.normalize import winsorize_clip, zscore_normalize
from gridmet_etl_spark.operators.profile import data_profile, histogram_fixed


def test_zscore_matches_numpy(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    df = spark.createDataFrame([Row(g="a", v=x) for x in vals])
    out = zscore_normalize(df, keys=("g",), value_col="v").collect()
    mu, sigma = np.mean(vals), np.std(vals)
    for r in out:
        assert r["mu"] == pytest.approx(mu)
        assert r["sigma"] == pytest.approx(sigma)
        assert r["z"] == pytest.approx((r["v"] - mu) / sigma)


def test_zscore_constant_group_null(spark):
    df = spark.createDataFrame([Row(g="c", v=5.0), Row(g="c", v=5.0)])
    out = zscore_normalize(df, keys=("g",), value_col="v").collect()
    assert all(r["z"] is None for r in out)


def test_winsorize_matches_numpy(spark):
    vals = [float(x) for x in range(1, 101)]
    df = spark.createDataFrame([Row(g="a", v=x) for x in vals])
    out = winsorize_clip(df, keys=("g",), value_col="v", p_lo=0.10, p_hi=0.90)
    rows = out.collect()
    lo = np.percentile(vals, 10)  # linear interpolation, same as F.percentile
    hi = np.percentile(vals, 90)
    for r in rows:
        assert r["lo"] == pytest.approx(lo)
        assert r["hi"] == pytest.approx(hi)
        assert r["clipped"] == pytest.approx(min(max(r["v"], lo), hi))
    # p10 = 10.9, p90 = 90.1 -> 1..10 and 91..100 clip
    assert sum(1 for r in rows if r["clipped"] != r["v"]) == 20


def test_histogram_mass_conserved_and_clamped(spark):
    df = spark.createDataFrame(
        [Row(v=x) for x in [-5.0, 0.0, 0.5, 1.0, 2.5, 9.9, 10.0, 55.0, None]]
    )
    out = {r["bin"]: r for r in histogram_fixed(df, "v", lo=0.0, hi=10.0, nbins=10).collect()}
    assert sum(r["n"] for r in out.values()) == 8  # NULL dropped
    # bin width 1.0: -5->clamp 0; 0->0; 0.5->0; 1.0->1; 2.5->2; 9.9->9; 10->clamp 9; 55->clamp 9
    assert out[0]["n"] == 3  # {-5, 0, 0.5}
    assert out[1]["n"] == 1
    assert out[2]["n"] == 1
    assert out[9]["n"] == 3
    assert out[0]["bin_lo"] == 0.0 and out[9]["bin_lo"] == 9.0


def test_data_profile_single_scan(spark):
    df = spark.createDataFrame(
        [
            Row(a=1.0, b="x"),
            Row(a=None, b="y"),
            Row(a=3.0, b="x"),
        ]
    )
    rows = {r["column"]: r for r in data_profile(df, ["a"], ["b"]).collect()}
    assert rows["a"]["n"] == 3 and rows["a"]["n_null"] == 1
    assert rows["a"]["n_distinct"] == 2
    assert rows["a"]["vmin"] == 1.0 and rows["a"]["vmax"] == 3.0
    assert rows["b"]["n_null"] == 0 and rows["b"]["n_distinct"] == 2
    assert rows["b"]["vmin"] is None


def test_upsert_by_key_semantics(spark):
    base = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    updates = spark.createDataFrame([Row(k=2, v="B2"), Row(k=9, v="new")])
    got = {r["k"]: r["v"] for r in upsert_by_key(base, updates, ["k"]).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}
    # shuffled (non-broadcast) path agrees
    got2 = {
        r["k"]: r["v"]
        for r in upsert_by_key(base, updates, ["k"], broadcast_updates=False).collect()
    }
    assert got2 == got


def test_upsert_broadcast_plan(spark):
    base = spark.createDataFrame([Row(k=i, v=str(i)) for i in range(100)])
    updates = spark.createDataFrame([Row(k=1, v="u")])
    plan = upsert_by_key(base, updates, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
