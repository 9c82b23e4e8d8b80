"""Round-9 ext29 inequality-family tests: numpy references for
theil_decomposition, atkinson_index, palma_ratio."""

import numpy as np


def test_theil_matches_numpy_and_decomposes(spark):
    from gridmet_etl_spark.operators.stats import theil_decomposition

    rng = np.random.RandomState(5)
    g = rng.randint(0, 3, 3000)
    x = (np.exp(rng.randn(3000)) * 1000 + 1).astype(np.int64) * (1 + g)
    df = spark.createDataFrame(
        [(chr(65 + int(b)), int(v)) for b, v in zip(g, x)], "g string, x long"
    )
    out = theil_decomposition(df, "x", "g").collect()[0]
    mu = x.mean()
    t_ref = ((x / mu) * np.log(x / mu)).mean()
    tb_ref = 0.0
    for k in range(3):
        sel = x[g == k]
        tb_ref += (sel.sum() / x.sum()) * np.log(sel.mean() / mu)
    assert out["n"] == 3000 and out["k_groups"] == 3
    assert abs(out["theil_total"] - t_ref) < 1e-5
    assert abs(out["theil_between"] - tb_ref) < 1e-5
    # decomposition identity holds on the published (quantized) values
    assert abs(out["theil_total"] - out["theil_between"] - out["theil_within"]) < 2e-6
    assert out["theil_between"] > 0  # groups genuinely differ


def test_theil_equal_values_zero(spark):
    from gridmet_etl_spark.operators.stats import theil_decomposition

    df = spark.createDataFrame([("a", 500)] * 100, "g string, x long")
    out = theil_decomposition(df, "x", "g").collect()[0]
    assert out["theil_total"] == 0.0 and out["theil_between"] == 0.0


def test_atkinson_matches_numpy(spark):
    from gridmet_etl_spark.operators.stats import atkinson_index

    rng = np.random.RandomState(7)
    x = (np.exp(rng.randn(2000)) * 500 + 1).astype(np.int64)
    df = spark.createDataFrame([(int(v),) for v in x], "x long")
    out = atkinson_index(df, "x").collect()[0]
    geo = np.exp(np.log(x).mean())
    a_ref = 1 - geo / x.mean()
    assert abs(out["atkinson"] - a_ref) < 1e-5
    assert abs(out["geomean"] - geo) < geo * 1e-5
    assert 0 < out["atkinson"] < 1


def test_palma_matches_numpy(spark):
    from gridmet_etl_spark.operators.stats import palma_ratio

    rng = np.random.RandomState(9)
    x = (np.exp(rng.randn(1000) * 1.2) * 1000 + 1).astype(np.int64)
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(x)], "id long, x long"
    )
    out = palma_ratio(df, "x", "id").collect()[0]
    srt = np.sort(x)
    n = len(x)
    b40 = srt[: 4 * n // 10].sum()
    t10 = srt[n - n // 10 :].sum()
    assert out["n"] == n
    assert abs(out["bottom40_share"] - b40 / x.sum()) < 1e-6
    assert abs(out["top10_share"] - t10 / x.sum()) < 1e-6
    assert abs(out["palma"] - t10 / b40) < 1e-4 * (t10 / b40)
    assert out["palma"] > 1  # lognormal tail dominates
