"""Round-9 ext23 privacy/profiling operator tests: brute-force references
for t_closeness_report, candidate_key_audit, and reidentification_risk.
"""

import numpy as np


def test_t_closeness_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.mlprep import t_closeness_report

    rng = np.random.RandomState(5)
    qi = rng.randint(0, 4, 2000)
    band = rng.randint(0, 6, 2000) + (qi == 2) * 3  # class 2 skewed high
    df = spark.createDataFrame(
        [(int(q), int(b)) for q, b in zip(qi, band)], "qi int, b int"
    )
    out = {r["qi"]: r for r in t_closeness_report(df, ["qi"], "b").collect()}
    bands = np.unique(band)
    k = len(bands)
    glob = np.array([(band == b).sum() for b in bands], float) / len(band)
    for q in range(4):
        sel = band[qi == q]
        p = np.array([(sel == b).sum() for b in bands], float) / len(sel)
        t_ref = np.abs(np.cumsum(p - glob)).sum() / (k - 1)
        assert out[q]["n"] == len(sel)
        assert abs(out[q]["t_closeness"] - t_ref) < 1e-6
    # the skewed class must stand out
    assert out[2]["t_closeness"] > max(out[q]["t_closeness"] for q in (0, 1, 3))


def test_t_closeness_identical_class_zero(spark):
    from gridmet_etl_spark.operators.mlprep import t_closeness_report

    # one class == whole population -> EMD 0
    rows = [(0, b % 5) for b in range(100)]
    df = spark.createDataFrame(rows, "qi int, b int")
    out = t_closeness_report(df, ["qi"], "b").collect()[0]
    assert out["t_closeness"] == 0.0


def test_candidate_key_audit(spark):
    from gridmet_etl_spark.operators.mlprep import candidate_key_audit

    rows = [(1, "a", 10), (1, "b", 10), (2, "a", 20), (2, "a", 30), (3, "c", 10)]
    df = spark.createDataFrame(rows, "x int, y string, z int")
    out = {r["combo"]: r for r in candidate_key_audit(df, [["x"], ["x", "y"], ["x", "y", "z"]]).collect()}
    assert out["x"]["n_rows"] == 5
    assert out["x"]["n_distinct"] == 3
    assert out["x"]["is_key"] == 0
    assert out["x"]["n_dup_rows"] == 4  # x=1 (2 rows) + x=2 (2 rows)
    assert out["x"]["max_multiplicity"] == 2
    assert out["x+y"]["n_distinct"] == 4
    assert out["x+y"]["is_key"] == 0  # (2,'a') twice
    assert out["x+y+z"]["is_key"] == 1
    assert out["x+y+z"]["n_dup_rows"] == 0


def test_reident_risk_matches_bruteforce(spark):
    from gridmet_etl_spark.operators.mlprep import reidentification_risk

    rng = np.random.RandomState(7)
    qi = rng.randint(0, 300, 1000)  # some classes unique, some big
    df = spark.createDataFrame([(int(q),) for q in qi], "qi int")
    out = reidentification_risk(df, ["qi"]).collect()[0]
    _, counts = np.unique(qi, return_counts=True)
    assert out["n_rows"] == 1000
    assert out["n_classes"] == len(counts)
    assert abs(out["pct_unique"] - (counts == 1).sum() / 1000) < 1e-9
    assert abs(out["prosecutor_risk"] - len(counts) / 1000) < 1e-9
    assert abs(out["journalist_risk"] - 1.0 / counts.min()) < 1e-9
