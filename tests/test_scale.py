"""Scale utilities: bucketed join exchange-elimination (plan-level),
skew-salted aggregation correctness, IVF ANN recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.scale import salted_sum, write_bucketed
from gridmet_etl_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_centroids,
    ivf_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_eliminates_exchange(spark, fixdir, tmp_path):
    """Both sides bucketed by (i, j) → the join runs with ZERO exchanges."""
    grid = spark.read.parquet(f"{fixdir}/grid.parquet").filter(F.col("var") == "tmmx")
    weights = spark.read.parquet(f"{fixdir}/weights.parquet")
    write_bucketed(grid, "grid_b", ("i", "j"), 8)
    write_bucketed(weights, "weights_b", ("i", "j"), 8)
    joined = (
        spark.table("grid_b")
        .join(spark.table("weights_b").hint("merge"), ["i", "j"])
        .select("feature_id", "time", "value", "wght")
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "Exchange" not in plan, plan
    # same rows as the unbucketed join
    ref = grid.join(weights, ["i", "j"]).count()
    assert joined.count() == ref


def test_salted_sum_matches_plain(spark):
    """Skew-salted two-phase aggregation ≡ plain groupBy on skewed data
    (99% of rows share one key)."""
    df = spark.range(100_000).select(
        F.col("id"),
        F.when(F.col("id") % 100 < 99, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    salted = salted_sum(df, ["k"], {"v": "sum", "id": "count"}, n_salts=8)
    plain = df.groupBy("k").agg(F.sum("v").alias("sum_v"), F.count("id").alias("count_id"))
    s = {r.k: (r.sum_v, r.count_id) for r in salted.collect()}
    p = {r.k: (r.sum_v, r.count_id) for r in plain.collect()}
    assert set(s) == set(p)
    for k in p:
        assert s[k][1] == p[k][1]
        assert s[k][0] == pytest.approx(p[k][0], rel=1e-12)


def test_salted_sum_rejects_non_algebraic(spark):
    df = spark.range(10).select(F.lit("a").alias("k"), F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        salted_sum(df, ["k"], {"v": "avg"})


@pytest.fixture(scope="module")
def emb(spark):
    import os

    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()


def test_ivf_assignment_deterministic_and_narrow(spark, emb):
    cents = ivf_centroids(emb, n_centroids=8)
    a1 = {r.vec_id: r.cluster for r in ivf_assign(emb, cents).collect()}
    a2 = {r.vec_id: r.cluster for r in ivf_assign(emb, cents).collect()}
    assert a1 == a2
    assert set(a1.values()) <= set(range(8))
    # centroid vectors assign to themselves (cosine with self = 1)
    for cid in range(8):
        assert a1[cid] == cid
    plan = ivf_assign(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow projection


def test_ivf_topk_recall_rises_with_probes(spark, emb):
    cents = ivf_centroids(emb, n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    got1 = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, queries, cents, k=5, n_probe=1).collect()}
    got8 = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, queries, cents, k=5, n_probe=8).collect()}
    # full probe = exact search (all clusters searched)
    assert got8 == exact
    assert len(got1 & exact) <= len(got8 & exact)
