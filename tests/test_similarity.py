"""Similarity search: brute-force top-k vs numpy golden; LSH variant recall
and bucket determinism."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dups,
    srp_bucket,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def _golden_topk(ids, mat, qidx, k):
    q = mat[qidx]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))
    out = [(int(ids[i]), float(sims[i])) for i in order if ids[i] != ids[qidx]][:k]
    return out


def test_brute_force_topk_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = cosine_topk(emb, queries, k=10).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        qidx = int(np.where(ids == qid)[0][0])
        golden = _golden_topk(ids, mat, qidx, 10)
        assert [r.neighbor_id for r in rows] == [g[0] for g in golden]
        for r, g in zip(rows, golden):
            assert r.cosine_sim == pytest.approx(g[1], abs=1e-9)


def test_lsh_bucket_deterministic(spark, emb):
    b1 = {r.vec_id: r.b for r in emb.select("vec_id", srp_bucket(F.col("embedding")).alias("b")).collect()}
    b2 = {r.vec_id: r.b for r in emb.select("vec_id", srp_bucket(F.col("embedding")).alias("b")).collect()}
    assert b1 == b2
    assert all(0 <= v < 256 for v in b1.values())
    assert len(set(b1.values())) > 10  # buckets actually spread


def test_lsh_topk_subset_of_exact_ordering(spark, emb, emb_np):
    """LSH results are true cosines (no approximation of the metric) and
    multi-probe widening raises recall."""
    ids, mat = emb_np
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5).collect()
    exact_sims = {(r.query_id, r.neighbor_id): r.cosine_sim for r in exact}
    lsh1 = cosine_topk_lsh(emb, queries, k=5, n_probes=1).collect()
    lsh3 = cosine_topk_lsh(emb, queries, k=5, n_probes=3).collect()
    for r in lsh1 + lsh3:
        qidx = int(np.where(ids == r.query_id)[0][0])
        nidx = int(np.where(ids == r.neighbor_id)[0][0])
        g = mat @ mat[qidx] / (np.linalg.norm(mat, axis=1) * np.linalg.norm(mat[qidx]))
        assert r.cosine_sim == pytest.approx(float(g[nidx]), abs=1e-9)
    recall1 = len({k for k in exact_sims if k in {(r.query_id, r.neighbor_id) for r in lsh1}})
    recall3 = len({k for k in exact_sims if k in {(r.query_id, r.neighbor_id) for r in lsh3}})
    assert recall3 >= recall1


def test_embedding_near_dups_with_planted_dupe(spark, emb):
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(planted)
    dups = embedding_near_dups(corpus, threshold=0.999).collect()
    found = {(d.id_a, d.id_b) for d in dups}
    for i in range(10):
        assert (i, i + 100000) in found
        sim = [d.cosine_sim for d in dups if (d.id_a, d.id_b) == (i, i + 100000)][0]
        assert sim == pytest.approx(1.0, abs=1e-9)


def test_cosine_topk_np_matches_hof_exactly(spark, emb):
    """The Arrow-vectorized path must reproduce the HOF path bit-for-bit at
    rounded precision: same neighbors, same ranks, same tie-breaks."""
    from gridmet_etl_spark.operators.similarity import cosine_topk_np

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = {(r.query_id, r.neighbor_id, round(r.cosine_sim, 9), r.rank)
         for r in cosine_topk(emb, queries, k=10, rank_round=6).collect()}
    b = {(r.query_id, r.neighbor_id, round(r.cosine_sim, 9), r.rank)
         for r in cosine_topk_np(emb, queries, k=10, rank_round=6).collect()}
    assert a == b


def test_kmeans_refine_matches_numpy_lloyd(spark, emb, emb_np):
    """Spark Lloyd's iterations must reproduce an independent numpy
    implementation exactly: same assignments, same centroids per round."""
    from gridmet_etl_spark.operators.similarity import ivf_assign, ivf_centroids, kmeans_refine

    ids, mat = emb_np
    k, n_iter = 6, 3
    seed = ivf_centroids(emb, n_centroids=k)

    # numpy golden: cosine argmax (first-wins ties), mean recompute
    C = np.array(seed, dtype=np.float64)
    order = np.argsort(ids)
    M = mat[order]
    for _ in range(n_iter):
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        assign = np.argmax(np.round(Mn @ Cn.T, 12), axis=1)
        for c in range(k):
            if (assign == c).any():
                C[c] = M[assign == c].mean(axis=0)

    got = np.array(kmeans_refine(emb, seed, n_iter=n_iter), dtype=np.float64)
    assert got.shape == C.shape
    np.testing.assert_allclose(got, C, rtol=1e-9, atol=1e-12)

    # refined centroids give a valid assignment over all clusters
    assigned = ivf_assign(emb, [list(c) for c in got])
    n_used = assigned.select("cluster").distinct().count()
    assert 1 < n_used <= k


def test_quantize_embeddings_roundtrip_and_recall(spark, emb):
    from pyspark.sql import functions as F

    from gridmet_etl_spark.operators.similarity import (
        cosine_topk,
        dequantize_embeddings,
        quantize_embeddings,
    )

    q = quantize_embeddings(emb)
    # error bound: |x - x'| <= scale/2 = max|x| / 254 per component
    err = (
        dequantize_embeddings(q.withColumnRenamed("embedding", "orig"))
        .select(
            F.array_max(
                F.zip_with("embedding", "orig", lambda a, b: F.abs(a - b))
            ).alias("e"),
            (F.array_max(F.transform("orig", lambda x: F.abs(x))) / 254.0 + 1e-9).alias("bound"),
        )
    )
    assert err.filter(F.col("e") > F.col("bound")).count() == 0
    # top-10 cosine recall on dequantized vectors stays high
    queries = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=10).collect()}
    deq = dequantize_embeddings(q.drop("embedding")).select("vec_id", "embedding")
    approx = {(r.query_id, r.neighbor_id) for r in cosine_topk(deq, queries, k=10).collect()}
    assert len(exact & approx) / len(exact) >= 0.9


def test_srp_bucket_wide_and_null_vectors_dont_degenerate(spark):
    """Vectors wider than the plane table or containing NULL elements must
    still spread across buckets (a NULL projection used to send EVERYTHING
    to bucket 0)."""
    import random

    random.seed(7)
    wide = [(i, [random.uniform(-1, 1) for _ in range(600)]) for i in range(40)]
    df = spark.createDataFrame(wide, ["vec_id", "embedding"])
    buckets = {r.b for r in df.select(srp_bucket(F.col("embedding")).alias("b")).collect()}
    assert len(buckets) > 1
    # a single NULL element must not zero the bucket either
    nulled = spark.createDataFrame(
        [(1, [0.5, None, -0.3, 0.8]), (2, [-0.5, 0.1, None, -0.8])],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r.b for r in nulled.select("vec_id", srp_bucket(F.col("embedding")).alias("b")).collect()}
    assert got[1] != got[2] or got[1] != 0  # not everything collapsed to 0


def test_banded_srp_bounds_skewed_buckets(spark):
    """Scale property of the band structure: on a SKEWED corpus (vectors
    clustered around one direction), a single 8-bit SRP table piles most of
    the corpus into a handful of buckets, while each 16-bit band keeps the
    largest bucket a small fraction of the corpus — so in-bucket pair
    enumeration stays near-linear."""
    import numpy as np

    from gridmet_etl_spark.operators.similarity import SRP_BAND_BITS

    rng = np.random.default_rng(11)
    base = rng.normal(size=64)
    base /= np.linalg.norm(base)
    n = 400
    vecs = base + 0.1 * rng.normal(size=(n, 64))  # one directional cluster = skew
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    coarse = df.select(srp_bucket(F.col("embedding"), 8, 64).alias("b"))
    coarse_max = max(
        r.n for r in coarse.groupBy("b").agg(F.count("*").alias("n")).collect()
    )
    band_maxes = []
    for band in range(3):
        fine = df.select(
            srp_bucket(
                F.col("embedding"), SRP_BAND_BITS, 64, plane_offset=band * SRP_BAND_BITS
            ).alias("b")
        )
        band_maxes.append(
            max(r.n for r in fine.groupBy("b").agg(F.count("*").alias("n")).collect())
        )
    # the skewed cluster concentrates in the coarse table...
    assert coarse_max > n * 0.10
    # ...but every 16-bit band keeps its largest bucket strictly smaller,
    # and bounded to a small fraction of the corpus
    assert all(m < coarse_max for m in band_maxes)
    assert all(m < n * 0.08 for m in band_maxes)


def test_ivf_refined_recall_vs_exact(spark, emb):
    """ivf_topk through kmeans-refined centroids (the real index path, and
    what the registered contract query runs) must recover most of the exact
    brute-force top-k with half the clusters probed."""
    from gridmet_etl_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
        kmeans_refine,
    )

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=10).collect()
    }
    cents = kmeans_refine(emb, ivf_centroids(emb, n_centroids=8), n_iter=3)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, cents, k=10, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"refined-IVF recall {recall:.2f} below floor"


def test_semantic_dedup_planted(spark):
    """Planted exact-duplicate vectors collapse to one canonical id per
    cluster; untouched vectors stay canonical singletons."""
    import os

    from pyspark.sql import functions as F

    from gridmet_etl_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(os.path.join("/root/testdata/sf0.001", "embeddings.parquet"))
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(planted)
    out = semantic_dedup(corpus, threshold=0.99, dim=64).cache()
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == corpus.count()
    # each planted copy clusters with its source, source id is canonical
    for vid in range(10):
        assert rows[100000 + vid].cluster_id == vid
        assert not rows[100000 + vid].is_canonical
        assert rows[vid].cluster_id == vid and rows[vid].is_canonical
    # canonical set = one per cluster
    n_clusters = out.select("cluster_id").distinct().count()
    n_canonical = out.filter("is_canonical").count()
    assert n_clusters == n_canonical
    out.unpersist()


def test_rp_project_jl_property(spark, emb, emb_np):
    import numpy as np

    from gridmet_etl_spark.operators.similarity import RP_OUT_DIM, rp_project

    out = rp_project(emb).orderBy("vec_id").collect()
    ids, X = emb_np  # (vec_id array, matrix) module fixture
    order = np.argsort(ids)
    X = X[order]
    R = np.array([[r[f"rp{j}"] for j in range(RP_OUT_DIM)] for r in out])
    assert R.shape == (len(X), RP_OUT_DIM)
    # JL unbiasedness: E||Rx||^2 = ||x||^2 — with ±1/sqrt(k) signs the
    # squared-distance ratio is 1 in expectation; at k=8 individual pairs
    # are ~50% noisy but the MEAN over 300 pairs must sit near 1.
    rng = np.random.default_rng(42)
    pairs = rng.integers(0, len(X), size=(300, 2))
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    d_orig = np.array([np.sum((X[a] - X[b]) ** 2) for a, b in pairs])
    d_proj = np.array([np.sum((R[a] - R[b]) ** 2) for a, b in pairs])
    ratio = np.mean(d_proj / d_orig)
    assert 0.8 < ratio < 1.2
    # and distances still carry signal (positively correlated)
    corr = np.corrcoef(d_orig, d_proj)[0, 1]
    assert corr > 0.1

    # determinism: same input -> bit-identical output
    again = rp_project(emb).orderBy("vec_id").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]
