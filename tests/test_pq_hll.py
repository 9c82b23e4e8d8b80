"""Product quantization: numpy golden for codebooks/codes/ADC ranking;
reconstruction-error sanity. HLL rollup: merge-equals-rescan property and
estimate accuracy."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_refine,
    pq_seed_codebooks,
)
from gridmet_etl_spark.operators.sketch import hll_merge, hll_rollup

SF_DIR = "/root/testdata/sf0.001"
M, KSUB, DIM, ITER = 4, 8, 64, 2
DSUB = DIM // M


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def _golden_books(ids, mat):
    """Sequential reference of pq_refine: lowest-id seeds, L2 argmin with
    lowest-code ties, per-dim mean, empty cells keep their centroid."""
    books = [
        [mat[v, s * DSUB : (s + 1) * DSUB].copy() for v in range(KSUB)]
        for s in range(M)
    ]
    for _ in range(ITER):
        for s in range(M):
            sub = mat[:, s * DSUB : (s + 1) * DSUB]
            cents = np.array(books[s])
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)  # argmin takes the first (lowest code)
            books[s] = [
                sub[assign == c].mean(axis=0) if (assign == c).any() else cents[c]
                for c in range(KSUB)
            ]
    return books


def _golden_codes(books, mat):
    codes = np.zeros((mat.shape[0], M), dtype=int)
    for s in range(M):
        sub = mat[:, s * DSUB : (s + 1) * DSUB]
        cents = np.array(books[s])
        codes[:, s] = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    return codes


@pytest.fixture(scope="module")
def books(emb):
    return pq_refine(emb, pq_seed_codebooks(emb, M, KSUB, DIM), n_iter=ITER)


def test_pq_refine_matches_numpy_golden(books, emb_np):
    ids, mat = emb_np
    golden = _golden_books(ids, mat)
    for s in range(M):
        for c in range(KSUB):
            np.testing.assert_allclose(books[s][c], golden[s][c], rtol=1e-9)


def test_pq_encode_matches_numpy_golden(emb, books, emb_np):
    ids, mat = emb_np
    golden = _golden_codes(_golden_books(ids, mat), mat)
    got = {
        r.vec_id: [r[f"code_{s}"] for s in range(M)]
        for r in pq_encode(emb, books).collect()
    }
    for i, vid in enumerate(ids):
        assert got[int(vid)] == list(golden[i])


def test_pq_reconstruction_beats_random_codes(emb, books, emb_np):
    """Quantizing to the TRAINED codebook must reconstruct better than
    assigning every vector code 0 — i.e. the codebook actually fits."""
    ids, mat = emb_np
    codes = _golden_codes(books, mat)
    recon = np.concatenate(
        [np.array(books[s])[codes[:, s]] for s in range(M)], axis=1
    )
    fixed = np.concatenate(
        [np.tile(books[s][0], (mat.shape[0], 1)) for s in range(M)], axis=1
    )
    err_trained = ((mat - recon) ** 2).sum()
    err_fixed = ((mat - fixed) ** 2).sum()
    assert err_trained < 0.8 * err_fixed


def test_pq_adc_topk_recall_vs_exact(emb, books, emb_np):
    """ADC over 8-code-per-subspace PQ is lossy; the i.i.d.-random driver
    embeddings are PQ's worst case (no cluster structure to exploit), so
    assert only that recall beats chance (10/|corpus| ~= 0.05) while the
    ADC ranking itself must equal the numpy-ADC ranking exactly."""
    ids, mat = emb_np
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_adc_topk(pq_encode(emb, books), queries, books, k=10).collect()
    codes = _golden_codes(books, mat)
    recalls = []
    for q in range(3):
        qv = mat[ids == q][0]
        lut = np.array(
            [
                np.round(
                    ((qv[s * DSUB : (s + 1) * DSUB] - np.array(books[s])) ** 2).sum(
                        axis=1
                    ),
                    9,
                )
                for s in range(M)
            ]
        )
        adc = np.round(lut[np.arange(M)[None, :], codes].sum(axis=1), 6)
        order = sorted(
            [(float(adc[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != q]
        )[:10]
        got_q = sorted(
            [(r.adc_dist, r.neighbor_id) for r in got if r.query_id == q],
        )
        assert [(round(a, 6), b) for a, b in order] == [
            (round(a, 6), b) for a, b in got_q
        ]
        exact = ((mat - qv) ** 2).sum(axis=1)
        exact_top = {
            int(ids[i])
            for i in sorted(
                (i for i in range(len(ids)) if ids[i] != q), key=lambda i: exact[i]
            )[:10]
        }
        recalls.append(len(exact_top & {b for _, b in order}) / 10)
    assert sum(recalls) / len(recalls) >= 0.1


def test_hll_merge_equals_direct_sketch(spark):
    """Merging daily sketches must estimate the same as sketching the whole
    table at once (HLL union is lossless over HLL_4 registers), and land
    within 5% of the exact distinct count."""
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).withColumn(
        "day", F.to_date("ts")
    )
    daily = hll_rollup(ev, ["event_type", "day"], "user_id")
    merged = hll_merge(daily, ["event_type"]).select("event_type", "approx_distinct")
    direct = hll_merge(
        hll_rollup(ev, ["event_type"], "user_id"), ["event_type"]
    ).select("event_type", F.col("approx_distinct").alias("direct"))
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact")
    )
    rows = merged.join(direct, "event_type").join(exact, "event_type").collect()
    assert rows
    for r in rows:
        assert r.approx_distinct == r.direct
        assert abs(r.approx_distinct - r.exact) <= max(2, 0.05 * r.exact)


def test_hll_rollup_shuffle_is_output_sized(spark):
    """Plan shape: the rollup aggregation partially aggregates map-side
    (HashAggregate below the exchange), so the shuffle carries sketch rows,
    not event rows."""
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).withColumn(
        "day", F.to_date("ts")
    )
    plan = hll_rollup(ev, ["event_type", "day"], "user_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    before_exchange = plan.split("Exchange")[1]
    assert "HashAggregate" in before_exchange


def test_ivfpq_probe_all_equals_pq_adc(spark, emb, books):
    from gridmet_etl_spark.operators.pq import ivfpq_topk, pq_adc_topk, pq_encode, pq_index
    from gridmet_etl_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(emb, n_centroids=4)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = sorted(
        tuple(r)
        for r in pq_adc_topk(pq_encode(emb, books), queries, books, k=10).collect()
    )
    via_ivf = sorted(
        tuple(r)
        for r in ivfpq_topk(
            pq_index(emb, books, cents), queries, books, cents, k=10, n_probe=4
        ).collect()
    )
    assert via_ivf == full  # exhaustive probe reproduces the exact ADC result


def test_ivfpq_pruned_probe_subset_and_recall(spark, emb, books):
    from gridmet_etl_spark.operators.pq import ivfpq_topk, pq_index
    from gridmet_etl_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(emb, n_centroids=4)
    index = pq_index(emb, books, cents)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = ivfpq_topk(index, queries, books, cents, k=10, n_probe=4).collect()
    pruned = ivfpq_topk(index, queries, books, cents, k=10, n_probe=2).collect()
    full_ids = {(r.query_id, r.neighbor_id) for r in full}
    pruned_ids = {(r.query_id, r.neighbor_id) for r in pruned}
    # pruned probing returns k results per query from a candidate SUBSET
    assert len(pruned) == len(full) == 30
    recall = len(full_ids & pruned_ids) / len(full_ids)
    assert 0.2 <= recall <= 1.0
