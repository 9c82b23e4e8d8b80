"""Hypothesis property tests for the session-C operators: BPE training vs
the pure-python reference on generated corpora, covariance vs numpy on
generated matrices, quota prefix-sum invariants, containment bounds.

Same discipline as test_property_hypothesis.py: generation driver-side,
few examples, complementing the fixed goldens."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.bpe import bpe_train
from gridmet_etl_spark.operators.linalg import embed_covariance
from tests.test_round3c import _ref_bpe

word = st.text(alphabet="abc", min_size=1, max_size=5)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(word, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(1, 4),
)
def test_bpe_matches_reference_on_random_corpora(spark, docs, k):
    """The distributed trainer equals the sequential Sennrich reference on
    arbitrary small corpora — merges, order, and counts (ties broken
    (count DESC, l, r) in both)."""
    sdf = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    got = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(sdf, k=k).orderBy("merge_rank").collect()
    ]
    freqs: dict[str, int] = {}
    for d in docs:
        for w in d.split():
            freqs[w] = freqs.get(w, 0) + 1
    assert got == _ref_bpe(freqs, k)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(3, 40),
    dim=st.integers(2, 6),
    seed=st.integers(0, 10_000),
    parts=st.integers(1, 4),
)
def test_covariance_matches_numpy_on_random_data(spark, n, dim, seed, parts):
    rng = np.random.default_rng(seed)
    x = rng.normal(scale=3.0, size=(n, dim))
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    emb = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    ).repartition(parts)
    got = {
        (r.i, r.j): r.cov for r in embed_covariance(emb, dim=dim, ndigits=9).collect()
    }
    ref = np.cov(x, rowvar=False, bias=True).reshape(dim, dim)
    for i in range(dim):
        for j in range(i, dim):
            assert got[(i + 1, j + 1)] == pytest.approx(ref[i, j], abs=1e-7)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    tokens=st.lists(st.integers(1, 50), min_size=1, max_size=25),
    budget=st.integers(1, 300),
)
def test_quota_prefix_invariants(spark, tokens, budget):
    """Kept set is a prefix in order: once a doc is rejected, every later
    doc of that source is rejected; kept total ≤ budget; cum_tokens is the
    exact prefix sum."""
    from gridmet_etl_spark.streaming.quota import quota_filter

    rows = [("s", i, t) for i, t in enumerate(tokens)]
    docs = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = sorted(
        quota_filter(docs, budget=budget).collect(), key=lambda r: r.doc_id
    )
    run = 0
    rejected_seen = False
    for r in out:
        run += tokens[r.doc_id]
        assert r.cum_tokens == run
        assert r.kept == (run <= budget)
        if not r.kept:
            rejected_seen = True
        else:
            assert not rejected_seen  # prefix property
    kept_total = sum(tokens[r.doc_id] for r in out if r.kept)
    assert kept_total <= budget


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(word, min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=5,
    )
)
def test_containment_bounds_and_reflexive_superset(spark, texts):
    """0 < containment ≤ 1 for every emitted pair; a doc duplicated
    verbatim under a new id always surfaces with containment 1.0."""
    from gridmet_etl_spark.operators.dedup import containment_pairs

    rows = list(enumerate(texts)) + [(1000, texts[0])]  # verbatim dup of doc 0
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(docs, threshold=0.0).collect()
    }
    assert all(0.0 < c <= 1.0 for c in got.values())
    assert got[(0, 1000)] == pytest.approx(1.0)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=1,
        max_size=60,
    )
)
def test_star_cc_equals_minlabel_on_random_graphs(spark, edges):
    from gridmet_etl_spark.operators.cluster import (
        connected_components,
        connected_components_star,
    )

    pdf = spark.createDataFrame(edges, "doc_a long, doc_b long")
    a = {
        (r.node, r.cluster_id)
        for r in connected_components(pdf, max_iter=500).collect()
    }
    b = {
        (r.node, r.cluster_id) for r in connected_components_star(pdf).collect()
    }
    assert a == b
