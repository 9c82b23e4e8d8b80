"""Model-scoring operators: hashed linear classifier + bigram LM."""

import math
import os

import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.scoring import (
    N_BUCKETS,
    bigram_lm_scores,
    classifier_scores,
    doc_bigrams,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).cache()


def _py_bucket(tok: str) -> int:
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:6], 16) % N_BUCKETS


def _py_weight_milli(bucket: int) -> int:
    import hashlib

    return int(hashlib.md5(f"w:{bucket}".encode()).hexdigest()[:6], 16) % 2001 - 1000


def test_classifier_python_golden(spark, docs):
    got = {r.doc_id: r for r in classifier_scores(docs).collect()}
    for row in docs.limit(25).collect():
        toks = [t for t in row.text.split(" ") if t]
        swi = sum(_py_weight_milli(_py_bucket(t)) for t in toks)
        logit = swi / (1000.0 * len(toks))
        r = got[row.doc_id]
        assert r.logit_milli == swi and r.n_tokens == len(toks)
        assert abs(r.logit - logit) < 1e-12
        assert abs(r.score - 1.0 / (1.0 + math.exp(-logit))) < 1e-12


def test_classifier_deterministic_and_bounded(spark, docs):
    a = {r.doc_id: r.score for r in classifier_scores(docs).collect()}
    b = {r.doc_id: r.score for r in classifier_scores(docs).collect()}
    assert a == b
    assert all(0.0 < s < 1.0 for s in a.values())


def test_doc_bigrams_golden(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "solo")], "doc_id long, text string")
    got = {(r.doc_id, r.w1, r.w2) for r in doc_bigrams(df).collect()}
    assert got == {(1, "a", "b"), (1, "b", "c")}


def test_lm_score_python_golden(spark):
    """Tiny corpus, hand-computed add-1 bigram LM."""
    from collections import Counter

    rows = [(1, "a b a b"), (2, "a b c"), (3, "c c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks_all = [t for _, s in rows for t in s.split(" ")]
    uni = Counter(toks_all)
    bigs = Counter()
    for _, s in rows:
        ts = s.split(" ")
        bigs.update(zip(ts, ts[1:]))
    V = len(uni)
    got = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
    for doc_id, s in rows:
        ts = s.split(" ")
        grams = list(zip(ts, ts[1:]))
        want = sum(
            math.log((bigs[g] + 1.0) / (uni[g[0]] + V)) for g in grams
        ) / len(grams)
        assert got[doc_id].n_bigrams == len(grams)
        assert abs(got[doc_id].avg_logp - want) < 1e-12, doc_id


def test_lm_score_invariants(spark, docs):
    """Every score is a log-probability (< 0), every multi-token doc gets
    exactly one row, n_bigrams = n_tokens - 1 on the single-spaced corpus,
    and the computation is deterministic across runs."""
    out = bigram_lm_scores(docs).cache()
    rows = {r.doc_id: r for r in out.collect()}
    n_docs = docs.count()
    assert len(rows) == n_docs  # every testdata doc has ≥ 2 tokens
    tok_counts = {
        r.doc_id: r.n for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    for doc_id, r in rows.items():
        assert r.avg_logp < 0.0
        assert r.n_bigrams == tok_counts[doc_id] - 1
    again = {r.doc_id: r.avg_logp for r in bigram_lm_scores(docs).collect()}
    assert again == {k: v.avg_logp for k, v in rows.items()}
    out.unpersist()
