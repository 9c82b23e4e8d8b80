"""Tests for the hashed-embedding RAG pipeline: exact-integer embedding
goldens (Python md5 model), retrieval ranking, and plan shape."""

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.embed import EMBED_DIMS, _MOD, cosine_retrieve, hash_embed
from gridmet_etl_spark.plans.rag import rag_retrieve


def _py_component(tok: str, dim: int) -> int:
    h = int(hashlib.md5(tok.encode()).hexdigest()[4 * dim : 4 * dim + 4], 16)
    return h % _MOD - (_MOD - 1) // 2


def _py_embed(text: str, dims: int = EMBED_DIMS):
    toks = [t for t in text.split(" ") if t]
    return [sum(_py_component(t, d) for t in toks) for d in range(dims)]


def test_hash_embed_matches_python_md5_model(spark):
    texts = ["spark hash join", "window aggregation query", "x"]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    rows = {r["doc_id"]: r for r in hash_embed(df, ["doc_id"]).collect()}
    for i, t in enumerate(texts):
        exp = _py_embed(t)
        got = [rows[i][f"e{d}"] for d in range(EMBED_DIMS)]
        assert got == exp
        assert rows[i]["nrm2"] == sum(e * e for e in exp)


def test_hash_embed_empty_text_zero_vector(spark):
    df = spark.createDataFrame([Row(doc_id=0, text=""), Row(doc_id=1, text="a b")])
    rows = {r["doc_id"]: r for r in hash_embed(df, ["doc_id"]).collect()}
    assert rows[0]["nrm2"] == 0
    assert all(rows[0][f"e{d}"] == 0 for d in range(EMBED_DIMS))
    assert rows[1]["nrm2"] > 0


def test_cosine_retrieve_self_is_top1(spark):
    texts = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    idx = hash_embed(df, ["doc_id"])
    q = hash_embed(
        spark.createDataFrame([Row(query_id=0, text="alpha beta gamma")]),
        ["query_id"],
    )
    hits = cosine_retrieve(idx, q, ["doc_id"], k=3).collect()
    best = min(hits, key=lambda r: r["rank"])
    assert best["doc_id"] == 0 and best["score"] == pytest.approx(1.0)
    # scores within [-1, 1] and non-increasing by rank
    ordered = sorted(hits, key=lambda r: r["rank"])
    assert all(-1.0 <= r["score"] <= 1.0 for r in ordered)
    assert all(
        a["score"] >= b["score"] for a, b in zip(ordered, ordered[1:])
    )


def test_rag_retrieve_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=" ".join(["spark sql join"] * 30)),
            Row(doc_id=1, text=" ".join(["totally unrelated words"] * 30)),
        ]
    )
    out = rag_retrieve(spark, docs, ["spark sql join"], k=2).collect()
    assert len(out) == 2
    top = min(out, key=lambda r: r["rank"])
    assert top["doc_id"] == 0
    assert "spark" in top["chunk_text"]


def test_cosine_retrieve_plan_broadcasts_queries(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=f"tok{i} tok{i+1}") for i in range(200)])
    idx = hash_embed(df, ["doc_id"])
    q = hash_embed(
        spark.createDataFrame([Row(query_id=0, text="tok5 tok6")]), ["query_id"]
    )
    out = cosine_retrieve(idx, q, ["doc_id"], k=5)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
