"""Tests for the link-graph / inverted-index / resample batch: PageRank
against a numpy power-iteration golden, posting-list exactness, and
bucketed downsampling invariants.
"""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.graph import link_graph, pagerank
from gridmet_etl_spark.operators.retrieval import inverted_index
from gridmet_etl_spark.operators.timeseries import resample_time


def test_link_graph_extraction(spark):
    pages = spark.createDataFrame(
        [
            Row(
                page_id=0,
                url="https://A.test/home",
                text="see https://b.test/x and https://C.test/y and https://a.test/self",
            ),
            Row(page_id=1, url="https://b.test/", text="no links here"),
        ]
    )
    edges = {(r["src"], r["dst"]) for r in link_graph(pages).collect()}
    # hosts lowercased, self-loop (a.test -> a.test) dropped
    assert edges == {("a.test", "b.test"), ("a.test", "c.test")}


def _numpy_pagerank(edges, d=0.85, iters=5):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {s: sum(1 for e in edges if e[0] == s) for s, _ in edges}
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        for s, t in edges:
            nxt[idx[t]] += d * r[idx[s]] / out[s]
        r = nxt
    return {nd: r[idx[nd]] for nd in nodes}


def test_pagerank_matches_numpy_golden(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "a"), ("e", "a"),
    ]
    df = spark.createDataFrame([Row(src=s, dst=t) for s, t in edges])
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=5).collect()}
    exp = _numpy_pagerank(edges)
    assert set(got) == set(exp)
    for node, val in exp.items():
        assert got[node] == pytest.approx(val, abs=1e-12)
    # c has the most in-mass, e none beyond teleport
    assert got["c"] > got["b"] > 0
    assert min(got, key=got.get) in {"d", "e"}


def test_pagerank_checkpoint_path(spark):
    # checkpoint_every smaller than iters exercises the lineage truncation
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame([Row(src=s, dst=t) for s, t in edges])
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=6, checkpoint_every=2).collect()}
    exp = _numpy_pagerank(edges, iters=6)
    for node, val in exp.items():
        assert got[node] == pytest.approx(val, abs=1e-12)


def test_inverted_index_golden(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=3, text="b a b"),
            Row(doc_id=1, text="a b"),
            Row(doc_id=2, text="a  a"),  # double space -> empty token dropped
        ]
    )
    rows = {r["term"]: r for r in inverted_index(docs, min_df=1).collect()}
    assert rows["a"]["df"] == 3 and rows["a"]["total_tf"] == 4
    # postings ordered by doc_id regardless of input order
    assert rows["a"]["postings"] == "1:1,2:2,3:1"
    assert rows["b"]["postings"] == "1:1,3:2"
    assert set(rows) == {"a", "b"}
    # min_df filter
    only = inverted_index(docs.where(F.col("doc_id") < 3), min_df=2).collect()
    assert {r["term"] for r in only} == {"a", "b"} - {"b"} | {"a"}  # b df=1 dropped


def test_resample_time_weekly(spark, grid):
    out = resample_time(grid, freq="week")
    rows = out.collect()
    # conservation: per-series row counts sum back to the series length
    total = sum(r["n_rows"] for r in rows)
    assert total == grid.count()
    for r in rows[:50]:
        if r["n_obs"] > 0:
            assert r["vmin"] <= r["vmean"] <= r["vmax"]
        else:
            assert r["vmean"] is None
    # bucket boundaries are Mondays
    mondays = out.select(F.dayofweek("bucket").alias("d")).distinct().collect()
    assert {r["d"] for r in mondays} == {2}  # Spark dayofweek: Monday == 2
