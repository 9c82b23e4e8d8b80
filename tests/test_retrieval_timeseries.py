"""Tests for the round-2 retrieval / chunking / sampling / timeseries batch:
BM25 ranked retrieval, PMI collocations, sliding-window chunking, weighted
reservoir sampling, curriculum ordering, climatology anomaly, and linear
gap-fill. Golden values are computed with plain Python math on tiny inputs.
"""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.chunking import chunk_windows
from gridmet_etl_spark.operators.retrieval import BM25_B, BM25_K1, bm25_topk, pmi_bigrams
from gridmet_etl_spark.operators.sampling import (
    CURRICULUM_THRESHOLDS,
    curriculum_order,
    weighted_sample,
)
from gridmet_etl_spark.operators.timeseries import climatology_anomaly, gap_fill_linear


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


# ---------------------------------------------------------------- BM25 ----


def test_bm25_golden(spark):
    texts = ["a b a c", "a d", "b b b", "c c d d"]
    out = bm25_topk(_docs(spark, texts), ["a", "b"], k=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 3 matches neither term
    assert set(rows) == {0, 1, 2}
    n, avgdl = 4, 13 / 4  # dls 4+2+3+4

    def score(tf, dl, df):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (BM25_K1 + 1) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
        )

    # doc 0: a x2 (df 2), b x1 (df 2), dl 4
    exp0 = score(2, 4, 2) + score(1, 4, 2)
    assert rows[0]["score"] == pytest.approx(exp0, abs=1e-6)
    assert rows[0]["n_matched"] == 2
    # doc 2: b x3, dl 3
    assert rows[2]["score"] == pytest.approx(score(3, 3, 2), abs=1e-6)
    # ranking is by score desc
    ordered = [r["doc_id"] for r in out.collect()]
    scores = [rows[d]["score"] for d in ordered]
    assert scores == sorted(scores, reverse=True)


def test_bm25_explode_bounded_by_matches(spark):
    # non-matching tokens never survive the pre-explode filter: a doc of
    # 1000 junk tokens contributes zero exploded rows
    texts = [" ".join(["junk"] * 1000) + " a", "a b"]
    out = bm25_topk(_docs(spark, texts), ["a", "b"], k=10).collect()
    assert {r["doc_id"] for r in out} == {0, 1}


# ----------------------------------------------------------------- PMI ----


def test_pmi_golden(spark):
    # "x y" appears in every doc; unigram counts: x:3 y:3 z:2
    texts = ["x y z", "x y", "x y z"]
    out = pmi_bigrams(_docs(spark, texts), min_count=2, k=10).collect()
    by = {r["bigram"]: r for r in out}
    assert by["x y"]["c_xy"] == 3
    n1, n2 = 8, 5  # total unigrams, total bigrams
    exp = math.log((3 / n2) / ((3 / n1) * (3 / n1)))
    assert by["x y"]["pmi"] == pytest.approx(exp, abs=1e-6)
    # y z occurs twice
    assert by["y z"]["c_xy"] == 2
    assert set(by) == {"x y", "y z"}


# ------------------------------------------------------------ chunking ----


def test_chunk_windows_golden(spark):
    toks = [f"t{i}" for i in range(10)]
    out = chunk_windows(_docs(spark, [" ".join(toks)]), window=4, stride=3)
    rows = sorted(out.collect(), key=lambda r: r["chunk_id"])
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t3 t4 t5 t6"
    assert rows[3]["chunk_text"] == "t9"  # trailing partial chunk
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 1]


def test_chunk_windows_single_token_doc(spark):
    rows = chunk_windows(_docs(spark, ["only"]), window=8, stride=4).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "only"


# ---------------------------------------------------- weighted sampling ----


def test_weighted_sample_invariants(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=f"d{i:03d}", n_chars=(i % 7 + 1) * 100) for i in range(300)]
    )
    out = weighted_sample(docs, k=50).collect()
    assert len(out) == 50
    keys = [r["wrs_key"] for r in out]
    assert keys == sorted(keys, reverse=True)
    assert len({r["doc_id"] for r in out}) == 50
    # deterministic across invocations
    again = weighted_sample(docs, k=50).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in out]


def test_weighted_sample_biases_toward_heavy(spark):
    # two weight classes 100x apart: heavy docs must dominate the sample
    docs = spark.createDataFrame(
        [Row(doc_id=f"h{i:03d}", n_chars=10000) for i in range(150)]
        + [Row(doc_id=f"l{i:03d}", n_chars=100) for i in range(150)]
    )
    out = weighted_sample(docs, k=60).collect()
    heavy = sum(1 for r in out if r["doc_id"].startswith("h"))
    assert heavy >= 50


# ---------------------------------------------------------- curriculum ----


def test_curriculum_stage_assignment(spark):
    # difficulty = floor(chars*1000/tokens); craft docs per tier
    def doc_with_mean_len(mean):  # mean word length incl. separator
        return " ".join(["x" * (mean - 1)] * 50)

    t1, t2, t3 = CURRICULUM_THRESHOLDS
    docs = _docs(
        spark,
        [
            doc_with_mean_len(5),  # 5*1000 - tail -> easy
            doc_with_mean_len(6),  # 6000 - tail -> hard
        ],
    )
    rows = sorted(curriculum_order(docs).collect(), key=lambda r: r["doc_id"])
    assert rows[0]["stage"] == 0 and rows[0]["difficulty"] < t1
    assert rows[1]["stage"] == 3 and rows[1]["difficulty"] >= t3
    # order_key deterministic
    again = sorted(curriculum_order(docs).collect(), key=lambda r: r["doc_id"])
    assert [r["order_key"] for r in again] == [r["order_key"] for r in rows]


# --------------------------------------------------------- climatology ----


def test_climatology_anomaly_sums_to_zero(spark, grid):
    out = climatology_anomaly(grid, keys=("var", "ens", "i", "j"))
    chk = (
        out.groupBy("var", "ens", "i", "j")
        .agg(F.sum("anomaly").alias("s"), F.count("anomaly").alias("n"))
        .where(F.abs(F.col("s")) > 1e-6)
    )
    assert chk.count() == 0
    # clim constant within group
    nuniq = (
        out.groupBy("var", "ens", "i", "j")
        .agg(F.countDistinct("clim").alias("u"))
        .where(F.col("u") > 1)
    )
    assert nuniq.count() == 0


# ------------------------------------------------------------ gap fill ----


def _series(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, time=t, value=v) for k, t, v in rows],
        "k string, time timestamp, value double",
    )


def test_gap_fill_linear_golden(spark):
    from datetime import datetime

    d = lambda day: datetime(2020, 1, day)  # noqa: E731
    df = _series(
        spark,
        [
            ("a", d(1), 10.0),
            ("a", d(2), None),  # interp 10 -> 16 at 1/3: 12.0
            ("a", d(4), 16.0),
            ("a", d(5), None),  # trailing: ffill 16
            ("b", d(1), None),  # leading: bfill 5
            ("b", d(2), 5.0),
        ],
    )
    out = gap_fill_linear(df, "k", "time", "value")
    got = {(r["k"], r["t_us"]): r for r in out.collect()}
    us = lambda day: int(datetime(2020, 1, day).timestamp() * 1e6)  # noqa: E731
    assert got[("a", us(2))]["filled"] == pytest.approx(12.0)
    assert got[("a", us(2))]["was_null"] is True
    assert got[("a", us(5))]["filled"] == pytest.approx(16.0)
    assert got[("b", us(1))]["filled"] == pytest.approx(5.0)
    assert got[("a", us(1))]["filled"] == pytest.approx(10.0)


def test_gap_fill_all_null_key_stays_null(spark):
    from datetime import datetime

    df = _series(
        spark,
        [("c", datetime(2020, 1, 1), None), ("c", datetime(2020, 1, 2), None)],
    )
    out = gap_fill_linear(df, "k", "time", "value").collect()
    assert all(r["filled"] is None for r in out)


def test_gap_fill_composite_key_no_cross_leak(spark, grid):
    out = gap_fill_linear(
        grid, key_cols=("var", "ens", "i", "j"), ts_col="time", value_col="value"
    )
    # non-null inputs pass through untouched
    bad = out.where(
        F.col("value").isNotNull() & (F.col("filled") != F.col("value"))
    ).count()
    assert bad == 0
    # every gap with at least one non-null neighbor in its series is filled
    still_null = out.where(F.col("was_null") & F.col("filled").isNull())
    series_with_data = (
        grid.where(F.col("value").isNotNull())
        .select("var", "ens", "i", "j")
        .distinct()
    )
    leaked = still_null.join(
        series_with_data, ["var", "ens", "i", "j"], "left_semi"
    ).count()
    assert leaked == 0
