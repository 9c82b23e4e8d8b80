"""Text-analysis operators vs python-computed goldens on the driver's
documents table."""

import os

import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.textops import (
    LANG_MARKERS,
    STOPWORDS,
    analyze_documents,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    token_count_bpe,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).cache()


def test_token_count(spark, docs):
    res = docs.select("doc_id", "text", token_count("text").alias("n")).limit(20).collect()
    for r in res:
        assert r.n == len(r.text.split(" "))


def test_token_count_bpe(spark):
    df = spark.createDataFrame([("hello, world 123 foo-bar",)], ["text"])
    n = df.select(token_count_bpe("text").alias("n")).collect()[0].n
    # hello , world 123 foo - bar → 7
    assert n == 7


def test_lang_id_markers(spark):
    rows = [
        ("the cat and the dog of a house", "en"),
        ("el perro de la casa que ladra y", "es"),
        ("der hund und die katze ist das", "de"),
        ("xyzzy plugh qwerty", "und"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    preds = [r[0] for r in df.select(lang_id("text")).collect()]
    assert preds == [lang for _, lang in rows]


def test_lang_id_python_parity(spark, docs):
    """Spark lang_id == reference python implementation on real docs."""
    sample = docs.limit(30).collect()
    preds = {
        r.doc_id: p.lang_pred
        for r, p in zip(sample, analyze_documents(spark.createDataFrame(sample)).limit(30).collect())
    }
    for r in sample:
        toks = r.text.split(" ")
        scores = {
            lang: sum(1 for t in toks if t in set(markers))
            for lang, markers in LANG_MARKERS.items()
        }
        best, best_s = "und", 0
        for lang in ["en", "es", "de", "fr", "zh"]:
            if scores[lang] > best_s:
                best, best_s = lang, scores[lang]
        assert preds[r.doc_id] == best, r.doc_id


def test_quality_score_bounded(spark, docs):
    qs = analyze_documents(docs).select("quality").toPandas()["quality"]
    assert (qs >= 0).all() and (qs <= 1).all()


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], ["text"])
    fps = [r[0] for r in df.select(fingerprint("text")).collect()]
    assert fps[0] == fps[1]


def test_analyze_single_projection_no_shuffle(spark, docs):
    """analyze_documents must stay a narrow projection (no exchange)."""
    plan = analyze_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
