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


def test_repetition_stats_golden(spark):
    """Repetition fractions vs hand-computed goldens."""
    from collections import Counter

    from gridmet_etl_spark.operators.textops import repetition_stats

    rows = [
        (1, "a b a b a b"),          # heavy bigram repetition
        (2, "u v w x y z"),          # all distinct
        (3, "q"),                    # single token: no bigrams/5-grams
        (4, "s s s s s s s s s s"),  # one word repeated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}

    for doc_id, text in rows:
        toks = text.split(" ")
        for n, col in [(1, "top_word_frac"), (2, "top_bigram_frac")]:
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            want = max(Counter(grams).values()) / len(grams) if grams else 0.0
            assert abs(got[doc_id][col] - want) < 1e-9, (doc_id, col)
        g5 = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
        want5 = (len(g5) - len(set(g5))) / len(g5) if g5 else 0.0
        assert abs(got[doc_id]["dup_5gram_frac"] - want5) < 1e-9
    assert got[3].n_bigrams == 0 and got[3].top_bigram_frac == 0.0
    assert got[4].top_word_frac == 1.0 and got[4].dup_5gram_frac == 5 / 6


def test_repetition_stats_corpus(spark, docs):
    """On the real documents table: fractions in [0,1], no shuffle in the
    plan (row-local design is the point)."""
    from gridmet_etl_spark.operators.textops import repetition_stats

    out = repetition_stats(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    bad = out.filter(
        (F.col("top_bigram_frac") < 0) | (F.col("top_bigram_frac") > 1)
        | (F.col("dup_5gram_frac") < 0) | (F.col("dup_5gram_frac") > 1)
    ).count()
    assert bad == 0


def test_repetition_kernel_matches_column_twin(spark, docs):
    """The Arrow kernel and the column-expression twin are value-identical
    (both exact), so either can back the oracle."""
    from gridmet_etl_spark.operators.textops import repetition_stats, repetition_stats_cols

    a = {r.doc_id: r for r in repetition_stats(docs).collect()}
    b = {r.doc_id: r for r in repetition_stats_cols(docs).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k].n_bigrams == b[k].n_bigrams
        for col in ("top_word_frac", "top_bigram_frac", "dup_5gram_frac"):
            assert abs(a[k][col] - b[k][col]) < 1e-12, (k, col)


def test_domain_flags_golden(spark):
    from gridmet_etl_spark.operators.textops import domain_flags

    rows = [
        (1, "x https://Bad.com/a http://ok.org/b https://bad.com/c y"),
        (2, "no links here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in domain_flags(df, ["bad.com"]).collect()}
    assert sorted(got[1].domains) == ["bad.com", "ok.org"]
    assert got[1].n_links == 3 and got[1].blocklisted
    assert got[2].domains == [] and got[2].n_links == 0 and not got[2].blocklisted
