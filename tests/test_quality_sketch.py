"""Gopher/C4 quality rules, TF-IDF, and count-min sketch vs python goldens."""

import math
import os

import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.quality import c4_clean, gopher_flags
from gridmet_etl_spark.operators.sketch import cms_build, cms_estimate
from gridmet_etl_spark.operators.textops import tfidf_topk, vocab_topk

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "fixtures")
SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Gopher
# ---------------------------------------------------------------------------


def test_gopher_golden(spark):
    long_ok = " ".join(["the"] * 25 + ["word"] * 30)  # 55 words, stops ok
    short = "tiny doc the the"  # 4 words
    symbols = " ".join(["the", "the"] + ["#"] * 20 + ["word"] * 50)
    df = spark.createDataFrame(
        [(0, long_ok), (1, short), (2, symbols)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in gopher_flags(df).collect()}
    assert rows[0].n_words == 55 and rows[0].word_count_ok and rows[0].gopher_pass
    assert not rows[1].word_count_ok and not rows[1].gopher_pass
    # '#' tokens: symbol ratio 20/72 > 0.1 and alpha frac 52/72 < 0.8
    assert not rows[2].symbol_ok and not rows[2].alpha_ok


def test_gopher_line_rules(spark):
    bullets = "\n".join(["- item one here"] * 9 + ["a plain line"])  # 90% bullets
    ellipses = "\n".join(["the line trails off..."] * 2 + ["a normal line"])
    df = spark.createDataFrame([(0, bullets), (1, ellipses)], ["doc_id", "text"])
    rows = {r.doc_id: r for r in gopher_flags(df).collect()}
    assert rows[0].bullet_ratio == pytest.approx(0.9) and rows[0].bullet_ok
    assert rows[1].ellipsis_ratio == pytest.approx(2 / 3) and not rows[1].ellipsis_ok


def test_gopher_webpages_discriminates(spark):
    pages = spark.read.parquet(os.path.join(FIXDIR, "webpages.parquet"))
    out = gopher_flags(pages, id_col="page_id").collect()
    # fixture mixes bullet/ellipsis lines in: ratios must actually vary
    assert any(r.bullet_ratio > 0 for r in out)
    assert any(r.ellipsis_ratio > 0 for r in out)
    for r in out:
        for c in ("symbol_ratio", "bullet_ratio", "ellipsis_ratio", "alpha_frac"):
            assert 0.0 <= getattr(r, c) <= 1.0


# ---------------------------------------------------------------------------
# C4
# ---------------------------------------------------------------------------


def test_c4_golden(spark):
    good = "this line has five words.\nnav menu\nanother proper sentence right here!"
    short_lines = "too short.\nalso tiny!"
    lorem = "one two three four five.\nsix seven eight nine ten.\na b c d e.\nlorem ipsum"
    brace = "one two three four five.\nsix seven eight nine ten.\na b c d e.\nvar x = {}"
    three = "one two three four five.\nsix seven eight nine ten!\nw x y z q?"
    df = spark.createDataFrame(
        list(enumerate([good, short_lines, lorem, brace, three])), ["page_id", "text"]
    )
    rows = {r.page_id: r for r in c4_clean(df).collect()}
    assert rows[0].n_lines_kept == 2 and rows[0].n_sentences == 2
    assert not rows[0].c4_keep  # only 2 sentences
    assert rows[1].n_lines_kept == 0 and rows[1].clean_body == ""
    assert rows[2].has_lorem and not rows[2].c4_keep
    assert rows[3].has_brace and not rows[3].c4_keep
    assert rows[4].c4_keep and rows[4].n_sentences == 3


def test_c4_python_twin_on_fixture(spark):
    import re

    pages = spark.read.parquet(os.path.join(FIXDIR, "webpages.parquet"))
    out = {r.page_id: r for r in c4_clean(pages).collect()}
    for row in pages.collect():
        lines = row.text.split("\n")
        kept = [
            l
            for l in lines
            if re.search(r'[.!?"]$', l) and len(re.findall(r"\S+", l)) >= 5
        ]
        body = "\n".join(kept)
        r = out[row.page_id]
        assert r.n_lines == len(lines) and r.n_lines_kept == len(kept)
        assert r.clean_body == body
        assert r.n_sentences == len(re.findall(r"[.!?]", body))
        want_keep = (
            r.n_sentences >= 3
            and "lorem ipsum" not in row.text.lower()
            and "{" not in row.text
        )
        assert r.c4_keep == want_keep


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def test_tfidf_golden(spark):
    df = spark.createDataFrame(
        [(0, "cat cat dog"), (1, "dog bird"), (2, "bird bird bird fish")],
        ["doc_id", "text"],
    )
    out = tfidf_topk(df, k=2).collect()
    byrank = {(r.doc_id, r.rank): r for r in out}

    def idf(dfc):
        return math.log((1 + 3) / (1 + dfc)) + 1

    # doc 0: cat tf=2 df=1 → 2*idf(1); dog tf=1 df=2 → idf(2). cat ranks 1st.
    assert byrank[(0, 1)].term == "cat"
    assert byrank[(0, 1)].tfidf == pytest.approx(round(2 * idf(1), 6))
    assert byrank[(0, 2)].term == "dog"
    # doc 2: bird tf=3 df=2 beats fish tf=1 df=1
    assert byrank[(2, 1)].term == "bird"
    assert byrank[(2, 1)].tfidf == pytest.approx(round(3 * idf(2), 6))
    assert all(r.rank <= 2 for r in out)


def test_tfidf_tie_break_deterministic(spark):
    # identical tf/df for all terms → rank ordered by term asc
    df = spark.createDataFrame([(0, "b a c")], ["doc_id", "text"])
    out = tfidf_topk(df, k=3).orderBy("rank").collect()
    assert [r.term for r in out] == ["a", "b", "c"]


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_underestimates(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    sketch = cms_build(docs)
    top = vocab_topk(docs, k=30)
    est = cms_estimate(top, sketch).collect()
    assert len(est) == min(30, top.count())
    for r in est:
        assert r.est >= r.n  # CMS overestimates, never under


def test_cms_exact_when_no_collisions(spark):
    # single-token corpus: the only occupied cells belong to that token
    df = spark.createDataFrame([(0, "alpha alpha alpha")], ["doc_id", "text"])
    sketch = cms_build(df)
    tok = spark.createDataFrame([("alpha",)], ["token"])
    [r] = cms_estimate(tok, sketch).collect()
    assert r.est == 3
    # sketch has exactly depth occupied cells (one per row), each cnt=3
    cells = sketch.collect()
    assert len(cells) == 4 and all(c.cnt == 3 for c in cells)


def test_cms_unknown_token_zero(spark):
    df = spark.createDataFrame([(0, "alpha beta")], ["doc_id", "text"])
    sketch = cms_build(df)
    tok = spark.createDataFrame([("never-seen-token-xyz",)], ["token"])
    [r] = cms_estimate(tok, sketch).collect()
    # min over rows is 0 unless EVERY row collides; with 2 tokens in 256
    # buckets a 4-row full collision is astronomically unlikely (and
    # deterministic for this fixed token set: assert the actual value)
    assert r.est == 0
