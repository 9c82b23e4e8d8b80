"""Tests for text cleaning, vocabulary top-k, and benchmark
decontamination operators."""

from pyspark.sql import functions as F

from gridmet_etl_spark.operators.decontam import decontaminate_exact, decontaminate_fuzzy
from gridmet_etl_spark.operators.textops import clean_text, vocab_topk


def test_clean_text_scrubs_urls_emails_ctrl_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "see https://x.co/a?b=1 and  mail bob@x.co \x07 now\t\tdone")], ["id", "text"]
    )
    got = df.select(clean_text("text").alias("c")).first().c
    assert got == "see <URL> and mail <EMAIL> now done"


def test_clean_text_idempotent(spark):
    df = spark.createDataFrame([(1, " a   b https://q.io x a@b.io \x01")], ["id", "text"])
    once = df.select(clean_text("text").alias("c"))
    twice = once.select(clean_text("c").alias("c"))
    assert once.first().c == twice.first().c


def test_vocab_topk_order_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "b a a c b a"), (2, "c b  d")], ["id", "text"]
    )
    got = [(r.token, r.n) for r in vocab_topk(df, 3).collect()]
    # a:3, b:3 (tie → token asc), c:2; empty token from double space dropped
    assert got == [("a", 3), ("b", 3), ("c", 2)]


def test_decontaminate_exact_flags_normalized_dupes(spark):
    train = spark.createDataFrame(
        [(0, "The   quick brown fox"), (1, "totally unique document")], ["doc_id", "text"]
    )
    ev = spark.createDataFrame([(100, "the quick BROWN fox")], ["doc_id", "text"])
    # fingerprint normalizes case + whitespace → doc 0 is contaminated
    got = {r.doc_id: r.contaminated for r in decontaminate_exact(train, ev).collect()}
    assert got == {0: True, 1: False}


def test_decontaminate_fuzzy_catches_embedded_benchmark_text(spark):
    bench = "the seven secret answers to every question"
    train = spark.createDataFrame(
        [
            (0, "intro text then " + bench + " then trailing words"),  # embeds benchmark
            (1, "zzz qqq vvv kkk www yyy xxx mmm nnn ooo ppp rrr"),  # disjoint alphabet
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(100, bench)], ["doc_id", "text"])
    out = {r.doc_id: (r.n_shared_fps, r.contaminated) for r in
           decontaminate_fuzzy(train, ev, min_shared=3).collect()}
    assert out[0][1] is True and out[0][0] >= 3
    assert out[1][1] is False


def test_decontaminate_fuzzy_full_corpus_unflagged_when_eval_disjoint(spark):
    train = spark.createDataFrame([(i, f"alpha beta gamma delta {i}") for i in range(20)],
                                  ["doc_id", "text"])
    ev = spark.createDataFrame([(99, "omicron sigma upsilon phi chi psi")], ["doc_id", "text"])
    out = decontaminate_fuzzy(train, ev, min_shared=1)
    assert out.filter(F.col("contaminated")).count() == 0
    assert out.count() == 20


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Every exact-contaminated doc is bloom-flagged (guarantee), and the
    false-positive tail stays small at the default geometry."""
    import os

    from pyspark.sql import functions as F

    from gridmet_etl_spark.operators.decontam import (
        decontaminate_bloom,
        decontaminate_exact,
    )

    docs = spark.read.parquet(os.path.join("/root/testdata/sf0.01", "documents.parquet"))
    train = docs.filter(F.col("doc_id") < 400)
    ev = docs.filter(F.col("doc_id") >= 400)
    exact = decontaminate_exact(train, ev)
    bloom = decontaminate_bloom(train, ev)
    j = exact.join(bloom, "doc_id").cache()
    assert j.filter(F.col("contaminated") & ~F.col("bloom_hit")).count() == 0
    clean = j.filter(~F.col("contaminated"))
    fp_rate = clean.filter(F.col("bloom_hit")).count() / max(clean.count(), 1)
    assert fp_rate < 0.05, fp_rate
    j.unpersist()


def test_bloom_corpus_side_join_free(spark):
    """The probe side is a pure scan: no join, no exchange."""
    import os

    from pyspark.sql import functions as F

    from gridmet_etl_spark.operators.decontam import bloom_bitmap, bloom_hit

    docs = spark.read.parquet(os.path.join("/root/testdata/sf0.001", "documents.parquet"))
    bitmap = bloom_bitmap(docs.filter(F.col("doc_id") >= 150))
    probe = docs.filter(F.col("doc_id") < 150).select(
        "doc_id", bloom_hit(F.col("text"), bitmap).alias("hit")
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
