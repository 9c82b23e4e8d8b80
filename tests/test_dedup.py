"""Dedup operators: exact (with injected dupes), MinHash-LSH recall vs exact
Jaccard, SimHash hamming bucketing, n-gram Jaccard vs python golden."""

import os

import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_near_dups,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).cache()


@pytest.fixture(scope="module")
def docs_with_dupes(spark, docs):
    """Corpus + exact dupes (ids +10000) + near-dupes (ids +20000, one word
    appended)."""
    dupes = docs.limit(20).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = docs.limit(10).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(dupes).unionByName(near).cache()


def test_exact_dedup(spark, docs, docs_with_dupes):
    kept = exact_dedup(docs_with_dupes)
    n_docs = docs.count()
    assert kept.count() == n_docs + 10  # near-dupes kept, exact dupes dropped
    # kept id is the lowest in each dupe group
    assert kept.filter(F.col("doc_id") >= 10000).filter(F.col("doc_id") < 20000).count() == 0
    assert kept.filter(F.col("n_dupes") == 2).count() == 20


def test_shingles_golden(spark, docs):
    row = docs.limit(1).collect()[0]
    sh = {
        r.sh
        for r in shingles(docs.filter(F.col("doc_id") == row.doc_id)).collect()
    }
    t = " ".join(row.text.lower().strip().split())
    golden = {t[i : i + 3] for i in range(max(len(t) - 2, 1))}
    assert sh == golden


def test_ngram_jaccard_finds_near_dupes(spark, docs, docs_with_dupes):
    sub = docs_with_dupes.filter((F.col("doc_id") < 10) | (F.col("doc_id") >= 20000))
    pairs = ngram_jaccard_pairs(sub, threshold=0.8).collect()
    found = {(p.doc_a, p.doc_b) for p in pairs}
    # each near-dup (orig + ' extraword') must pair with its original
    for r in docs.limit(10).collect():
        assert (r.doc_id, r.doc_id + 20000) in found
    for p in pairs:
        assert 0.8 <= p.jaccard <= 1.0


def test_ngram_jaccard_python_golden(spark, docs):
    sub = docs.filter(F.col("doc_id") < 30)
    pairs = {(p.doc_a, p.doc_b): p.jaccard for p in ngram_jaccard_pairs(sub, threshold=0.3).collect()}
    rows = sub.collect()
    sh = {}
    for r in rows:
        t = " ".join(r.text.lower().strip().split())
        sh[r.doc_id] = {t[i : i + 3] for i in range(max(len(t) - 2, 1))}
    for a in sh:
        for b in sh:
            if a < b:
                j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if j >= 0.3:
                    assert pairs[(a, b)] == pytest.approx(j, rel=1e-12)
                else:
                    assert (a, b) not in pairs


def test_minhash_lsh_recall(spark, docs, docs_with_dupes):
    """LSH candidates must include every high-Jaccard pair (recall at the
    0.9+ range is ~1 for 4 bands × 4 rows) and stay far below all-pairs."""
    sub = docs_with_dupes.filter(
        (F.col("doc_id") < 50) | ((F.col("doc_id") >= 20000) & (F.col("doc_id") < 20010))
    ).cache()
    cand = {(p.doc_a, p.doc_b) for p in minhash_lsh_candidates(sub).collect()}
    true_pairs = {
        (p.doc_a, p.doc_b)
        for p in ngram_jaccard_pairs(sub, threshold=0.9).collect()
    }
    assert true_pairs, "fixture should contain high-jaccard pairs"
    missed = true_pairs - cand
    assert not missed, f"LSH missed {missed}"
    n = sub.count()
    assert len(cand) < n * (n - 1) / 4  # meaningfully pruned vs all-pairs


def test_minhash_fast_path_same_recall(spark, docs, docs_with_dupes):
    """xxhash64 production path: different hash values, same LSH structure —
    must still catch every exact-dup pair (identical shingle sets collide in
    every band regardless of hash function)."""
    sub = docs_with_dupes.filter((F.col("doc_id") < 20) | (F.col("doc_id") >= 10000)).cache()
    cand = {(p.doc_a, p.doc_b) for p in minhash_lsh_candidates(sub, hash_fn="xxhash64").collect()}
    for r in docs.limit(20).collect():
        assert (r.doc_id, r.doc_id + 10000) in cand


def test_simhash_deterministic_and_identical_dupes(spark, docs, docs_with_dupes):
    sub = docs_with_dupes.filter((F.col("doc_id") < 10) | (F.col("doc_id") >= 10000)).cache()
    s1 = {r.doc_id: r.simhash for r in simhash(sub).collect()}
    s2 = {r.doc_id: r.simhash for r in simhash(sub).collect()}
    assert s1 == s2
    # identical token set (exact dupes at +10000) → identical simhash
    for r in range(10):
        if r in s1 and r + 10000 in s1:
            assert s1[r] == s1[r + 10000]


def test_simhash_blockjoin_exact_vs_allpairs(spark, docs):
    """The block-join candidate generation must find EXACTLY the pairs an
    all-pairs hamming scan finds (pigeonhole guarantee, not approximation)."""
    sub = docs.filter(F.col("doc_id") < 40).cache()
    got = {(p.doc_a, p.doc_b): p.hamming for p in simhash_near_dups(sub, max_hamming=3).collect()}
    sigs = {r.doc_id: r.simhash for r in simhash(sub).collect()}
    ids = sorted(sigs)
    expected = {}
    for x in ids:
        for y in ids:
            if x < y:
                h = bin(sigs[x] ^ sigs[y]).count("1")
                if h <= 3:
                    expected[(x, y)] = h
    assert got == expected


def test_minhash_bands_partial_final_band(spark, docs):
    """Non-divisible n_seeds must form a partial final band (not drop the
    trailing seeds): 10 seeds / 4 per band -> 3 bands."""
    from pyspark.sql import functions as F

    from gridmet_etl_spark.operators.dedup import minhash_bands

    sub = docs.limit(20)
    bands = minhash_bands(sub, n_seeds=10, rows_per_band=4)
    assert bands.select("band").distinct().count() == 3
    # partial band key differs from any full band's (2 seeds vs 4)
    assert bands.filter(F.col("band") == 2).count() == 20


def test_span_dedup_semantics(spark):
    """First-occurrence keep across and within docs, reassembly digest."""
    import hashlib

    from gridmet_etl_spark.operators.dedup import span_dedup

    rows = [
        (1, "a b c d e f"),   # 2 chunks of 3, all first occurrences
        (2, "a b c d e f"),   # exact dup of doc 1 → loses both chunks
        (3, "a b c x y z"),   # first chunk dup of doc 1's, second kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in span_dedup(df, span_tokens=3).collect()}
    assert (got[1].n_chunks, got[1].n_kept, got[1].n_dup_chunks) == (2, 2, 0)
    assert (got[2].n_chunks, got[2].n_kept, got[2].n_dup_chunks) == (2, 0, 2)
    assert (got[3].n_chunks, got[3].n_kept, got[3].n_dup_chunks) == (2, 1, 1)
    assert got[1].dedup_digest == hashlib.md5(b"a b c d e f").hexdigest()
    assert got[2].dedup_digest == hashlib.md5(b"").hexdigest()
    assert got[3].dedup_digest == hashlib.md5(b"x y z").hexdigest()


def test_span_dedup_within_doc(spark):
    """A doc repeating its own span keeps only the first copy."""
    import hashlib

    from gridmet_etl_spark.operators.dedup import span_dedup

    df = spark.createDataFrame([(7, "p q r p q r p q r")], "doc_id long, text string")
    r = span_dedup(df, span_tokens=3).collect()[0]
    assert (r.n_chunks, r.n_kept, r.n_dup_chunks) == (3, 1, 2)
    assert r.dedup_digest == hashlib.md5(b"p q r").hexdigest()
