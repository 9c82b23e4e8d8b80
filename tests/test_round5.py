"""Round-5 operator tests: star-expanded LSH candidates, corpus-wide
line dedup, temperature mixture weights."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# minhash_lsh_star
# ---------------------------------------------------------------------------


def test_star_candidates_same_components_as_all_pairs(spark):
    """The load-bearing claim: star edges span the SAME connected
    components as the quadratic all-pairs bucket join (a star is a
    spanning tree of the bucket clique), so dedup clustering is unchanged."""
    from gridmet_etl_spark.operators.cluster import connected_components
    from gridmet_etl_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_star,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).filter(
        F.col("doc_id") < 200
    )
    allp = minhash_lsh_candidates(docs)
    star = minhash_lsh_star(docs)
    comp_all = {
        (r.node, r.cluster_id) for r in connected_components(allp).collect()
    }
    comp_star = {
        (r.node, r.cluster_id) for r in connected_components(star).collect()
    }
    assert comp_all == comp_star
    assert len(comp_all) > 0  # the slice does contain near-dup buckets


def test_star_is_subset_and_linear(spark):
    from gridmet_etl_spark.operators.dedup import (
        minhash_bands,
        minhash_lsh_candidates,
        minhash_lsh_star,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).filter(
        F.col("doc_id") < 200
    )
    allp = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidates(docs).collect()}
    star = {(r.doc_a, r.doc_b) for r in minhash_lsh_star(docs).collect()}
    assert star <= allp
    # linear bound: at most one edge per non-rep member per band
    n_band_rows = minhash_bands(docs).count()
    assert len(star) <= n_band_rows


def test_star_known_bucket(spark):
    """Three identical docs + one distinct: star pairs (min, other) only."""
    from gridmet_etl_spark.operators.dedup import minhash_lsh_star

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (9, "completely unrelated text about spark shuffles"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_a, r.doc_b) for r in minhash_lsh_star(docs).collect()}
    assert got == {(1, 2), (1, 3)}


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------


def _lines_df(spark, rows):
    from gridmet_etl_spark.operators.dedup import split_lines

    return split_lines(spark.createDataFrame(rows, ["doc_id", "text"]))


def test_line_dedup_first_occurrence_wins(spark):
    from gridmet_etl_spark.operators.dedup import line_dedup

    rows = [
        (1, "alpha\nshared boilerplate\nbeta"),
        (2, "shared boilerplate\ngamma"),
        (3, "shared boilerplate"),
    ]
    out = {r.doc_id: r for r in line_dedup(_lines_df(spark, rows)).collect()}
    assert out[1].text == "alpha\nshared boilerplate\nbeta"
    assert (out[1].n_lines, out[1].n_kept) == (3, 3)
    assert out[2].text == "gamma"
    assert (out[2].n_lines, out[2].n_kept) == (2, 1)
    # every line a dup seen earlier → empty doc, not a missing row
    assert out[3].text == "" and out[3].n_kept == 0 and out[3].n_lines == 1


def test_line_dedup_within_doc_duplicates(spark):
    from gridmet_etl_spark.operators.dedup import line_dedup

    rows = [(5, "x\ny\nx\nx")]
    out = line_dedup(_lines_df(spark, rows)).collect()[0]
    assert out.text == "x\ny"
    assert (out.n_lines, out.n_kept) == (4, 2)


def test_line_dedup_order_preserved(spark):
    from gridmet_etl_spark.operators.dedup import line_dedup

    text = "\n".join(f"line {i}" for i in range(20))
    out = line_dedup(_lines_df(spark, [(1, text)])).collect()[0]
    assert out.text == text  # unique lines: reassembly must be lossless


# ---------------------------------------------------------------------------
# mixture_weights
# ---------------------------------------------------------------------------


def test_mixture_weights_flattens(spark):
    """α=0.5 pulls shares toward uniform: small sources gain, big lose."""
    from gridmet_etl_spark.operators.sampling import mixture_weights

    rows = [("big", i) for i in range(90)] + [("small", i) for i in range(10)]
    docs = spark.createDataFrame(rows, ["source", "doc_id"])
    out = {r.source: r for r in mixture_weights(docs, "source").collect()}
    assert out["big"].share_raw == pytest.approx(0.9)
    assert out["small"].share_raw == pytest.approx(0.1)
    assert out["big"].share_temp < 0.9 and out["small"].share_temp > 0.1
    assert out["big"].share_temp + out["small"].share_temp == pytest.approx(1.0, abs=1e-5)
    assert out["big"].n_docs == 90 and out["big"].size == 90


def test_mixture_weights_size_col(spark):
    from gridmet_etl_spark.operators.sampling import mixture_weights

    rows = [("a", 1, 400), ("a", 2, 0), ("b", 3, 100)]
    docs = spark.createDataFrame(rows, ["source", "doc_id", "n_tok"])
    out = {
        r.source: r
        for r in mixture_weights(docs, "source", size_col="n_tok").collect()
    }
    assert out["a"].share_raw == pytest.approx(0.8)
    # sqrt weighting: 20 vs 10 → 2/3 vs 1/3
    assert out["a"].share_temp == pytest.approx(2 / 3, abs=1e-6)
    assert out["b"].share_temp == pytest.approx(1 / 3, abs=1e-6)


# ---------------------------------------------------------------------------
# streaming line dedup
# ---------------------------------------------------------------------------


def test_streaming_line_dedup_matches_batch(spark, tmp_path):
    """Docs arriving in doc_id order across micro-batches must reassemble
    exactly as the batch line_dedup of the union (first-arrived ==
    first-(doc_id, line_no)); a re-drain changes nothing (idempotence)."""
    from pyspark.sql import types as T

    from gridmet_etl_spark.operators.dedup import line_dedup, split_lines
    from gridmet_etl_spark.streaming.line_stream import incremental_line_dedup

    rows1 = [
        (1, "alpha\nshared boilerplate\nbeta"),
        (2, "shared boilerplate\ngamma"),
    ]
    rows2 = [
        (3, "shared boilerplate\ndelta\ngamma"),  # both lines dups of batch 1
        (4, "epsilon\nepsilon"),  # within-doc dup in a later batch
    ]
    landing = str(tmp_path / "landing")
    for rows in (rows1, rows2):
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    out, seen, ck = (
        str(tmp_path / "out"),
        str(tmp_path / "seen"),
        str(tmp_path / "ck"),
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = incremental_line_dedup(stream, out, seen, ck)
    q.awaitTermination()

    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.text)
        for r in spark.read.parquet(out).collect()
    }
    batch_docs = spark.createDataFrame(rows1 + rows2, ["doc_id", "text"])
    want = {
        r.doc_id: (r.n_lines, r.n_kept, r.text)
        for r in line_dedup(split_lines(batch_docs)).collect()
    }
    assert got == want
    assert got[3] == (3, 1, "delta")
    assert got[4] == (2, 1, "epsilon")

    # re-drain: no new files → no new batches, output unchanged
    q2 = incremental_line_dedup(
        spark.readStream.schema(schema).parquet(landing), out, seen, ck
    )
    q2.awaitTermination()
    assert {
        r.doc_id: (r.n_lines, r.n_kept, r.text)
        for r in spark.read.parquet(out).collect()
    } == want


# ---------------------------------------------------------------------------
# corpus_pipeline_v3
# ---------------------------------------------------------------------------


def test_corpus_v3_invariants(spark):
    """Canonical-only manifest, per-source share_temp constant and summing
    to 1, n_members ≥ 1, token counts consistent with kept lines."""
    from gridmet_etl_spark.contract_ext8 import q_corpus_pipeline_v3

    out = q_corpus_pipeline_v3(spark, SF_DIR).collect()
    assert len(out) > 0
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids))
    shares = {}
    for r in out:
        assert r.n_members >= 1
        assert 0 < r.n_kept <= r.n_lines
        assert r.split in ("train", "val", "test")
        shares[r.source] = r.share_temp
    assert abs(sum(shares.values()) - 1.0) < 1e-4


def test_corpus_v3_drops_boilerplate_and_clones(spark):
    """Hand corpus: doc 2 is a clone of doc 1 (exact dedup), doc 3 is all
    boilerplate (gate), doc 4 is a near-dup of doc 1 (LSH cluster), doc 5
    is independent — manifest keeps 1 (n_members 2) and 5."""
    from gridmet_etl_spark.plans.corpus import corpus_pipeline_v3

    b = "common header line"
    d1 = f"{b}\nthe quick brown fox jumps over the lazy dog\nunique tail one"
    # d4 shares NO exact line with d1 (line dedup runs first!) but is
    # shingle-near-identical post-dedup → LSH folds it into d1's cluster
    d4 = f"{b} z\nthe quick brown fox jumps over the lazy dogz\nunique tail onez"
    d5 = f"{b}\ncompletely different content about shuffle exchanges here"
    rows = [(1, "a", d1), (2, "a", d1), (3, "b", b), (4, "a", d4), (5, "b", d5)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r.doc_id: r for r in corpus_pipeline_v3(docs, keep_num=1, keep_den=4).collect()}
    assert set(out) == {1, 5}
    assert out[1].n_members == 2  # doc 4 folded in as a near-dup
    assert out[1].n_lines == 3 and out[1].n_kept == 3
    # doc 5 lost its boilerplate header line (dup of doc 1's) but survived
    assert out[5].n_kept == 1 and out[5].n_lines == 2


# ---------------------------------------------------------------------------
# jl_project / tfidf_topk_terms
# ---------------------------------------------------------------------------


def test_jl_project_shape_and_determinism(spark):
    from gridmet_etl_spark.operators.linalg import jl_project

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).limit(50)
    a = sorted((r.vec_id, r.j, r.value) for r in jl_project(emb).collect())
    b = sorted((r.vec_id, r.j, r.value) for r in jl_project(emb).collect())
    assert a == b
    ids = {x[0] for x in a}
    assert all(sum(1 for x in a if x[0] == i) == 8 for i in ids)


def test_jl_project_preserves_distances_roughly(spark):
    """JL guarantee is probabilistic; with m=16 on unit-ish 64-dim vectors
    check the pairwise-distance ratio stays within a loose (0.3, 3)
    envelope for a sample — catches sign-matrix bugs (a constant or
    degenerate matrix collapses distances entirely)."""
    import math

    from gridmet_etl_spark.operators.linalg import jl_project

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).filter(
        F.col("vec_id") < 12
    )
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    proj = {}
    for r in jl_project(emb, out_dim=16, ndigits=6).collect():
        proj.setdefault(r.vec_id, [0.0] * 16)[r.j] = r.value
    ids = sorted(orig)
    ratios = []
    for a in ids:
        for b in ids:
            if a < b:
                d0 = math.dist(orig[a], orig[b])
                d1 = math.dist(proj[a], proj[b])
                if d0 > 1e-9:
                    ratios.append(d1 / d0)
    assert ratios and all(0.3 < r < 3.0 for r in ratios)


def test_tfidf_topk_terms_golden(spark):
    from gridmet_etl_spark.operators.retrieval import tfidf_topk_terms

    rows = [
        (1, "apple apple banana common"),
        (2, "banana cherry common"),
        (3, "common cherry cherry durian"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_topk_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rnk, r.token, r.tf, r.score))
    # 'common' (df=3) has idf=ln(1)=0 → never a top term over real signals
    assert by_doc[1][0][1] == "apple" and by_doc[1][0][2] == 2
    assert all(t != "common" or s == 0.0 for d in by_doc.values() for _, t, _, s in d)
    # doc 3: cherry (tf=2, df=2) beats durian (tf=1, df=1)?
    # scores: cherry 2*ln(1.5)=0.811, durian 1*ln(3)=1.099 → durian first
    assert by_doc[3][0][1] == "durian"
    assert [r for r, *_ in by_doc[3]] == [1, 2]


# ---------------------------------------------------------------------------
# cms_join_size / bias_als
# ---------------------------------------------------------------------------


def test_cms_join_size_bounds(spark):
    """AMS/CMS estimate never under-counts (min of over-estimates) and
    stays within collision-inflation range on the real orders⋈lineitem."""
    from gridmet_etl_spark.operators.sketch import cms_join_size

    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        F.col("o_orderkey").alias("jk")
    )
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        F.col("l_orderkey").alias("jk")
    )
    exact = o.join(li, "jk").count()
    est = cms_join_size(o, li, "jk").collect()[0].est_rows
    assert est >= exact
    # expected collision inflation of one sketch row is |A|·|B|/width;
    # the min over 4 rows stays within a small multiple of it
    na, nb = o.count(), li.count()
    assert est <= exact + 3 * na * nb // 256


def test_cms_join_size_exact_when_collision_free(spark):
    """Disjoint single-key relations: inner product = true product."""
    from gridmet_etl_spark.operators.sketch import cms_join_size

    a = spark.createDataFrame([(1,)] * 7, ["k"])
    b = spark.createDataFrame([(1,)] * 3, ["k"])
    assert cms_join_size(a, b, "k").collect()[0].est_rows == 21


def test_bias_als_matches_numpy_replay(spark):
    import numpy as np

    from gridmet_etl_spark.operators.recommend import bias_als

    rows = [
        (1, "a", 5.0), (1, "b", 3.0), (2, "a", 4.0),
        (2, "b", 1.0), (3, "a", 5.0),
    ]
    reg = 2.0
    got = {
        r.item_id: (r.b_i, r.n_ratings)
        for r in bias_als(
            spark.createDataFrame(rows, ["user_id", "item_id", "rating"]),
            reg=reg,
        ).collect()
    }
    mu = np.mean([v for _, _, v in rows])
    bu, bi = {}, {"a": 0.0, "b": 0.0}
    for _ in range(2):
        bu = {}
        for u in {r[0] for r in rows}:
            terms = [v - mu - bi[i] for uu, i, v in rows if uu == u]
            bu[u] = sum(terms) / (len(terms) + reg)
        bi = {}
        for i in {r[1] for r in rows}:
            terms = [v - mu - bu[u] for u, ii, v in rows if ii == i]
            bi[i] = sum(terms) / (len(terms) + reg)
    for i in ("a", "b"):
        assert got[i][0] == pytest.approx(round(bi[i], 4), abs=2e-4)
    assert got["a"][1] == 3 and got["b"][1] == 2
    # popular well-liked item gets positive bias, disliked one negative
    assert got["a"][0] > 0 > got["b"][0]


# ---------------------------------------------------------------------------
# randomized invariants (fixed seeds — one Spark job per case, not per example)
# ---------------------------------------------------------------------------


def test_line_dedup_invariants_random(spark):
    """Random corpora: (1) kept-line multiset == distinct line set of the
    corpus; (2) Σ n_kept == |distinct lines|; (3) every doc's kept text is
    a subsequence of its original lines."""
    import random

    from gridmet_etl_spark.operators.dedup import line_dedup, split_lines

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for d in range(40):
        n = rng.randint(1, 6)
        rows.append(
            (d, "\n".join(
                " ".join(rng.choices(vocab, k=rng.randint(1, 4)))
                for _ in range(n)
            ))
        )
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in line_dedup(split_lines(docs)).collect()}
    all_lines = [ln for _, t in rows for ln in t.split("\n")]
    distinct = set(all_lines)
    kept_lines = [
        ln for r in out.values() if r.text for ln in r.text.split("\n")
    ]
    assert sorted(kept_lines) == sorted(distinct)
    assert sum(r.n_kept for r in out.values()) == len(distinct)
    for d, t in rows:
        orig = t.split("\n")
        kept = out[d].text.split("\n") if out[d].text else []
        it = iter(orig)
        assert all(any(k == o for o in it) for k in kept)  # subsequence


def test_mixture_weights_alpha_contracts_ratios(spark):
    """The real α<1 property: source ORDER is preserved and every pairwise
    share ratio contracts toward 1 ((si/sj)^α exactly, since shares are a
    common normalization away from sizes)."""
    from gridmet_etl_spark.operators.sampling import mixture_weights

    rows = (
        [("a", i) for i in range(64)]
        + [("b", i) for i in range(25)]
        + [("c", i) for i in range(9)]
        + [("d", i) for i in range(2)]
    )
    docs = spark.createDataFrame(rows, ["source", "doc_id"])
    out = {r.source: r for r in mixture_weights(docs, "source").collect()}
    srcs = sorted(out, key=lambda s: out[s].share_raw)
    for x, y in zip(srcs, srcs[1:]):
        assert out[x].share_temp <= out[y].share_temp + 1e-6  # order kept
    for x in srcs:
        for y in srcs:
            r_raw = out[x].share_raw / out[y].share_raw
            r_tmp = out[x].share_temp / out[y].share_temp
            assert r_tmp == pytest.approx(r_raw**0.5, rel=2e-2)


def test_star_components_parity_random(spark):
    """Randomized clone corpora (several seeds, one job each): star and
    all-pairs candidates must always produce identical components."""
    import random

    from gridmet_etl_spark.operators.cluster import connected_components
    from gridmet_etl_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_star,
    )

    templates = [
        "the quick brown fox jumps over the lazy dog again and again",
        "spark shuffles partition data across the cluster network fabric",
        "completely unrelated legal boilerplate about licensing terms here",
    ]
    rng = random.Random(7)
    rows = []
    for d in range(60):
        t = rng.choice(templates)
        if rng.random() < 0.5:  # light mutation keeps it a near-dup
            t = t + " v" + str(rng.randint(0, 3))
        rows.append((d, t))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ca = {(r.node, r.cluster_id) for r in connected_components(
        minhash_lsh_candidates(docs)).collect()}
    cs = {(r.node, r.cluster_id) for r in connected_components(
        minhash_lsh_star(docs)).collect()}
    assert ca == cs and len(ca) > 0
