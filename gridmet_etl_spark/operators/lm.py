"""Corpus language-model scoring: train an interpolated bigram LM on the
corpus itself and score every document by average negative log-likelihood —
the CCNet-style "perplexity filter" of an LLM data pipeline (documents that
score far from the corpus distribution are boilerplate, spam, or noise).

Scale shape (what survives 100 TB):
  - Tokens and bigrams are derived ROW-LOCALLY (split + slice/zip —
    codegen, no UDF, no shuffle): a document's bigram list never leaves
    its partition until aggregation.
  - Training = two counting aggregations with map-side partial combine:
    the unigram exchange is vocabulary-sized, the bigram exchange is
    distinct-bigram-sized. Neither is proportional to corpus tokens.
  - Scoring joins the per-doc bigram stream to the count tables: the
    unigram table broadcasts (natural-language vocab fits in memory);
    the bigram join shuffles on the bigram key — the one corpus-sized
    exchange, keyed well (bigram keys are near-uniform; no skew salt
    needed because stopword-pair hot keys still hash-spread across
    reducers with AQE skew handling as the backstop).
  - The final per-doc average is a doc-keyed partial aggregation whose
    output is one row per document.

Model: p(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/N  (interpolated
backoff; every probability is nonzero because the unigram term is trained
on the same corpus). Score = −mean ln p over the document's bigram
positions. Tokenization is the literal single-space split, lowercased, in
BOTH engines (no filtering — the oracle must agree token-for-token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_lm_scores"]


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair, row-local."""
    a = F.split(F.lower(F.col(text_col)), " ")
    return (
        docs.select(F.col(id_col), a.alias("a"))
        .where(F.size("a") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(
                    F.slice("a", 1, F.size("a") - 1).alias("w1"),
                    F.slice("a", 2, F.size("a") - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select(F.col(id_col), F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.8,
    ndigits: int = 6,
) -> DataFrame:
    """Score each document by the corpus-trained interpolated bigram LM.
    Output: (doc_id, n_bigrams, nll) — nll = −mean ln p, rounded."""
    tokens = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
    )
    uni = tokens.groupBy("w").agg(F.count("*").alias("cu"))
    total = tokens.agg(F.count("*").alias("n_total"))  # 1 row
    bi = (
        _doc_bigrams(docs, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
    )
    stream = _doc_bigrams(docs, text_col, id_col)
    scored = (
        stream.join(bi, ["w1", "w2"])  # bigram-keyed shuffle join
        .join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("cu").alias("c1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("cu").alias("c2"))),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lp",
            -F.log(
                F.lit(lam) * F.col("cb") / F.col("c1")
                + F.lit(1.0 - lam) * F.col("c2") / F.col("n_total")
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("lp"), ndigits).alias("nll"),
    )


def ppl_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    group_col: str = "lang",
    lam: float = 0.8,
    ndigits: int = 6,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document with the corpus bigram LM (bigram_lm_scores), then split each
    language into ``n_buckets`` equal-count bands by score — head/middle/
    tail tiers, the standard "keep head, sample middle, drop tail"
    curation knob, reported with each band's volume and score range.

    Determinism: band assignment is ntile over the total order
    (nll, doc_id) — nll is the already-rounded score (identical on both
    engines by the lm_scores contract), doc_id breaks ties; all counts are
    exact integers and min/max pass the rounded scores through.

    Scale shape: the LM scoring is the heavy part (see bigram_lm_scores);
    the bucketing adds one per-language window + one band-sized agg.

    Output per (group, bucket): (group, bucket, n_docs, sum_bigrams,
    min_nll, max_nll)."""
    from pyspark.sql import Window

    scored = bigram_lm_scores(docs, lam=lam).join(
        docs.select("doc_id", F.col(group_col).alias("_g")), "doc_id"
    )
    w = Window.partitionBy("_g").orderBy("nll", "doc_id")
    banded = scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    return banded.groupBy(F.col("_g").alias(group_col), "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("sum_bigrams"),
        F.min("nll").alias("min_nll"),
        F.max("nll").alias("max_nll"),
    )
