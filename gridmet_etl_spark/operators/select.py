"""DSIR-style data selection: importance weights from the log-ratio of a
target-domain unigram LM to the raw-corpus LM (Xie et al., "Data Selection
for Language Models via Importance Resampling", NeurIPS 2023 — the public
method; hashed n-gram features reduce to the same relational shape).

Why it belongs in the engine: selecting "books-and-wiki-like" slices out
of a 100 TB crawl is a per-document scoring pass — exactly the workload
shape Spark does well IF the LMs stay relational:

- both LMs are token-count aggregates (two output-sized partial-agg
  shuffles over the exploded token streams);
- the scoring model collapses to ONE broadcastable (token, Δlogp)
  relation — Δlogp = ln p_target − ln p_raw with add-one smoothing over
  the shared vocabulary;
- per-document weights are a broadcast join + (doc)-keyed partial agg;
  the corpus is scanned once and payloads never shuffle.

Determinism: weights are Σ count·Δlogp — ln is libm, so weights round at
``ndigits`` and the top-k selection ranks on the rounded weight with the
doc id as tie-break (the standard discipline here), which is what lets a
SQL oracle replay selection exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import tokens

__all__ = ["dsir_weights", "dsir_select"]


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Per-document importance weight ln(p_target(doc)/p_raw(doc)) under
    unigram LMs with add-one smoothing over the SHARED vocabulary (corpus
    ∪ target tokens — every corpus token scores, no OOV special case).
    Output: (id, n_tokens, weight)."""
    ctok = corpus.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    ttok = target.select(F.explode(tokens(text_col)).alias("token")).where(
        F.col("token") != ""
    )
    raw_counts = ctok.groupBy("token").agg(F.count(F.lit(1)).alias("_nr"))
    tgt_counts = ttok.groupBy("token").agg(F.count(F.lit(1)).alias("_nt"))
    vocab = (
        raw_counts.select("token")
        .unionByName(tgt_counts.select("token"))
        .distinct()
    )
    sizes = vocab.agg(F.count(F.lit(1)).alias("_v")).crossJoin(
        raw_counts.agg(F.sum("_nr").alias("_sr"))
    ).crossJoin(tgt_counts.agg(F.sum("_nt").alias("_st")))
    model = (
        vocab.join(raw_counts, "token", "left")
        .join(tgt_counts, "token", "left")
        .crossJoin(F.broadcast(sizes))
        .select(
            "token",
            (
                F.log(
                    (F.coalesce(F.col("_nt"), F.lit(0)) + 1).cast("double")
                    / (F.col("_st") + F.col("_v"))
                )
                - F.log(
                    (F.coalesce(F.col("_nr"), F.lit(0)) + 1).cast("double")
                    / (F.col("_sr") + F.col("_v"))
                )
            ).alias("_dlp"),
        )
    )
    per_doc = (
        ctok.groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .join(F.broadcast(model), "token")
        .groupBy("_id")
        .agg(
            F.sum("_cnt").alias("n_tokens"),
            (
                F.round(F.sum(F.col("_cnt") * F.col("_dlp")), ndigits) + F.lit(0.0)
            ).alias("weight"),
        )
    )
    # token-less docs still get a (zero-weight) row — full-corpus contract
    return corpus.select(F.col(id_col)).join(
        per_doc.withColumnRenamed("_id", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.col("weight"), F.lit(0.0)).alias("weight"),
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_normalize: bool = True,
    ndigits: int = 6,
) -> DataFrame:
    """Select the k most target-like documents by importance weight
    (length-normalized by default — raw log-ratios scale with document
    length, drowning short on-domain docs). Rank on the rounded
    per-token weight, ties by id; the global top-k plans as
    TakeOrderedAndProject, never a full sort. Output:
    (id, n_tokens, weight, sel_score, rnk)."""
    w = dsir_weights(corpus, target, id_col, text_col, ndigits)
    score = (
        F.round(F.col("weight") / F.greatest(F.col("n_tokens"), F.lit(1)), ndigits)
        + F.lit(0.0)
        if length_normalize
        else F.col("weight")
    )
    scored = w.select(id_col, "n_tokens", "weight", score.alias("sel_score"))
    # global selection as orderBy+limit → TakeOrderedAndProject: every
    # partition keeps its local top-k, one task merges k×parts rows — the
    # corpus-wide weight relation never sorts on a single partition (a
    # row_number window here would). The rank window then runs over the
    # k-row result only.
    topk = scored.orderBy(F.col("sel_score").desc(), F.col(id_col)).limit(k)
    win = Window.orderBy(F.col("sel_score").desc(), F.col(id_col))
    return topk.withColumn("rnk", F.row_number().over(win))
