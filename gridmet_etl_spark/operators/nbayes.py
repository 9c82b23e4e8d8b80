"""Multinomial Naive Bayes over token counts — trained AND applied as
relational algebra. The workhorse shallow classifier of corpus curation
(language ID, domain routing, quality gating) when a learned deep model is
overkill or not yet trained: fit on a labeled slice, score the corpus.

Scale shape (the reason NB belongs in a 100 TB engine):

- TRAIN is two partial-agg shuffles over the exploded token stream —
  (label, token) counts and label totals — both output-sized (vocab ×
  classes, not corpus). No iterations.
- The MODEL is a (vocab × classes) log-probability relation plus a
  |classes| prior relation. With add-one smoothing every (token, class)
  cell exists (vocab ⨯ classes built explicitly), so scoring is a pure
  equi join. For web-scale vocabularies, cap to the top-V tokens by
  training frequency first (V=50k covers language ID comfortably) so the
  model stays broadcastable; out-of-vocab tokens are SKIPPED at scoring
  time (both engines agree on the convention).
- CLASSIFY is one broadcast hash join (doc tokens ⋈ model) + one
  (doc, class)-keyed partial agg + a per-doc argmax window over ≤
  |classes| rows. The corpus is scanned once and never shuffles payloads
  — only (doc_id, token, count) triples move.

Determinism: scores are Σ count·ln P — ln is libm, so scores round at
``ndigits`` BEFORE the argmax and ties break on the class name, the same
discipline as every ranked operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import tokens

__all__ = ["nb_train", "nb_classify"]


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    max_vocab: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB with add-one smoothing.

    Returns ``(model, priors)``: model = (token, label, logp) for EVERY
    (vocab token, class) pair, logp = ln((n_tc + 1) / (n_c + V));
    priors = (label, logprior) with logprior = ln(docs_c / docs_total).
    ``max_vocab`` caps vocabulary to the most frequent V tokens (ties by
    token) — the broadcastability knob at corpus scale."""
    tok = docs.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(text_col)).alias("token"),
    ).where(F.col("token") != "")
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("_n"))
    if max_vocab is not None:
        w = Window.orderBy(F.col("_n").desc(), F.col("token"))
        vocab = vocab.withColumn("_r", F.row_number().over(w)).where(
            F.col("_r") <= max_vocab
        )
    vocab = vocab.select("token")
    vsize = vocab.agg(F.count(F.lit(1)).alias("_v"))
    counts = (
        tok.join(vocab, "token", "left_semi")
        .groupBy("label", "token")
        .agg(F.count(F.lit(1)).alias("_ntc"))
    )
    class_tot = counts.groupBy("label").agg(F.sum("_ntc").alias("_nc"))
    cells = vocab.crossJoin(class_tot).crossJoin(F.broadcast(vsize))
    model = cells.join(counts, ["label", "token"], "left").select(
        "token",
        "label",
        F.log(
            (F.coalesce(F.col("_ntc"), F.lit(0)) + 1).cast("double")
            / (F.col("_nc") + F.col("_v"))
        ).alias("logp"),
    )
    pri = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("_dc")
    )
    tot = pri.agg(F.sum("_dc").alias("_dt"))
    priors = pri.crossJoin(F.broadcast(tot)).select(
        "label", F.log(F.col("_dc") / F.col("_dt")).alias("logprior")
    )
    return model, priors


def nb_classify(
    docs: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Predict the argmax class per document: score_c = logprior_c +
    Σ_tokens count·logp(token, c), out-of-vocab tokens skipped. Output:
    (id, pred_label, score) — score rounded at ``ndigits``, ties on the
    label name. Documents whose tokens are ALL out-of-vocab still score
    (priors alone)."""
    tok = (
        docs.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    contrib = (
        tok.join(F.broadcast(model), "token")
        .groupBy("_id", "label")
        .agg(F.sum(F.col("_cnt") * F.col("logp")).alias("_s"))
    )
    # every doc × every class, so prior-only docs still rank all classes
    base = docs.select(F.col(id_col).alias("_id")).crossJoin(
        F.broadcast(priors)
    )
    scored = base.join(contrib, ["_id", "label"], "left").select(
        "_id",
        "label",
        (
            F.round(F.col("logprior") + F.coalesce(F.col("_s"), F.lit(0.0)), ndigits)
            + F.lit(0.0)
        ).alias("score"),
    )
    w = Window.partitionBy("_id").orderBy(F.col("score").desc(), F.col("label"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("label").alias("pred_label"),
            "score",
        )
    )
