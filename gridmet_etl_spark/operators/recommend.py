"""Item-item collaborative filtering from co-occurrence — the classic
"customers who bought X also bought Y" similarity, computed as cosine over
the binary basket-item incidence matrix without ever materializing it.

Scale shape: pairs are generated WITHIN baskets only (a self-join keyed on
the basket id), so the pair fan-out is Σ |basket|² — bounded by the
largest basket, not by item-catalog size or row count. TPC-H orders hold
≤7 lines; real carts are similarly tiny, so the explode is a small
constant factor on the facts relation. The pair counts then take ONE
item-pair-keyed partial-agg shuffle (output-sized: distinct co-purchased
pairs), item marginals one item-keyed shuffle, and the marginal attach is
a broadcast of the |items|-sized count relation. cosine(i,j) =
cooc(i,j) / sqrt(n_i · n_j) over basket SETS (duplicates within a basket
collapse first — one distinct pass keyed the same as the pair join).

A skew guard for 100 TB: a degenerate mega-basket (one key holding 10⁶
items) would explode quadratically; ``max_basket`` drops baskets above a
size cap before pairing (logged via the returned frame's lineage, and the
cap relation is computed with the same single partial-agg pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["item_cosine_topk"]


def item_cosine_topk(
    facts: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    k: int = 5,
    min_cooc: int = 2,
    max_basket: int = 100,
    ndigits: int = 6,
) -> DataFrame:
    """Top-k most-similar items per item by co-occurrence cosine.

    Output: (item_id, other_id, cooc, cosine, rnk) with rnk ≤ k, ranked by
    (cosine desc, other_id) on the ROUNDED cosine for cross-engine-stable
    ordering. Pairs below ``min_cooc`` shared baskets are pruned before
    the window (support pruning — kills the quadratic noise tail early).
    """
    pairs_src = (
        facts.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        )
        .distinct()
    )
    sizes = pairs_src.groupBy("_b").agg(F.count(F.lit(1)).alias("_sz"))
    kept = pairs_src.join(
        F.broadcast(sizes.where(F.col("_sz") > max_basket).select("_b")),
        "_b",
        "left_anti",
    )
    marg = kept.groupBy("_i").agg(F.count(F.lit(1)).alias("n"))
    a = kept.select(F.col("_b"), F.col("_i").alias("ia"))
    b = kept.select(F.col("_b"), F.col("_i").alias("ib"))
    cooc = (
        a.join(b, "_b")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("cooc"))
        .where(F.col("cooc") >= min_cooc)
    )
    # symmetrize once so the per-item top-k window sees both directions
    sym = cooc.select("ia", "ib", "cooc").unionByName(
        cooc.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), F.col("cooc")
        )
    )
    na = F.broadcast(marg.select(F.col("_i").alias("ia"), F.col("n").alias("na")))
    nb = F.broadcast(marg.select(F.col("_i").alias("ib"), F.col("n").alias("nb")))
    scored = (
        sym.join(na, "ia")
        .join(nb, "ib")
        .select(
            F.col("ia"),
            F.col("ib"),
            F.col("cooc"),
            (
                F.round(
                    F.col("cooc")
                    / F.sqrt(F.col("na").cast("double") * F.col("nb")),
                    ndigits,
                )
                + F.lit(0.0)
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("ia").orderBy(F.col("cosine").desc(), F.col("ib"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("ia").alias("item_id"),
            F.col("ib").alias("other_id"),
            "cooc",
            "cosine",
            "rnk",
        )
    )


def bias_als(
    ratings: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "rating",
    n_rounds: int = 2,
    reg: float = 5.0,
    ndigits: int = 4,
) -> DataFrame:
    """Bias-only alternating least squares — the baseline model every
    recommender paper reports first (r̂ = μ + b_u + b_i, Koren's "baseline
    predictor"): alternate closed-form regularized updates

        b_u ← Σ_{(u,i)} (r − μ − b_i) / (n_u + reg)
        b_i ← Σ_{(u,i)} (r − μ − b_u) / (n_i + reg)

    for ``n_rounds`` rounds from b=0. Pure relational algebra: each
    half-round is ONE broadcast join of the (current) other-side bias
    relation + ONE user- or item-keyed partial agg — the ratings fact
    never shuffles by anything except the side being updated, and nothing
    iterates over more state than |users|+|items| rows. Intermediates stay
    full-precision (rounding per update quantizes values ONTO the rounding
    grid, making exact half-way boundaries — and cross-engine flips —
    common instead of rare); only the OUTPUT rounds at ``ndigits``, so a
    SQL oracle replays training as chained CTEs.

    Output: (item, b_i, n_ratings) — the trained item-bias table
    (broadcastable; the user table is the symmetric groupBy).
    """
    r = ratings.select(
        F.col(user_col).alias("_u"),
        F.col(item_col).alias("_i"),
        F.col(rating_col).cast("double").alias("_r"),
    )
    mu_row = r.agg(F.avg("_r").alias("_mu"))
    r = r.crossJoin(F.broadcast(mu_row))
    bu = None  # (u, _bu)
    bi = None  # (i, _bi)
    for _ in range(n_rounds):
        base = r
        if bi is not None:
            base = base.join(F.broadcast(bi), "_i", "left").withColumn(
                "_bi", F.coalesce("_bi", F.lit(0.0))
            )
        else:
            base = base.withColumn("_bi", F.lit(0.0))
        bu = base.groupBy("_u").agg(
            (
                F.sum(F.col("_r") - F.col("_mu") - F.col("_bi"))
                / (F.count(F.lit(1)) + F.lit(reg))
            ).alias("_bu")
        )
        base2 = r.join(F.broadcast(bu), "_u", "left").withColumn(
            "_bu", F.coalesce("_bu", F.lit(0.0))
        )
        bi = base2.groupBy("_i").agg(
            (
                F.sum(F.col("_r") - F.col("_mu") - F.col("_bu"))
                / (F.count(F.lit(1)) + F.lit(reg))
            ).alias("_bi"),
            F.count(F.lit(1)).alias("n_ratings"),
        )
    return bi.select(
        F.col("_i").alias(item_col),
        (F.round(F.col("_bi"), ndigits) + F.lit(0.0)).alias("b_i"),
        "n_ratings",
    )
