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


def slope_one(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Weighted Slope One predictions for every PREDICTABLE (user,
    unrated item) pair — pairs with no co-rating path (no rated item i
    of u co-rated with j by anyone) have no Slope One estimate and are
    absent from the output — the closed-form recommender baseline (no training loop, one
    deviation matrix): pred(u,j) = Σ_i [num_ji + c_ji·r_ui] / Σ_i c_ji
    over the items i the user rated, where num_ji = Σ_v (r_vj − r_vi)
    and c_ji = |users rating both i and j|.

    Determinism discipline: ``rating_col`` must be INTEGER, so the
    deviation NUMERATORS stay exact integers (dev_ji = num_ji/c_ji is
    never materialized — the prediction expands to an exact integer
    numerator over an exact integer denominator; one float division per
    output row, rounded at the edge).

    Scale shape: the co-rating pair matrix is |items|²-bounded (one
    self-join of the per-user basket, partial-aggregated map-side —
    standard Slope One; cap |items| like any item-item CF). Prediction
    joins are (user-basket × items)-sized, never |users|×|items| unless
    the caller asks for the full matrix (they do here: output is the
    unrated grid, which IS the deliverable).

    Output: (user, item, n_pairs, denom, pred)."""
    r = ratings.select(
        F.col(user_col).alias("_u"),
        F.col(item_col).alias("_i"),
        F.col(rating_col).cast("long").alias("_r"),
    )
    a = r.select(F.col("_u"), F.col("_i").alias("_ia"), F.col("_r").alias("_ra"))
    b = r.select(F.col("_u"), F.col("_i").alias("_ib"), F.col("_r").alias("_rb"))
    # deviation matrix: j=_ia (target), i=_ib (source), num = Σ(r_j − r_i)
    pairs = (
        a.join(b, "_u")
        .where(F.col("_ia") != F.col("_ib"))
        .groupBy(F.col("_ia").alias("_j"), F.col("_ib").alias("_i"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_c"),
            F.sum(F.col("_ra") - F.col("_rb")).cast("long").alias("_num"),
        )
    )
    items = r.select(F.col("_i").alias("_j")).distinct()
    rated = r.select("_u", F.col("_i").alias("_j")).withColumn(
        "_has", F.lit(1)
    )
    # candidate grid: user × unrated item
    cand = (
        r.select("_u").distinct()
        .crossJoin(F.broadcast(items))
        .join(rated, ["_u", "_j"], "left_anti")
    )
    # expand: for each candidate (u, j), walk u's rated items i
    scored = (
        cand.join(r.select("_u", F.col("_i"), F.col("_r")), "_u")
        .join(pairs, ["_j", "_i"])
        .groupBy("_u", "_j")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("_num") + F.col("_c") * F.col("_r"))
            .cast("long")
            .alias("_numer"),
            F.sum("_c").cast("long").alias("denom"),
        )
    )
    return scored.select(
        F.col("_u").alias("user"),
        F.col("_j").alias("item"),
        "n_pairs",
        "denom",
        (
            F.round(
                F.col("_numer").cast("double") / F.col("denom").cast("double"),
                ndigits,
            )
            + F.lit(0.0)
        ).alias("pred"),
    )
