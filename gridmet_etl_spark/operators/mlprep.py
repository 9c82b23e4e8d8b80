"""Feature-engineering / data-quality primitives for training-table prep:
smoothed target encoding, pairwise correlation matrices, per-key skew
profiling, and referential-integrity orphan checks.

No reference-file counterpart (extension surface): these are the tabular
feature-prep steps a 100 TB training pipeline runs between raw ingest and
model export. All four are pure DataFrame compositions:

- ``target_encode`` — two aggregates (per-category + global) joined back;
  the global mean is a 1-row broadcast, the category table is
  |categories|-sized. No per-row shuffle: the encode output IS the
  category table (callers join it onto facts map-side).
- ``corr_pairs`` — every pairwise Pearson coefficient in ONE aggregate
  pass (C(n,2) `corr` expressions share the scan); output is C(n,2) rows.
  At 100 TB this is a single map-side-partial-aggregated scan — the
  shuffle carries one row per column pair.
- ``key_skew_profile`` — the two-level "how skewed is this join key"
  diagnostic: group sizes, then a histogram over sizes. Both shuffles are
  bounded (|keys|, then |distinct sizes|); the heavy first agg is
  partially aggregated map-side.
- ``referential_orphans`` — left-anti joins of a fact table against each
  dimension, counted. Dimension sides are broadcast (they are the small
  sides by construction), so the fact table is scanned once per FK but
  never shuffled; at scale the scans share the cached fact relation or
  run as one pass with `count(CASE WHEN d.key IS NULL)` after left joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: float = 10.0,
) -> DataFrame:
    """Smoothed mean target encoding: ``enc = (sum_c + m*mu) / (n_c + m)``
    where ``mu`` is the global target mean. Returns one row per category:
    ``(cat_col, n, enc)``. The smoothing prior keeps rare categories near
    the global mean (standard leakage-safe encode when fit on train split
    only)."""
    per_cat = df.groupBy(cat_col).agg(
        F.count(target_col).alias("n"),
        F.sum(target_col).alias("s"),
    )
    glob = df.agg(
        (F.sum(target_col) / F.count(target_col)).alias("mu")
    )
    return (
        per_cat.crossJoin(F.broadcast(glob))
        .select(
            cat_col,
            "n",
            ((F.col("s") + F.lit(m) * F.col("mu")) / (F.col("n") + F.lit(m))).alias("enc"),
        )
    )


def corr_pairs(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` in one aggregate pass.
    Output: ``(col_a, col_b, corr)`` for every a < b pair, ordered."""
    names = list(cols)
    exprs = []
    pairs = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            exprs.append(F.corr(a, b).alias(f"c_{a}_{b}"))
            pairs.append((a, b))
    wide = df.agg(*exprs)
    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"c_{a}_{b}").alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return (
        wide.select(F.explode(structs).alias("p"))
        .select("p.col_a", "p.col_b", "p.corr")
    )


def key_skew_profile(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Join-key skew diagnostic: distribution of per-key group sizes.
    Output ``(group_size, n_keys)`` — e.g. a key with group_size 10⁶ rows
    is the salting candidate. Two bounded shuffles (|keys|, |sizes|)."""
    sizes = df.groupBy(*key_cols).agg(F.count("*").alias("group_size"))
    return sizes.groupBy("group_size").agg(F.count("*").alias("n_keys"))


def referential_orphans(
    fact: DataFrame,
    fks: dict[str, tuple[DataFrame, str]],
    relation: str = "fact",
) -> DataFrame:
    """Referential-integrity check: for each ``fk_col -> (dim, pk_col)``
    mapping, count fact rows whose FK value has no matching dimension row
    (NULL FKs are counted separately as ``n_null``). Output one row per FK:
    ``(relation, fk, n_orphans, n_null)``."""
    outs = []
    for fk_col, (dim, pk_col) in fks.items():
        keys = F.broadcast(dim.select(F.col(pk_col).alias("__pk")).distinct())
        joined = fact.select(F.col(fk_col).alias("__fk")).join(
            keys, F.col("__fk") == F.col("__pk"), "left"
        )
        outs.append(
            joined.agg(
                F.lit(relation).alias("relation"),
                F.lit(fk_col).alias("fk"),
                F.count(
                    F.when(F.col("__fk").isNotNull() & F.col("__pk").isNull(), 1)
                ).alias("n_orphans"),
                F.count(F.when(F.col("__fk").isNull(), 1)).alias("n_null"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def nearest_centroid(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_round: int = 6,
) -> DataFrame:
    """Nearest-centroid classification (Rocchio) over a labeled embedding
    table: per-label mean vectors, then each vector assigned to the
    cosine-nearest centroid. Returns the confusion rollup
    ``(label, assigned, n)``.

    Scale shape: centroids aggregate per (label, dim) in ONE exploded
    partial-agg shuffle (|labels|×dim rows), collapse to |labels| array
    rows, and BROADCAST; the assignment dot products run row-locally via
    zip_with/aggregate (no corpus shuffle). Ranking uses the rounded
    cosine with a label tiebreak so engines with different float-sum
    orders agree."""
    expl = df.select(
        label_col, F.posexplode(vec_col).alias("pos", "v")
    )
    cents = (
        expl.groupBy(label_col, "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy(label_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "c"))
            ).alias("pc")
        )
        .select(
            F.col(label_col).alias("centroid_label"),
            F.transform("pc", lambda s: s["c"]).alias("cvec"),
        )
    )
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col), F.col("cvec"), lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nc = F.sqrt(
        F.aggregate(
            F.transform("cvec", lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    scored = (
        df.select(id_col, label_col, vec_col)
        .crossJoin(F.broadcast(cents))
        .select(
            id_col,
            label_col,
            "centroid_label",
            F.round(dot / (nv * nc), rank_round).alias("sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), "centroid_label")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(label_col, F.col("centroid_label").alias("assigned"))
    )
    return assigned.groupBy(label_col, "assigned").agg(F.count("*").alias("n"))


def knn_classify(
    df: DataFrame,
    k: int = 5,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_round: int = 6,
) -> DataFrame:
    """Leave-one-out k-NN label evaluation: each vector's label predicted by
    majority vote of its k cosine-nearest OTHER vectors (the embedding-
    quality eval harness). Returns the confusion rollup
    ``(label, predicted, n)``.

    Reuses the brute-force broadcast scan (similarity.cosine_topk): corpus
    scanned once, never shuffled; the only exchanges carry k×|queries|
    candidate rows and the vote counts. For large tables, sample the query
    side — the corpus side stays full."""
    from .similarity import cosine_topk

    queries = df.select(F.col(id_col).alias("query_id"), vec_col)
    topk = cosine_topk(df, queries, k=k, id_col=id_col, vec_col=vec_col,
                       rank_round=rank_round)
    labels = F.broadcast(df.select(F.col(id_col).alias("neighbor_id"),
                                   F.col(label_col).alias("neighbor_label")))
    votes = (
        topk.join(labels, "neighbor_id")
        .groupBy("query_id", "neighbor_label")
        .agg(F.count("*").alias("v"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("v").desc(), "neighbor_label")
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", F.col("neighbor_label").alias("predicted"))
    )
    truth = F.broadcast(
        df.select(F.col(id_col).alias("query_id"), F.col(label_col))
    )
    return pred.join(truth, "query_id").groupBy(label_col, "predicted").agg(
        F.count("*").alias("n")
    )


def trailing_window_features(
    df: DataFrame,
    key_cols: Sequence[str],
    date_col: str,
    value_col: str,
    days: int = 90,
) -> DataFrame:
    """Point-in-time trailing-window features (the feature-store primitive):
    for every row, the count and sum of the SAME key's rows in the previous
    ``days`` days EXCLUDING the current day — so a model scoring day D only
    sees strictly-prior history (no same-day leakage).

    One shuffle keyed by the entity; the RANGE frame is value-defined on
    epoch days, so calendar gaps are handled exactly (a ROWS frame would
    silently widen across gaps). Output adds ``n_prior`` and
    ``sum_prior``."""
    from pyspark.sql import Window

    keys = list(key_cols)
    d = F.unix_date(F.col(date_col).cast("date"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(d)
        .rangeBetween(-days, -1)
    )
    return (
        df.withColumn("n_prior", F.coalesce(F.count(value_col).over(w), F.lit(0)))
        .withColumn("sum_prior", F.sum(value_col).over(w))
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Cross-group quantile normalization: map each row's value to the
    GLOBAL distribution's value at the same within-group percentile — so
    every group ends up with an identical (global) value distribution.
    The genomics/array-normalization classic, here for aligning per-source
    feature distributions before mixing corpora.

    Lower-quantile semantics, fully deterministic: within-group position
    by row_number ordered (value, id); percentile pr = (pos-1)/(n-1)
    (single-row groups pin pr = 0.5); target = the global value at row
    1 + floor(pr·(N-1)) — floor, not round, so no round-half boundary can
    diverge across engines.

    Scale shape: the within-group window is a group-keyed shuffle; the
    global ordering uses scale.global_rank (range-partition + two-level
    prefix sums — NO single-partition sort); the final lookup joins on the
    rank key over the narrow (rank, value) relation. Three value-sized
    narrow exchanges total; payloads never move.

    Output: (id_col, group_col, value_col, qnorm).
    """
    from .scale import global_rank

    n_tot = df.count()
    w_g = Window.partitionBy(group_col).orderBy(value_col, id_col)
    pos = df.select(
        id_col,
        group_col,
        value_col,
        F.row_number().over(w_g).alias("_pos"),
        F.count("*").over(Window.partitionBy(group_col)).alias("_n"),
    )
    pr = F.when(F.col("_n") > 1, (F.col("_pos") - 1) / (F.col("_n") - 1)).otherwise(
        F.lit(0.5)
    )
    idx = (F.lit(1) + F.floor(pr * F.lit(float(n_tot - 1)))).cast("long")
    keyed = pos.select(id_col, group_col, value_col, idx.alias("_idx"))
    ref = global_rank(
        df.select(F.col(value_col).alias("_rv"), F.col(id_col).alias("_rid")),
        "_rv",
        tie_cols=("_rid",),
        with_rank=False,
    ).select(F.col("rn").alias("_idx"), F.col("_rv").alias("qnorm"))
    return keyed.join(ref, "_idx").drop("_idx")


def logistic_gd(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    lr: float = 1.0,
    rounds: int = 3,
    ndigits: int = 6,
) -> DataFrame:
    """Distributed logistic regression by full-batch gradient descent,
    expressed as pure relational algebra — the lineage-friendly sibling of
    a driver-side optimizer: every round is ONE scan + ONE scalar
    aggregate, the weight state is a 1-row relation that broadcasts, and
    nothing ever collects to the driver (the whole multi-round DAG stays
    lazy, like pca_power's power iteration).

    Round r: p = σ(w·x) with bias; g_j = avg((p − y)·x_j);
    w_j ← ROUND(w_j − lr·g_j, ndigits). Rounding the weight state each
    round pins it bit-identically across engines (σ uses libm exp, whose
    last-ulp may differ; the per-round round() re-synchronizes before
    drift can compound), which is what makes an unrolled SQL oracle able
    to replay training exactly.

    Scale shape: per round, the data relation is scanned once and folds
    map-side into a (k+2)-value partial aggregate — shuffle volume is
    (k+2)·partitions, independent of rows. The weight relation is 1 row ×
    k+1 columns, broadcast into the scan. rounds is fixed (hyperparameter,
    not convergence-tested) so the plan is statically bounded.

    Output: one row — (w0..wk, log_loss, n) with w0 the bias and log_loss
    the final-round training loss under the OUTPUT weights.
    """
    feats = list(feature_cols)
    k = len(feats)
    spark = df.sparkSession
    data = df.select(
        F.col(label_col).cast("double").alias("_y"),
        *[F.col(c).cast("double").alias(f"_x{j}") for j, c in enumerate(feats)],
    )
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(k + 1)]
    )

    def _z() -> F.Column:
        z = F.col("w0")
        for j in range(k):
            z = z + F.col(f"w{j + 1}") * F.col(f"_x{j}")
        return z

    for _ in range(rounds):
        joined = data.crossJoin(F.broadcast(w))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z()))
        grads = joined.agg(
            F.avg(p - F.col("_y")).alias("g0"),
            *[
                F.avg((p - F.col("_y")) * F.col(f"_x{j}")).alias(f"g{j + 1}")
                for j in range(k)
            ],
            *[F.first(f"w{j}").alias(f"_pw{j}") for j in range(k + 1)],
        )
        w = grads.select(
            *[
                (
                    F.round(F.col(f"_pw{j}") - F.lit(lr) * F.col(f"g{j}"), ndigits)
                    + F.lit(0.0)
                ).alias(f"w{j}")
                for j in range(k + 1)
            ]
        )
    final = data.crossJoin(F.broadcast(w))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z()))
    eps = 1e-12
    loss = -F.avg(
        F.col("_y") * F.log(p + eps) + (F.lit(1.0) - F.col("_y")) * F.log(F.lit(1.0) - p + eps)
    )
    return final.agg(
        *[F.first(f"w{j}").alias(f"w{j}") for j in range(k + 1)],
        (F.round(loss, ndigits) + F.lit(0.0)).alias("log_loss"),
        F.count(F.lit(1)).alias("n"),
    )

def ridge_closed_form(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
    reg: float = 0.1,
    ndigits: int = 6,
) -> DataFrame:
    """Closed-form STANDARDIZED ridge regression for exactly 3 features:
    solve (R + λI)β = r_y on the correlation scale — R the 3×3 feature
    correlation matrix, r_y the feature–label correlations — via Cramer's
    rule evaluated as column expressions. Output: ONE row
    (n, b1, b2, b3) of standardized (beta-weight) coefficients.

    Contrast with ``logistic_gd``: no iteration — a single aggregation
    pass (count + 6 Pearson correlations), every exchange a 1-row
    partial-agg tree. At 100 TB this is the cheapest possible supervised
    fit: the data never shuffles.

    Float discipline: the ONLY order-dependent quantities are the
    correlation aggregates, rounded at ``ndigits``; correlations live in
    [-1, 1], so the rounding quantum (1e-6) sits far above float-sum
    reordering noise (~1e-13) yet far below the value scale — the
    mixed-magnitude trap of covariance-scale moments (var(price) ~ 5e8
    rounds unstably, var(discount) ~ 8e-4 rounds away) never arises. The
    Cramer solve is then pure deterministic IEEE-double arithmetic on
    identical inputs in any engine that mirrors the expression tree (the
    oracle does). Standardization is also what makes ONE λ meaningful
    across features of wildly different units."""
    assert len(x_cols) == 3, "closed-form path is fixed at 3 features"

    def r(c):
        return F.round(c, ndigits) + F.lit(0.0)

    x1, x2, x3 = (F.col(c) for c in x_cols)
    yv = F.col(y_col)
    g = df.agg(
        F.count(F.lit(1)).alias("n"),
        r(F.corr(x1, x2)).alias("r12"),
        r(F.corr(x1, x3)).alias("r13"),
        r(F.corr(x2, x3)).alias("r23"),
        r(F.corr(x1, yv)).alias("r1y"),
        r(F.corr(x2, yv)).alias("r2y"),
        r(F.corr(x3, yv)).alias("r3y"),
    )
    lam = F.lit(float(reg))
    a11 = F.lit(1.0) + lam
    a22, a33 = a11, a11
    a12, a13, a23 = F.col("r12"), F.col("r13"), F.col("r23")
    v1, v2, v3 = F.col("r1y"), F.col("r2y"), F.col("r3y")
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    det1 = (
        v1 * (a22 * a33 - a23 * a23)
        - a12 * (v2 * a33 - a23 * v3)
        + a13 * (v2 * a23 - a22 * v3)
    )
    det2 = (
        a11 * (v2 * a33 - a23 * v3)
        - v1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * v3 - v2 * a13)
    )
    det3 = (
        a11 * (a22 * v3 - v2 * a23)
        - a12 * (a12 * v3 - v2 * a13)
        + v1 * (a12 * a23 - a22 * a13)
    )
    return g.select(
        F.col("n"),
        r(det1 / det).alias("b1"),
        r(det2 / det).alias("b2"),
        r(det3 / det).alias("b3"),
    )


def woe_iv(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    n_bins: int = 10,
    laplace: float = 0.5,
    ndigits: int = 6,
) -> DataFrame:
    """Weight-of-evidence / information-value binning — the credit-scoring
    feature-screening standard: bin the feature into equal-width bands,
    WOE(bin) = ln(P(bin|positive) / P(bin|negative)) with Laplace
    smoothing, IV = Σ (P(bin|pos) − P(bin|neg))·WOE. |IV| reads as
    predictive power (<0.02 useless, >0.3 strong).

    Scale shape: one data-sized conditional-agg groupBy on the bin id
    (min/max bounds are a 1-row scalar broadcast), then everything runs
    on the n_bins-row relation; class totals come from a second bounded
    agg over those rows — the fact table is scanned ONCE.

    Equal-WIDTH bins keep the bin id a pure expression (no rank shuffle);
    for equal-mass bins compose with planner.equiheight_bounds.
    Output: (bin, lo, hi, n_pos, n_neg, woe, iv_term, iv) — iv repeated
    per row for a one-relation readout."""
    bounds = df.agg(
        F.min(feature_col).alias("_lo"), F.max(feature_col).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / n_bins
    binned = df.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col(feature_col) - F.col("_lo")) / width).cast("int"),
        ).alias("bin"),
        F.col(label_col).alias("_y"),
        "_lo",
        "_hi",
    )
    per_bin = binned.groupBy("bin").agg(
        F.min(F.col("_lo") + F.col("bin") * width).alias("lo"),
        F.min(F.col("_lo") + (F.col("bin") + 1) * width).alias("hi"),
        F.count(F.when(F.col("_y") == 1, F.lit(1))).alias("n_pos"),
        F.count(F.when(F.col("_y") == 0, F.lit(1))).alias("n_neg"),
    )
    tot = per_bin.agg(
        F.sum("n_pos").alias("_tp"), F.sum("n_neg").alias("_tn")
    )
    lap = F.lit(laplace)
    with_tot = per_bin.crossJoin(F.broadcast(tot))
    p_pos = (F.col("n_pos") + lap) / (F.col("_tp") + lap * n_bins)
    p_neg = (F.col("n_neg") + lap) / (F.col("_tn") + lap * n_bins)
    woe = F.log(p_pos / p_neg)
    scored = with_tot.withColumn("_woe", woe).withColumn(
        "_iv_term", (p_pos - p_neg) * F.col("_woe")
    )
    iv = scored.agg(F.sum("_iv_term").alias("_iv"))
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return (
        scored.crossJoin(F.broadcast(iv))
        .select(
            "bin",
            rnd(F.col("lo")).alias("lo"),
            rnd(F.col("hi")).alias("hi"),
            "n_pos",
            "n_neg",
            rnd(F.col("_woe")).alias("woe"),
            rnd(F.col("_iv_term")).alias("iv_term"),
            rnd(F.col("_iv")).alias("iv"),
        )
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    el: int = 2,
) -> DataFrame:
    """Privacy-risk audit before a data release: group rows by the
    quasi-identifier combination and report, per equivalence-class SIZE,
    how many classes/rows sit at that size, how many violate k-anonymity
    (class smaller than k → re-identifiable) and l-diversity (fewer than
    ``el`` distinct sensitive values → attribute disclosure even when
    k holds). Sweeney 2002 / Machanavajjhala 2007 as one groupBy.

    Scale shape: one quasi-key partial-agg shuffle (count +
    count_distinct per class), then the report aggregates the
    |classes|-row relation by size — the fact table is scanned once.
    Output: (class_size, n_classes, n_rows, n_k_violating_rows,
    n_ldiv_violating_rows)."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(sensitive_col).alias("_l"),
    )
    return (
        classes.groupBy(F.col("_n").alias("class_size"))
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("_n").alias("n_rows"),
            F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0)).alias(
                "n_k_violating_rows"
            ),
            F.sum(F.when(F.col("_l") < el, F.col("_n")).otherwise(0)).alias(
                "n_ldiv_violating_rows"
            ),
        )
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    salt: str = "dp",
    ndigits: int = 6,
) -> DataFrame:
    """Differentially-private count release via the Laplace mechanism:
    per-group count + Laplace(Δf/ε) noise (sensitivity Δf = 1 for counts).
    Noise comes from the exact inverse-CDF sampler
    ``−b·sign(u−.5)·ln(1−2|u−.5|)`` driven by a SEEDED md5 uniform over
    the group key — reproducible releases (rerunning the job republishes
    identical numbers, no fresh privacy budget burned by retries) and
    oracle-replayable. The privacy guarantee holds under the standard
    seeded-mechanism caveat: the seed/salt must stay secret with the raw
    data; anyone holding both can invert the noise.

    One partial-agg shuffle; noise is row-local arithmetic on the
    |groups|-row relation. Output: (*group_cols, noisy_count)."""
    b = 1.0 / epsilon
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), key)), 1, 12), 16, 10
        ).cast("double")
        / F.lit(float(1 << 48))
    )
    v = u - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(v)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v))
    )
    return counts.select(
        *group_cols,
        (F.round(F.col("_n") + noise, ndigits) + F.lit(0.0)).alias("noisy_count"),
    )


def info_gain(
    df: DataFrame,
    target_col: str,
    feature_cols: Sequence[str],
    ndigits: int = 4,
) -> DataFrame:
    """Information gain of each categorical feature against a categorical
    target — the entropy-based feature screen (woe_iv's multi-class
    sibling; use it to rank candidate bucketings before a model sees
    them): IG(f) = H(target) − Σ_v p(v)·H(target|v).

    Exactness: all probabilities are exact integer-count ratios; entropy
    terms c·ln(n/c) are computed in fixed operand order and made
    order-independent by max-normalized e12 floor quantization before
    each bounded sum (the kruskal discipline — never a raw double sum
    over an unordered relation); ln chains round at 4.

    Scale shape: per feature, ONE (value, class) cell aggregation over
    the data; every later relation is |values×classes|-bounded.

    Output per feature: (feature, n_values, h_target, h_cond,
    info_gain)."""
    spark = df.sparkSession
    n_tot = df.agg(F.count(F.lit(1)).cast("long").alias("_n"))

    # H(target): |classes|-row relation
    tcells = df.groupBy(F.col(target_col).alias("_c")).agg(
        F.count(F.lit(1)).alias("_cc")
    )
    tterm = tcells.crossJoin(F.broadcast(n_tot)).select(
        (
            F.col("_cc").cast("double")
            * F.log(F.col("_n").cast("double") / F.col("_cc"))
        ).alias("_t")
    )
    tmax = tterm.agg(F.max("_t").alias("_tm"))
    htgt = (
        tterm.crossJoin(F.broadcast(tmax))
        .agg(
            F.sum(
                F.when(
                    F.col("_tm") > 0.0,
                    F.floor(F.col("_t") / F.col("_tm") * 1e12).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("_q"),
            F.first("_tm").alias("_tm"),
        )
        .crossJoin(F.broadcast(n_tot))
        .select(
            (
                F.col("_q").cast("double") / 1e12 * F.col("_tm") / F.col("_n")
            ).alias("h_target")
        )
    )

    outs = []
    for feat in feature_cols:
        cells = df.groupBy(
            F.col(feat).alias("_v"), F.col(target_col).alias("_c")
        ).agg(F.count(F.lit(1)).alias("_cvc"))
        vtot = cells.groupBy("_v").agg(F.sum("_cvc").alias("_nv"))
        term = cells.join(vtot, "_v").select(
            (
                F.col("_cvc").cast("double")
                * F.log(F.col("_nv").cast("double") / F.col("_cvc"))
            ).alias("_t")
        )
        fmax = term.agg(F.max("_t").alias("_tm"))
        hcond = (
            term.crossJoin(F.broadcast(fmax))
            .agg(
                F.sum(
                    F.when(
                        F.col("_tm") > 0.0,
                        F.floor(F.col("_t") / F.col("_tm") * 1e12).cast("long"),
                    ).otherwise(F.lit(0))
                ).alias("_q"),
                F.first("_tm").alias("_tm"),
            )
            .crossJoin(F.broadcast(n_tot))
            .select(
                (
                    F.col("_q").cast("double") / 1e12 * F.col("_tm") / F.col("_n")
                ).alias("h_cond")
            )
        )
        nv = vtot.agg(F.count(F.lit(1)).cast("long").alias("n_values"))
        row = (
            spark.range(1)
            .select(F.lit(feat).alias("feature"))
            .crossJoin(F.broadcast(nv))
            .crossJoin(F.broadcast(htgt))
            .crossJoin(F.broadcast(hcond))
        )
        outs.append(row)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return out.select(
        "feature",
        "n_values",
        rnd(F.col("h_target")).alias("h_target"),
        rnd(F.col("h_cond")).alias("h_cond"),
        rnd(F.col("h_target") - F.col("h_cond")).alias("info_gain"),
    )


def decision_stump(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Best single-threshold split (1R / depth-1 decision tree) of a
    binary label on an integer feature — the strongest-cut companion to
    ``info_gain``'s whole-column screen: which threshold x ≤ v buys the
    most entropy, and what accuracy does majority-vote at that cut get?

    Determinism discipline: candidates are the DISTINCT feature values
    (the histogram), cumulated with one bounded window; per-candidate
    split entropy n_s·H_s = n·ln n − p·ln p − q·ln q is a closed form of
    six exact integers evaluated in fixed operand order (IEEE-identical
    cross-engine), and the ARGMAX is decided on the max-normalized
    floor-e12-quantized gain with the threshold as tie-break — no raw
    double ever picks the winner.

    Scale shape: ONE (value, label) cell aggregation over the data;
    every later relation is |distinct values|-sized.

    Output (1 row): (threshold, n_left, n_right, pos_left, pos_right,
    gain, stump_acc)."""
    y = F.col(label_col).cast("long")
    hist = (
        df.filter(F.col(feature_col).isNotNull() & y.isNotNull())
        .groupBy(F.col(feature_col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(y).alias("_p"))
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    tot = hist.agg(
        F.sum("_n").cast("long").alias("_nt"), F.sum("_p").cast("long").alias("_pt")
    )

    def _t(n, p):
        # n·H(p/n) in nats: n ln n − p ln p − (n−p) ln (n−p), 0·ln0 = 0
        q = n - p
        term = lambda c: F.when(c > 0, c.cast("double") * F.log(c.cast("double"))).otherwise(F.lit(0.0))  # noqa: E731,E501
        return term(n) - term(p) - term(q)

    cum = (
        hist.withColumn("_nl", F.sum("_n").over(w).cast("long"))
        .withColumn("_pl", F.sum("_p").over(w).cast("long"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("_nl") < F.col("_nt"))  # right side must be non-empty
    )
    nl, pl = F.col("_nl"), F.col("_pl")
    nr, pr = F.col("_nt") - nl, F.col("_pt") - pl
    t_root = _t(F.col("_nt"), F.col("_pt"))
    gain_n = t_root - _t(nl, pl) - _t(nr, pr)  # N·(information gain)
    scored = cum.withColumn(
        "_gq",
        F.when(
            t_root > 0.0, F.floor(gain_n / t_root * 1e12).cast("long")
        ).otherwise(F.lit(0)),
    )
    pick = Window.orderBy(F.col("_gq").desc(), F.col("_v").asc())
    best = scored.withColumn("_rn", F.row_number().over(pick)).filter(
        F.col("_rn") == 1
    )
    maj = F.greatest(pl, nl - pl) + F.greatest(pr, nr - pr)
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return best.select(
        F.col("_v").cast("long").alias("threshold"),
        nl.alias("n_left"),
        nr.cast("long").alias("n_right"),
        pl.alias("pos_left"),
        pr.cast("long").alias("pos_right"),
        rnd(gain_n / F.col("_nt").cast("double")).alias("gain"),
        rnd(maj.cast("double") / F.col("_nt").cast("double")).alias("stump_acc"),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """t-closeness audit per equivalence class (Li/Li/Venkatasubramanian
    2007): the earth-mover's distance between each class's distribution
    over an ORDERED sensitive attribute and the global distribution,
    t = (1/(k−1))·Σ_i |Σ_{j≤i}(p_j − q_j)| with unit ground distance
    between adjacent values. The attribute-disclosure gate k-anonymity /
    l-diversity miss (a class can be large AND diverse yet still skewed
    toward one end of the sensitive range).

    Determinism: ``sensitive_col`` must be an integer band. The EMD is
    computed EXACTLY — with integer cumulative counts cumP (class) and
    cumQ (global), |cumP_i·N − cumQ_i·n| accumulates as DECIMAL(38,0)
    and t = Σ/(n·N·(k−1)) is ONE double division per class. No float
    ever sums across rows.

    Scale shape: one quasi-key shuffle for class/band counts, a
    |classes|×k densification (k = |bands|, the psi pattern — bands are
    bounded), window cumsums over the k-row band axis per class.
    Output: (*quasi_cols, n, t_closeness)."""
    band = F.col(sensitive_col)
    # ONE full-table scan: the (class, band) cell relation; the band
    # marginal, the class sizes, and the scalars all derive from it by
    # exact integer re-aggregation (identical values, two fewer scans)
    cb = df.groupBy(*quasi_cols, band.alias("_b")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    gl = cb.groupBy("_b").agg(F.sum("_c").alias("_g"))
    wq = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    gl_cum = gl.select(
        "_b",
        F.sum("_g").over(wq).cast("long").alias("_cumq"),
    )
    tot = gl.agg(
        F.sum("_g").cast("long").alias("_nn"),
        F.count(F.lit(1)).cast("long").alias("_k"),
    )
    cls = cb.groupBy(*quasi_cols).agg(
        F.sum("_c").cast("long").alias("_n")
    )
    dense = (
        cls.crossJoin(F.broadcast(gl_cum.select("_b")))
        .join(cb, [*quasi_cols, "_b"], "left")
        .na.fill({"_c": 0})
    )
    wp = Window.partitionBy(*quasi_cols).orderBy("_b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    stepped = (
        dense.withColumn("_cump", F.sum("_c").over(wp).cast("long"))
        .join(F.broadcast(gl_cum), "_b")
        .crossJoin(F.broadcast(tot))
    )
    term = F.abs(
        F.col("_cump").cast("decimal(38,0)") * F.col("_nn")
        - F.col("_cumq").cast("decimal(38,0)") * F.col("_n")
    )
    acc = stepped.groupBy(*quasi_cols).agg(
        F.min("_n").alias("n"),
        F.sum(term).alias("_ts"),
        F.min("_nn").alias("_nnx"),
        F.min("_k").alias("_kx"),
    )
    t = F.when(F.col("_kx") < 2, F.lit(0.0)).otherwise(
        F.col("_ts").cast("double")
        / (
            F.col("n").cast("double")
            * F.col("_nnx").cast("double")
            * (F.col("_kx").cast("double") - 1.0)
        )
    )
    return acc.select(
        *quasi_cols,
        F.col("n"),
        (F.round(t, ndigits) + F.lit(0.0)).alias("t_closeness"),
    )


def candidate_key_audit(
    df: DataFrame,
    combos: Sequence[Sequence[str]],
) -> DataFrame:
    """Candidate-key discovery audit: for each enumerated column combo,
    how close is it to a key? Reports exact distinct-combination count,
    rows living in duplicated combinations, the worst multiplicity, and
    an is_key flag — the profiling pass schema inference and CDC-merge
    key selection start from (the reference's fid/date natural key,
    etl.py weights CSV, is exactly such an audited pair).

    Scale shape: one partial-agg shuffle per combo (the honest cost of a
    uniqueness proof); the per-combo report aggregates |distinct|-row
    relations. Output one row per combo: (combo, n_rows, n_distinct,
    n_dup_rows, max_multiplicity, is_key)."""
    out = None
    for combo in combos:
        counts = df.groupBy(*combo).agg(F.count(F.lit(1)).alias("_c"))
        rep = counts.agg(
            F.lit("+".join(combo)).alias("combo"),
            F.sum("_c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0))
            .cast("long")
            .alias("n_dup_rows"),
            F.max("_c").cast("long").alias("max_multiplicity"),
        ).select(
            "*",
            (F.col("n_distinct") == F.col("n_rows")).cast("int").alias("is_key"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


def reidentification_risk(
    df: DataFrame,
    quasi_cols: Sequence[str],
    ndigits: int = 6,
) -> DataFrame:
    """Re-identification risk scalars for a release under the standard
    attacker models (El Emam): prosecutor average risk = E[1/class size]
    = n_classes/N (each record's risk is 1/|its class|), journalist risk
    = 1/min class size, plus the uniques share (size-1 classes — the
    records a single lookup de-anonymizes). Complements
    ``k_anonymity_report`` (size histogram) with the decision-grade
    scalars.

    One quasi-key shuffle; exact integers, three double divisions.
    Output (1 row): (n_rows, n_classes, pct_unique, prosecutor_risk,
    journalist_risk)."""
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    acc = classes.agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(F.col("_n") == 1, 1).otherwise(0)).cast("long").alias("_u"),
        F.min("_n").cast("long").alias("_mn"),
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("n_rows"),
        F.col("n_classes"),
        rnd(F.col("_u").cast("double") / F.col("n_rows").cast("double")).alias(
            "pct_unique"
        ),
        rnd(
            F.col("n_classes").cast("double") / F.col("n_rows").cast("double")
        ).alias("prosecutor_risk"),
        rnd(F.lit(1.0) / F.col("_mn").cast("double")).alias("journalist_risk"),
    )
