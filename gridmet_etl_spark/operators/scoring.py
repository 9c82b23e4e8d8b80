"""Model-based corpus scoring at scan speed: a hashed linear quality
classifier (fastText-shaped) and a bigram language-model scorer — the two
scoring passes a training-data pipeline runs to rank/filter documents
before sampling.

Both are engine-portable by construction (md5-derived hashing and integer
arithmetic for the deterministic weights), so they're DuckDB-oracle-checkable
— rare for "apply a model" operators.

Scale design:
- classifier_scores: explode tokens → codegen bucket/weight lookup →
  per-doc mean (map-side partial agg collapses the token stream; the ONE
  shuffle carries |docs| partial sums). The "model" is a pure expression,
  not a broadcast table — nothing to ship.
- bigram_lm_scores: training is two partial-agg'd counts (bigram, unigram)
  — vocabulary-sized shuffles, not corpus-sized. Scoring joins the doc
  bigram stream (pre-aggregated to per-(doc, gram) multiplicities) against
  the model counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 1024
_W_MOD = 2001  # weights take values (k - 1000)/1000 ∈ [-1, 1]


def hash_bucket(token: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Portable token→bucket hash: first 6 md5 hex chars as an integer,
    mod n_buckets (Spark ``conv`` ≡ DuckDB ``CAST('0x…' AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(token), 1, 6), 16, 10).cast("long") % n_buckets


def bucket_weight_milli(bucket: Column) -> Column:
    """Deterministic pseudo-random weight NUMERATOR for a bucket id — an
    integer in [-1000, 1000] (the weight is numerator/1000), derived from
    md5('w:'||bucket) so both engines compute the identical fixed 'model'
    without shipping any parameter table. Kept integer until the final
    division so per-doc sums are EXACT (long arithmetic) — no float-sum
    ordering divergence between engines."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit("w:"), bucket.cast("string"))), 1, 6), 16, 10)
    return h.cast("long") % _W_MOD - F.lit(1000)


def classifier_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Hashed bag-of-words linear classifier (fastText-shaped): mean bucket
    weight over the doc's tokens through a sigmoid. Output: (doc_id,
    logit, score). The whole model evaluation is codegen'd column
    arithmetic; the shuffle is |docs| exact integer partial sums."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    weighted = toks.select(
        F.col(id_col), bucket_weight_milli(hash_bucket(F.col("tok"))).alias("wi")
    )
    per_doc = weighted.groupBy(id_col).agg(
        F.sum("wi").alias("swi"), F.count("*").alias("n")
    )
    logit = F.col("swi").cast("double") / (F.lit(1000.0) * F.col("n"))
    return per_doc.select(
        F.col(id_col),
        F.col("swi").alias("logit_milli"),  # exact integer numerator
        F.col("n").alias("n_tokens"),
        logit.alias("logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("score"),
    )


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc adjacent bigram stream (doc_id, w1, w2): posexplode the
    token array and pair each token with its successor via element_at —
    all codegen, no self-join, no interpreted lambda."""
    base = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("t"))
    return (
        base.select(F.col(id_col), F.col("t"), F.posexplode("t").alias("pos", "w1"))
        .filter(F.col("pos") < F.size("t") - 1)
        .select(
            F.col(id_col),
            F.col("w1"),
            F.element_at(F.col("t"), F.col("pos") + 2).alias("w2"),
        )
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
) -> DataFrame:
    """Per-document mean bigram log-likelihood under an add-k-smoothed
    bigram LM trained on the same corpus: avg log((c2 + k) / (c1 + k·V)).
    Low scores = improbable word sequences (gibberish/spam signal).
    Output: (doc_id, n_bigrams, avg_logp). Docs with zero bigrams are
    absent (no sequence to score).

    The model side (bigram/unigram counts) is vocabulary-bounded; the doc
    side pre-aggregates to per-(doc, gram) multiplicities so the join
    output is distinct-gram-sized, not token-stream-sized."""
    grams = doc_bigrams(docs, text_col, id_col)
    doc_grams = grams.groupBy(id_col, "w1", "w2").agg(F.count("*").alias("m"))
    toks = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w1")).filter(
        F.col("w1") != ""
    )
    unigrams = toks.groupBy("w1").agg(F.count("*").alias("c1"))
    bigrams = grams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    vocab = unigrams.count()
    logp = F.log(
        (F.col("c2") + F.lit(add_k)) / (F.col("c1") + F.lit(add_k * vocab))
    )
    scored = (
        doc_grams.join(bigrams, ["w1", "w2"])
        .join(unigrams, "w1")
        .select(F.col(id_col), (logp * F.col("m")).alias("lp"), F.col("m"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("m").cast("long").alias("n_bigrams"),
        (F.sum("lp") / F.sum("m")).alias("avg_logp"),
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier: bucket the
    predicted probability into ``n_bins`` equal-width bins and compare the
    bin's mean prediction against its observed positive rate (the gap per
    bin is what ECE weights; the per-row squared error aggregates to the
    Brier score). Output per non-empty bin: (bin, n, mean_score, frac_pos,
    abs_gap, brier) — ``brier`` is the bin-local mean squared error, so
    Σ n·brier / Σ n is the global Brier score.

    One scan, one |bins|-row exchange (map-side partial aggregation does
    the work): the canonical shape for evaluating a quality classifier
    over a full corpus."""
    s = F.col(score_col)
    y = F.col(label_col).cast("double")
    binned = scored.select(
        F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("long").alias("bin"),
        s.alias("_s"),
        y.alias("_y"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("_s"), 6).alias("mean_score"),
            F.round(F.avg("_y"), 6).alias("frac_pos"),
            F.round(F.abs(F.avg("_s") - F.avg("_y")), 6).alias("abs_gap"),
            F.round(F.avg((F.col("_s") - F.col("_y")) * (F.col("_s") - F.col("_y"))), 6).alias(
                "brier"
            ),
        )
    )


def lift_curve(
    df: DataFrame,
    label_col: str,
    score_col: str,
    id_col: str,
    n_bins: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Cumulative gains / lift table: rank the population by classifier
    score (best first), cut into ``n_bins`` equal-count bins, and report
    per bin the cumulative capture rate (share of all positives found so
    far) and lift over the base rate — the campaign-targeting /
    quality-gate view that AUC alone hides.

    Scale shape: ranking routes through ``scale.global_rank`` (range
    partition + partition-offset arithmetic — no single-partition global
    window over data rows); bin assignment is integer arithmetic on the
    rank; the per-bin aggregate is n_bins rows and the cumulative window
    runs over those n_bins rows only. Ties rank deterministically by
    (score, id).

    Output: (bin, n, n_pos, cum_capture, cum_lift), bin 0 = best-scored.
    """
    from .scale import global_rank

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("int").alias("_y"),
        F.col(score_col).cast("double").alias("_s"),
    ).withColumn("_negs", -F.col("_s"))
    ranked = global_rank(base, "_negs", tie_cols=["_id"], with_rank=False)
    tot = base.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_npos")
    )
    binned = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.expr(f"((rn - 1) * {n_bins}) div _n").alias("bin"),
            "_y",
            "_n",
            "_npos",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("n_pos"),
            F.first("_n").alias("_n"),
            F.first("_npos").alias("_npos"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("bin")  # n_bins rows — bounded by construction
    return binned.select(
        "bin",
        "n",
        "n_pos",
        F.sum("n").over(w).alias("_cn"),
        F.sum("n_pos").over(w).alias("_cp"),
        "_n",
        "_npos",
    ).select(
        F.col("bin").cast("int").alias("bin"),
        "n",
        "n_pos",
        (
            F.round(F.col("_cp") / F.col("_npos"), ndigits) + F.lit(0.0)
        ).alias("cum_capture"),
        (
            F.round(
                (F.col("_cp") / F.col("_cn"))
                / (F.col("_npos") / F.col("_n")),
                ndigits,
            )
            + F.lit(0.0)
        ).alias("cum_lift"),
    )


def f1_report(
    confusion: DataFrame,
    label_col: str = "label",
    pred_col: str = "assigned",
    n_col: str = "n",
    ndigits: int = 6,
) -> DataFrame:
    """Per-class precision / recall / F1 from a confusion rollup
    (label, predicted, n), plus MACRO (unweighted class mean) and MICRO
    (pooled — equals accuracy for single-label) summary rows: the
    classification report AUC/NDCG/MRR don't give.

    Everything runs on the |classes|²-bounded confusion relation — three
    bounded aggregates and a union; the fact table was consumed by
    whatever built the confusion. Empty-denominator classes report 0
    (the sklearn zero_division=0 convention).

    Output: (class, n_true, n_pred, precision, recall, f1) with class as
    string; summary rows use 'MACRO'/'MICRO'."""
    lbl, prd, n = F.col(label_col), F.col(pred_col), F.col(n_col)
    per_true = confusion.groupBy(lbl.alias("c")).agg(F.sum(n).alias("n_true"))
    per_pred = confusion.groupBy(prd.alias("c")).agg(F.sum(n).alias("n_pred"))
    tp = confusion.filter(lbl == prd).groupBy(lbl.alias("c")).agg(
        F.sum(n).alias("tp")
    )
    base = (
        per_true.join(per_pred, "c", "full")
        .join(tp, "c", "left")
        .na.fill({"n_true": 0, "n_pred": 0, "tp": 0})
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_true") > 0, F.col("tp") / F.col("n_true")).otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    scored = base.select(
        F.col("c").cast("string").alias("class"),
        "n_true",
        "n_pred",
        prec.alias("_p"),
        rec.alias("_r"),
        f1.alias("_f"),
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    per_class = scored.select(
        "class", "n_true", "n_pred",
        rnd(F.col("_p")).alias("precision"),
        rnd(F.col("_r")).alias("recall"),
        rnd(F.col("_f")).alias("f1"),
    )
    macro = scored.agg(
        F.lit("MACRO").alias("class"),
        F.sum("n_true").alias("n_true"),
        F.sum("n_pred").alias("n_pred"),
        rnd(F.avg("_p")).alias("precision"),
        rnd(F.avg("_r")).alias("recall"),
        rnd(F.avg("_f")).alias("f1"),
    )
    micro_stats = confusion.agg(
        F.sum(n).alias("_tot"),
        F.sum(F.when(lbl == prd, n).otherwise(0)).alias("_tp"),
    )
    micro = micro_stats.select(
        F.lit("MICRO").alias("class"),
        F.col("_tot").alias("n_true"),
        F.col("_tot").alias("n_pred"),
        rnd(F.col("_tp") / F.col("_tot")).alias("precision"),
        rnd(F.col("_tp") / F.col("_tot")).alias("recall"),
        rnd(F.col("_tp") / F.col("_tot")).alias("f1"),
    )
    return per_class.unionByName(macro).unionByName(micro)


def rbo_overlap(
    a: DataFrame,
    b: DataFrame,
    item_col: str = "item",
    rank_col: str = "rank",
    k: int = 32,
    scale: int = 10**15,
) -> DataFrame:
    """Rank-Biased Overlap (Webber et al. 2010) between two top-``k``
    rankings with persistence p = 1/2: RBO = (1−p)·Σ_d p^(d−1)·A_d where
    A_d is the prefix-agreement |A₁..d ∩ B₁..d|/d — the top-weighted
    "did the ranking change" number for comparing retrieval runs, feature
    rankings, or drifted top-k reports.

    p = 1/2 is chosen for EXACTNESS, not just taste: p^(d−1)·(1−p) =
    2^(−d), so every depth's term is the exact integer division
    (overlap_d·scale) div (d·2^d) — both engines floor identically and
    the k-term sum is exact (an arbitrary p would need cross-engine pow()
    rounding). int64 bounds: the numerator overlap·10¹⁵ ≤ k·10¹⁵ needs
    k ≤ 4000 (enforced — ValueError above that); the denominator d·2^d
    would overflow at d ≥ 58, but every depth ≥ 50 term is EXACTLY zero
    anyway (overlap_d ≤ d, so term ≤ 10¹⁵/2^d < 1 once 2^d > 10¹⁵, i.e.
    d ≥ 50, and the floor division yields 0) — those depths emit a
    literal 0 and 2^d is never materialized past 49.

    Scale shape: callers produce the two rankings however they like (the
    heavy part); this joins two ≤k-row relations and does bounded-window
    arithmetic — driver-free, broadcast-sized.

    Output per depth: (depth, overlap, agree_e4) + shared (rbo, n_both)."""
    from pyspark.sql import Window

    if k > 4000:
        raise ValueError(
            f"rbo_overlap: k={k} exceeds the int64-exact bound (k <= 4000: "
            "the scaled numerator overlap*1e15 must stay below 2^63)"
        )
    am = a.filter(F.col(rank_col) <= k).select(
        F.col(item_col).alias("_i"), F.col(rank_col).alias("_ra")
    )
    bm = b.filter(F.col(rank_col) <= k).select(
        F.col(item_col).alias("_i"), F.col(rank_col).alias("_rb")
    )
    both = am.join(bm, "_i").select(
        F.greatest("_ra", "_rb").alias("_md")
    )
    per_md = both.groupBy("_md").agg(F.count(F.lit(1)).alias("_c"))
    spark = a.sparkSession
    depths = spark.range(1, k + 1).select(F.col("id").cast("int").alias("depth"))
    w = Window.orderBy("depth")  # k rows — bounded
    curve = (
        depths.join(per_md, depths["depth"] == per_md["_md"], "left")
        .na.fill({"_c": 0})
        .select(
            "depth",
            F.sum("_c")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("overlap"),
        )
        .withColumn(
            # depth >= 50: d*2^d > k*scale for any allowed k, so the floor
            # division is exactly 0 — emit it literally instead of
            # materializing 2^d (which overflows int64 at d >= 58)
            "term",
            F.expr(
                f"CASE WHEN depth >= 50 THEN CAST(0 AS BIGINT) "
                f"ELSE overlap * CAST({scale} AS BIGINT) div "
                f"(depth * CAST(power(2, depth) AS BIGINT)) END"
            ),
        )
    )
    summary = curve.agg(
        (
            F.round(F.sum("term").cast("double") / scale, 6) + F.lit(0.0)
        ).alias("rbo")
    ).crossJoin(F.broadcast(both.agg(F.count(F.lit(1)).cast("long").alias("n_both"))))
    return curve.select(
        "depth",
        "overlap",
        F.expr("overlap * 10000 div depth").alias("agree_e4"),
    ).crossJoin(F.broadcast(summary))


def brier_decomposition(
    scored: DataFrame,
    score_e6_col: str,
    label_col: str,
    n_bins: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Murphy decomposition of the Brier score over equal-width
    probability bins: BRIER = RELIABILITY − RESOLUTION + UNCERTAINTY for
    the BINNED forecast q = p̄_bin (exact identity), next to the raw
    per-row Brier — the "is my classifier bad at calibration or just
    uninformative?" diagnostic behind calibration_bins' per-bin view.

    Determinism discipline: the score arrives as an INTEGER e6
    micro-probability in [0, 10⁶] (``score_e6_col``; quantize AND clamp
    at the caller — out-of-range scores land in unclamped bins), so the
    per-bin score sums, the raw Brier numerator Σ(s_e6 − y·10⁶)², and
    every p̄_b are exact integer ratios. The three |bins|-row
    decomposition sums quantize max-normalized e12 before aggregating
    (the kruskal discipline).

    Scale shape: ONE corpus scan (bin rollup with map-side partials);
    everything after is |bins|-sized.

    Output (1 row): (n, n_bins_used, brier_raw, brier_binned,
    reliability, resolution, uncertainty)."""
    s6 = F.col(score_e6_col).cast("long")
    y = F.col(label_col).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    binned = scored.select(
        F.least(
            F.floor(s6 * n_bins / 1_000_000), F.lit(n_bins - 1)
        ).cast("long").alias("_b"),
        s6.alias("_s6"),
        y.alias("_y"),
    )
    per_b = binned.groupBy("_b").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(dec(F.col("_s6"))).alias("_ss"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(
            dec(F.col("_s6") - F.col("_y") * 1_000_000)
            * (F.col("_s6") - F.col("_y") * 1_000_000)
        ).alias("_se2"),
    )
    tot = per_b.agg(
        F.sum("_n").cast("long").alias("_nt"),
        F.sum("_sy").cast("long").alias("_syt"),
        F.sum("_se2").alias("_se2t"),
        F.count(F.lit(1)).cast("long").alias("_nb"),
    )
    nd = F.col("_n").cast("double")
    pbar = F.col("_ss").cast("double") / (nd * 1e6)
    ybar_b = F.col("_sy").cast("double") / nd
    ybar = F.col("_syt").cast("double") / F.col("_nt").cast("double")
    terms = per_b.crossJoin(F.broadcast(tot)).select(
        "_n",
        (nd * (pbar - ybar_b) * (pbar - ybar_b)).alias("_rel"),
        (nd * (ybar_b - ybar) * (ybar_b - ybar)).alias("_res"),
    )
    tmax = terms.agg(
        F.max("_rel").alias("_rm"), F.max("_res").alias("_sm")
    )
    qz = lambda c, mx: F.when(  # noqa: E731
        F.col(mx) > 0.0, F.floor(c / F.col(mx) * 1e12).cast("long")
    ).otherwise(F.lit(0))
    acc = (
        terms.crossJoin(F.broadcast(tmax))
        .agg(
            F.sum(qz(F.col("_rel"), "_rm")).alias("_qr"),
            F.sum(qz(F.col("_res"), "_sm")).alias("_qs"),
            F.first("_rm").alias("_rm"),
            F.first("_sm").alias("_sm"),
        )
        .crossJoin(F.broadcast(tot))
    )
    ntd = F.col("_nt").cast("double")
    rel = F.col("_qr").cast("double") / 1e12 * F.col("_rm") / ntd
    res = F.col("_qs").cast("double") / 1e12 * F.col("_sm") / ntd
    unc = ybar * (1.0 - ybar)
    brier_raw = F.col("_se2t").cast("double") / (ntd * 1e12)
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("_nt").alias("n"),
        F.col("_nb").cast("int").alias("n_bins_used"),
        rnd(brier_raw).alias("brier_raw"),
        rnd(rel - res + unc).alias("brier_binned"),
        rnd(rel).alias("reliability"),
        rnd(res).alias("resolution"),
        rnd(unc).alias("uncertainty"),
    )


def err_at_k(
    ranked: DataFrame,
    query_col: str,
    rank_col: str,
    grade_col: str,
    gmax: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Expected Reciprocal Rank (Chapelle 2009) per query over a graded
    ranking: ERR = Σ_r (1/r)·R_r·Π_{i<r}(1−R_i) with stop probability
    R = (2^g − 1)/2^gmax — the cascade-model eval NDCG's position
    discount can't express (a perfect hit at rank 1 makes later ranks
    nearly worthless).

    Determinism: with integer grades, R is an exact DYADIC rational
    (denominator 2^gmax), so the running product Π(1−R_i) over ≤k ranks
    is EXACT in binary doubles (no rounding ever occurs); each term is
    one fixed-order double expression, e12-quantized before the per-query
    sum so accumulation order cannot matter. Output one row per query —
    no cross-query float aggregation.

    Scale shape: one window over each query's ≤k ranked rows (k bounded),
    one groupBy query. Output: (query_col, err)."""
    r_stop = (
        F.pow(F.lit(2.0), F.col(grade_col).cast("double")) - 1.0
    ) / F.lit(float(1 << gmax))
    w = (
        Window.partitionBy(query_col)
        .orderBy(rank_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.product(F.lit(1.0) - r_stop).over(w), F.lit(1.0))
    term = prior * r_stop / F.col(rank_col).cast("double")
    t_e12 = F.round(term * 1e12, 0).cast("long")
    per_q = ranked.select(
        F.col(query_col), t_e12.alias("_t")
    ).groupBy(query_col).agg(F.sum("_t").cast("long").alias("_s"))
    return per_q.select(
        query_col,
        (F.round(F.col("_s").cast("double") / 1e12, ndigits) + F.lit(0.0)).alias(
            "err"
        ),
    )


def mcc_confusion(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Matthews correlation coefficient + confusion matrix for a binary
    classifier — the single-number eval that stays honest under class
    imbalance (accuracy and F1 both inflate; MCC = Pearson's φ on the
    confusion matrix). MCC = (TP·TN − FP·FN)/(√(TP+FP)·√(TP+FN)·
    √(TN+FP)·√(TN+FN)) — the denominator multiplies four separate
    correctly-rounded sqrts, so nothing overflows at any N (the product
    form would pass 10³⁸ once cells reach ~10¹²).

    One conditional-aggregation pass over exact integer counts.
    Output (1 row): (tp, fp, tn, fn, accuracy, mcc)."""
    y = F.col(label_col).cast("int")
    p = F.col(pred_col).cast("int")
    acc = df.agg(
        F.sum(((y == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((y == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((y == 0) & (p == 0)).cast("long")).alias("tn"),
        F.sum(((y == 1) & (p == 0)).cast("long")).alias("fn"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = (dec(F.col("tp")) * F.col("tn") - dec(F.col("fp")) * F.col("fn")).cast(
        "double"
    )
    den = (
        F.sqrt((F.col("tp") + F.col("fp")).cast("double"))
        * F.sqrt((F.col("tp") + F.col("fn")).cast("double"))
        * F.sqrt((F.col("tn") + F.col("fp")).cast("double"))
        * F.sqrt((F.col("tn") + F.col("fn")).cast("double"))
    )
    n = (F.col("tp") + F.col("fp") + F.col("tn") + F.col("fn")).cast("double")
    accuracy = (F.col("tp") + F.col("tn")).cast("double") / n
    mcc = F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("tn").cast("long").alias("tn"),
        F.col("fn").cast("long").alias("fn"),
        rnd(accuracy).alias("accuracy"),
        rnd(mcc).alias("mcc"),
    )
