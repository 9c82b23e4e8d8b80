"""Statistical tests for data monitoring and model evaluation: chi-square
contingency, Mann–Whitney U, Kolmogorov–Smirnov two-sample, and rank-based
ROC AUC.

Extension surface (no reference counterpart): the drift-detection and
eval-harness statistics a production pipeline runs between ingest and
training. All four are EXACT (no approximation, no RNG) so every one has a
DuckDB oracle; the rank-based ones route through ``scale.global_rank`` —
distributed range-partitioned ranking — instead of a single-partition
global window, so they hold at corpus scale.

Float discipline: IEEE divisions on identical operands are bit-identical
across engines, so ranking on a computed double (e.g. a logit) is
cross-engine-safe; display values round at the edge.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .scale import global_rank


def chi_square_contingency(
    df: DataFrame, row_col: str, col_col: str, round_digits: int = 6
) -> DataFrame:
    """Pearson chi-square contingency table: observed vs expected counts
    for every (row, col) combination plus each cell's chi² term. One
    |cells|-sized aggregate; marginals broadcast back (two joins against
    |rows|- and |cols|-sized relations).

    Output: (row, col, n, expected, chi2_term)."""
    cells = df.groupBy(row_col, col_col).agg(F.count("*").alias("n"))
    row_tot = cells.groupBy(row_col).agg(F.sum("n").alias("_r"))
    col_tot = cells.groupBy(col_col).agg(F.sum("n").alias("_c"))
    grand = cells.agg(F.sum("n").alias("_t"))
    exp = (
        cells.join(F.broadcast(row_tot), row_col)
        .join(F.broadcast(col_tot), col_col)
        .crossJoin(F.broadcast(grand))
        .withColumn(
            "expected",
            F.col("_r").cast("double") * F.col("_c") / F.col("_t"),
        )
    )
    chi = (F.col("n") - F.col("expected")) ** 2 / F.col("expected")
    return exp.select(
        row_col,
        col_col,
        "n",
        F.round("expected", round_digits).alias("expected"),
        F.round(chi, round_digits).alias("chi2_term"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) for a two-group comparison:
    pooled average ranks (ties averaged) via ``global_rank``, then per-group
    ``U_g = R_g − n_g(n_g+1)/2``. Output one row per group:
    (group, n, rank_sum, u)."""
    ranked = global_rank(df.select(group_col, value_col), value_col)
    per_group = ranked.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum("rank").alias("_rs"),
    )
    return per_group.select(
        group_col,
        "n",
        F.round("_rs", round_digits).alias("rank_sum"),
        F.round(
            F.col("_rs") - F.col("n").cast("double") * (F.col("n") + 1) / 2.0,
            round_digits,
        ).alias("u"),
    )


def ks_statistic(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_digits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic: max |ECDF_a − ECDF_b| over
    the pooled distinct values — the standard distribution-drift gate.

    Per distinct value: cumulative counts of each group (value-ordered
    prefix sums over the |distinct|-bounded relation), ECDF difference,
    global max. Output: one row (n_a, n_b, d_stat)."""
    from pyspark.sql import Window

    two = df.where(F.col(group_col).isin(group_a, group_b))
    per_val = two.groupBy(value_col).agg(
        F.count(F.when(F.col(group_col) == group_a, 1)).alias("_na"),
        F.count(F.when(F.col(group_col) == group_b, 1)).alias("_nb"),
    )
    # DISTRIBUTED prefix sums over the value-ordered relation — the same
    # two-level range-partition shape as global_rank: within-partition
    # cumulative windows run in parallel; only the |partitions|-row offset
    # relation sees a single-partition window
    n = df.sparkSession.sparkContext.defaultParallelism
    rp = per_val.repartitionByRange(n, F.col(value_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    ptot = rp.groupBy("_pid").agg(
        F.sum("_na").alias("_pa"), F.sum("_nb").alias("_pb")
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = ptot.select(
        "_pid",
        F.coalesce(F.sum("_pa").over(w_off), F.lit(0)).alias("_oa"),
        F.coalesce(F.sum("_pb").over(w_off), F.lit(0)).alias("_ob"),
    )
    w_in = Window.partitionBy("_pid").orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        rp.withColumn("_la", F.sum("_na").over(w_in))
        .withColumn("_lb", F.sum("_nb").over(w_in))
        .join(F.broadcast(offs), "_pid")
        .select(
            (F.col("_la") + F.col("_oa")).alias("_ca"),
            (F.col("_lb") + F.col("_ob")).alias("_cb"),
        )
    )
    totals = per_val.agg(
        F.sum("_na").alias("n_a"), F.sum("_nb").alias("n_b")
    )
    diff = cum.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("_ca").cast("double") / F.col("n_a")
            - F.col("_cb").cast("double") / F.col("n_b")
        ).alias("_d"),
    )
    return diff.groupBy("n_a", "n_b").agg(
        F.round(F.max("_d"), round_digits).alias("d_stat")
    )


def auc_score(
    scored: DataFrame,
    label_col: str,
    score_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Exact ROC AUC from ranks (the Mann–Whitney identity):
    ``AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg)`` with average
    ranks on score ties — ties contribute 0.5, matching the trapezoidal
    ROC. Ranking is distributed (``global_rank``); the label must be
    boolean. Output: one row (n_pos, n_neg, auc)."""
    ranked = global_rank(
        scored.select(F.col(label_col).alias("_y"), score_col), score_col
    )
    agg = ranked.agg(
        F.count(F.when(F.col("_y"), 1)).alias("n_pos"),
        F.count(F.when(~F.col("_y"), 1)).alias("n_neg"),
        F.sum(F.when(F.col("_y"), F.col("rank"))).alias("_rp"),
    )
    auc = (
        F.col("_rp") - F.col("n_pos").cast("double") * (F.col("n_pos") + 1) / 2.0
    ) / (F.col("n_pos").cast("double") * F.col("n_neg"))
    return agg.select("n_pos", "n_neg", F.round(auc, round_digits).alias("auc"))


def weighted_median(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    weight_col: str,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact weighted median per group: the smallest value whose running
    weight reaches half the group total (lower weighted median —
    deterministic, no interpolation). One group-keyed shuffle shared by
    the cumulative window and the total; the crossing row is picked with
    a row_number over the same partitioning, so no second exchange.
    ``tie_cols`` pin the scan order among equal values for cross-engine
    determinism."""
    keys = list(keys)
    order = [F.col(value_col), *[F.col(c) for c in tie_cols]]
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*keys)
    flagged = df.select(*keys, value_col, weight_col, *tie_cols).withColumn(
        "_cw", F.sum(weight_col).over(w_cum)
    ).withColumn("_tw", F.sum(weight_col).over(w_tot))
    crossing = flagged.where(F.col("_cw") * 2 >= F.col("_tw"))
    w_pick = Window.partitionBy(*keys).orderBy(*order)
    return (
        crossing.withColumn("_rn", F.row_number().over(w_pick))
        .where(F.col("_rn") == 1)
        .select(
            *keys,
            F.col(value_col).alias("w_median"),
            F.col("_tw").alias("total_weight"),
        )
    )


# Poisson(1) inverse-CDF thresholds, fixed literals so Spark and the SQL
# oracle evaluate the SAME constants (cumulative e^-1 · Σ 1/k!)
POISSON1_CDF = (0.36787944, 0.73575888, 0.9196986, 0.98101184, 0.99634015)


def bootstrap_weight(u: Column) -> Column:
    """Deterministic Poisson(1) draw from a uniform u ∈ [0,1) by inverse
    CDF (capped at 5 — P(>5) < 6e-4). The Poisson bootstrap replaces
    sample-with-replacement (which needs a global index and coordinated
    RNG) with an independent per-row weight, which is exactly what a
    shared-nothing scan can do."""
    t = POISSON1_CDF
    return (
        F.when(u < t[0], 0)
        .when(u < t[1], 1)
        .when(u < t[2], 2)
        .when(u < t[3], 3)
        .when(u < t[4], 4)
        .otherwise(5)
    )


def bootstrap_ci(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    id_col: str,
    n_boot: int = 64,
    alpha: float = 0.05,
    ndigits: int = 6,
) -> DataFrame:
    """Percentile bootstrap confidence interval for the per-group MEAN,
    fully deterministic: replicate b draws row weights w = Poisson(1)
    seeded by md5(id:b), the replicate statistic is the weighted mean, and
    the CI takes the ceil(α/2·B)-th / ceil((1-α/2)·B)-th order statistics
    of the B replicate means.

    Scale shape: the B-way replication is a row-local explode (map-side,
    never shuffled); ONE partial-agg shuffle keyed (group, b) carries
    |groups|×B partial sums; the order-statistic step sorts B ≤ a few
    hundred values per group inside an array — no window over data rows.
    Determinism makes it oracle-replayable AND retry-safe on speculative
    re-execution (a task rerun draws identical weights).

    Output: (*group_cols, mean_est, ci_lo, ci_hi, n_boot).
    """
    groups = list(group_cols)
    b = F.explode(F.array(*[F.lit(i) for i in range(n_boot)])).alias("_b")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col("_b").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    rep = (
        df.select(*groups, F.col(id_col), F.col(val_col).cast("double").alias("_x"), b)
        .withColumn("_w", bootstrap_weight(u))
        .groupBy(*groups, "_b")
        .agg(
            (F.sum(F.col("_w") * F.col("_x")) / F.sum("_w")).alias("_m")
        )
        .where(F.col("_m").isNotNull())
    )
    lo_rank = max(1, math.ceil(alpha / 2 * n_boot))
    hi_rank = math.ceil((1 - alpha / 2) * n_boot)
    ci = rep.groupBy(*groups).agg(
        F.array_sort(F.collect_list(F.round(F.col("_m"), ndigits))).alias("_ms")
    )
    base = df.groupBy(*groups).agg(
        (F.round(F.avg(F.col(val_col).cast("double")), ndigits) + F.lit(0.0)).alias(
            "mean_est"
        )
    )
    return base.join(ci, groups).select(
        *groups,
        "mean_est",
        (F.element_at("_ms", lo_rank) + F.lit(0.0)).alias("ci_lo"),
        (F.element_at("_ms", hi_rank) + F.lit(0.0)).alias("ci_hi"),
        F.lit(n_boot).alias("n_boot"),
    )


def kaplan_meier(
    df: DataFrame,
    group_cols: Sequence[str],
    duration_col: str,
    event_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival curve per group — the right-censoring-aware
    retention/churn estimator (a plain "fraction still alive at t" is
    biased the moment observation windows differ).

    S(t) = Π_{u ≤ t, u event time} (1 − d_u / n_u) with d_u = events at u
    and n_u = subjects still at risk (duration ≥ u, censored or not).

    Relational form: one (group, time)-keyed partial agg collapses
    subjects to per-time (events, total leaving) counts; the at-risk count
    is the group total minus a running sum over the time-ordered count
    relation (a window over |distinct durations| rows per group, NOT over
    subjects); the running product is exp(Σ ln(1−d/n)) — written with the
    identical expression in the SQL oracle so both engines evaluate the
    same float steps, then rounded. Shuffles: the per-time partial agg +
    one |times|-sized window — subject rows never sort globally.

    Output: (*group_cols, t, n_risk, d, surv) for EVENT times only,
    ordered semantics (surv non-increasing within a group).
    """
    groups = list(group_cols)
    base = df.select(
        *groups,
        F.col(duration_col).cast("long").alias("_t"),
        F.col(event_col).cast("int").alias("_e"),
    )
    per_t = base.groupBy(*groups, "_t").agg(
        F.sum("_e").alias("_d"),
        F.count(F.lit(1)).alias("_leave"),
    )
    w_ord = Window.partitionBy(*groups).orderBy("_t")
    w_all = Window.partitionBy(*groups)
    cum = per_t.select(
        *groups,
        "_t",
        "_d",
        (
            F.sum("_leave").over(w_all)
            - F.coalesce(
                F.sum("_leave").over(
                    Window.partitionBy(*groups)
                    .orderBy("_t")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("_n"),
    )
    # d == n (everyone at risk dies) sends the factor to 0; ln(0) is an
    # engine-divergent edge (Spark NULL, DuckDB -inf), so clamp at 1e-300:
    # exp of any sum containing ln(1e-300) underflows to exactly 0.0 in
    # both engines — the correct S(t) after rounding
    surv = cum.withColumn(
        "_ln",
        F.log(F.greatest(F.lit(1.0) - F.col("_d") / F.col("_n"), F.lit(1e-300))),
    ).withColumn("_s", F.exp(F.sum("_ln").over(w_ord)))
    return surv.where(F.col("_d") > 0).select(
        *groups,
        F.col("_t").alias("t"),
        F.col("_n").alias("n_risk"),
        F.col("_d").alias("d"),
        (F.round(F.col("_s"), ndigits) + F.lit(0.0)).alias("surv"),
    )


def gini_lorenz(
    units: DataFrame,
    y_col: str,
    id_col: str,
    n_points: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Lorenz curve + Gini coefficient of a nonnegative quantity across
    units (revenue concentration, token-budget share, …): rank units by
    value ascending through ``scale.global_rank`` (never a
    single-partition data sort), bucket ranks into ``n_points`` equal-
    population points, and report each point's cumulative value share.
    Gini uses the exact rank identity G = 2·Σ(rn·y)/(n·Σy) − (n+1)/n —
    one extra aggregate over the ranked relation, no pairwise |y_i − y_j|
    join. Ties rank deterministically by (y, id).

    Output: (point, pop_share, cum_value_share, gini) — gini repeated per
    row for a one-relation readout; point n_points = (1.0, 1.0)."""
    from pyspark.sql import Window

    from .scale import global_rank

    base = units.select(
        F.col(id_col).alias("_id"), F.col(y_col).cast("double").alias("_y")
    )
    ranked = global_rank(base, "_y", tie_cols=["_id"], with_rank=False)
    tot = ranked.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("rn") * F.col("_y")).alias("_srny"),
    )
    binned = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            # ceil so point p covers ranks ((p-1)/k, p/k]·n — point k is all
            F.ceil(F.col("rn") * n_points / F.col("_n")).cast("int").alias("point"),
            "_y",
        )
        .groupBy("point")
        .agg(F.sum("_y").alias("_py"))
    )
    w = Window.orderBy("point")  # n_points rows — bounded
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return (
        binned.select("point", F.sum("_py").over(w).alias("_cy"))
        .crossJoin(F.broadcast(tot))
        .select(
            "point",
            rnd(F.col("point") / F.lit(float(n_points))).alias("pop_share"),
            rnd(F.col("_cy") / F.col("_sy")).alias("cum_value_share"),
            rnd(
                F.lit(2.0) * F.col("_srny") / (F.col("_n") * F.col("_sy"))
                - (F.col("_n") + 1) / F.col("_n")
            ).alias("gini"),
        )
    )


def logrank_test(
    df: DataFrame,
    grp_col: str,
    t_col: str,
    e_col: str,
    group_a,
    ndigits: int = 6,
) -> DataFrame:
    """Two-sample log-rank test (Mantel-Cox) — the significance companion
    to kaplan_meier: at every event time, compare group A's observed
    deaths d1 to its hypergeometric expectation d·n1/n given the at-risk
    sets, accumulate O−E and the variance, report χ² = (O−E)²/V (1 df).

    Scale shape: subject rows collapse to per-(group, time) counts in ONE
    partial-agg shuffle; at-risk counts come from a time-grid range join
    (|event times| × |distinct durations| pairs — bounded by the TIME
    GRID squared, e.g. days², never by subjects); the O/E/V accumulation
    is one aggregate over the |event times|-row relation.

    Output (1 row): (n_a, n_b, observed_a, expected_a, variance, chi2)."""
    per = df.groupBy(grp_col, t_col).agg(
        F.sum(F.col(e_col).cast("long")).alias("d"),
        F.count(F.lit(1)).alias("lv"),
    )
    times = (
        per.groupBy(t_col)
        .agg(F.sum("d").alias("_dt"))
        .filter(F.col("_dt") > 0)
        .select(F.col(t_col).alias("_t"))
    )
    # at-risk n_g(t) = Σ lv over durations ≥ t (time-grid range join)
    risk = (
        times.join(per, per[t_col] >= F.col("_t"))
        .groupBy("_t", grp_col)
        .agg(F.sum("lv").alias("n_g"))
    )
    deaths = per.select(grp_col, F.col(t_col).alias("_t"), "d")
    is_a = F.col(grp_col) == group_a
    cells = (
        risk.join(deaths, ["_t", grp_col], "left")
        .na.fill({"d": 0})
        .groupBy("_t")
        .agg(
            F.sum(F.when(is_a, F.col("n_g")).otherwise(0)).alias("n1"),
            F.sum("n_g").alias("n"),
            F.sum(F.when(is_a, F.col("d")).otherwise(0)).alias("d1"),
            F.sum("d").alias("dd"),
        )
        .filter(F.col("n") > 1)
    )
    frac = F.col("n1") / F.col("n")
    acc = cells.agg(
        F.sum("d1").alias("_o"),
        F.sum(F.col("dd") * frac).alias("_e"),
        F.sum(
            F.col("dd")
            * frac
            * (1 - frac)
            * (F.col("n") - F.col("dd"))
            / (F.col("n") - 1)
        ).alias("_v"),
    )
    sizes = df.groupBy(grp_col).agg(F.count(F.lit(1)).alias("_ng"))
    n_a = sizes.filter(is_a).select(F.col("_ng").alias("n_a"))
    n_b = sizes.filter(~is_a).agg(F.sum("_ng").alias("n_b"))
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return (
        acc.crossJoin(F.broadcast(n_a))
        .crossJoin(F.broadcast(n_b))
        .select(
            "n_a",
            "n_b",
            F.col("_o").cast("long").alias("observed_a"),
            rnd(F.col("_e")).alias("expected_a"),
            rnd(F.col("_v")).alias("variance"),
            rnd((F.col("_o") - F.col("_e")) * (F.col("_o") - F.col("_e")) / F.col("_v")).alias(
                "chi2"
            ),
        )
    )


def welch_ttest(
    units: DataFrame,
    y_col: str,
    t_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Welch's unequal-variance t-test for a continuous metric — the
    means-comparison companion to the two-proportion z (ab_test) and the
    rank tests (mann_whitney): per-arm mean and sample variance from ONE
    conditional-aggregate pass, t = Δm/√(s₁²/n₁ + s₂²/n₂), and the
    Welch–Satterthwaite effective df. No pooled-variance assumption — the
    correct default when arms differ in spread (they do, post-treatment).

    Output (1 row): (n_t, n_c, mean_t, mean_c, diff, t_stat, df)."""
    is_t, is_c = F.col(t_col) == 1, F.col(t_col) == 0
    y = F.col(y_col)
    g = units.agg(
        F.count(F.when(is_t, F.lit(1))).alias("n1"),
        F.sum(F.when(is_t, y)).alias("s1"),
        F.sum(F.when(is_t, y * y)).alias("q1"),
        F.count(F.when(is_c, F.lit(1))).alias("n2"),
        F.sum(F.when(is_c, y)).alias("s2"),
        F.sum(F.when(is_c, y * y)).alias("q2"),
    )
    m1, m2 = F.col("s1") / F.col("n1"), F.col("s2") / F.col("n2")
    v1 = (F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1")) / (F.col("n1") - 1)
    v2 = (F.col("q2") - F.col("s2") * F.col("s2") / F.col("n2")) / (F.col("n2") - 1)
    se2 = v1 / F.col("n1") + v2 / F.col("n2")
    df_ws = (se2 * se2) / (
        (v1 / F.col("n1")) * (v1 / F.col("n1")) / (F.col("n1") - 1)
        + (v2 / F.col("n2")) * (v2 / F.col("n2")) / (F.col("n2") - 1)
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return g.select(
        F.col("n1").alias("n_t"),
        F.col("n2").alias("n_c"),
        rnd(m1).alias("mean_t"),
        rnd(m2).alias("mean_c"),
        rnd(m1 - m2).alias("diff"),
        rnd((m1 - m2) / F.sqrt(se2)).alias("t_stat"),
        rnd(df_ws).alias("df"),
    )


def effective_sample_size(
    units: DataFrame,
    group_cols: Sequence[str],
    w_col: str,
    cents: int = 100,
) -> DataFrame:
    """Kish effective sample size per group: ESS = (Σw)² / Σw² — how many
    EQUAL-weight observations a weighted sample is worth. The design
    effect deff = n/ESS is the variance-inflation factor every weighted
    estimate (IPW, importance-resampled corpora, upweighted minority
    classes) silently pays; ESS ≪ n means a few huge weights dominate.

    Determinism discipline: weights quantize to integers at ``cents``
    resolution (exact for currency-like inputs) BEFORE the sums, so Σw
    and Σw² are exact order-independent integers; the two output ratios
    divide exact ints in fixed order. Σw² accumulates in DECIMAL(38,0):
    the int64 bound n·(w_max·cents)² already blows at sf0.1 orders
    (3×10⁴ rows · (5×10⁷)² ≈ 7.5×10¹⁹ — caught by the r9 at-scale oracle
    sweep), and decimal partials stay exact and mergeable map-side.

    One aggregation pass; output one row per group:
    (*group_cols, n, sum_w_cents, ess, deff)."""
    wq = F.round(F.col(w_col).cast("double") * cents).cast("long")
    agg = units.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(wq).alias("sum_w_cents"),
        F.sum((wq * wq).cast("decimal(38,0)")).alias("_sw2"),
    )
    sw = F.col("sum_w_cents").cast("double")
    ess = sw * sw / F.col("_sw2").cast("double")
    rnd = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    return agg.select(
        *group_cols,
        "n",
        "sum_w_cents",
        rnd(ess).alias("ess"),
        rnd(F.col("n").cast("double") / ess).alias("deff"),
    )


def cohen_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Cohen's κ agreement between two categorical raters — accuracy
    corrected for chance (two raters both predicting the majority class
    'agree' constantly; κ discounts exactly that). κ = (p_o − p_e)/(1 − p_e)
    with p_o = observed agreement and p_e = Σ_c marginal_a(c)·marginal_b(c)/n².

    Determinism: p_o and p_e divide EXACT integer counts (the marginal
    cross-products sum in int64), and κ is a fixed expression over those
    two — engine-exact. Everything runs on the |categories|²-bounded
    confusion rollup; the data-sized work is one counting agg.

    Degenerate guard: p_e = 1 (both raters constant, same class) forces
    p_o = 1 — report κ = 1. Output (1 row): (n, n_agree, po, pe, kappa)."""
    a, b = F.col(a_col).cast("string"), F.col(b_col).cast("string")
    conf = df.groupBy(a.alias("_a"), b.alias("_b")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    tot = conf.agg(
        F.sum("_n").cast("long").alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n")).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    ma = conf.groupBy("_a").agg(F.sum("_n").cast("long").alias("_na"))
    mb = conf.groupBy("_b").agg(F.sum("_n").cast("long").alias("_nb"))
    pe_num = (
        ma.join(mb, ma["_a"] == mb["_b"])
        .agg(F.sum(F.col("_na") * F.col("_nb")).cast("long").alias("_pe_num"))
    )
    po = F.col("n_agree").cast("double") / F.col("n")
    pe = F.col("_pe_num").cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    kappa = F.when(pe == 1.0, F.lit(1.0)).otherwise((po - pe) / (1 - pe))
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return tot.crossJoin(F.broadcast(pe_num)).select(
        "n",
        "n_agree",
        rnd(po).alias("po"),
        rnd(pe).alias("pe"),
        rnd(kappa).alias("kappa"),
    )


def _prefix_rank2(per_v: DataFrame, gp: Sequence[str], val_col: str) -> DataFrame:
    """Per-(group, value) exact integer 2·r̄(v) = 2·(#rows below v) + tie(v)
    + 1 from a (group, value, _cv) count relation, with the cumulative
    below-counts computed by the two-level DISTRIBUTED prefix (range
    repartition on (group, value) → per-(partition, group) windows + a
    bounded |partitions|×|groups| offset relation ordered per group) — a
    per-group window over the whole value relation would funnel each group
    through ONE task when values are near-continuous (|distinct| ≈ |rows|,
    e.g. prices). localCheckpoint pins one evaluation across the offset and
    cumulative branches (scale.global_rank precedent)."""
    gp = list(gp)
    npart = per_v.sparkSession.sparkContext.defaultParallelism
    rp = (
        per_v.repartitionByRange(npart, *[F.col(c) for c in gp], F.col(val_col))
        .sortWithinPartitions(*gp, val_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    rp = rp.localCheckpoint(eager=False)
    ptot = rp.groupBy("_pid", *gp).agg(F.sum("_cv").alias("_pc"))
    w_off = (
        Window.partitionBy(*gp)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = ptot.select(
        "_pid", *gp,
        F.coalesce(F.sum("_pc").over(w_off), F.lit(0)).alias("_ob"),
    )
    w_in = (
        Window.partitionBy("_pid", *gp)
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        rp.withColumn("_lb", F.coalesce(F.sum("_cv").over(w_in), F.lit(0)))
        .join(F.broadcast(offs), ["_pid", *gp])
        .select(
            *gp,
            val_col,
            (2 * (F.col("_lb") + F.col("_ob")) + F.col("_cv") + 1).alias("_r2"),
        )
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    ndigits: int = 6,
) -> DataFrame:
    """Spearman rank correlation (average-rank ties) per group — the
    monotone-association screen (Pearson on RANKS, so it sees any
    monotone relation and shrugs at outliers).

    Determinism discipline: tie-averaged ranks are carried as the exact
    INTEGER 2·r̄(v) = 2·(#rows below v) + tie(v) + 1, so every regression
    sum (Σx, Σy, Σxy, Σx², Σy²) is an exact int64 — order-independent
    across shuffles and engines; the closed-form correlation combines the
    exact sums in fixed expression order. int64 bound: Σ(2r)² ≤ n·(2n)² —
    safe through n ≈ 10⁸ per group.

    Scale shape — COUNT-BASED, no row-level rank window: ranks are a
    function of the VALUE alone, so the per-(group, x, y) cell counts
    (one groupBy) join two per-(group, value) rank relations built with
    histogram-sized cumulative windows (|distinct values| rows per group,
    not |rows|). The raw data is touched by exactly one aggregation; at
    100 TB every later exchange is histogram-sized.

    NULL semantics: PAIRWISE-COMPLETE — rows with NULL x or y are
    dropped BEFORE ranking, so ranks and moment sums are computed over
    the same row set (a NULL-keyed cell would silently vanish at the
    rank joins anyway, but its counts would still inflate the per-value
    rank relation and skew the surviving rows' ranks — ADVICE r7).

    Output per group: (*group_cols, n, rho)."""
    gp = list(group_cols)
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(*gp, F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )

    def ranks2(col: str, out: str) -> DataFrame:
        per_v = cells.groupBy(*gp, col).agg(F.sum("_c").alias("_cv"))
        return _prefix_rank2(per_v, gp, col).withColumnRenamed("_r2", out)

    j = cells.join(ranks2("_x", "rx"), [*gp, "_x"]).join(
        ranks2("_y", "ry"), [*gp, "_y"]
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    acc = j.groupBy(*gp).agg(
        F.sum("_c").cast("long").alias("n"),
        F.sum(dec(F.col("_c")) * F.col("rx")).alias("sx"),
        F.sum(dec(F.col("_c")) * F.col("ry")).alias("sy"),
        F.sum(dec(F.col("_c")) * F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(dec(F.col("_c")) * F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(dec(F.col("_c")) * F.col("ry") * F.col("ry")).alias("syy"),
    )
    dn = F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    dx = F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    dy = F.col("n").cast("double") * F.col("syy") - F.col("sy").cast(
        "double"
    ) * F.col("sy")
    rho = F.when((dx == 0.0) | (dy == 0.0), F.lit(0.0)).otherwise(
        dn / F.sqrt(dx * dy)
    )
    return acc.select(
        *gp,
        F.col("n"),
        (F.round(rho, ndigits) + F.lit(0.0)).alias("rho"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Kruskal–Wallis H (rank one-way ANOVA): do ≥2 groups draw from the
    same distribution, judged on GLOBAL average ranks — the k-sample
    generalization of mann_whitney_u.

    Determinism: global tie-averaged ranks as exact 2·r̄(v) = 2·(#rows
    below v) + tie(v) + 1 integers; per-group H terms use the DEVIATION
    form H = 12/(N(N+1))·Σ n_g·(r̄_g − r̄)², with the deviation numerator
    D_g = Σ2r_g − n_g·(N+1) an EXACT integer — all terms positive, no
    catastrophic cancellation; the (k-row) term sum is made
    order-independent by quantizing each group's double term RELATIVE to
    the largest term (⌊term/max·10¹²⌋ — identical-operand IEEE division,
    exact integer sum, ≤2⁻⁴⁰ relative error; an absolute e6 quantization
    would overflow int64 once n_g·dev² > 9.2×10¹²). Tie correction
    C = 1 − Σ(t³−t)/(N³−N) from exact integer tie counts.

    Scale shape — COUNT-BASED, no row-level rank window: rank is a
    function of the value alone, so Σ2r̄ per group = Σ_v count_g(v)·2r̄(v)
    over the per-(group, value) cell relation. The pooled per-value
    cumulative counts use the distributed two-level prefix (range
    repartition + per-partition windows + a |partitions|-row offset
    relation — the ks_statistic / global_rank shape), never a
    single-partition pass over the data or its distinct values.

    Output per group: (grp, n_g, mean_rank) plus the shared
    (n, dof, h, h_corrected) columns."""
    cells = df.groupBy(
        F.col(group_col).alias("grp"), F.col(value_col).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_c"))
    vals = cells.groupBy("_v").agg(F.sum("_c").alias("_cv"))
    # distributed prefix over the pooled distinct values (shared helper,
    # gp=() — the grouped form is spearman's)
    r2v = _prefix_rank2(vals, (), "_v")
    per_g = cells.join(r2v, "_v").groupBy("grp").agg(
        F.sum("_c").cast("long").alias("n_g"),
        F.sum(F.col("_c") * F.col("_r2")).alias("s2"),
    )
    tot = per_g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("dof_plus1"),
    )
    ties = vals.agg(
        F.sum(F.col("_cv") * F.col("_cv") * F.col("_cv") - F.col("_cv")).alias(
            "tie3"
        )
    )
    # D_g = Σ2r − n_g·(N+1): exact integer deviation ×2; term = D²/(4·n_g)
    # in double (identical operands both engines), floor-e6-quantized so
    # the k-row sum is exact
    g = per_g.crossJoin(F.broadcast(tot)).withColumn(
        "_d", F.col("s2") - F.col("n_g") * (F.col("n") + 1)
    )
    term = (
        F.col("_d").cast("double")
        * F.col("_d").cast("double")
        / (4.0 * F.col("n_g").cast("double"))
    )
    g = g.withColumn("_term", term)
    tmax = g.agg(F.max("_term").alias("_tmax"))
    q = F.floor(F.col("_term") / F.col("_tmax") * 1e12).cast("long")
    acc = (
        g.crossJoin(F.broadcast(tmax))
        .agg(
            F.sum(F.when(F.col("_tmax") > 0.0, q).otherwise(F.lit(0))).alias(
                "q_e12"
            ),
            F.first("_tmax").alias("_tmax"),
            F.first("n").alias("n"),
            F.first("dof_plus1").alias("k"),
        )
        .crossJoin(F.broadcast(ties))
    )
    nn = F.col("n").cast("double")
    h = (
        12.0
        * (F.col("q_e12").cast("double") / 1e12 * F.col("_tmax"))
        / (nn * (nn + 1.0))
    )
    # N <= 1 degenerates the tie-correction denominator N^3 - N to 0
    # (0/0 -> NaN would flow PAST the corr == 0.0 guard, since NaN != 0.0)
    # — emit 0.0 for both H forms there, matching the no-information case
    corr = F.when(
        nn * nn * nn - nn == 0.0, F.lit(0.0)
    ).otherwise(1.0 - F.col("tie3").cast("double") / (nn * nn * nn - nn))
    h_corr = F.when(corr == 0.0, F.lit(0.0)).otherwise(h / corr)
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    summary = acc.select(
        "n",
        (F.col("k") - 1).cast("int").alias("dof"),
        rnd(h).alias("h"),
        rnd(h_corr).alias("h_corrected"),
    )
    detail = per_g.select(
        F.col("grp"),
        F.col("n_g"),
        (
            F.round(F.col("s2").cast("double") / (2.0 * F.col("n_g")), ndigits)
            + F.lit(0.0)
        ).alias("mean_rank"),
    )
    return detail.crossJoin(F.broadcast(summary))


def cramers_v(
    df: DataFrame, row_col: str, col_col: str, ndigits: int = 6
) -> DataFrame:
    """Association SUMMARY for two categoricals: total chi², dof, and
    Cramér's V (chi_square_contingency is the per-cell table; this is the
    one-row effect size you act on). Per-cell (O−E)²/E terms are computed
    from exact integer marginals in fixed order and quantized RELATIVE to
    the largest term (⌊term/max·10¹²⌋ — the kruskal_wallis pattern) before
    the |cells|-row sum: order-independent at ANY magnitude, where the
    old absolute e9 quantization overflowed int64 once a single term
    exceeded ~9.2×10⁹ (a term is bounded only by N — ADVICE r8 fix);
    V = √(χ²/(N·min(r−1, c−1)))."""
    cells = df.groupBy(
        F.col(row_col).alias("_r"), F.col(col_col).alias("_c")
    ).agg(F.count(F.lit(1)).alias("n"))
    row_tot = cells.groupBy("_r").agg(F.sum("n").alias("rt"))
    col_tot = cells.groupBy("_c").agg(F.sum("n").alias("ct"))
    grand = cells.agg(
        F.sum("n").cast("long").alias("_tot"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    dims = row_tot.agg(F.count(F.lit(1)).cast("long").alias("r")).crossJoin(
        col_tot.agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # the FULL r×c table, including zero cells — (0−E)²/E terms are part
    # of chi² (omitting them halves the statistic under perfect
    # association; caught by the textbook pytest)
    exp = (
        row_tot.crossJoin(col_tot)
        .join(cells, ["_r", "_c"], "left")
        .na.fill({"n": 0})
        .crossJoin(F.broadcast(grand))
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("_tot")
    exp = exp.withColumn(
        "_term",
        (F.col("n").cast("double") - e) * (F.col("n").cast("double") - e) / e,
    )
    tmax = exp.agg(F.max("_term").alias("_tmax"))
    q = F.floor(F.col("_term") / F.col("_tmax") * 1e12).cast("long")
    chi = (
        exp.crossJoin(F.broadcast(tmax))
        .agg(
            F.sum(
                F.when(F.col("_tmax") > 0.0, q).otherwise(F.lit(0))
            ).alias("q_e12"),
            F.first("_tmax").alias("_tmax"),
            F.first("_tot").alias("_tot"),
            F.first("n_cells").alias("n_cells"),
        )
        .crossJoin(F.broadcast(dims))
    )
    chi2 = F.col("q_e12").cast("double") / 1e12 * F.col("_tmax")
    denom = F.col("_tot").cast("double") * F.least(
        F.col("r") - 1, F.col("c") - 1
    ).cast("double")
    v = F.when(denom == 0.0, F.lit(0.0)).otherwise(F.sqrt(chi2 / denom))
    rnd = lambda x: F.round(x, ndigits) + F.lit(0.0)  # noqa: E731
    return chi.select(
        F.col("_tot").alias("n"),
        F.col("r").cast("int").alias("n_rows"),
        F.col("c").cast("int").alias("n_cols"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        rnd(chi2).alias("chi2"),
        rnd(v).alias("cramers_v"),
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    lo_pct: int = 5,
    hi_pct: int = 95,
    ndigits: int = 6,
) -> DataFrame:
    """Winsorized + trimmed means per group over an INTEGER value column
    (quantize money to cents upstream): the robust-mean pair reported
    next to the raw mean, with the nearest-rank percentile bounds used.

    Exactness: bounds are order statistics at rank ⌈p·n/100⌉ (exact
    integers via one rank window); clamped/trimmed sums are integer sums;
    only the final mean divisions are double. One window + one agg.

    Output per group: (*group_cols, n, lo_bound, hi_bound, winsorized_mean,
    trimmed_mean, raw_mean, n_trimmed)."""
    gp = list(group_cols)
    w = Window.partitionBy(*gp).orderBy(F.col(value_col), F.lit(1))
    cnt = Window.partitionBy(*gp)
    ranked = df.select(
        *gp,
        F.col(value_col).alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    # nearest-rank bounds: k = ⌈p·n/100⌉ via exact integer arithmetic
    ranked = ranked.withColumn(
        "k_lo", F.floor((F.col("n") * lo_pct + 99) / 100).cast("long")
    ).withColumn("k_hi", F.floor((F.col("n") * hi_pct + 99) / 100).cast("long"))
    bounds = ranked.groupBy(*gp).agg(
        F.max(F.when(F.col("rn") == F.col("k_lo"), F.col("v"))).alias("lo"),
        F.max(F.when(F.col("rn") == F.col("k_hi"), F.col("v"))).alias("hi"),
    )
    j = ranked.join(F.broadcast(bounds), gp) if gp else ranked.crossJoin(
        F.broadcast(bounds)
    )
    clamped = F.greatest(F.least(F.col("v"), F.col("hi")), F.col("lo"))
    in_core = (F.col("rn") > F.col("k_lo")) & (F.col("rn") <= F.col("k_hi"))
    acc = j.groupBy(*gp).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first("lo").alias("lo_bound"),
        F.first("hi").alias("hi_bound"),
        F.sum(clamped).alias("s_win"),
        F.sum(F.when(in_core, F.col("v"))).alias("s_trim"),
        F.sum(F.when(in_core, 1).otherwise(0)).cast("long").alias("n_core"),
        F.sum("v").alias("s_raw"),
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    win_mean = F.col("s_win").cast("double") / F.col("n")
    # degenerate groups (n so small that ⌈lo·n⌉ == ⌈hi·n⌉, e.g. n = 1)
    # have an EMPTY trim core — fall back to the winsorized mean rather
    # than emitting NULL (caught by the hypothesis bounds property)
    trim_mean = F.when(
        F.col("n_core") > 0, F.col("s_trim").cast("double") / F.col("n_core")
    ).otherwise(win_mean)
    return acc.select(
        *gp,
        "n",
        "lo_bound",
        "hi_bound",
        rnd(win_mean).alias("winsorized_mean"),
        rnd(trim_mean).alias("trimmed_mean"),
        rnd(F.col("s_raw").cast("double") / F.col("n")).alias("raw_mean"),
        (F.col("n") - F.col("n_core")).cast("long").alias("n_trimmed"),
    )


def fleiss_kappa(
    ratings: DataFrame,
    item_col: str = "item",
    category_col: str = "category",
    ndigits: int = 6,
) -> DataFrame:
    """Fleiss' kappa — chance-corrected agreement for m raters per item
    (cohen_kappa's multi-rater generalization; m is read from the data
    and items with a different rater count are dropped and counted).

    Exactness: P̄ and P̄_e are ratios of EXACT integers —
    Σ_i Σ_j n_ij² (one |item × category| agg) and Σ_j (Σ_i n_ij)²
    (one |categories| agg) — combined in fixed expression order:
    P̄ = (S2 − N·m)/(N·m·(m−1)), P̄_e = C2/(N·m)², κ = (P̄−P̄_e)/(1−P̄_e).
    No per-cell floats anywhere.

    Output (1 row): (n_items, m_raters, n_dropped, pbar, pe, kappa)."""
    per_cell = ratings.groupBy(
        F.col(item_col).alias("_i"), F.col(category_col).alias("_j")
    ).agg(F.count(F.lit(1)).alias("_n"))
    per_item = per_cell.groupBy("_i").agg(
        F.sum("_n").alias("_m"), F.sum(F.col("_n") * F.col("_n")).alias("_s2")
    )
    m_mode = (
        per_item.groupBy("_m")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("_m"))
        .limit(1)
        .select(F.col("_m").alias("_mm"))
    )
    kept = per_item.join(F.broadcast(m_mode), per_item["_m"] == F.col("_mm"))
    tot = kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.first("_mm").alias("m"),
        F.sum("_s2").cast("long").alias("s2"),
    )
    dropped = per_item.crossJoin(F.broadcast(m_mode)).filter(
        F.col("_m") != F.col("_mm")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_dropped"))
    col_tot = (
        per_cell.join(F.broadcast(kept.select("_i")), "_i", "left_semi")
        .groupBy("_j")
        .agg(F.sum("_n").alias("_cj"))
    )
    c2 = col_tot.agg(
        F.sum(F.col("_cj") * F.col("_cj")).cast("long").alias("c2")
    )
    acc = tot.crossJoin(F.broadcast(c2)).crossJoin(F.broadcast(dropped))
    nn = F.col("n_items").cast("double")
    mm = F.col("m").cast("double")
    # m <= 1 (single rater) or n = 0 degenerates the P̄ denominator
    # N·m·(m−1) to 0 (x/0 -> Inf/NaN) — agreement is undefined with one
    # rater, so emit 0.0 for all three statistics rather than NaN
    degen = (nn == 0.0) | (mm <= 1.0)
    pbar = F.when(degen, F.lit(0.0)).otherwise(
        (F.col("s2").cast("double") - nn * mm) / (nn * mm * (mm - 1.0))
    )
    pe = F.when(degen, F.lit(0.0)).otherwise(
        F.col("c2").cast("double") / ((nn * mm) * (nn * mm))
    )
    kappa = F.when(degen, F.lit(0.0)).otherwise(
        F.when(pe == 1.0, F.lit(1.0)).otherwise((pbar - pe) / (1.0 - pe))
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        "n_items",
        F.col("m").cast("int").alias("m_raters"),
        "n_dropped",
        rnd(pbar).alias("pbar"),
        rnd(pe).alias("pe"),
        rnd(kappa).alias("kappa"),
    )


def wilcoxon_signed_rank(
    pairs: DataFrame,
    diff_col: str = "diff",
    ndigits: int = 6,
) -> DataFrame:
    """Wilcoxon signed-rank test over an INTEGER difference column
    (quantize money to cents upstream): zero diffs drop (Wilcoxon
    convention), |d| gets tie-averaged ranks as exact 2·r̄ integers via
    the shared distributed prefix (_prefix_rank2 — no row-level rank
    window), W± = signed rank sums, and the normal approximation
    z = (W⁺ − n(n+1)/4)/σ with the tie-corrected
    σ² = n(n+1)(2n+1)/24 − Σ(t³−t)/48 from exact integer tie counts.

    Output (1 row): (n, n_zero, w_plus, w_minus, z)."""
    d = pairs.select(F.col(diff_col).alias("_d")).filter(F.col("_d") != 0)
    cells = d.groupBy(
        F.abs(F.col("_d")).alias("_v"), (F.col("_d") > 0).alias("_pos")
    ).agg(F.count(F.lit(1)).alias("_c"))
    vals = cells.groupBy("_v").agg(F.sum("_c").alias("_cv"))
    r2v = _prefix_rank2(vals, (), "_v")
    acc = cells.join(r2v, "_v").agg(
        F.sum("_c").cast("long").alias("n"),
        F.sum(F.when(F.col("_pos"), F.col("_c") * F.col("_r2"))).alias("_wp2"),
        F.sum(F.when(~F.col("_pos"), F.col("_c") * F.col("_r2"))).alias("_wm2"),
    )
    ties = vals.agg(
        F.sum(F.col("_cv") * F.col("_cv") * F.col("_cv") - F.col("_cv"))
        .cast("long")
        .alias("tie3")
    )
    n_zero = pairs.select(F.col(diff_col).alias("_d")).filter(
        F.col("_d") == 0
    ).agg(F.count(F.lit(1)).cast("long").alias("n_zero"))
    j = acc.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(n_zero))
    nn = F.col("n").cast("double")
    wp = F.coalesce(F.col("_wp2").cast("double"), F.lit(0.0)) / 2.0
    wm = F.coalesce(F.col("_wm2").cast("double"), F.lit(0.0)) / 2.0
    var = nn * (nn + 1.0) * (2.0 * nn + 1.0) / 24.0 - F.col("tie3").cast(
        "double"
    ) / 48.0
    z = F.when(var <= 0.0, F.lit(0.0)).otherwise(
        (wp - nn * (nn + 1.0) / 4.0) / F.sqrt(var)
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return j.select(
        "n", "n_zero", rnd(wp).alias("w_plus"), rnd(wm).alias("w_minus"),
        rnd(z).alias("z"),
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Friedman test — k related treatments ranked WITHIN each block
    (the repeated-measures cousin of kruskal_wallis; blocks are days,
    treatments compared per day). Within-block rank windows run over k
    rows each (k = |treatments|, bounded); per-treatment deviation
    numerators D_j = Σ2r̄_j − n(k+1) are exact integers, the positive
    χ² terms are max-normalized floor-e12-quantized before the k-row sum
    (order-independent at any scale — see kruskal_wallis), and the tie
    correction 1 − Σ(t³−t)/(n·k·(k²−1)) uses exact per-block tie counts.

    Output per treatment: (treatment, n_blocks, mean_rank) + shared
    (k, chi2, chi2_corrected, dof)."""
    one = df.groupBy(
        F.col(block_col).alias("_b"), F.col(treatment_col).alias("_t")
    ).agg(F.sum(value_col).alias("_v"))
    wr = Window.partitionBy("_b").orderBy("_v")  # k rows per block
    wt = Window.partitionBy("_b", "_v")
    ranked = one.select(
        "_b",
        "_t",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).alias("_r2"),
    )
    per_t = ranked.groupBy("_t").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("_r2").alias("_s2"),
    )
    kk = per_t.agg(F.count(F.lit(1)).cast("long").alias("k"),
                   F.max("n_blocks").cast("long").alias("n"))
    ties = (
        one.groupBy("_b", "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_t3"))
        .agg(
            F.sum(F.col("_t3") * F.col("_t3") * F.col("_t3") - F.col("_t3"))
            .cast("long")
            .alias("tie3")
        )
    )
    g = per_t.crossJoin(F.broadcast(kk)).withColumn(
        "_d", F.col("_s2") - F.col("n") * (F.col("k") + 1)
    )
    g = g.withColumn(
        "_term",
        F.col("_d").cast("double") * F.col("_d").cast("double") / 4.0,
    )
    tmax = g.agg(F.max("_term").alias("_tmax"))
    q = F.floor(F.col("_term") / F.col("_tmax") * 1e12).cast("long")
    acc = (
        g.crossJoin(F.broadcast(tmax))
        .agg(
            F.sum(F.when(F.col("_tmax") > 0.0, q).otherwise(F.lit(0))).alias(
                "q_e12"
            ),
            F.first("_tmax").alias("_tmax"),
            F.first("k").alias("k"),
            F.first("n").alias("n"),
        )
        .crossJoin(F.broadcast(ties))
    )
    nn, kx = F.col("n").cast("double"), F.col("k").cast("double")
    chi2 = 12.0 * (F.col("q_e12").cast("double") / 1e12 * F.col("_tmax")) / (
        nn * kx * (kx + 1.0)
    )
    corr = 1.0 - F.col("tie3").cast("double") / (
        nn * kx * (kx * kx - 1.0)
    )
    chi2_c = F.when(corr == 0.0, F.lit(0.0)).otherwise(chi2 / corr)
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    summary = acc.select(
        F.col("k").cast("int").alias("k"),
        rnd(chi2).alias("chi2"),
        rnd(chi2_c).alias("chi2_corrected"),
        (F.col("k") - 1).cast("int").alias("dof"),
    )
    detail = per_t.select(
        F.col("_t").alias("treatment"),
        "n_blocks",
        (
            F.round(F.col("_s2").cast("double") / (2.0 * F.col("n_blocks")), ndigits)
            + F.lit(0.0)
        ).alias("mean_rank"),
    )
    return detail.crossJoin(F.broadcast(summary))


def ordinal_gamma(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Goodman–Kruskal gamma — ordinal association from concordant vs
    discordant pairs: γ = (C − D)/(C + D). Computed ENTIRELY on the
    |X-levels × Y-levels| cell relation (one data-sized count agg, then a
    cells×cells self-join bounded by the ordinal cardinalities squared —
    pass BUCKETED ordinals, never raw continuous values). C and D are
    exact int64 pair counts (n_a·n_b sums halved once at the edge).

    Output (1 row): (n, n_cells, concordant, discordant, gamma)."""
    cells = df.groupBy(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count(F.lit(1)).alias("_n"))
    a = cells.select(
        F.col("_x").alias("_xa"), F.col("_y").alias("_ya"), F.col("_n").alias("_na")
    )
    b = cells.select(
        F.col("_x").alias("_xb"), F.col("_y").alias("_yb"), F.col("_n").alias("_nb")
    )
    pairs = a.join(
        b,
        (F.col("_xa") < F.col("_xb"))
        & (F.col("_ya") != F.col("_yb")),
        "inner",
    )
    acc = pairs.agg(
        F.sum(
            F.when(F.col("_ya") < F.col("_yb"), F.col("_na") * F.col("_nb"))
        ).cast("long").alias("concordant"),
        F.sum(
            F.when(F.col("_ya") > F.col("_yb"), F.col("_na") * F.col("_nb"))
        ).cast("long").alias("discordant"),
    )
    tot = cells.agg(
        F.sum("_n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    j = acc.crossJoin(F.broadcast(tot))
    c = F.coalesce(F.col("concordant"), F.lit(0)).cast("double")
    d = F.coalesce(F.col("discordant"), F.lit(0)).cast("double")
    gamma = F.when((c + d) == 0.0, F.lit(0.0)).otherwise((c - d) / (c + d))
    return j.select(
        "n",
        "n_cells",
        F.coalesce(F.col("concordant"), F.lit(0)).alias("concordant"),
        F.coalesce(F.col("discordant"), F.lit(0)).alias("discordant"),
        (F.round(gamma, ndigits) + F.lit(0.0)).alias("gamma"),
    )


def kendall_tau_b(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Kendall's τ-b — ordinal association with TIE correction:
    τ-b = (C − D)/√((n₀ − n₁)(n₀ − n₂)) with n₀ = n(n−1)/2,
    n₁ = Σ_x t(t−1)/2 over x-tie groups, n₂ the y twin (the companion to
    ordinal_gamma, which ignores ties entirely — γ saturates at ±1 on
    sparse tables where τ-b stays honest).

    Exactness: C, D, n₀, n₁, n₂ are all exact int64 pair counts computed
    on the |X-levels × Y-levels| cell relation (one data-sized count agg,
    then a cells×cells join bounded by the ordinal cardinalities squared
    — pass BUCKETED ordinals). The only floats are the final
    √ and division over identical exact operands. int64 bound:
    pair counts ≤ n²/2 — safe through n ≈ 4×10⁹.

    Scale shape: raw data touched by ONE aggregation; everything after is
    |levels|²-bounded (ordinal_gamma's discipline).

    Output (1 row): (n, n_cells, concordant, discordant, n1_ties_x,
    n2_ties_y, tau_b)."""
    cells = df.groupBy(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count(F.lit(1)).alias("_n"))
    a = cells.select(
        F.col("_x").alias("_xa"), F.col("_y").alias("_ya"), F.col("_n").alias("_na")
    )
    b = cells.select(
        F.col("_x").alias("_xb"), F.col("_y").alias("_yb"), F.col("_n").alias("_nb")
    )
    pairs = a.join(
        b,
        (F.col("_xa") < F.col("_xb")) & (F.col("_ya") != F.col("_yb")),
        "inner",
    )
    cd = pairs.agg(
        F.sum(
            F.when(F.col("_ya") < F.col("_yb"), F.col("_na") * F.col("_nb"))
        ).cast("long").alias("concordant"),
        F.sum(
            F.when(F.col("_ya") > F.col("_yb"), F.col("_na") * F.col("_nb"))
        ).cast("long").alias("discordant"),
    )
    xt = (
        cells.groupBy("_x").agg(F.sum("_n").alias("_t"))
        .agg(F.sum(F.col("_t") * (F.col("_t") - 1)).cast("long").alias("t2x"))
    )
    yt = (
        cells.groupBy("_y").agg(F.sum("_n").alias("_t"))
        .agg(F.sum(F.col("_t") * (F.col("_t") - 1)).cast("long").alias("t2y"))
    )
    tot = cells.agg(
        F.sum("_n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    j = (
        cd.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(xt))
        .crossJoin(F.broadcast(yt))
    )
    # ×2 pair counts throughout (n(n−1), Σt(t−1)) so everything stays an
    # exact integer until the one final sqrt
    c = F.coalesce(F.col("concordant"), F.lit(0))
    d = F.coalesce(F.col("discordant"), F.lit(0))
    n0x2 = F.col("n") * (F.col("n") - 1)
    den = (
        (n0x2 - F.col("t2x")).cast("double")
        * (n0x2 - F.col("t2y")).cast("double")
    )
    tau = F.when(den <= 0.0, F.lit(0.0)).otherwise(
        2.0 * (c - d).cast("double") / F.sqrt(den)
    )
    return j.select(
        "n",
        "n_cells",
        c.alias("concordant"),
        d.alias("discordant"),
        F.expr("t2x div 2").alias("n1_ties_x"),
        F.expr("t2y div 2").alias("n2_ties_y"),
        (F.round(tau, ndigits) + F.lit(0.0)).alias("tau_b"),
    )


def permutation_test(
    df: DataFrame,
    id_col: str,
    treat_col: str,
    value_col: str,
    n_perm: int = 48,
    ndigits: int = 6,
) -> DataFrame:
    """Two-sample permutation test for a mean difference over an INTEGER
    value column (quantize money to cents upstream): the exact-inference
    companion to welch_ttest — no normality assumption, the null
    distribution is the data's own relabelings.

    Determinism (no RNG): permutation p reassigns treatment by ranking
    rows on the 48-bit md5 of (id, p) and giving the top-n₁ ranks
    treatment — group sizes are EXACTLY preserved per permutation and the
    assignment replays identically in any engine. Extremeness is decided
    on the common-denominator integer form |s₁ᵖ·n₀ − s₀ᵖ·n₁| ≥
    |s₁·n₀ − s₀·n₁| (DECIMAL(38,0) cross-products — no float enters the
    decision), so n_extreme is exact; p = (1 + n_extreme)/(1 + P) is the
    standard add-one permutation p-value.

    Scale shape (r11 rewrite, guide §2.3/§2.4): the P× explode
    repartitions to full cluster width FIRST — the md5 projection
    otherwise runs in the file-scan stage at the scan's partition count
    (measured: 29M hashes on 3 parquet-split tasks = 38 s at sf0.1;
    spread across 32 cores it is ~4 s). s1p = Σv over each permutation's
    top-n₁ rows by (hash, id) is then an exact ORDER-STATISTIC SUM,
    computed with the same two-level bucket-histogram discipline as
    ``exact_quantiles`` instead of a per-permutation global sort: one
    partial-agg pass counts/sums per (perm, 1024-wide hash bucket) —
    the exchange carries ≤ P×1024 rows per upstream partition, not the
    n×P hashed rows — a P×1024-row cumsum picks each permutation's
    threshold bucket, and only the rows of that ONE bucket per
    permutation (~n/1024 rows) are exactly ranked. The old plan's
    per-permutation sort was a P-way parallelism ceiling AND a
    hub-partition at scale (10⁸ rows sorted in one task per
    permutation); both are gone — no stage's per-task state exceeds
    max(P×1024 cumsum rows, n/1024 boundary rows). The hashed relation
    is evaluated exactly TWICE (histogram pass feeding the broadcast
    threshold relation, then the boundary resolve); per_p deliberately
    rebuilds its one-row-per-perm frame from range(P) instead of
    referencing `chosen` again, which would re-evaluate the whole
    histogram subtree a third time (measured +1.4 s at sf0.1). Two md5
    projections cost far less than shuffling and sorting n×P rows. The
    decision relation is P rows.

    Output (1 row): (n, n1, n_perm, n_extreme, mean_diff, p_value)."""
    n_buckets = 1024  # 48-bit md5 prefix → 2^38-wide buckets
    rows = df.select(
        F.col(id_col).alias("_rid"),
        F.col(treat_col).cast("int").alias("_t"),
        F.col(value_col).cast("long").alias("_v"),
    )
    obs = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_t").cast("long").alias("n1"),
        F.sum(F.col("_v") * F.col("_t")).cast("long").alias("s1"),
        F.sum("_v").cast("long").alias("s_tot"),
    )
    n_spread = rows.sparkSession.sparkContext.defaultParallelism
    perms = rows.repartition(n_spread).crossJoin(
        F.broadcast(
            rows.sparkSession.range(n_perm).select(F.col("id").alias("_p"))
        )
    ).select(
        "_p", "_rid", "_v",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("_rid"), F.col("_p"))), 1, 12
            ),
            16, 10,
        ).cast("long").alias("_h"),
    )
    # level 1: per-(perm, hash-bucket) counts and value sums. Bucketing by
    # _h div keeps (_h, _rid) order across buckets: every row of a lower
    # bucket ranks before every row of a higher one, and equal hashes
    # land in the same bucket, so the boundary resolve below is exact.
    bdiv = (1 << 48) // n_buckets
    hist = (
        perms.groupBy("_p", F.expr(f"_h div {bdiv}").alias("_hb"))
        .agg(F.count(F.lit(1)).alias("_c"), F.sum("_v").alias("_sv"))
    )
    wcum = Window.partitionBy("_p").orderBy("_hb")
    cum = hist.select(
        "_p", "_hb", "_c", "_sv",
        F.sum("_c").over(wcum.rowsBetween(Window.unboundedPreceding, 0)).alias("_cumc"),
        F.sum("_sv").over(wcum.rowsBetween(Window.unboundedPreceding, 0)).alias("_cumsv"),
    )
    # threshold bucket per perm: FIRST bucket whose cumulative count
    # reaches n1; everything strictly below it contributes whole
    wpick = Window.partitionBy("_p").orderBy("_hb")
    chosen = (
        cum.crossJoin(F.broadcast(obs.select("n1")))
        .where(F.col("_cumc") >= F.col("n1"))
        .withColumn("_rn", F.row_number().over(wpick))
        .where(F.col("_rn") == 1)
        .select(
            "_p",
            F.col("_hb").alias("_hb_t"),
            (F.col("_cumc") - F.col("_c")).alias("_below_c"),
            (F.col("_cumsv") - F.col("_sv")).alias("_below_sv"),
            (F.col("n1") - (F.col("_cumc") - F.col("_c"))).alias("_take"),
        )
    )
    # level 2: exact (hash, id) rank inside the ~n/n_buckets threshold
    # bucket rows only. perms is re-evaluated here, but both subtrees hang
    # off the SAME repartition exchange (ReusedExchange) — only the md5
    # projection runs twice.
    bnd = (
        perms.alias("pp")
        .join(
            F.broadcast(chosen.alias("ch")),
            (F.col("pp._p") == F.col("ch._p"))
            & (F.expr(f"pp._h div {bdiv}") == F.col("ch._hb_t")),
        )
        .select(
            F.col("pp._p").alias("_p"),
            "pp._v", "pp._h", "pp._rid", "ch._take", "ch._below_sv",
        )
    )
    wb = Window.partitionBy("_p").orderBy("_h", "_rid")
    bnd_sum = (
        bnd.withColumn("_rn", F.row_number().over(wb))
        .where(F.col("_rn") <= F.col("_take"))
        .groupBy("_p")
        .agg((F.first("_below_sv") + F.sum("_v")).cast("long").alias("s1p"))
    )
    # per_p rebuilds the one-row-per-perm relation from a FREE range(P)
    # rather than referencing `chosen` a second time — `chosen`'s subtree
    # contains a full pass over `perms` (scan + shuffle + md5 + histogram),
    # and a second reference re-evaluates it (3 passes total, measured).
    # n1 = 0 parity with the old sort plan: _take = 0 ⇒ no boundary rows
    # ⇒ the perm is absent from bnd_sum ⇒ left join gives s1p NULL (the
    # old sum over an always-false filter). _take ≥ 1 whenever n1 ≥ 1, so
    # no non-degenerate perm is ever absent.
    per_p = (
        rows.sparkSession.range(n_perm)
        .select(F.col("id").alias("_p"))
        .join(F.broadcast(bnd_sum), "_p", "left")
        .select("_p", "s1p")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    joined = per_p.crossJoin(F.broadcast(obs))
    n0 = F.col("n") - F.col("n1")
    s0p = F.col("s_tot") - F.col("s1p")
    s0 = F.col("s_tot") - F.col("s1")
    extreme = F.abs(
        dec(F.col("s1p")) * dec(n0) - dec(s0p) * dec(F.col("n1"))
    ) >= F.abs(dec(F.col("s1")) * dec(n0) - dec(s0) * dec(F.col("n1")))
    acc = joined.agg(
        F.sum(extreme.cast("long")).cast("long").alias("n_extreme"),
        F.first("n").alias("n"),
        F.first("n1").alias("n1"),
        F.first("s1").alias("s1"),
        F.first("s_tot").alias("s_tot"),
    )
    mean_diff = F.col("s1").cast("double") / F.col("n1") - (
        F.col("s_tot") - F.col("s1")
    ).cast("double") / (F.col("n") - F.col("n1"))
    return acc.select(
        "n",
        "n1",
        F.lit(n_perm).cast("int").alias("n_perm"),
        "n_extreme",
        (F.round(mean_diff, ndigits) + F.lit(0.0)).alias("mean_diff"),
        (
            F.round(
                (1 + F.col("n_extreme")).cast("double") / (1 + n_perm), ndigits
            )
            + F.lit(0.0)
        ).alias("p_value"),
    )


def mcnemar_test(
    preds: DataFrame,
    correct_a_col: str,
    correct_b_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """McNemar's test for comparing two classifiers on the SAME examples
    (the paired-binary eval the two-proportion z-test gets wrong): only
    the discordant cells carry information — b = A right, B wrong;
    c = A wrong, B right; χ² = (|b−c|−1)²/(b+c) with continuity
    correction.

    Exactness: the 2×2 cell counts are one exact aggregation; the
    statistic is a single division over exact integers. b+c = 0 (no
    disagreements) emits 0.0.

    Scale shape: ONE pass, 1-row output — no joins, no windows.

    Output (1 row): (n, both_right, both_wrong, a_only, b_only, chi2)."""
    a = F.col(correct_a_col).cast("boolean")
    b = F.col(correct_b_col).cast("boolean")
    acc = preds.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((a & b).cast("long")).cast("long").alias("both_right"),
        F.sum((~a & ~b).cast("long")).cast("long").alias("both_wrong"),
        F.sum((a & ~b).cast("long")).cast("long").alias("a_only"),
        F.sum((~a & b).cast("long")).cast("long").alias("b_only"),
    )
    bb, cc = F.col("a_only"), F.col("b_only")
    num = (F.abs(bb - cc) - 1) * (F.abs(bb - cc) - 1)
    chi = F.when(bb + cc == 0, F.lit(0.0)).otherwise(
        num.cast("double") / (bb + cc).cast("double")
    )
    return acc.select(
        "n", "both_right", "both_wrong", "a_only", "b_only",
        (F.round(chi, ndigits) + F.lit(0.0)).alias("chi2"),
    )


def cochran_q(
    marks: DataFrame,
    block_col: str,
    treatment_col: str,
    hit_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Cochran's Q — do k binary treatments (did the user view / click /
    purchase; did the doc pass filter 1/2/3) differ, judged WITHIN blocks
    (users/docs)? The k-treatment generalization of McNemar, the binary
    twin of friedman_test.

    Q = k(k−1)·Σ_j (C_j − T/k)² / (k·T − Σ_i R_i²) with C_j treatment
    totals, R_i block totals, T the grand total — ALL exact integers here:
    the numerator is computed as k(k−1)·Σ(k·C_j − T)²/k² re-arranged to
    keep integer arithmetic, i.e. Q = (k−1)·[k·ΣC_j² − T²] / (k·T − ΣR_i²).

    ``marks`` must contain one row per (block, treatment) with hit ∈
    {0, 1} — build the block×treatment cross grid upstream (an absent
    pair IS information; duplicate rows collapse via max(hit)).

    Scale shape: one (block, treatment) presence agg, one |blocks|-sized
    row-total agg, one |treatments|-sized column-total agg; output 1 row.
    int64 bound: k·ΣC_j² ≤ k·T² — DECIMAL(38,0) accumulation.

    Output (1 row): (n_blocks, k, grand_total, q)."""
    cells = marks.groupBy(
        F.col(block_col).alias("_b"), F.col(treatment_col).alias("_t")
    ).agg(F.max(F.col(hit_col).cast("int")).alias("_x"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rows = cells.groupBy("_b").agg(F.sum("_x").alias("_r"))
    r2 = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(dec(F.col("_r")) * F.col("_r")).alias("sr2"),
        F.sum(F.col("_r").cast("long")).cast("long").alias("t_grand"),
    )
    cols = cells.groupBy("_t").agg(F.sum("_x").alias("_c"))
    c2 = cols.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(dec(F.col("_c")) * F.col("_c")).alias("sc2"),
    )
    j = r2.crossJoin(F.broadcast(c2))
    kk = F.col("k")
    num = (kk - 1).cast("decimal(38,0)") * (
        kk.cast("decimal(38,0)") * F.col("sc2")
        - dec(F.col("t_grand")) * F.col("t_grand")
    )
    den = kk.cast("decimal(38,0)") * F.col("t_grand") - F.col("sr2")
    q = F.when(den.cast("double") == 0.0, F.lit(0.0)).otherwise(
        num.cast("double") / den.cast("double")
    )
    return j.select(
        "n_blocks",
        kk.cast("int").alias("k"),
        "t_grand",
        (F.round(q, ndigits) + F.lit(0.0)).alias("q"),
    )


def jarque_bera(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    ndigits: int = 6,
) -> DataFrame:
    """Jarque–Bera normality test per group: JB = n/6·(S² + (K−3)²/4)
    from the first four raw moments. The distribution-shape screen you
    run before trusting a z/t-based gate (ab_test, welch_ttest) on a
    metric — heavy tails or skew show up here first.

    Determinism discipline: ``value_col`` must be INTEGER (quantize at
    the caller — cents, counts); the four moment sums accumulate as
    DECIMAL(38,0) (exact, order-independent; x⁴ sums overflow int64 for
    |x| ≳ 10⁴ at any real n, the overflow class ADVICE r8 flagged in
    cramers_v). Central moments combine the exact sums in fixed operand
    order, so the doubles are engine-identical.

    Scale shape: ONE partial-agg pass over the data (5 sums + count per
    group); everything after is |groups|-sized.

    Output per group: (*group_cols, n, mean, skewness, kurtosis, jb)."""
    gp = list(group_cols)
    x = F.col(value_col)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    acc = df.filter(x.isNotNull()).groupBy(*gp).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(x)).alias("s1"),
        F.sum(dec(x) * x).alias("s2"),
        F.sum(dec(x) * x * x).alias("s3"),
        F.sum(dec(x) * x * x * x).alias("s4"),
    )
    n = F.col("n").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    s3, s4 = F.col("s3").cast("double"), F.col("s4").cast("double")
    m = s1 / n
    m2 = s2 / n - m * m
    m3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m
    m4 = (
        s4 / n
        - 4.0 * m * (s3 / n)
        + 6.0 * m * m * (s2 / n)
        - 3.0 * m * m * m * m
    )
    skew = F.when(m2 <= 0.0, F.lit(0.0)).otherwise(m3 / F.sqrt(m2 * m2 * m2))
    kurt = F.when(m2 <= 0.0, F.lit(0.0)).otherwise(m4 / (m2 * m2))
    jb = F.when((F.col("n") < 2) | (m2 <= 0.0), F.lit(0.0)).otherwise(
        n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        *gp,
        F.col("n"),
        rnd(m).alias("mean"),
        rnd(skew).alias("skewness"),
        rnd(kurt).alias("kurtosis"),
        rnd(jb).alias("jb"),
    )


def brown_forsythe(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test (Levene with the robust
    MEDIAN center): one-way ANOVA F on z_ij = |x_ij − median_j|. The
    gate before pooled-variance tests — unequal spreads invalidate them.

    Determinism discipline: ``value_col`` must be INTEGER. The per-group
    median is carried as the exact integer 2·median = (lower + upper
    middle order statistic), found from the per-(group, value) HISTOGRAM
    with a cumulative window — never a per-row rank. Deviations
    z2 = |2x − 2med| are exact integers, so the ANOVA sums (Σz2, Σz2²)
    are exact DECIMAL(38,0); F is scale-invariant in z so the factor 2
    cancels. Doubles combine the exact sums in fixed operand order.

    Scale shape: one histogram aggregation over the data, one
    |distinct values|-per-group cumulative window, one moment-sum pass
    over the histogram (counts-weighted — raw rows are touched once).

    Output (1 row): (k, n, f_stat, df1, df2)."""
    x = F.col(value_col)
    hist = (
        df.filter(x.isNotNull())
        .groupBy(F.col(group_col).alias("_g"), x.alias("_v"))
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    w = Window.partitionBy("_g").orderBy("_v")
    cum = hist.withColumn("_hi", F.sum("_c").over(w)).withColumn(
        "_lo", F.col("_hi") - F.col("_c")
    )
    ng = hist.groupBy("_g").agg(F.sum("_c").alias("_ng"))
    # lower middle = order stat floor((n+1)/2), upper = floor(n/2)+1
    # (1-indexed); value v covers order stats (_lo, _hi]
    med = (
        cum.join(ng, "_g")
        .withColumn("_lom", F.floor((F.col("_ng") + 1) / 2))
        .withColumn("_upm", F.floor(F.col("_ng") / 2) + 1)
        .groupBy("_g")
        .agg(
            (
                F.sum(
                    F.when(
                        (F.col("_lo") < F.col("_lom"))
                        & (F.col("_lom") <= F.col("_hi")),
                        F.col("_v"),
                    ).otherwise(F.lit(0))
                )
                + F.sum(
                    F.when(
                        (F.col("_lo") < F.col("_upm"))
                        & (F.col("_upm") <= F.col("_hi")),
                        F.col("_v"),
                    ).otherwise(F.lit(0))
                )
            ).alias("_m2")
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    z2 = (F.abs(F.lit(2) * F.col("_v") - F.col("_m2"))).alias("_z2")
    per_g = (
        hist.join(F.broadcast(med), "_g")
        .select("_g", "_c", z2)
        .groupBy("_g")
        .agg(
            F.sum("_c").cast("long").alias("n_g"),
            F.sum(dec(F.col("_c")) * F.col("_z2")).alias("sz"),
            F.sum(dec(F.col("_c")) * F.col("_z2") * F.col("_z2")).alias("szz"),
        )
    )
    # between-group pieces t_g = sz_g²/n_g are per-group DOUBLES summed over
    # an unordered |k|-row relation — max-normalized floor-e12 quantization
    # (the kruskal discipline) keeps the sum order-independent cross-engine
    parts = per_g.withColumn(
        "_t",
        F.col("sz").cast("double") * F.col("sz").cast("double")
        / F.col("n_g").cast("double"),
    )
    pmax = parts.agg(F.max("_t").alias("_tm"))
    tot = (
        parts.crossJoin(F.broadcast(pmax))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("n_g").cast("long").alias("n"),
            F.sum("sz").alias("sz_all"),
            F.sum("szz").alias("szz_all"),
            F.sum(
                F.when(
                    F.col("_tm") > 0.0,
                    F.floor(F.col("_t") / F.col("_tm") * 1e12).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("_q"),
            F.first("_tm").alias("_tm"),
        )
        .withColumn(
            "sb_parts", F.col("_q").cast("double") / 1e12 * F.col("_tm")
        )
    )
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    ssb = F.col("sb_parts") - F.col("sz_all").cast("double") * F.col(
        "sz_all"
    ).cast("double") / n
    ssw = F.col("szz_all").cast("double") - F.col("sb_parts")
    fstat = F.when(
        (F.col("k") < 2) | (F.col("n") <= F.col("k")) | (ssw <= 0.0),
        F.lit(0.0),
    ).otherwise((ssb / (k - 1.0)) / (ssw / (n - k)))
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return tot.select(
        F.col("k").cast("int").alias("k"),
        F.col("n"),
        rnd(fstat).alias("f_stat"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n") - F.col("k")).cast("long").alias("df2"),
    )


def partial_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """First-order partial correlation r_xy·z — the x↔y association with
    the confounder z regressed out of both:
    r_xy·z = (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²)). The one-number
    answer to "is the corr_matrix entry just the confounder again?".

    Determinism discipline: all three columns must be INTEGER (quantize
    at the caller); the 9 regression sums accumulate as DECIMAL(38,0)
    (exact, order-independent), the three Pearson r's and the final
    formula combine them in fixed operand order.

    Scale shape: ONE partial-agg pass (count + 9 sums), then scalar math.

    Output (1 row): (n, r_xy, r_xz, r_yz, r_xy_z)."""
    cx, cy, cz = F.col(x_col), F.col(y_col), F.col(z_col)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    acc = df.filter(
        cx.isNotNull() & cy.isNotNull() & cz.isNotNull()
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(cx)).alias("sx"),
        F.sum(dec(cy)).alias("sy"),
        F.sum(dec(cz)).alias("sz"),
        F.sum(dec(cx) * cx).alias("sxx"),
        F.sum(dec(cy) * cy).alias("syy"),
        F.sum(dec(cz) * cz).alias("szz"),
        F.sum(dec(cx) * cy).alias("sxy"),
        F.sum(dec(cx) * cz).alias("sxz"),
        F.sum(dec(cy) * cz).alias("syz"),
    )
    n = F.col("n").cast("double")

    def _r(sab, sa, sb, saa, sbb):
        dn = n * F.col(sab).cast("double") - F.col(sa).cast("double") * F.col(
            sb
        ).cast("double")
        da = n * F.col(saa).cast("double") - F.col(sa).cast("double") * F.col(
            sa
        ).cast("double")
        db = n * F.col(sbb).cast("double") - F.col(sb).cast("double") * F.col(
            sb
        ).cast("double")
        return F.when((da <= 0.0) | (db <= 0.0), F.lit(0.0)).otherwise(
            dn / F.sqrt(da * db)
        )

    rxy = _r("sxy", "sx", "sy", "sxx", "syy")
    rxz = _r("sxz", "sx", "sz", "sxx", "szz")
    ryz = _r("syz", "sy", "sz", "syy", "szz")
    den = (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
    pc = F.when(den <= 0.0, F.lit(0.0)).otherwise(
        (rxy - rxz * ryz) / F.sqrt(den)
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("n"),
        rnd(rxy).alias("r_xy"),
        rnd(rxz).alias("r_xz"),
        rnd(ryz).alias("r_yz"),
        rnd(pc).alias("r_xy_z"),
    )


def nelson_aalen(
    df: DataFrame,
    group_cols: Sequence[str],
    duration_col: str,
    event_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator per group — Kaplan–Meier's
    additive twin: H(t) = Σ_{u ≤ t} d_u / n_u with the same
    right-censoring-aware at-risk denominator. Prefer it when hazards are
    the modeling target (−ln S vs H is the standard KM-vs-NA diagnostic).

    Relational form mirrors ``kaplan_meier`` exactly: one (group, time)
    partial agg collapses subjects to per-time (events, leavers), at-risk
    = group total minus a running sum over the |distinct durations|-sized
    relation, and the cumulative hazard is a running sum of d/n doubles
    over the SAME ordered window (sequential frame order — the engine
    evaluates running frames in sort order, the precedent kaplan_meier's
    exp(Σ ln) already relies on). Variance is the standard Σ d/n².

    Output: (*group_cols, t, n_risk, d, cumhaz, var) for event times.
    """
    groups = list(group_cols)
    base = df.select(
        *groups,
        F.col(duration_col).cast("long").alias("_t"),
        F.col(event_col).cast("int").alias("_e"),
    )
    per_t = base.groupBy(*groups, "_t").agg(
        F.sum("_e").alias("_d"),
        F.count(F.lit(1)).alias("_leave"),
    )
    w_ord = Window.partitionBy(*groups).orderBy("_t")
    w_all = Window.partitionBy(*groups)
    cum = per_t.select(
        *groups,
        "_t",
        "_d",
        (
            F.sum("_leave").over(w_all)
            - F.coalesce(
                F.sum("_leave").over(
                    Window.partitionBy(*groups)
                    .orderBy("_t")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("_n"),
    )
    nd = F.col("_n").cast("double")
    haz = cum.withColumn(
        "_h", F.col("_d").cast("double") / nd
    ).withColumn("_hv", F.col("_d").cast("double") / (nd * nd))
    out = haz.withColumn("_H", F.sum("_h").over(w_ord)).withColumn(
        "_V", F.sum("_hv").over(w_ord)
    )
    return out.where(F.col("_d") > 0).select(
        *groups,
        F.col("_t").alias("t"),
        F.col("_n").cast("long").alias("n_risk"),
        F.col("_d").cast("long").alias("d"),
        (F.round(F.col("_H"), ndigits) + F.lit(0.0)).alias("cumhaz"),
        (F.round(F.col("_V"), ndigits) + F.lit(0.0)).alias("var"),
    )


def grubbs_stat(
    df: DataFrame,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Grubbs outlier statistic G = max|x − x̄| / s with the offending
    value — the single-most-extreme-point screen (mad_outliers' classical
    z-based sibling; compare G against the t-based critical value for
    your n offline).

    Determinism discipline: ``value_col`` must be INTEGER; the argmax is
    decided on the exact integer |n·x − S| (ties broken by smaller
    value), never on a float; mean/sd/G combine exact DECIMAL(38,0) sums
    in fixed operand order.

    Scale shape: ONE moment pass + one greatest-deviation aggregation
    (both map-side partial); 1-row output.

    Output (1 row): (n, mean, sd, outlier_value, g_stat)."""
    x = F.col(value_col)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    acc = df.filter(x.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(x)).alias("s"),
        F.sum(dec(x) * x).alias("q"),
    )
    # exact-integer deviation key: |n·x − S|, tie-break smaller value
    dev = df.filter(x.isNotNull()).crossJoin(F.broadcast(acc)).select(
        x.cast("long").alias("_v"),
        F.abs(
            F.col("n").cast("decimal(38,0)") * x - F.col("s")
        ).alias("_d"),
    )
    worst = dev.agg(
        F.max(F.struct(F.col("_d"), (-F.col("_v")).alias("_nv"))).alias("_w")
    ).select(
        (-F.col("_w._nv")).cast("long").alias("outlier_value")
    )
    n = F.col("n").cast("double")
    mean = F.col("s").cast("double") / n
    var = F.when(F.col("n") < 2, F.lit(0.0)).otherwise(
        (n * F.col("q").cast("double") - F.col("s").cast("double")
         * F.col("s").cast("double")) / (n * (n - 1.0))
    )
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    out = acc.crossJoin(F.broadcast(worst))
    g = F.when(sd <= 0.0, F.lit(0.0)).otherwise(
        F.abs(F.col("outlier_value").cast("double") - mean) / sd
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return out.select(
        F.col("n"),
        rnd(mean).alias("mean"),
        rnd(sd).alias("sd"),
        "outlier_value",
        rnd(g).alias("g_stat"),
    )


def mann_kendall(
    df: DataFrame,
    order_col: str,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Mann–Kendall monotone-trend test on one ordered series — the
    hydrology/climatology standard (pair it with theilsen_trend's Sen
    slope for the magnitude): S = Σ_{i<j} sgn(x_j − x_i), tie-corrected
    variance, continuity-corrected z.

    Determinism discipline: S is an exact integer from the pair
    comparison; Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18 combines
    exact integers (tie histogram); z divides exact values in fixed
    operand order.

    Scale shape: input is the caller's |days|-bounded ordered rollup by
    contract (runs_test shape), so the pair self-join is |days|²-bounded
    — document the bound at the call site; beyond ~10⁵ points switch to
    a merge-sort inversion count.

    Output (1 row): (n, s, var_s, z)."""
    w = Window.orderBy(order_col)
    base = df.select(
        F.col(order_col), F.col(value_col).cast("long").alias("_x")
    ).withColumn("_rn", F.row_number().over(w)).drop(order_col)
    a = base.select(F.col("_rn").alias("_ra"), F.col("_x").alias("_xa"))
    b = base.select(F.col("_rn").alias("_rb"), F.col("_x").alias("_xb"))
    s_acc = (
        a.join(b, a._ra < b._rb)
        .agg(
            F.sum(
                F.when(F.col("_xb") > F.col("_xa"), F.lit(1))
                .when(F.col("_xb") < F.col("_xa"), F.lit(-1))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("s")
        )
    )
    n_acc = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        base.groupBy("_x")
        .agg(F.count(F.lit(1)).cast("long").alias("_t"))
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            )
            .cast("long")
            .alias("tie3")
        )
    )
    j = s_acc.crossJoin(F.broadcast(n_acc)).crossJoin(F.broadcast(ties))
    n = F.col("n")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.coalesce(F.col("tie3"), F.lit(0))
    ).cast("double") / 18.0
    s = F.coalesce(F.col("s"), F.lit(0))
    z = F.when(var_s <= 0.0, F.lit(0.0)).otherwise(
        F.when(s > 0, (s - 1).cast("double") / F.sqrt(var_s))
        .when(s < 0, (s + 1).cast("double") / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return j.select(
        n.alias("n"),
        s.alias("s"),
        rnd(var_s).alias("var_s"),
        rnd(z).alias("z"),
    )


def cramer_von_mises(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Two-sample Cramér–von Mises statistic — the EDF-distance test that
    weights the WHOLE distribution (ks_test reacts to the single worst
    gap; CvM integrates every gap, so it sees broad shape drift KS
    under-weights): T = Σ_z (a_z + b_z)·(A_z·m − B_z·n)² / (n·m·(n+m)²)
    over the distinct combined values z, with A/B the cumulative counts.
    Ties are handled naturally by the count form.

    Determinism discipline: every term numerator is an exact integer
    ((A·m − B·n)² needs DECIMAL — it reaches (nm)² ≈ 10²³ at 10⁶-row
    samples); ONE cumulative window over the |distinct values|-sized
    histogram; the final division is a fixed-order closed form.

    The two groups are the two distinct values of ``group_col`` (sorted:
    first = X, second = Y).

    Output (1 row): (n, m, t_stat)."""
    cells = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(value_col).alias("_v"), F.col(group_col).alias("_g")
        )
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    groups = [
        r["_g"]
        for r in cells.select("_g").distinct().orderBy("_g").collect()
    ]
    if len(groups) != 2:
        raise ValueError(
            f"cramer_von_mises needs exactly 2 groups, got {groups}"
        )
    gx, gy = groups
    per_v = cells.groupBy("_v").agg(
        F.sum(F.when(F.col("_g") == gx, F.col("_c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("_a"),
        F.sum(F.when(F.col("_g") == gy, F.col("_c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("_b"),
    )
    # NOTE: cumulative columns must NOT be named "_A"/"_B" — Spark's
    # default case-insensitive resolution would make withColumn REPLACE
    # the per-value "_a"/"_b" weights instead of adding new columns
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.withColumn("_cuma", F.sum("_a").over(w)).withColumn(
        "_cumb", F.sum("_b").over(w)
    )
    tot = per_v.agg(
        F.sum("_a").cast("long").alias("n"), F.sum("_b").cast("long").alias("m")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    d = dec(F.col("_cuma")) * F.col("m") - dec(F.col("_cumb")) * F.col("n")
    acc = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(dec(F.col("_a") + F.col("_b")) * d * d).alias("_u"),
            F.first("n").alias("n"),
            F.first("m").alias("m"),
        )
    )
    n, m = F.col("n").cast("double"), F.col("m").cast("double")
    t = F.when((n <= 0.0) | (m <= 0.0), F.lit(0.0)).otherwise(
        F.col("_u").cast("double") / (n * m * ((n + m) * (n + m)))
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("n"), F.col("m"), rnd(t).alias("t_stat")
    )


def cliffs_delta(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Cliff's delta ordinal effect size between two groups:
    δ = (#(x > y) − #(x < y)) / (n·m) — the assumption-free "how often
    does one arm beat the other" number that survives heavy tails where
    Cohen's d lies (the effect-size companion to mann_whitney's test).

    Determinism discipline: the dominance counts come from the
    (value → per-group count) HISTOGRAM with one cumulative window —
    exact DECIMAL(38,0) integers (Σ a_v·B_{<v} reaches n·m) — never a
    row-level pair join; δ is one fixed-order division. Group identity:
    the two distinct ``group_col`` values sorted ascending (first = X).

    Magnitude label: |δ| < 0.147 negligible, < 0.33 small, < 0.474
    medium, else large (Romano et al. thresholds).

    Scale shape: one histogram agg over the data; everything after is
    |distinct values|-sized.

    Output (1 row): (n, m, n_gt, n_lt, n_eq, delta, magnitude)."""
    cells = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("_v"), F.col(group_col).alias("_g"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    groups = [
        r["_g"] for r in cells.select("_g").distinct().orderBy("_g").collect()
    ]
    if len(groups) != 2:
        raise ValueError(f"cliffs_delta needs exactly 2 groups, got {groups}")
    gx, gy = groups
    per_v = cells.groupBy("_v").agg(
        F.sum(F.when(F.col("_g") == gx, F.col("_c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("_a"),
        F.sum(F.when(F.col("_g") == gy, F.col("_c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("_b"),
    )
    wlt = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cum = per_v.withColumn(
        "_bless", F.coalesce(F.sum("_b").over(wlt), F.lit(0))
    )
    tot = per_v.agg(
        F.sum("_a").cast("long").alias("n"),
        F.sum("_b").cast("long").alias("m"),
    )
    acc = cum.crossJoin(F.broadcast(tot)).agg(
        F.sum(dec(F.col("_a")) * F.col("_bless")).alias("_gt"),
        F.sum(
            dec(F.col("_a")) * (F.col("m") - F.col("_bless") - F.col("_b"))
        ).alias("_lt"),
        F.sum(dec(F.col("_a")) * F.col("_b")).alias("_eq"),
        F.first("n").alias("n"),
        F.first("m").alias("m"),
    )
    nm = F.col("n").cast("double") * F.col("m").cast("double")
    delta = F.when(nm <= 0.0, F.lit(0.0)).otherwise(
        (F.col("_gt").cast("double") - F.col("_lt").cast("double")) / nm
    )
    mag = (
        F.when(F.abs(delta) < 0.147, F.lit("negligible"))
        .when(F.abs(delta) < 0.33, F.lit("small"))
        .when(F.abs(delta) < 0.474, F.lit("medium"))
        .otherwise(F.lit("large"))
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("n"),
        F.col("m"),
        F.col("_gt").cast("long").alias("n_gt"),
        F.col("_lt").cast("long").alias("n_lt"),
        F.col("_eq").cast("long").alias("n_eq"),
        rnd(delta).alias("delta"),
        mag.alias("magnitude"),
    )


_Z975 = 1.959963984540054


def odds_ratio(
    df: DataFrame,
    exposure_col: str,
    outcome_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """2×2 association summary: odds ratio with the Wald 95% CI and the
    relative risk — the epidemiology/AB-analysis staple (chi_square says
    "associated", this says "how strongly, with a CI").

    Determinism discipline: one conditional-aggregate pass yields the
    exact integer 2×2 cells (a = exposed∧outcome, b = exposed∧¬outcome,
    c = unexposed∧outcome, d = unexposed∧¬outcome); OR/RR/CI combine
    them in fixed operand order with the z constant as a shared literal.
    Any zero cell → NULL estimates (the caller should Haldane-correct
    upstream if they want finite output).

    Output (1 row): (a, b, c, d, odds_ratio, or_ci_lo, or_ci_hi,
    relative_risk)."""
    e = F.col(exposure_col).cast("int") == 1
    y = F.col(outcome_col).cast("int") == 1
    g = df.agg(
        F.count(F.when(e & y, F.lit(1))).cast("long").alias("a"),
        F.count(F.when(e & ~y, F.lit(1))).cast("long").alias("b"),
        F.count(F.when(~e & y, F.lit(1))).cast("long").alias("c"),
        F.count(F.when(~e & ~y, F.lit(1))).cast("long").alias("d"),
    )
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    c, d = F.col("c").cast("double"), F.col("d").cast("double")
    any_zero = (
        (F.col("a") == 0) | (F.col("b") == 0)
        | (F.col("c") == 0) | (F.col("d") == 0)
    )
    orr = (a * d) / (b * c)
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    lo = F.exp(F.log(orr) - F.lit(_Z975) * se)
    hi = F.exp(F.log(orr) + F.lit(_Z975) * se)
    rr = (a / (a + b)) / (c / (c + d))
    nul = F.lit(None).cast("double")
    rnd = lambda cc: F.round(cc, ndigits) + F.lit(0.0)  # noqa: E731
    return g.select(
        "a",
        "b",
        "c",
        "d",
        F.when(any_zero, nul).otherwise(rnd(orr)).alias("odds_ratio"),
        F.when(any_zero, nul).otherwise(rnd(lo)).alias("or_ci_lo"),
        F.when(any_zero, nul).otherwise(rnd(hi)).alias("or_ci_hi"),
        F.when(any_zero, nul).otherwise(rnd(rr)).alias("relative_risk"),
    )


def km_median_survival(
    df: DataFrame,
    group_cols: Sequence[str],
    duration_col: str,
    event_col: str,
    km_digits: int = 6,
) -> DataFrame:
    """Median survival time per group from the Kaplan–Meier curve: the
    FIRST event time where S(t) ≤ 0.5 (NULL when the curve never
    crosses — more than half the cohort survives the observation
    window). The one-number summary clinicians and retention analysts
    actually quote from kaplan_meier's full curve.

    Composition: ``kaplan_meier``'s certified curve (same rounding), one
    conditional min per group, plus the curve-end diagnostics.

    Output per group: (*group_cols, median_t, final_surv, n_event_times).
    """
    groups = list(group_cols)
    km = kaplan_meier(df, groups, duration_col, event_col, ndigits=km_digits)
    return km.groupBy(*groups).agg(
        F.min(F.when(F.col("surv") <= 0.5, F.col("t"))).alias("median_t"),
        F.min_by(F.col("surv"), -F.col("t")).alias("final_surv"),
        F.count(F.lit(1)).cast("long").alias("n_event_times"),
    )


def anova_oneway(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """One-way fixed-effects ANOVA F across k groups — the classic
    means-comparison (kruskal_wallis' parametric twin; welch_ttest's
    k-group extension under the equal-variance assumption bartlett_test
    checks): F = (SSB/(k−1)) / (SSW/(N−k)), plus η² = SSB/SST.

    Determinism discipline: ``value_col`` must be INTEGER; per-group
    (n, Σx, Σx²) accumulate as DECIMAL(38,0); the |k|-row between-group
    terms s_g²/n_g quantize max-normalized floor-e12 before summing
    (the brown_forsythe discipline); closed forms in fixed operand
    order.

    Scale shape: ONE partial-agg pass over the data; |k|-row algebra.

    Output (1 row): (k, n, f_stat, df1, df2, eta_sq)."""
    x = F.col(value_col)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_g = (
        df.filter(x.isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum(dec(x)).alias("s"),
            F.sum(dec(x) * x).alias("q"),
        )
    )
    parts = per_g.withColumn(
        "_t",
        F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("n_g").cast("double"),
    )
    pmax = parts.agg(F.max("_t").alias("_tm"))
    tot = (
        parts.crossJoin(F.broadcast(pmax))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("n_g").cast("long").alias("n"),
            F.sum("s").alias("s_all"),
            F.sum("q").alias("q_all"),
            F.sum(
                F.when(
                    F.col("_tm") > 0.0,
                    F.floor(F.col("_t") / F.col("_tm") * 1e12).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("_q12"),
            F.first("_tm").alias("_tm"),
        )
        .withColumn(
            "sb_parts", F.col("_q12").cast("double") / 1e12 * F.col("_tm")
        )
    )
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    ssb = F.col("sb_parts") - F.col("s_all").cast("double") * F.col(
        "s_all"
    ).cast("double") / n
    ssw = F.col("q_all").cast("double") - F.col("sb_parts")
    sst = F.col("q_all").cast("double") - F.col("s_all").cast(
        "double"
    ) * F.col("s_all").cast("double") / n
    fstat = F.when(
        (F.col("k") < 2) | (F.col("n") <= F.col("k")) | (ssw <= 0.0),
        F.lit(0.0),
    ).otherwise((ssb / (k - 1.0)) / (ssw / (n - k)))
    eta = F.when(sst <= 0.0, F.lit(0.0)).otherwise(ssb / sst)
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return tot.select(
        F.col("k").cast("int").alias("k"),
        F.col("n"),
        rnd(fstat).alias("f_stat"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n") - F.col("k")).cast("long").alias("df2"),
        rnd(eta).alias("eta_sq"),
    )


def bartlett_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Bartlett's variance-homogeneity test — the normal-theory twin of
    brown_forsythe (more powerful under normality, fragile under heavy
    tails; run both): χ² = [(N−k)·ln s_p² − Σ(n_g−1)·ln s_g²] / C with
    the standard correction C.

    Determinism discipline: per-group variances come from exact
    DECIMAL(38,0) sums; the two |k|-row sums (ln-variance terms, which
    can be NEGATIVE, and the 1/(n_g−1) terms) quantize with ABS-max
    normalization floor-e12 (the hurst-OLS discipline for signed
    terms); fixed-order closed forms.

    Output (1 row): (k, n, chi2, df)."""
    x = F.col(value_col)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_g = (
        df.filter(x.isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum(dec(x)).alias("s"),
            F.sum(dec(x) * x).alias("q"),
        )
        .filter(F.col("n_g") >= 2)
    )
    ng = F.col("n_g").cast("double")
    var_g = (
        ng * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (ng * (ng - 1.0))
    # pooled within-group SS terms (n_g·q_g − s_g²)/n_g are POSITIVE
    # per-group doubles; quantize max-normalized like the ln terms
    ssw_t = (
        ng * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / ng
    terms = per_g.select(
        "n_g",
        ((ng - 1.0) * F.log(F.greatest(var_g, F.lit(1e-300)))).alias("_lt"),
        (1.0 / (ng - 1.0)).alias("_it"),
        ssw_t.alias("_wt"),
    )
    tmax = terms.agg(
        F.max(F.abs(F.col("_lt"))).alias("_lm"),
        F.max(F.col("_it")).alias("_im"),
        F.max(F.col("_wt")).alias("_wm"),
    )
    qz = lambda c, mx: F.when(  # noqa: E731
        F.col(mx) > 0.0, F.floor(c / F.col(mx) * 1e12).cast("long")
    ).otherwise(F.lit(0))
    acc = (
        terms.crossJoin(F.broadcast(tmax))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("n_g").cast("long").alias("n"),
            F.sum(qz(F.col("_lt"), "_lm")).alias("_ql"),
            F.sum(qz(F.col("_it"), "_im")).alias("_qi"),
            F.sum(qz(F.col("_wt"), "_wm")).alias("_qw"),
            F.first("_lm").alias("_lm"),
            F.first("_im").alias("_im"),
            F.first("_wm").alias("_wm"),
        )
        .withColumn(
            "ssw_parts", F.col("_qw").cast("double") / 1e12 * F.col("_wm")
        )
    )
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    sp2 = F.col("ssw_parts") / (n - k)
    sum_ln = F.col("_ql").cast("double") / 1e12 * F.col("_lm")
    sum_inv = F.col("_qi").cast("double") / 1e12 * F.col("_im")
    num = (n - k) * F.log(F.greatest(sp2, F.lit(1e-300))) - sum_ln
    corr = 1.0 + (sum_inv - 1.0 / (n - k)) / (3.0 * (k - 1.0))
    chi2 = F.when(
        (F.col("k") < 2) | (sp2 <= 0.0), F.lit(0.0)
    ).otherwise(num / corr)
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("k").cast("int").alias("k"),
        F.col("n"),
        rnd(chi2).alias("chi2"),
        (F.col("k") - 1).cast("long").alias("df"),
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    taus: Sequence[float],
    bucket_div: int = 1_000_000,
) -> DataFrame:
    """Exact discrete quantiles of a NON-NEGATIVE INTEGER column without a
    global sort: for each τ, the smallest x with count(≤x) ≥ ⌈n·τ⌉ (lower
    discrete quantile — deterministic, no interpolation, engine-exact).

    Two-level plan (the global-order-statistic shape that survives 100 TB
    where percentile_approx is approximate and a full sort-window is a
    single-task scan): (1) one partial-agg pass counts per value-BUCKET
    (x div bucket_div → at most value_range/bucket_div rows — the only
    single-partition window runs over THIS bounded relation); (2) targets
    join the bucket cumsum to pick each τ's bucket; (3) a second pass
    touches only rows in the ≤|taus| chosen buckets and resolves the exact
    value with a bucket-partitioned cumsum. No collect, no global sort.

    Output: one row per τ — (tau double, value long)."""
    spark = df.sparkSession
    src = (
        df.select(F.col(value_col).cast("long").alias("_x"))
        .where(F.col("_x").isNotNull())
        .withColumn("_b", F.expr(f"_x div {int(bucket_div)}"))
    )
    b = src.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    cumb = b.withColumn("_cum", F.sum("_c").over(wb))
    n_row = src.agg(F.count(F.lit(1)).alias("_n"))
    t = (
        spark.createDataFrame([(float(x),) for x in taus], "tau double")
        .crossJoin(F.broadcast(n_row))
        .select(
            "tau",
            F.ceil(F.col("_n").cast("double") * F.col("tau"))
            .cast("long")
            .alias("_target"),
        )
    )
    wpick = Window.partitionBy("tau").orderBy("_b")
    chosen = (
        t.join(cumb, cumb["_cum"] >= t["_target"])
        .withColumn("_rn", F.row_number().over(wpick))
        .where(F.col("_rn") == 1)
        .select(
            "tau", "_target", "_b", (F.col("_cum") - F.col("_c")).alias("_before")
        )
    )
    per_val = (
        src.join(F.broadcast(chosen.select("_b").distinct()), "_b")
        .groupBy("_b", "_x")
        .agg(F.count(F.lit(1)).alias("_c2"))
    )
    wv = (
        Window.partitionBy("_b")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cumv = per_val.withColumn("_cv", F.sum("_c2").over(wv))
    wres = Window.partitionBy("tau").orderBy("_x")
    return (
        chosen.join(cumv, "_b")
        .where(F.col("_before") + F.col("_cv") >= F.col("_target"))
        .withColumn("_rn2", F.row_number().over(wres))
        .where(F.col("_rn2") == 1)
        .select("tau", F.col("_x").alias("value"))
    )


def mood_median_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Mood's median test across k groups: χ² on the k×2 table of counts
    above vs at-or-below the GRAND median — kruskal_wallis' cruder,
    outlier-immune sibling (only the side of the median matters, not the
    rank). Median from ``exact_quantiles`` (lower discrete, engine-exact
    on integer values).

    Determinism: cell counts are exact integers; the per-group χ² terms
    (computed in the exact-integer form (n·a_g − n_g·A)² / n_g scaled by
    1/(A·B)) quantize max-normalized floor-e12 before the |k|-row sum
    (the anova_oneway discipline).

    Output (1 row): (k, n, median, chi2, df)."""
    med = exact_quantiles(df.select(value_col), value_col, [0.5]).select(
        F.col("value").alias("_med")
    )
    x = F.col(value_col).cast("long")
    per_g = (
        df.where(x.isNotNull())
        .crossJoin(F.broadcast(med))
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count(F.when(x > F.col("_med"), F.lit(1))).alias("a_g"),
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.first("_med").alias("_med"),
        )
    )
    tot = per_g.agg(
        F.sum("a_g").cast("long").alias("A"),
        F.sum("n_g").cast("long").alias("n"),
    ).withColumn("B", F.col("n") - F.col("A"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    parts = per_g.crossJoin(F.broadcast(tot)).withColumn(
        "_t",
        (
            (dec(F.col("n")) * F.col("a_g") - dec(F.col("n_g")) * F.col("A"))
            * (dec(F.col("n")) * F.col("a_g") - dec(F.col("n_g")) * F.col("A"))
        ).cast("double")
        / F.col("n_g").cast("double"),
    )
    pmax = parts.agg(F.max("_t").alias("_tm"))
    agg = (
        parts.crossJoin(F.broadcast(pmax))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.first("n").alias("n"),
            F.first("A").alias("A"),
            F.first("B").alias("B"),
            F.first("_med").alias("median"),
            F.sum(
                F.when(
                    F.col("_tm") > 0.0,
                    F.floor(F.col("_t") / F.col("_tm") * 1e12).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("_q12"),
            F.first("_tm").alias("_tm"),
        )
        .withColumn("_tsum", F.col("_q12").cast("double") / 1e12 * F.col("_tm"))
    )
    chi2 = F.when(
        (F.col("A") <= 0) | (F.col("B") <= 0), F.lit(0.0)
    ).otherwise(
        F.col("_tsum") / (F.col("A").cast("double") * F.col("B").cast("double"))
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return agg.select(
        F.col("k").cast("int").alias("k"),
        F.col("n"),
        F.col("median"),
        rnd(chi2).alias("chi2"),
        (F.col("k") - 1).cast("long").alias("df"),
    )


def sign_test(
    df: DataFrame,
    pre_col: str,
    post_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Paired sign test: did the post value move up or down vs the pre
    value, ignoring magnitude — the assumption-free paired comparison
    (wilcoxon_signed without the rank weighting). Ties drop; z is the
    normal approximation (n_pos − n_neg)/√m over m non-tied pairs.

    Counts are exact integers; z is one fixed-order expression of them.
    Output (1 row): (n_pos, n_neg, n_tie, z)."""
    pre, post = F.col(pre_col), F.col(post_col)
    agg = df.where(pre.isNotNull() & post.isNotNull()).agg(
        F.count(F.when(post > pre, F.lit(1))).alias("n_pos"),
        F.count(F.when(post < pre, F.lit(1))).alias("n_neg"),
        F.count(F.when(post == pre, F.lit(1))).alias("n_tie"),
    )
    m = (F.col("n_pos") + F.col("n_neg")).cast("double")
    z = F.when(m <= 0.0, F.lit(0.0)).otherwise(
        (F.col("n_pos") - F.col("n_neg")).cast("double") / F.sqrt(m)
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.col("n_tie").cast("long").alias("n_tie"),
        rnd(z).alias("z"),
    )


def page_trend_test(
    df: DataFrame,
    block_col: str,
    treat_order_col: str,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Page's L trend test: is there a MONOTONE trend across k ordered
    treatments, judged over b independent blocks — friedman_test with the
    ordering hypothesis baked in (L = Σ_j j·R_j weights rank sums by the
    hypothesized order, far more powerful than the omnibus χ² when the
    alternative is monotone).

    Input: ONE row per (block, treatment); ``treat_order_col`` is the
    1..k hypothesized order. Incomplete blocks drop. Within-block ranks
    are row_number over (value, treat_order) — the deterministic
    label-tiebreak convention (exact-value ties between two treatments in
    one block break toward the hypothesized order; documented, engine-
    identical). L is an exact integer; z its fixed-order normal form
    (12L − 3bk(k+1)²) / (k(k+1)·√(b(k−1))).

    Scale shape: one (block)-keyed shuffle for the k-row windows; the
    rank-sum relation is k rows. Output (1 row): (b, k, l_stat, z)."""
    kcnt = df.agg(
        F.countDistinct(treat_order_col).cast("long").alias("_k")
    )
    complete = (
        df.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .crossJoin(F.broadcast(kcnt))
        .where(F.col("_cnt") == F.col("_k"))
        .select(block_col)
    )
    wr = Window.partitionBy(block_col).orderBy(
        F.col(value_col), F.col(treat_order_col)
    )
    ranked = df.join(complete, block_col).withColumn(
        "_r", F.row_number().over(wr)
    )
    rsums = ranked.groupBy(F.col(treat_order_col).alias("_j")).agg(
        F.sum("_r").cast("long").alias("_rj"),
        F.countDistinct(block_col).cast("long").alias("_b"),
    )
    agg = rsums.agg(
        F.sum(F.col("_j").cast("long") * F.col("_rj")).cast("long").alias("l_stat"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("_b").cast("long").alias("b"),
    )
    bb, kk = F.col("b").cast("double"), F.col("k").cast("double")
    z = F.when(
        (F.col("k") < 2) | (F.col("b") < 1), F.lit(0.0)
    ).otherwise(
        (12.0 * F.col("l_stat").cast("double") - 3.0 * bb * kk * (kk + 1.0) * (kk + 1.0))
        / (kk * (kk + 1.0) * F.sqrt(bb * (kk - 1.0)))
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return agg.select(
        "b", "k", "l_stat", rnd(z).alias("z")
    )


def pinball_eval(
    train: DataFrame,
    test: DataFrame,
    value_col: str,
    taus: Sequence[float],
    ndigits: int = 6,
) -> DataFrame:
    """Quantile-forecast evaluation: for each τ, forecast the τ-quantile
    of the TRAIN split (``exact_quantiles`` — lower discrete, exact) and
    score it on the TEST split with pinball loss
    mean(τ·(y−f)⁺ + (1−τ)·(f−y)⁺) — the proper scoring rule for quantile
    forecasts (a forecast minimizes it iff it IS the τ-quantile).

    Determinism: y and f are integers, so Σ(y−f)⁺ and Σ(f−y)⁺ accumulate
    as exact DECIMAL(38,0); the loss applies τ ONCE to the two exact sums
    (no per-row float accumulation, no ordering sensitivity).

    Output: one row per τ — (tau, forecast, pinball)."""
    fc = exact_quantiles(train, value_col, taus).select(
        "tau", F.col("value").alias("forecast")
    )
    y = F.col(value_col).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    scored = (
        test.where(y.isNotNull())
        .select(y.alias("_y"))
        .crossJoin(F.broadcast(fc))
        .groupBy("tau", "forecast")
        .agg(
            F.sum(
                dec(F.greatest(F.col("_y") - F.col("forecast"), F.lit(0)))
            ).alias("_p"),
            F.sum(
                dec(F.greatest(F.col("forecast") - F.col("_y"), F.lit(0)))
            ).alias("_m"),
            F.count(F.lit(1)).cast("long").alias("_n"),
        )
    )
    loss = (
        F.col("tau") * F.col("_p").cast("double")
        + (F.lit(1.0) - F.col("tau")) * F.col("_m").cast("double")
    ) / F.col("_n").cast("double")
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return scored.select("tau", "forecast", rnd(loss).alias("pinball"))


def dunn_posthoc(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Dunn's post-hoc pairwise z after Kruskal–Wallis: which group PAIRS
    actually differ once the omnibus H rejects. z_ij = (r̄_i − r̄_j) /
    sqrt(V·(1/n_i + 1/n_j)) with the tie-corrected rank variance
    V = N(N+1)/12 − Σ(t³−t)/(12(N−1)), on the same global tie-averaged
    ranks kruskal_wallis uses.

    Determinism: rank sums are exact integers from the count-based
    2·r̄(v) relation (``_prefix_rank2``, gp=()); mean ranks are one
    division each; V and z are fixed-operand-order double expressions of
    exact integers. Pairs ordered g1 < g2 lexicographically.

    Scale shape: identical to kruskal_wallis (per-(group, value) cells,
    distributed prefix over pooled values) plus a k²-bounded self-join of
    the k-row per-group relation. Output per pair: (g1, g2, n1, n2,
    mean_rank_1, mean_rank_2, z_dunn)."""
    cells = df.groupBy(
        F.col(group_col).cast("string").alias("grp"),
        F.col(value_col).alias("_v"),
    ).agg(F.count(F.lit(1)).alias("_c"))
    vals = cells.groupBy("_v").agg(F.sum("_c").alias("_cv"))
    r2v = _prefix_rank2(vals, (), "_v")
    per_g = cells.join(r2v, "_v").groupBy("grp").agg(
        F.sum("_c").cast("long").alias("n_g"),
        F.sum(F.col("_c") * F.col("_r2")).cast("decimal(38,0)").alias("s2"),
    )
    tot = per_g.agg(F.sum("n_g").cast("long").alias("n"))
    ties = vals.agg(
        F.sum(F.col("_cv") * F.col("_cv") * F.col("_cv") - F.col("_cv"))
        .cast("long")
        .alias("tie3")
    )
    a = per_g.select(
        F.col("grp").alias("g1"),
        F.col("n_g").alias("n1"),
        F.col("s2").alias("_s21"),
    )
    b = per_g.select(
        F.col("grp").alias("g2"),
        F.col("n_g").alias("n2"),
        F.col("s2").alias("_s22"),
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("g1") < F.col("g2"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
    )
    nn = F.col("n").cast("double")
    v = nn * (nn + 1.0) / 12.0 - F.col("tie3").cast("double") / (
        12.0 * (nn - 1.0)
    )
    r1 = F.col("_s21").cast("double") / (2.0 * F.col("n1").cast("double"))
    r2 = F.col("_s22").cast("double") / (2.0 * F.col("n2").cast("double"))
    den = F.sqrt(
        v
        * (
            1.0 / F.col("n1").cast("double")
            + 1.0 / F.col("n2").cast("double")
        )
    )
    z = F.when((F.col("n") < 2) | (den == 0.0), F.lit(0.0)).otherwise(
        (r1 - r2) / den
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return pairs.select(
        "g1",
        "g2",
        "n1",
        "n2",
        rnd(r1).alias("mean_rank_1"),
        rnd(r2).alias("mean_rank_2"),
        rnd(z).alias("z_dunn"),
    )


def kendall_w(
    df: DataFrame,
    rater_col: str,
    item_col: str,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Kendall's coefficient of concordance W: do m raters agree on the
    ranking of n items (0 = no agreement, 1 = unanimous)? The
    inter-rater-agreement number for ORDINAL judgments (fleiss_kappa's
    counterpart for rankings; blocks rank items exactly as in
    friedman_test — W = χ²_friedman/(m·(n−1)) up to tie handling).

    Determinism: within-rater tie-averaged ranks as exact 2·r̄ integers
    (k-row windows per rater, k = |items| bounded); S₄ = Σ_i (R2_i −
    m(n+1))² = 4S exact DECIMAL(38,0); tie term Σ_j Σ(t³−t) exact; W =
    3·S₄/(m²(n³−n) − m·ΣT) is ONE double division. Assumes a complete
    design (every rater ranks every item — enforce upstream).

    Output (1 row): (m, n, w, chi2, dof) with χ² = m(n−1)W."""
    one = df.groupBy(
        F.col(rater_col).alias("_b"), F.col(item_col).alias("_t")
    ).agg(F.sum(value_col).alias("_v"))
    wr = Window.partitionBy("_b").orderBy("_v")
    wt = Window.partitionBy("_b", "_v")
    ranked = one.select(
        "_b",
        "_t",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).alias("_r2"),
    )
    per_item = ranked.groupBy("_t").agg(
        F.count(F.lit(1)).cast("long").alias("_m"),
        F.sum("_r2").cast("decimal(38,0)").alias("_s2"),
    )
    dims = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("_m").cast("long").alias("m"),
    )
    ties = (
        one.groupBy("_b", "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_tc"))
        .agg(
            F.sum(
                F.col("_tc") * F.col("_tc") * F.col("_tc") - F.col("_tc")
            )
            .cast("long")
            .alias("tie3")
        )
    )
    dev = per_item.crossJoin(F.broadcast(dims)).select(
        (
            (F.col("_s2") - F.col("m") * (F.col("n") + 1))
            * (F.col("_s2") - F.col("m") * (F.col("n") + 1))
        ).alias("_d2"),
        "n",
        "m",
    )
    acc = dev.groupBy("n", "m").agg(
        F.sum("_d2").cast("decimal(38,0)").alias("s4")
    ).crossJoin(F.broadcast(ties))
    nn = F.col("n").cast("double")
    mm = F.col("m").cast("double")
    den = mm * mm * (nn * nn * nn - nn) - mm * F.col("tie3").cast("double")
    w = F.when(den == 0.0, F.lit(0.0)).otherwise(
        3.0 * F.col("s4").cast("double") / den
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("m"),
        F.col("n"),
        rnd(w).alias("w"),
        rnd(mm * (nn - 1.0) * w).alias("chi2"),
        (F.col("n") - 1).cast("int").alias("dof"),
    )


def cochran_armitage(
    df: DataFrame,
    score_col: str,
    success_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Cochran–Armitage trend test: does success probability trend
    monotonically across ORDERED groups (integer scores)? The dose-
    response gate chi_square misses (χ² sees any difference; this is
    powered specifically against the ordered alternative).

    Determinism: per-score (n_i, r_i) exact; with N, R, Σsr, Σsn, Σs²n
    exact DECIMAL(38,0), χ²_trend = N·(N·Σsr − R·Σsn)² / (R·(N−R)·
    (N·Σs²n − (Σsn)²)) is one double expression; z carries the trend
    sign. One partial-agg shuffle, |scores|-row reduction.

    Output (1 row): (k, n, n_success, chi2_trend, z)."""
    s = F.col(score_col).cast("long")
    y = F.col(success_col).cast("long")
    per = df.groupBy(s.alias("_s")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(y).cast("long").alias("_r"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    acc = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("_n").cast("long").alias("n"),
        F.sum("_r").cast("long").alias("n_success"),
        F.sum(dec(F.col("_s")) * F.col("_r")).alias("ssr"),
        F.sum(dec(F.col("_s")) * F.col("_n")).alias("ssn"),
        F.sum(dec(F.col("_s")) * F.col("_s") * F.col("_n")).alias("ss2n"),
    )
    nn = F.col("n").cast("double")
    rr = F.col("n_success").cast("double")
    num = nn * F.col("ssr").cast("double") - rr * F.col("ssn").cast("double")
    den = (
        rr
        * (nn - rr)
        * (
            nn * F.col("ss2n").cast("double")
            - F.col("ssn").cast("double") * F.col("ssn").cast("double")
        )
    )
    chi2 = F.when(den == 0.0, F.lit(0.0)).otherwise(nn * num * num / den)
    z = F.when(den == 0.0, F.lit(0.0)).otherwise(
        F.signum(num) * F.sqrt(nn * num * num / den)
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("k").cast("int").alias("k"),
        F.col("n"),
        F.col("n_success"),
        rnd(chi2).alias("chi2_trend"),
        rnd(z).alias("z"),
    )


def cohens_d(
    df: DataFrame,
    value_col: str,
    group_col: str,
    g1: str,
    g2: str,
    ndigits: int = 6,
) -> DataFrame:
    """Cohen's d / Hedges' g standardized effect size between two groups
    — the "HOW different" companion to welch_ttest's "is it different"
    (a huge N makes trivial differences significant; d is N-free).
    d = (m₁ − m₂)/s_pooled with s²_pooled = ((n₁−1)s₁² + (n₂−1)s₂²)/
    (n₁+n₂−2); g = d·(1 − 3/(4(n₁+n₂)−9)) (Hedges' small-sample
    correction, the standard approximation of the exact gamma form).

    Determinism: value_col must be integer-quantized; per-group moments
    exact DECIMAL(38,0); one fixed-order double expression per output.
    Single conditional-aggregation pass. Output (1 row):
    (n1, n2, mean1, mean2, d, hedges_g)."""
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    v = F.col(value_col)
    in1 = F.col(group_col) == g1
    in2 = F.col(group_col) == g2
    acc = df.filter(in1 | in2).agg(
        F.sum(F.when(in1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(in2, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(in1, dec(v)).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("s1"),
        F.sum(F.when(in2, dec(v)).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("s2"),
        F.sum(F.when(in1, dec(v) * v).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("q1"),
        F.sum(F.when(in2, dec(v) * v).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("q2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1
    m2 = F.col("s2").cast("double") / n2
    v1 = (
        n1 * F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (n1 * (n1 - 1.0))
    v2 = (
        n2 * F.col("q2").cast("double")
        - F.col("s2").cast("double") * F.col("s2").cast("double")
    ) / (n2 * (n2 - 1.0))
    sp2 = ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / (n1 + n2 - 2.0)
    d = F.when(
        (F.col("n1") < 2) | (F.col("n2") < 2) | (sp2 <= 0.0), F.lit(0.0)
    ).otherwise((m1 - m2) / F.sqrt(sp2))
    g = d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("n1"),
        F.col("n2"),
        rnd(m1).alias("mean1"),
        rnd(m2).alias("mean2"),
        rnd(d).alias("d"),
        rnd(g).alias("hedges_g"),
    )


def theil_decomposition(
    df: DataFrame,
    y_col: str,
    group_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Theil T inequality index with the exact within/between-group
    decomposition — the inequality measure that ADDS UP (Gini doesn't
    decompose): T = (1/N)Σ(x/μ)ln(x/μ), T_between = Σ_g (S_g/S)ln(μ_g/μ),
    T_within = T − T_between. "How much of the revenue inequality is
    BETWEEN regions vs within them."

    Determinism: x must be positive integers. Member terms are
    fixed-operand-order doubles of exact moments, e12-quantized into a
    DECIMAL(38,0) sum BEFORE any cross-row accumulation (the source_jsd
    discipline — a raw double sum is shuffle-order dependent); the k
    between-group terms quantize the same way. T_within is computed from
    the two quantized values, so the decomposition identity holds exactly
    as published.

    Scale shape: one member-grain pass + one k-row group relation.
    Output (1 row): (n, k_groups, theil_total, theil_between,
    theil_within)."""
    base = df.select(
        F.col(group_col).alias("_g"), F.col(y_col).cast("long").alias("_x")
    ).filter(F.col("_x") > 0)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(dec(F.col("_x"))).alias("_s"),
    )
    wtot = base.crossJoin(F.broadcast(tot))
    mu = F.col("_s").cast("double") / F.col("_n").cast("double")
    ratio = F.col("_x").cast("double") / mu
    term = ratio * F.log(ratio)
    tq = wtot.agg(
        F.sum(dec(F.round(term * 1e12, 0))).alias("_tq"),
        F.min("_n").alias("n"),
    )
    per_g = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("_ng"),
        F.sum(dec(F.col("_x"))).alias("_sg"),
    )
    gterm = per_g.crossJoin(F.broadcast(tot)).select(
        F.round(
            (F.col("_sg").cast("double") / F.col("_s").cast("double"))
            * F.log(
                (F.col("_sg").cast("double") / F.col("_ng").cast("double"))
                / (F.col("_s").cast("double") / F.col("_n").cast("double"))
            )
            * 1e12,
            0,
        ).cast("long").alias("_bq")
    )
    bacc = gterm.agg(
        F.sum(dec(F.col("_bq"))).alias("_bsum"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
    )
    out = tq.crossJoin(F.broadcast(bacc))
    t_total = F.col("_tq").cast("double") / 1e12 / F.col("n").cast("double")
    t_between = F.col("_bsum").cast("double") / 1e12
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return out.select(
        F.col("n"),
        F.col("k_groups"),
        rnd(t_total).alias("theil_total"),
        rnd(t_between).alias("theil_between"),
        rnd(t_total - t_between).alias("theil_within"),
    )


def atkinson_index(
    df: DataFrame,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Atkinson inequality index at ε = 1: A = 1 − geomean(x)/mean(x) —
    the welfare-weighted inequality scalar (A = 0.2 reads "society would
    give up 20% of total income for perfect equality"). Positive integer
    inputs; Σln x e12-quantizes into a DECIMAL(38,0) sum before
    accumulation; one pass. Output (1 row): (n, mean, geomean,
    atkinson)."""
    base = df.select(F.col(y_col).cast("long").alias("_x")).filter(
        F.col("_x") > 0
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    acc = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("_x"))).alias("_s"),
        F.sum(dec(F.round(F.log(F.col("_x").cast("double")) * 1e12, 0))).alias(
            "_lq"
        ),
    )
    n = F.col("n").cast("double")
    mean = F.col("_s").cast("double") / n
    geo = F.exp(F.col("_lq").cast("double") / 1e12 / n)
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("n"),
        rnd(mean).alias("mean"),
        rnd(geo).alias("geomean"),
        rnd(F.lit(1.0) - geo / mean).alias("atkinson"),
    )


def palma_ratio(
    df: DataFrame,
    y_col: str,
    id_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Palma ratio: top-10% value share / bottom-40% value share — the
    tail-focused inequality readout (Gini is middle-insensitive; Palma is
    what moves when the extremes move). Ranks via the distributed
    ``scale.global_rank`` (ties (y, id) — never a single-partition data
    sort); the decile cuts are EXACT integer thresholds (b40 = 4N div 10,
    t10 = N − N div 10); shares are exact DECIMAL(38,0) cent sums.

    Output (1 row): (n, bottom40_share, top10_share, palma)."""
    from .scale import global_rank

    base = df.select(
        F.col(id_col).alias("_id"), F.col(y_col).cast("long").alias("_y")
    )
    ranked = global_rank(base, "_y", tie_cols=["_id"], with_rank=False)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("_y"))).alias("_s"),
    )
    acc = ranked.crossJoin(F.broadcast(tot)).agg(
        F.min("n").alias("n"),
        F.min("_s").alias("_s2"),
        F.sum(
            F.when(
                F.col("rn") <= (F.col("n") * 4 - F.col("n") * 4 % 10) / 10,
                dec(F.col("_y")),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("_b40"),
        F.sum(
            F.when(
                F.col("rn") > F.col("n") - (F.col("n") - F.col("n") % 10) / 10,
                dec(F.col("_y")),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("_t10"),
    )
    s = F.col("_s2").cast("double")
    b = F.col("_b40").cast("double") / s
    t = F.col("_t10").cast("double") / s
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("n"),
        rnd(b).alias("bottom40_share"),
        rnd(t).alias("top10_share"),
        rnd(
            F.when(F.col("_b40") == 0, F.lit(0.0)).otherwise(
                F.col("_t10").cast("double") / F.col("_b40").cast("double")
            )
        ).alias("palma"),
    )


def km_rmst(
    df: DataFrame,
    group_cols: Sequence[str],
    duration_col: str,
    event_col: str,
    tau: int,
    km_digits: int = 6,
    ndigits: int = 6,
) -> DataFrame:
    """Restricted mean survival time: the area under the Kaplan–Meier
    curve up to the horizon τ — "expected time alive in the first τ
    units", the survival summary that stays defined when the median
    never crosses and that compares arms without proportional-hazards
    assumptions.

    Composition: ``kaplan_meier``'s certified curve; the step areas use
    the ROUNDED curve re-quantized to exact 10^km_digits integers, so
    Σ s_{i−1}·(t_i − t_{i−1}) + s_last·(τ − t_last) accumulates as exact
    integers and divides ONCE (km_median's composition discipline —
    never re-accumulate floats over the curve).

    Output per group — EVERY input group emits a row (a group with no
    event time ≤ τ keeps S = 1 on [0, τ]: rmst = τ, t_last = 0,
    final_surv = 1): (*group_cols, tau, rmst, t_last, final_surv)."""
    groups = list(group_cols)
    scale = 10 ** int(km_digits)
    km = kaplan_meier(df, groups, duration_col, event_col, ndigits=km_digits)
    filt = km.filter(F.col("t") <= tau).select(
        *groups,
        F.col("t").cast("long").alias("_t"),
        F.round(F.col("surv") * scale, 0).cast("long").alias("_se"),
    )
    w = Window.partitionBy(*groups).orderBy("_t")
    stepped = filt.select(
        *groups,
        "_t",
        "_se",
        F.coalesce(F.lag("_se").over(w), F.lit(scale).cast("long")).alias(
            "_sprev"
        ),
        F.coalesce(F.lag("_t").over(w), F.lit(0).cast("long")).alias("_tprev"),
    )
    acc = stepped.groupBy(*groups).agg(
        F.sum(F.col("_sprev") * (F.col("_t") - F.col("_tprev")))
        .cast("long")
        .alias("_area"),
        F.max("_t").alias("t_last"),
        F.min_by(F.col("_se"), -F.col("_t")).alias("_slast"),
    )
    # groups whose curve has no event time ≤ τ (all-censored, or first
    # event past the horizon): S(t) = 1 on [0, τ] ⇒ RMST = τ exactly —
    # emit that row instead of silently dropping the group
    gset = df.select(*groups).distinct()
    out = gset.join(acc, groups, "left")
    rmst_e = F.coalesce(
        F.col("_area") + F.col("_slast") * (F.lit(int(tau)) - F.col("t_last")),
        F.lit(int(tau) * scale).cast("long"),
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return out.select(
        *groups,
        F.lit(int(tau)).cast("long").alias("tau"),
        rnd(rmst_e.cast("double") / F.lit(float(scale))).alias("rmst"),
        F.coalesce(F.col("t_last"), F.lit(0).cast("long")).alias("t_last"),
        rnd(
            F.coalesce(F.col("_slast"), F.lit(scale).cast("long")).cast(
                "double"
            )
            / F.lit(float(scale))
        ).alias("final_surv"),
    )


def gk_lambda(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Goodman–Kruskal lambda — the proportional-reduction-in-error
    association for NOMINAL pairs: λ_yx = (Σ_x max_y n_xy − max_y n_y) /
    (n − max_y n_y) — "how much better do I predict y knowing x than by
    always guessing the mode". The PRE complement to cramers_v (effect
    size) and nmi (information): λ = 0 can coexist with dependence, which
    is exactly what it measures (modal-prediction usefulness). Both
    directions reported.

    Exact integer cells, modal maxes, two divisions. One contingency
    shuffle; everything else is |cells|-bounded.

    Output (1 row): (n, lambda_yx, lambda_xy)."""
    cells = df.groupBy(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    row_max = cells.groupBy("_x").agg(F.max("_n").alias("_mx"))
    col_max = cells.groupBy("_y").agg(F.max("_n").alias("_my"))
    marg_y = cells.groupBy("_y").agg(F.sum("_n").cast("long").alias("_ny"))
    marg_x = cells.groupBy("_x").agg(F.sum("_n").cast("long").alias("_nx"))
    tot = cells.agg(F.sum("_n").cast("long").alias("n"))
    sums = (
        row_max.agg(F.sum("_mx").cast("long").alias("_srow"))
        .crossJoin(F.broadcast(col_max.agg(F.sum("_my").cast("long").alias("_scol"))))
        .crossJoin(F.broadcast(marg_y.agg(F.max("_ny").cast("long").alias("_mody"))))
        .crossJoin(F.broadcast(marg_x.agg(F.max("_nx").cast("long").alias("_modx"))))
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("n").cast("double")
    lam_yx = F.when(F.col("n") == F.col("_mody"), F.lit(0.0)).otherwise(
        (F.col("_srow") - F.col("_mody")).cast("double")
        / (F.col("n") - F.col("_mody")).cast("double")
    )
    lam_xy = F.when(F.col("n") == F.col("_modx"), F.lit(0.0)).otherwise(
        (F.col("_scol") - F.col("_modx")).cast("double")
        / (F.col("n") - F.col("_modx")).cast("double")
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return sums.select(
        F.col("n"),
        rnd(lam_yx).alias("lambda_yx"),
        rnd(lam_xy).alias("lambda_xy"),
    )


def somers_d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Somers' D_yx — ordinal_gamma's ASYMMETRIC sibling: D_yx =
    (C − D)/(C + D + T_y), penalizing pairs tied on the DEPENDENT
    variable only (γ ignores all ties, overstating association on
    coarse scales; D is what ROC-style "rank the outcome by the
    predictor" questions want — for a binary outcome b and predictor p,
    ``somers_d(df, b, p)`` (pairs conditioned on the OUTCOME differing,
    predictor ties penalized) equals exactly 2·AUC − 1).

    Same |cells|²-bounded machinery as ordinal_gamma (pass BUCKETED
    ordinals): exact int64 C/D/T_y pair counts, one division.

    Output (1 row): (n, concordant, discordant, ties_y, d_yx)."""
    cells = df.groupBy(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count(F.lit(1)).alias("_n"))
    a = cells.select(
        F.col("_x").alias("_xa"), F.col("_y").alias("_ya"),
        F.col("_n").alias("_na"),
    )
    b = cells.select(
        F.col("_x").alias("_xb"), F.col("_y").alias("_yb"),
        F.col("_n").alias("_nb"),
    )
    pairs = a.join(b, F.col("_xa") < F.col("_xb"), "inner")
    acc = pairs.agg(
        F.sum(
            F.when(F.col("_ya") < F.col("_yb"), F.col("_na") * F.col("_nb"))
            .otherwise(F.lit(0))
        ).cast("long").alias("concordant"),
        F.sum(
            F.when(F.col("_ya") > F.col("_yb"), F.col("_na") * F.col("_nb"))
            .otherwise(F.lit(0))
        ).cast("long").alias("discordant"),
        F.sum(
            F.when(F.col("_ya") == F.col("_yb"), F.col("_na") * F.col("_nb"))
            .otherwise(F.lit(0))
        ).cast("long").alias("ties_y"),
    )
    tot = cells.agg(F.sum("_n").cast("long").alias("n"))
    out = acc.crossJoin(F.broadcast(tot))
    den = (
        F.col("concordant") + F.col("discordant") + F.col("ties_y")
    ).cast("double")
    d = F.when(den == 0.0, F.lit(0.0)).otherwise(
        (F.col("concordant") - F.col("discordant")).cast("double") / den
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return out.select(
        F.col("n"),
        F.col("concordant"),
        F.col("discordant"),
        F.col("ties_y"),
        rnd(d).alias("d_yx"),
    )
