"""Per-group normalization operators: z-score standardization and
percentile winsorization (outlier clipping) — standard feature-prep steps
before training on tabular/grid data.

Both use the two-pass *aggregate → broadcast join back* shape instead of a
window over the group: at 100 TB a ``Window.partitionBy(var)`` would funnel
each variable's entire history through one partition, while the group-stats
relation here is |groups|-sized (thousands of rows), broadcast to every
executor, and the fact table is scanned exactly twice with no shuffle of the
fact itself (the groupBy shuffle moves only partial aggregates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_normalize(
    df: DataFrame,
    keys: Sequence[str] = ("var", "ens"),
    value_col: str = "value",
) -> DataFrame:
    """Standardize ``value`` within each key group: ``z = (v - μ) / σ``
    (population σ; NULL where σ == 0 or v is NULL). Adds ``mu``/``sigma``/
    ``z`` columns."""
    keys = list(keys)
    stats = df.groupBy(*keys).agg(
        F.avg(value_col).alias("mu"),
        F.stddev_pop(value_col).alias("sigma"),
    )
    v = F.col(value_col)
    z = F.when(F.col("sigma") > 0, (v - F.col("mu")) / F.col("sigma"))
    return df.join(F.broadcast(stats), keys).withColumn("z", z)


def winsorize_clip(
    df: DataFrame,
    keys: Sequence[str] = ("var",),
    value_col: str = "value",
    p_lo: float = 0.05,
    p_hi: float = 0.95,
) -> DataFrame:
    """Clip ``value`` to its per-group exact interpolated [p_lo, p_hi]
    percentiles (the winsorization used to tame sensor spikes / heavy-tailed
    doc lengths before aggregation). Adds ``lo``/``hi``/``clipped``."""
    keys = list(keys)
    v = F.col(value_col)
    bounds = df.groupBy(*keys).agg(
        F.percentile(v, F.lit(p_lo)).alias("lo"),
        F.percentile(v, F.lit(p_hi)).alias("hi"),
    )
    clipped = F.when(v < F.col("lo"), F.col("lo")).when(
        v > F.col("hi"), F.col("hi")
    ).otherwise(v)
    return df.join(F.broadcast(bounds), keys).withColumn("clipped", clipped)


def mad_outliers(
    df: DataFrame,
    keys: Sequence[str] = ("var",),
    value_col: str = "value",
    k: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier summary via the median absolute deviation:
    a row is an outlier when ``0.6745·|v - median| / MAD > k`` (the
    standard modified-z-score rule; 0.6745 ≈ Φ⁻¹(0.75) scales MAD to σ
    under normality — unlike z-scores, neither statistic is dragged by the
    outliers being hunted). Same two-pass aggregate/broadcast shape as
    zscore_normalize, done twice (median, then MAD of residuals); the exact
    ``percentile`` keeps a per-group value map — at 100 TB swap in
    ``approx_percentile`` (documented knob, identical plan shape).

    Output: one row per group — (keys…, n, n_outliers, med, mad),
    med/mad rounded to 6.
    """
    keys = list(keys)
    v = F.col(value_col)
    med = df.groupBy(*keys).agg(F.percentile(v, F.lit(0.5)).alias("med"))
    resid = df.join(F.broadcast(med), keys).withColumn("_ad", F.abs(v - F.col("med")))
    mad = resid.groupBy(*keys).agg(
        F.percentile(F.col("_ad"), F.lit(0.5)).alias("mad"), F.first("med").alias("med")
    )
    flagged = df.join(F.broadcast(mad), keys).withColumn(
        "_out",
        (F.col("mad") > 0)
        & (F.lit(0.6745) * F.abs(v - F.col("med")) / F.col("mad") > k),
    )
    return flagged.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(F.col("_out").cast("long")).alias("n_outliers"),
        F.round(F.first("med"), 6).alias("med"),
        F.round(F.first("mad"), 6).alias("mad"),
    )


def ntile_bins(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_bins: int = 4,
) -> DataFrame:
    """Equal-count quantile binning (the complement of profile.histogram_
    fixed's equal-WIDTH bins): ntile over (value, id) — the id tiebreak
    makes bin membership deterministic — then per-bin stats.

    The global ntile is a single total-order sort: fine for binning a
    bounded relation (feature stats, per-shard manifests); to bin a
    100 TB fact, compute approx-percentile cutoffs on a sample and bin by
    comparison instead (profile.histogram_fixed shape). That trade-off is
    the point of having both.

    Output: (bin, n, lo, hi) — lo/hi the bin's value range, rounded to 6.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col(value_col), F.col(id_col))
    return (
        df.select(F.col(value_col).alias("v"), F.ntile(n_bins).over(w).alias("bin"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("v"), 6).alias("lo"),
            F.round(F.max("v"), 6).alias("hi"),
        )
    )


def weighted_median(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact weighted median per group: the smallest value whose cumulative
    weight reaches half the group's total. The cumulative window uses the
    default RANGE frame (ORDER BY value → all peers of a tied value are
    included), so the result is deterministic under any tie order and
    reproducible across engines — no row_number tiebreak needed.

    Two windows over one group-keyed sort (same partitioning, single
    shuffle), then a min-aggregation. Weights that are exact integers in
    double stay exact under summation (< 2^53), so the half-total
    comparison has no float fuzz on count-like weights.

    Output: (keys…, wmedian, total_w).
    """
    from pyspark.sql import Window

    keys = list(keys)
    wp = Window.partitionBy(*keys)
    cum = F.sum(weight_col).over(wp.orderBy(F.col(value_col)))
    tot = F.sum(weight_col).over(wp)
    c = df.select(*keys, F.col(value_col).alias("_v"),
                  cum.alias("_cw"), tot.alias("_tw"))
    return (
        c.where(F.col("_cw") >= F.col("_tw") / 2)
        .groupBy(*keys)
        .agg(
            F.min("_v").alias("wmedian"),
            F.round(F.first("_tw"), 6).alias("total_w"),
        )
    )
