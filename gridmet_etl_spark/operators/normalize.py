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
