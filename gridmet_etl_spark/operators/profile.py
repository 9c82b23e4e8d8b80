"""Dataset profiling operators: fixed-width histograms and per-column
summary profiles — the QA pass a 100 TB ingest runs before anything else.

- ``histogram_fixed`` is one partially-aggregated shuffle of |groups|×nbins
  rows; bin assignment is pure codegen arithmetic.
- ``data_profile`` computes every column's stats in a SINGLE scan (one wide
  aggregate row) and unpivots driver-side literals — no per-column jobs, no
  second pass. Exact distinct counts shuffle one hash per column; swap in
  ``approx_count_distinct`` at the 10^12-row scale where exact NDV is not
  worth a shuffle (the ``exact_ndv`` flag).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram_fixed(
    df: DataFrame,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1.0,
    nbins: int = 20,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Fixed-width histogram: counts per bin index in [0, nbins-1], values
    outside [lo, hi] clamped into the edge bins (so mass is conserved).
    NULLs are dropped. Output: (*keys, bin, bin_lo, n)."""
    width = (hi - lo) / nbins
    v = F.col(value_col)
    raw = F.floor((v - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)).cast("int")
    out = (
        df.where(v.isNotNull())
        .groupBy(*[F.col(k) for k in keys], bin_.alias("bin"))
        .agg(F.count("*").alias("n"))
    )
    return out.withColumn("bin_lo", F.lit(lo) + F.col("bin") * F.lit(width))


def data_profile(
    df: DataFrame,
    numeric_cols: Sequence[str],
    other_cols: Sequence[str] = (),
    exact_ndv: bool = True,
) -> DataFrame:
    """Per-column profile: row count, null count, distinct count, and (for
    numeric columns) min/max. One row per column; one scan total."""
    ndv = (lambda c: F.countDistinct(c)) if exact_ndv else (
        lambda c: F.approx_count_distinct(c)
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in [*numeric_cols, *other_cols]:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            ndv(F.col(c)).alias(f"_ndv_{c}"),
        ]
    for c in numeric_cols:
        aggs += [
            F.min(F.col(c)).cast("double").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("double").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = []
    for c in [*numeric_cols, *other_cols]:
        is_num = c in numeric_cols
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
                F.col(f"_ndv_{c}").alias("n_distinct"),
                (F.col(f"_min_{c}") if is_num else F.lit(None).cast("double")).alias("vmin"),
                (F.col(f"_max_{c}") if is_num else F.lit(None).cast("double")).alias("vmax"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
