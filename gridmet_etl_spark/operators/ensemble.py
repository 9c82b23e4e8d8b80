"""Ensemble operators (SURVEY §2.5 A3, §2.6 E1/E2).

Reference: CFSv2 method 1 takes the exact median across the 48-member
``ens`` dimension per (time, lat, lon) cell (etl.py:296-298); method 2
processes all members (etl.py:361-383, a sequential loop we replace by
keeping ``ens`` in the aggregation keys — see weighted_agg).

Spark design: ``median`` (exact, Spark ≥3.4) in a groupBy over the cell
keys. Group size is fixed at 48 → bounded state per group, partial_merge
friendly. At 100 TB the shuffle key (var, time, i, j) is high-cardinality
and uniform → no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensemble_median(grid_ens: DataFrame, value_col: str = "value") -> DataFrame:
    """Exact median over the ensemble axis per (var, time, i, j) cell.

    Keeps lat/lon via first() (functionally dependent on i/j).
    Reproduces `ds[key].median(dim="ens")` (etl.py:296-297); xarray's
    median skips NaN by default only for skipna=True — the reference uses
    the default (skipna=True for float dtypes), matching SQL median's
    NULL-skipping.
    """
    return grid_ens.groupBy("var", "time", "i", "j").agg(
        F.first("lat").alias("lat"),
        F.first("lon").alias("lon"),
        F.median(value_col).alias("value"),
    )


def ensemble_stats(grid_ens: DataFrame, value_col: str = "value") -> DataFrame:
    """Extended ensemble summary (beyond reference surface, same shuffle):
    median/mean/min/max/stddev per cell, one pass."""
    v = F.col(value_col)
    return grid_ens.groupBy("var", "time", "i", "j").agg(
        F.median(v).alias("ens_median"),
        F.avg(v).alias("ens_mean"),
        F.min(v).alias("ens_min"),
        F.max(v).alias("ens_max"),
        F.stddev_samp(v).alias("ens_std"),
        F.count(v).alias("n_members"),
    )


def ensemble_quantiles(
    grid_ens: DataFrame,
    quantiles: tuple[float, ...] = (0.1, 0.5, 0.9),
    value_col: str = "value",
) -> DataFrame:
    """Exact interpolated quantiles across the ensemble per cell — the
    probabilistic-forecast generalization of the reference's median-only
    product (same shuffle as ensemble_median; linear interpolation matches
    DuckDB quantile_cont bit-for-bit on the 48-member groups)."""
    return grid_ens.groupBy("var", "time", "i", "j").agg(
        *[
            F.percentile(value_col, F.lit(q)).alias(f"q{int(q * 100)}")
            for q in quantiles
        ]
    )


def concat_members(members: list[DataFrame], tag_col: str = "ens") -> DataFrame:
    """E2: xr.concat(dim="ens") analogue — UNION ALL with a member tag.

    Reference builds this from 48 per-member files (etl.py:355-357); in the
    engine the long form usually arrives pre-tagged, making this a no-op.
    """
    tagged = [df.withColumn(tag_col, F.lit(n)) for n, df in enumerate(members)]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df)
    return out
