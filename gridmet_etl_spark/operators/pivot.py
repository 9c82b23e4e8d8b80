"""Long→wide variable alignment (SURVEY §2.4 J4, §2.3 P9).

Reference merges per-variable datasets on (time, nhru[, ens]) via
``xr.merge`` / ``open_mfdataset`` (etl.py:226-228) then renames variables
{"tmmx": "tmax", ...} (etl.py:455-459, 725-736).

Spark design: ``groupBy(keys).pivot("var", [known values])`` — passing the
explicit value list avoids the extra distinct-collection job and keeps the
plan static. One shuffle; at scale this is the same shuffle as the weighted
aggregation when fused (Catalyst collapses adjacent groupBys on a superset
key into one exchange reuse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    long_df: DataFrame,
    rename: dict[str, str],
    keys: tuple[str, ...] = ("feature_id", "time"),
    value_col: str = "value",
) -> DataFrame:
    """Pivot long (keys..., var, value) → wide (keys..., tmax, tmin, ...).

    ``rename`` maps source var name → output column name (P9), e.g.
    {"tmmx": "tmax"}. first() is the correct pivot agg: (keys, var) is
    unique post-aggregation.
    """
    pivoted = (
        long_df.groupBy(*keys)
        .pivot("var", list(rename.keys()))
        .agg(F.first(value_col))
    )
    for src, dst in rename.items():
        pivoted = pivoted.withColumnRenamed(src, dst)
    return pivoted


def unpivot_long(
    wide_df: DataFrame,
    value_cols: list[str],
    keys: tuple[str, ...] = ("feature_id", "time"),
) -> DataFrame:
    """Inverse of pivot_wide via the native unpivot (melt) operator —
    no shuffle at all (row-local expansion)."""
    return wide_df.unpivot(
        ids=list(keys), values=value_cols, variableColumnName="var", valueColumnName="value"
    )
