"""Climate-analytics flagship: anomaly → per-cell trend → focal-smoothed
trend map, composed as ONE lazy DAG over the long-form grid table (the
composition a climate analyst runs on the reference's output archive:
de-seasonalize, fit the trend, smooth the map for presentation).

Plan shape end to end: one window shuffle keyed (i, j) for the
climatology, one |cells|-sized aggregation for the OLS moments, one
scatter shuffle for the focal smooth — every exchange is cell-count-sized,
independent of history length, so a 47-year daily archive costs the same
shuffle bytes as the 7-day fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.bbox import focal_mean
from ..operators.timeseries import climatology_anomaly, trend_slope


def climate_pipeline(grid: DataFrame, var: str = "tmmx") -> DataFrame:
    """De-seasonalized trend map for one variable, focally smoothed.

    Output: (i, j, trend_smooth, n_nbrs) — slope in value-units/day
    averaged over each cell's 3×3 neighborhood.
    """
    sel = grid.where(F.col("var") == var)
    anom = climatology_anomaly(sel, keys=("i", "j"))
    trend = trend_slope(
        anom.select("i", "j", "time", F.col("anomaly").alias("value")),
        keys=("i", "j"),
    )
    slope_map = trend.select(
        F.lit(var).alias("var"), F.lit("all").alias("time"), "i", "j", "slope"
    )
    sm = focal_mean(slope_map, radius=1, keys=("var", "time"), value_col="slope")
    return sm.select(
        "i", "j", F.col("focal_value").alias("trend_smooth"), "n_nbrs"
    )
