"""Data-quality validators — the QA layer a production run gates on
(generalizing SURVEY §2.5 A6's weight-sum invariant into a reusable check
set). Each check is one aggregation; `qa_report` unions them into a tidy
(check, severity, metric, value, ok) table for the run log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row(check: str, metric: str, value, ok) -> list:
    return [F.lit(check).alias("check"), F.lit(metric).alias("metric"),
            value.cast("double").alias("value"), ok.alias("ok")]


def grid_duplicates(grid: DataFrame) -> DataFrame:
    """Key uniqueness: (var, ens, time, i, j) must be unique."""
    dupes = (
        grid.groupBy("var", "ens", "time", "i", "j")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("n_dupe_keys"))
    )
    return dupes.select(
        *_row("grid_duplicates", "n_dupe_keys", F.col("n_dupe_keys"), F.col("n_dupe_keys") == 0)
    )


def grid_null_rate(grid: DataFrame, max_null_rate: float = 0.10) -> DataFrame:
    rate = grid.agg(
        (F.count(F.when(F.col("value").isNull(), 1)) / F.count("*")).alias("r")
    )
    return rate.select(
        *_row("grid_null_rate", "null_rate", F.col("r"), F.col("r") <= max_null_rate)
    )


def weights_qa(weights: DataFrame, lo: float = 0.8, hi: float = 1.0 + 1e-9) -> DataFrame:
    """A6: per-feature Σw within the measured envelope of the real weights
    file (BASELINE.md: min 0.8209, max 1.0)."""
    sums = weights.groupBy("feature_id").agg(F.sum("wght").alias("s"))
    agg = sums.agg(
        F.min("s").alias("mn"),
        F.max("s").alias("mx"),
        F.count(F.when((F.col("s") < lo) | (F.col("s") > hi), 1)).alias("bad"),
    )
    return agg.select(
        *_row("weights_sum_min", "min_weight_sum", F.col("mn"), F.col("mn") >= lo)
    ).unionByName(
        agg.select(*_row("weights_sum_max", "max_weight_sum", F.col("mx"), F.col("mx") <= hi))
    ).unionByName(
        agg.select(*_row("weights_out_of_range", "n_features", F.col("bad"), F.col("bad") == 0))
    )


def output_completeness(output: DataFrame, n_features: int, n_times: int) -> DataFrame:
    """Post-fill invariant: |output| == features × timesteps."""
    c = output.agg(F.count("*").alias("n"))
    return c.select(
        *_row(
            "output_completeness",
            "n_rows",
            F.col("n"),
            F.col("n") == F.lit(n_features * n_times),
        )
    )


def qa_report(
    grid: DataFrame | None = None,
    weights: DataFrame | None = None,
    output: DataFrame | None = None,
    n_features: int | None = None,
    n_times: int | None = None,
) -> DataFrame:
    parts = []
    if grid is not None:
        parts += [grid_duplicates(grid), grid_null_rate(grid)]
    if weights is not None:
        parts.append(weights_qa(weights))
    if output is not None and n_features and n_times:
        parts.append(output_completeness(output, n_features, n_times))
    if not parts:
        raise ValueError("nothing to check")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
