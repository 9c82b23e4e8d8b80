"""Area-weighted aggregation — the engine core (SURVEY §2.4 J1, §2.5 A1/A2).

Reference semantics (the gdptools ``AggGen`` contract as configured at
/root/reference/gridmet_etl/etl.py:425-433 and :686-707):

- ``stat_method="mean"`` (A1): per (feature, time), Σ w·v / Σ w over ALL the
  feature's intersecting cells. NaN-intolerant — any missing cell poisons the
  result (NaN in → NaN out), because the denominator counts every weight.
- ``stat_method="masked_mean"`` (A2, the ``--partial`` path, etl.py:690):
  normalizes by Σ w over NON-NULL cells only, so partial coverage still
  yields a value; all-null groups yield NULL.

Spark-first design: the weights table is tiny relative to the grid fact
(27,971 rows vs billions of cells at production scale) → explicit
``broadcast`` hash join, so at 100 TB the join is map-side with zero shuffle
of the fact table; the single shuffle is the groupBy on
(feature_id, [ens,] time), which gets map-side partial aggregation for free.
Keeping ``ens`` in the group keys turns the reference's 48 sequential
per-member pipelines (E1 anti-pattern, etl.py:361-383) into one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _is_missing(v: Column, dtype: str) -> Column:
    """NULL — and, for float types, NaN — count as missing. Ingest paths
    normalize NaN→NULL by convention, but the aggregate must not depend on
    that: a NaN double is non-NULL to SQL and would silently pass an
    isNotNull mask and poison a masked mean."""
    if dtype in ("float", "double"):
        return v.isNull() | F.isnan(v)
    return v.isNull()


def weighted_mean(
    grid: DataFrame,
    weights: DataFrame,
    value_col: str = "value",
    extra_keys: tuple[str, ...] = (),
    masked: bool = False,
) -> DataFrame:
    """grid ⋈ broadcast(weights) on (i, j) → weighted mean per
    (feature_id, *extra_keys, time).

    Returns columns ``feature_id, *extra_keys, time, value`` (aliased
    ``value``). ``masked=False`` reproduces stat_method="mean" (NaN
    poisoning); ``masked=True`` reproduces "masked_mean".
    """
    joined = grid.join(F.broadcast(weights), on=["i", "j"], how="inner")
    keys = ["feature_id", *extra_keys, "time"]
    v, w = F.col(value_col), F.col("wght")
    missing = _is_missing(v, dict(grid.dtypes)[value_col])
    if masked:
        # normalize over non-missing cells only; all-missing → NULL (0/0)
        num = F.sum(F.when(~missing, w * v))
        den = F.sum(F.when(~missing, w))
    else:
        # strict mean: any missing cell must poison the group. SQL SUM skips
        # NULLs (and would propagate NaN), so poison explicitly to NULL.
        num = F.when(F.count(F.when(missing, F.lit(1))) > 0, F.lit(None)).otherwise(
            F.sum(w * v)
        )
        den = F.sum(w)
    return joined.groupBy(*keys).agg((num / den).alias("value"))


def weighted_mean_all_vars(
    grid: DataFrame,
    weights: DataFrame,
    variables: list[str] | None = None,
    masked: bool = False,
    with_ens: bool = False,
) -> DataFrame:
    """Long-form multi-variable weighted mean: one shuffle computes every
    variable (and every ensemble member when ``with_ens``) at once.

    Output: ``feature_id [, ens], time, var, value``.
    """
    if variables is not None:
        grid = grid.filter(F.col("var").isin(variables))  # P7 projection
    extra = ("ens", "var") if with_ens else ("var",)
    return weighted_mean(grid, weights, extra_keys=extra, masked=masked)


def weighted_mean_wide(
    grid: DataFrame,
    weights: DataFrame,
    variables: list[str],
    masked: bool = False,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Single-shuffle wide weighted mean: conditional aggregation computes
    every variable's weighted mean in ONE groupBy((feature_id, *extra_keys,
    time)) — versus the long-agg→pivot path, which shuffles twice
    (once on (…, var, time), once on (…, time)).

    At 100 TB this halves shuffle volume for the pipeline's dominant stage;
    semantics are identical to ``weighted_mean_all_vars`` + ``pivot_wide``
    (asserted by tests). Output: (feature_id, *extra_keys, time, <var>...).
    """
    joined = grid.filter(F.col("var").isin(variables)).join(
        F.broadcast(weights), on=["i", "j"], how="inner"
    )
    keys = ["feature_id", *extra_keys, "time"]
    w = F.col("wght")
    vmissing = _is_missing(F.col("value"), dict(grid.dtypes)["value"])
    aggs = []
    for var in variables:
        v = F.when(F.col("var") == var, F.col("value"))
        if masked:
            valid = (F.col("var") == var) & ~vmissing
            num = F.sum(F.when(valid, w * F.col("value")))
            den = F.sum(F.when(valid, w))
        else:
            num = F.when(
                F.count(F.when((F.col("var") == var) & vmissing, F.lit(1))) > 0,
                F.lit(None),
            ).otherwise(F.sum(F.when(F.col("var") == var, w * F.col("value"))))
            den = F.sum(F.when(F.col("var") == var, w))
        aggs.append((num / den).alias(var))
    return joined.groupBy(*keys).agg(*aggs)


def weight_sum_qa(weights: DataFrame) -> DataFrame:
    """QA invariant A6: per-feature Σw ∈ (0, 1 + 1e-9] (BASELINE.md measured
    bounds on the real weights file)."""
    return weights.groupBy("feature_id").agg(F.sum("wght").alias("wght_sum"))
