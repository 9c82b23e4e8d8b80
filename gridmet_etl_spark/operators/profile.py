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


def fd_strength(
    df: DataFrame,
    pairs: Sequence[tuple],
) -> DataFrame:
    """Approximate functional-dependency audit: for each candidate
    (determinant → dependent) column pair, the fraction of rows kept by
    the best per-determinant dependent value — 1.0 means the FD holds
    exactly (TANE/Metanome's g3 error, inverted). The profiling step
    that finds denormalization opportunities and dirty dimension keys
    before a 100 TB layout is chosen.

    Exactness: pure integer counts and one final division — no float
    ever aggregates. NULLs group as ordinary values in BOTH engines
    (SQL GROUP BY semantics), so a NULL dependent under one determinant
    counts like any other candidate value.

    Scale shape: per pair, ONE (det, dep) cell aggregation over the
    data (map-side partial), then |determinant-values|-sized relations;
    pairs share nothing but the scan, so Spark runs them as parallel
    jobs off one cached/columnar source.

    Output per pair: (determinant, dependent, n_det_values, n_rows,
    n_kept, strength, is_exact)."""
    outs = []
    for det, dep in pairs:
        cells = df.groupBy(
            F.col(det).alias("_a"), F.col(dep).alias("_b")
        ).agg(F.count(F.lit(1)).alias("_n"))
        per_det = cells.groupBy("_a").agg(
            F.max("_n").alias("_mx"), F.sum("_n").alias("_tot")
        )
        acc = per_det.agg(
            F.count(F.lit(1)).cast("long").alias("n_det_values"),
            F.sum("_tot").cast("long").alias("n_rows"),
            F.sum("_mx").cast("long").alias("n_kept"),
        )
        outs.append(
            acc.select(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_det_values",
                "n_rows",
                "n_kept",
                (
                    F.round(
                        F.when(
                            F.col("n_rows") > 0,
                            F.col("n_kept").cast("double") / F.col("n_rows"),
                        ).otherwise(F.lit(0.0)),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("strength"),
                (F.col("n_kept") == F.col("n_rows")).alias("is_exact"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
