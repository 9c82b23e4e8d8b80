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


def abc_classification(
    df: DataFrame,
    key_col: str,
    value_col: str,
    a_pct: int = 80,
    b_pct: int = 95,
) -> DataFrame:
    """ABC / Pareto classification: rank keys by integer value descending
    and cut classes at cumulative-share thresholds (A ≤ a_pct%, B ≤
    b_pct%, C rest) — the inventory-analysis readout ("which 20% of parts
    carry 80% of revenue").

    Determinism: ordering is the TOTAL order (value DESC, key); class
    membership is decided by the EXACT integer comparison cum·100 ≤
    pct·total (no share double ever classifies); shares are display-only.

    Scale shape: one groupBy on the key, one global cumulative window —
    over the |keys| relation, not the fact table (acceptable when keys
    are catalog-sized; a near-continuous key needs the two-level prefix).
    Output (3 rows): (abc_class, n_keys, value_sum, value_share)."""
    from pyspark.sql import Window

    per = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.sum(F.col(value_col).cast("decimal(38,0)")).alias("_v")
    )
    w = Window.orderBy(F.col("_v").desc(), F.col("_k")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per.select(
        "_k", "_v", F.sum("_v").over(w).alias("_cum")
    )
    tot = per.agg(F.sum("_v").alias("_tot"))
    classed = cum.crossJoin(F.broadcast(tot)).select(
        "_k",
        "_v",
        F.when(F.col("_cum") * 100 <= F.col("_tot") * a_pct, F.lit("A"))
        .when(F.col("_cum") * 100 <= F.col("_tot") * b_pct, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        F.col("_tot"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_v").cast("decimal(38,0)").cast("double").alias("value_sum"),
        (
            F.round(
                F.sum("_v").cast("double") / F.min("_tot").cast("double"), 6
            )
            + F.lit(0.0)
        ).alias("value_share"),
    )


def herfindahl(
    df: DataFrame,
    group_cols: Sequence[str],
    member_col: str,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per group: HHI =
    Σ_members (share_i)² ∈ (0, 1] — the market-concentration scalar
    (1/HHI is the "effective number of members"). Input values must be
    integer-quantized.

    Determinism: per-member sums and Σv_i² accumulate DECIMAL(38,0)
    exactly; HHI = Σv_i²/(Σv_i)² is one double division of exact
    decimals. Two partial-agg shuffles (member grain then group grain).

    Output per group: (group_cols..., n_members, hhi, effective_n,
    top_share)."""
    gp = list(group_cols)
    per = df.groupBy(*gp, F.col(member_col).alias("_m")).agg(
        F.sum(F.col(value_col).cast("decimal(38,0)")).alias("_v")
    )
    acc = per.groupBy(*gp).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("_v").alias("_s"),
        F.sum(F.col("_v") * F.col("_v")).alias("_q"),
        F.max("_v").alias("_mx"),
    )
    s = F.col("_s").cast("double")
    zero = F.col("_s") == 0  # all-zero group: 0/0 would poison with NaN
    hhi = F.when(zero, F.lit(0.0)).otherwise(
        F.col("_q").cast("double") / (s * s)
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        *gp,
        F.col("n_members"),
        rnd(hhi).alias("hhi"),
        rnd(F.when(zero, F.lit(0.0)).otherwise(F.lit(1.0) / hhi)).alias(
            "effective_n"
        ),
        rnd(
            F.when(zero, F.lit(0.0)).otherwise(
                F.col("_mx").cast("double") / s
            )
        ).alias("top_share"),
    )
