"""Range (interval-containment) join — events into time intervals.

Spark's naive `a.ts BETWEEN b.start AND b.end` join is a broadcast
nested-loop (or cartesian) — quadratic at scale. The engine's
``range_join`` buckets both sides by a time granule: each interval explodes
into the granules it spans, each point maps to one granule, and the join
becomes an equi-join on (key, granule) followed by the exact BETWEEN
predicate. Cost tracks Σ interval-spans/granule instead of |points| ×
|intervals|.

Granule choice: ≈ median interval length. Too fine → interval explosion;
too coarse → post-filter discards more candidates. Both extremes stay
correct (the exact predicate always applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | None = None,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    granule_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts <= end`` (optionally also equi-matching ``on``).

    Output: point columns + interval columns. ``how`` ∈ inner|left
    (left keeps unmatched points with null interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    g = F.lit(granule_seconds)
    p = points.withColumn("_g", (F.col(point_ts).cast("long") / g).cast("long"))
    iv = intervals.withColumn(
        "_g",
        F.explode(
            F.sequence(
                (F.col(start_col).cast("long") / g).cast("long"),
                (F.col(end_col).cast("long") / g).cast("long"),
            )
        ),
    )
    keys = ["_g"] if on is None else ["_g", on]
    matched = p.join(iv, keys, "inner").filter(
        F.col(point_ts).between(F.col(start_col), F.col(end_col))
    )
    if how == "inner":
        return matched.drop("_g")
    # left: re-attach points that matched no interval. The anti join must be
    # NULL-SAFE on every point column — plain equality would keep a matched
    # row containing any NULL as "unmatched" too (NULL = NULL is NULL) and
    # emit it twice.
    matched_points = matched.select(*[F.col(c).alias(f"_m_{c}") for c in p.columns]).distinct()
    anti_cond = None
    for c in p.columns:
        eq = p[c].eqNullSafe(F.col(f"_m_{c}"))
        anti_cond = eq if anti_cond is None else anti_cond & eq
    unmatched = p.join(matched_points, anti_cond, "left_anti")
    for c in intervals.columns:
        if c != on:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.drop("_g").unionByName(unmatched.drop("_g"))


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | None = None,
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
    granule_seconds: int = 3600,
) -> DataFrame:
    """Interval×interval OVERLAP join (half-open semantics:
    ``l_start < r_end AND r_start < l_end``) — sessions × campaign windows,
    maintenance × outage reconciliation, genomic-range intersection.

    Same granule-bucketing strategy as ``range_join``, applied to BOTH
    sides: each interval explodes into the granules it spans, candidates
    meet on (key, granule) as an equi-join, the exact overlap predicate
    filters, and duplicates from multi-granule overlaps collapse via the
    granule-equality trick: a candidate pair is kept only on the FIRST
    granule both intervals share (greatest of the two start-granules), so
    no distinct/shuffle is needed for dedup. Cost tracks
    Σ spans/granule, never |left| × |right|.
    """
    g = F.lit(granule_seconds)

    def _secs(c: str):
        # TIMESTAMP_NTZ has no direct long cast; routing through timestamp
        # applies the session offset UNIFORMLY to both sides, which cannot
        # break candidate generation (pairs shift into the same granules)
        # and the exact overlap predicate below compares original values
        return F.col(c).cast("timestamp").cast("long")

    def _granules(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_g",
            F.explode(
                F.sequence((_secs(s) / g).cast("long"), (_secs(e) / g).cast("long"))
            ),
        ).withColumn("_sg", (_secs(s) / g).cast("long"))

    lg = _granules(left, l_start, l_end)
    rg = _granules(right, r_start, r_end).withColumnRenamed("_sg", "_rsg")
    keys = ["_g"] if on is None else ["_g", on]
    return (
        lg.join(rg, keys, "inner")
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            # first-shared-granule gate: emit each overlapping pair exactly
            # once without a distinct
            & (F.col("_g") == F.greatest(F.col("_sg"), F.col("_rsg")))
        )
        .drop("_g", "_sg", "_rsg")
    )
