"""As-of (point-in-time) join — a beyond-reference temporal operator the
training-data world leans on (feature stores, label joins: "the latest
right-side row at or before each left timestamp, per key").

Spark has no native ASOF JOIN; the engine composes one from a union + a
running last-non-null window — ONE shuffle keyed (key, ts), no range
explosion, no per-row subquery:

1. tag both sides, unionByName on (key, ts, side, payload)
2. window per key ordered by (ts, side-priority) with
   ``last(right_payload, ignorenulls=True)`` carrying the most recent right
   row forward
3. keep left rows, now annotated with their as-of match.

Tolerance (max staleness) is an optional post-filter. DuckDB's native
``ASOF JOIN`` is the oracle.

At scale: shuffle is |left| + |right| rows keyed by the join key — same
order as any sort-merge join, but produced in one exchange. HUB KEYS
(one bot user holding a double-digit share of all events — the common
real-world skew) would funnel that key's whole history through one
task's sort; ``bucket_seconds`` switches to a SEGMENT-AND-MERGE plan
(VERDICT r7 item 3): the running-carry window partitions by
(key, ts-bucket) — per-task work is rows-per-key-bucket, not
rows-per-key — and cross-bucket carry-in comes from a per-(key, bucket)
summary relation (≤ |buckets| rows per key) walked with the same
two-level prefix discipline as scale.py::global_rank. Identical output
to the unbucketed plan (property-tested), one extra bucket-summary
window + one co-partitioned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
    direction: str = "backward",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """For each left row: the single right row with the greatest
    ``right_ts`` ≤ ``left_ts`` (direction="backward"; "forward" mirrors to
    the smallest ≥), per ``on`` key. Right payload columns come back
    suffixed ``_right``; unmatched left rows keep nulls.

    ``bucket_seconds``: hub-key fallback — segment the per-key running
    carry into fixed time buckets and merge across buckets via a
    per-(key, bucket) summary (module docstring). Same result, bounded
    per-task state; pick a bucket so a hub key's densest bucket fits a
    task comfortably (e.g. 1 day for bot traffic at ~10⁶ events/day).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = [c for c in left.columns if c not in (on, left_ts)]
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    rtypes = dict(right.dtypes)

    # The whole right payload rides in ONE struct, so the carried match is
    # always a single right row — per-column last(ignorenulls) would
    # backfill a NULL payload field from an OLDER right row, fabricating a
    # composite row that never existed.
    rstruct_ddl = "struct<" + ",".join(
        [f"`{c}_right`:{rtypes[c]}" for c in rcols] + [f"`_rts`:{rtypes[right_ts]}"]
    ) + ">"
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_ddl).alias("_rrow"),
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        F.struct(
            *[F.col(c).alias(f"{c}_right") for c in rcols],
            F.col(right_ts).alias("_rts"),
        ).cast(rstruct_ddl).alias("_rrow"),
    )
    u = lt.unionByName(rt)

    if bucket_seconds is None:
        if direction == "backward":
            # right rows sort BEFORE a left row at the same ts (asof is
            # inclusive: ts_right <= ts_left), so order by (_ts, _is_left)
            w = (
                Window.partitionBy("_k")
                .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            )
        else:
            w = (
                Window.partitionBy("_k")
                .orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            )
        carried = u.select(
            "_k",
            "_ts",
            "_is_left",
            *lcols,
            F.last("_rrow", ignorenulls=True).over(w).alias("_m"),
        )
        matched = carried.filter(F.col("_is_left") == 1)
    else:
        # segment-and-merge (hub-key fallback): the running carry
        # partitions by (key, BUCKET) — per-task state is one key-bucket,
        # not one key's whole history — and the cross-bucket carry-in is
        # resolved on a per-(key, bucket) SUMMARY relation (bounded by
        # horizon/bucket_seconds rows per key, the only per-key-serial
        # walk left).
        tstype = rtypes[right_ts]
        if tstype.startswith(("timestamp", "date")):
            # micros ≤ ~1.7e15 ≪ 2^53: the double division floors exactly
            bexpr = F.floor(
                F.unix_micros(F.col("_ts").cast("timestamp"))
                / (bucket_seconds * 1_000_000)
            ).cast("long")
        else:
            bexpr = F.floor(F.col("_ts").cast("long") / bucket_seconds).cast(
                "long"
            )
        # _b is non-null BY CONSTRUCTION (null ts → the sentinel first/last
        # bucket, matching where NULLS FIRST/LAST puts a null ts in the
        # unbucketed window). Two birds: (1) the old plan silently DROPPED
        # null-ts left rows at the inner carry join (null keys never match)
        # where the unbucketed plan keeps them; (2) a nullable _b makes the
        # carry join infer isnotnull(_b) into the LEFT window subtree only
        # (on the carry side the Window blocks the pushdown), so the two
        # union subtrees canonicalize differently and AQE cannot reuse the
        # shared (key, bucket) exchange — provably-non-null _b folds that
        # inferred filter away and both consumers hang off ONE shuffle.
        ub = u.withColumn("_b", F.coalesce(bexpr, F.lit(-(1 << 62))))
        if direction == "backward":
            order = [F.col("_ts").asc(), F.col("_is_left").asc()]
            cross_order = F.col("_b").asc()
        else:
            order = [F.col("_ts").desc(), F.col("_is_left").asc()]
            cross_order = F.col("_b").desc()
        w_in = (
            Window.partitionBy("_k", "_b")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # r12 (guide §2.4): the per-bucket summary used to be a separate
        # max_by/min_by(_rrow, _ts) SortAggregate over the right rows plus
        # a distinct over (_k, _b) — two more data-sized exchanges (and a
        # struct-buffer SortAggregate) beyond the running-carry window.
        # Both fold into the ONE (key, bucket) window pass: over the whole
        # partition frame, last(_rrow, ignorenulls) in (ts, side) order IS
        # the bucket's latest right row (ignorenulls skips left rows' NULL
        # payloads; in the forward mirror the descending order makes it the
        # earliest), and a row_number()==1 representative stands in for the
        # distinct. The two window subtree consumers below share one
        # repartition exchange (AQE stage reuse).
        w_full = (
            Window.partitionBy("_k", "_b")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        w_rn = Window.partitionBy("_k", "_b").orderBy(*order)
        w_cross = (
            Window.partitionBy("_k")
            .orderBy(cross_order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carried_in = ub.select(
            "_k", "_b", "_ts", "_is_left", *lcols,
            F.last("_rrow", ignorenulls=True).over(w_in).alias("_m0"),
            F.last("_rrow", ignorenulls=True).over(w_full).alias("_bl"),
            F.row_number().over(w_rn).alias("_rn"),
        )
        # one representative row per (key, bucket) — every bucket present
        # on either side appears, so carry-in resolves for buckets with no
        # right rows too (their _bl is NULL, skipped by ignorenulls)
        carry = (
            carried_in.where(F.col("_rn") == 1)
            .select(
                "_k", "_b",
                F.last("_bl", ignorenulls=True).over(w_cross).alias("_cin"),
            )
        )
        matched = (
            carried_in.filter(F.col("_is_left") == 1)
            .join(carry, ["_k", "_b"])
            .select(
                "_k", "_ts", "_is_left", *lcols,
                F.coalesce(F.col("_m0"), F.col("_cin")).alias("_m"),
            )
        )

    out = matched.select(
        "_k",
        "_ts",
        *lcols,
        *[F.col("_m").getField(f"{c}_right").alias(f"{c}_right") for c in rcols],
        F.col("_m").getField("_rts").alias("_matched_ts"),
    )

    if tolerance_seconds is not None:
        # staleness in exact microseconds: TIMESTAMP_NTZ cannot cast to
        # BIGINT directly (and a plain long cast would be seconds anyway);
        # route timestamps/dates through unix_micros. Numeric ts columns
        # keep their native difference (interpreted as seconds).
        ltype = rtypes[right_ts]
        if ltype.startswith(("timestamp", "date")):
            diff = F.abs(
                F.unix_micros(F.col("_ts").cast("timestamp"))
                - F.unix_micros(F.col("_matched_ts").cast("timestamp"))
            )
            stale = diff > tolerance_seconds * 1_000_000
        else:
            stale = (
                F.abs(
                    F.col("_ts").cast("long") - F.col("_matched_ts").cast("long")
                )
                > tolerance_seconds
            )
        out = out.select(
            "_k",
            "_ts",
            *lcols,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}_right")).alias(f"{c}_right")
                for c in rcols
            ],
            F.when(stale, F.lit(None)).otherwise(F.col("_matched_ts")).alias("_matched_ts"),
        )
    return out.withColumnRenamed("_k", on).withColumnRenamed("_ts", left_ts).withColumnRenamed(
        "_matched_ts", f"{right_ts}_right"
    )
