"""Stream-stream interval join (attribution): pair each left event with
the right-stream events of the same user that follow within a bounded
horizon — e.g. view → click attribution. The one major Structured
Streaming surface beyond aggregation/dedup/sessionization: a watermarked
stream-stream join, where BOTH sides buffer state and the time-range join
condition lets Spark evict it (without the range bound the state grows
forever).

The batch twin (``attribution_join``) is the same join on a static frame
— equi key on user plus the time-range predicate — and is what the DuckDB
oracle checks; the streaming form adds only the watermarks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lag_seconds(events: DataFrame, ts_col: str, l_col: str, r_col: str) -> Column:
    """Elapsed seconds from l to r, matching the arithmetic of the join's
    ``+ INTERVAL`` horizon so lag and horizon can never disagree.

    - TIMESTAMP (instant type): difference of epoch instants via
      ``unix_micros`` — timezone-independent, correct under a DST session
      zone. ``timestampdiff`` would NOT be: it differences the local-field
      representation, so across spring-forward a click 59 physical minutes
      after a view would join under a 60-minute horizon yet report a
      119-minute lag.
    - TIMESTAMP_NTZ (no instant): field arithmetic is the only semantics;
      ``timestampdiff`` and the NTZ ``+ INTERVAL`` predicate agree by
      construction.
    """
    if events.schema[ts_col].dataType.typeName() == "timestamp_ntz":
        return F.expr(f"timestampdiff(MICROSECOND, {l_col}, {r_col})") / 1_000_000.0
    return (F.unix_micros(F.col(r_col)) - F.unix_micros(F.col(l_col))) / 1_000_000.0


def attribution_join(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "click",
    within_minutes: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch attribution: (user, left event, right event) pairs where the
    right event follows the left within the horizon. Equi join on user +
    range predicate on time — Catalyst plans a hash/sort-merge join on the
    user key with the range as a post-filter; per-user event counts bound
    the pair fan-out. Output: (user_id, left_id, right_id, lag_seconds)."""
    l = events.filter(F.col("event_type") == left_type).select(
        F.col(user_col), F.col("event_id").alias("left_id"), F.col(ts_col).alias("l_ts")
    )
    r = events.filter(F.col("event_type") == right_type).select(
        F.col(user_col).alias("_ru"), F.col("event_id").alias("right_id"), F.col(ts_col).alias("r_ts")
    )
    return (
        l.join(
            r,
            (F.col(user_col) == F.col("_ru"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES")),
        )
        .select(
            user_col,
            "left_id",
            "right_id",
            _lag_seconds(events, ts_col, "l_ts", "r_ts").alias("lag_seconds"),
        )
    )


def attribution_join_outer(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "click",
    within_minutes: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """LEFT OUTER batch twin: every left event appears; unconverted ones
    carry NULL right_id/lag_seconds — the 'which views never got a click'
    question the inner join cannot answer. Same join shape, outer type."""
    l = events.filter(F.col("event_type") == left_type).select(
        F.col(user_col), F.col("event_id").alias("left_id"), F.col(ts_col).alias("l_ts")
    )
    r = events.filter(F.col("event_type") == right_type).select(
        F.col(user_col).alias("_ru"), F.col("event_id").alias("right_id"), F.col(ts_col).alias("r_ts")
    )
    return (
        l.join(
            r,
            (F.col(user_col) == F.col("_ru"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES")),
            "left_outer",
        )
        .select(
            user_col,
            "left_id",
            "right_id",
            _lag_seconds(events, ts_col, "l_ts", "r_ts").alias("lag_seconds"),
        )
    )


def streaming_attribution(
    events_stream: DataFrame,
    left_type: str = "view",
    right_type: str = "click",
    within_minutes: int = 10,
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join twin of ``attribution_join``. Both
    sides carry a watermark and the join condition bounds right-side time
    relative to left-side time, so Spark can evict buffered rows once the
    watermark passes their horizon — bounded state by construction.

    ``how="left_outer"`` is the other supported streaming join mode: a
    left row with no match is emitted WITH NULLs only once the watermark
    has passed its join horizon (Spark must prove no future right row can
    match before releasing it) — the streaming twin of
    ``attribution_join_outer``. The time-range bound is what makes the
    outer mode legal: without it unmatched rows could never be released.
    """
    l = (
        events_stream.filter(F.col("event_type") == left_type)
        .select(F.col(user_col), F.col("event_id").alias("left_id"), F.col(ts_col).alias("l_ts"))
        .withWatermark("l_ts", watermark)
    )
    r = (
        events_stream.filter(F.col("event_type") == right_type)
        .select(
            F.col(user_col).alias("_ru"),
            F.col("event_id").alias("right_id"),
            F.col(ts_col).alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    return (
        l.join(
            r,
            (F.col(user_col) == F.col("_ru"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES")),
            how,
        )
        .select(
            user_col,
            "left_id",
            "right_id",
            _lag_seconds(events_stream, ts_col, "l_ts", "r_ts").alias("lag_seconds"),
        )
    )
