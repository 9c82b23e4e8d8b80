"""Structured-Streaming surface (SURVEY §2.10).

The reference is pure batch; its operational patterns are (T1) a freshness
gate, (T2) daily incremental append, (T3) forecast-cycle reprocess. The
engine's batch pipelines cover those. This module adds the genuinely
streaming analogues a production deployment would run:

- ``stream_events``: file-source stream over an events directory.
- ``windowed_event_counts``: tumbling-window counts with a watermark for
  late data.
- ``streaming_dedup``: drop duplicate event_ids within the watermark
  horizon (idempotent ingestion).
- ``incremental_append`` (T2): batch writer with idempotent
  partition-overwrite semantics (`replaceWhere`-style via dynamic partition
  overwrite), the reference's daily-run equivalent.

All streaming queries use ``Trigger.AvailableNow`` in tests (bounded drain,
same code path as continuous operation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream (new parquet files under ``path`` are
    discovered per micro-batch)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window per-type rollup with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-id ingestion within the watermark horizon.

    Must be ``dropDuplicatesWithinWatermark``: plain
    ``dropDuplicates(["event_id"])`` never evicts state (watermark-based
    eviction only applies when the event-time column is in the subset), so
    a long-running stream keeps every id ever seen until executor OOM.
    The WithinWatermark variant keeps each id only for the watermark delay
    — bounded state, and the semantics the docstring promises."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)


def sessionize(events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization via
    ``applyInPandasWithState`` — sessions close after ``gap_minutes`` of
    inactivity (state timeout), emitting (user, start, end, n_events,
    sum_value).

    The reference has no stateful streaming (SURVEY §2.10); this is the
    engine's demonstration of the ``applyInPandasWithState`` escape hatch
    for semantics the built-in window/watermark operators can't express.
    State per key is O(1) (four scalars), so a 100 TB event stream costs
    |active users| × ~32 bytes of state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, sv = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [sv],
                }
            )
            return
        start_us = last_us = None
        n, sv = 0, 0.0
        if state.exists:
            start_us, last_us, n, sv = state.get
        closed = []
        # concatenate ALL chunks before sorting: a key spanning multiple
        # Arrow chunks may receive later-timestamped chunks first, and
        # per-chunk sorting would merge/misdate sessions
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values("ts")
            for ts, value in zip(batch["ts"], batch["value"]):
                us = int(pd.Timestamp(ts).value // 1000)
                if start_us is None:
                    start_us, last_us, n, sv = us, us, 0, 0.0
                elif us - last_us > gap_us:
                    closed.append((start_us, last_us, n, sv))
                    start_us, last_us, n, sv = us, us, 0, 0.0
                elif start_us - us > gap_us:
                    # late cross-batch event more than a gap BEFORE the open
                    # session: it can't belong to it — emit it as its own
                    # (already-closed) singleton session instead of silently
                    # folding it in
                    closed.append((us, us, 1, float(value) if value is not None else 0.0))
                    continue
                # a late event within the gap extends the session backward
                start_us = min(start_us, us)
                last_us = max(last_us, us)
                n += 1
                sv += float(value) if value is not None else 0.0
        if start_us is not None:  # guard: empty delivery with no prior state
            state.update((start_us, last_us, n, sv))
            # event-time timeout: the session closes when the WATERMARK
            # passes last_event + gap — correct semantics, and
            # bounded-drain friendly (AvailableNow's cleanup batch fires
            # these; a processing-time timeout would wall-clock-block it)
            state.setTimeoutTimestamp(last_us // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_available_now(stream_df: DataFrame, out_dir: str, checkpoint: str, mode: str = "append"):
    """Drain the stream with AvailableNow into parquet; returns the query
    after awaiting termination (test/bounded-batch helper)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def incremental_append(df: DataFrame, out_dir: str, partition_col: str = "day") -> None:
    """T2: idempotent daily append — dynamic partition overwrite so re-runs
    of a date window replace exactly the partitions they produce (the
    reference's one-file-per-run naming, done the Spark way)."""
    df.write.mode("overwrite").option("partitionOverwriteMode", "dynamic").partitionBy(
        partition_col
    ).parquet(out_dir)


def trending_topk(
    events: DataFrame,
    window: str = "6 hours",
    k: int = 3,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-window top-k event types by count — the 'trending now' rollup.

    Batch form: tumbling-window counts + per-window rank (count desc, type
    asc tie-break). The window partitions per time bucket, never globally;
    the count relation is |windows| × |types| — output-sized.

    Streaming form (``streaming_trending``): the SAME windowed count runs
    incrementally under a watermark; the rank is applied by the sink/
    consumer per completed window (complete-mode rank inside the stream
    would retract; emitting counts and ranking the tiny per-window
    relation downstream is the bounded-state design)."""
    from pyspark.sql import Window as W

    counts = events.groupBy(
        F.window(ts_col, window).alias("w"), F.col(type_col)
    ).agg(F.count("*").alias("n"))
    rank_w = W.partitionBy("w").orderBy(F.col("n").desc(), F.col(type_col))
    return (
        counts.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col),
            "n",
            "rank",
        )
    )


def streaming_trending(
    events_stream: DataFrame,
    window: str = "6 hours",
    watermark: str = "12 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of ``trending_topk``'s count stage: watermarked
    tumbling-window counts in update mode; state is |open windows| ×
    |types| and the watermark closes windows for eviction."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(type_col))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), F.col(type_col), "n")
    )
