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
    """Exactly-once-per-id ingestion within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


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
    (
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    df.write.mode("overwrite").partitionBy(partition_col).parquet(out_dir)
