"""Streaming KMV theta sketch: per-group distinct-count sketches (with
set algebra at read time) maintained across micro-batches in O(k) state
per group — the streaming "how many distinct users/keys per segment, and
how much do segments OVERLAP" answer, where exact streaming distinct
needs unbounded state.

KMV merging is a pure set operation — union the hash sets, keep the k
smallest — so unlike the Misra-Gries fold the result is ORDER-INSENSITIVE:
the stream's final state equals ``operators.sketch.kmv_build`` over the
concatenated batches exactly (pytest-pinned in tests/test_round5c.py),
not just a fold-order-equivalent summary.

State layout (the heavy_hitters.py / line_stream.py discipline): each
batch REPLACES the sketch by writing it under ``_batch_id=N`` partitions
of ``state_dir`` (dynamic partition overwrite) and reads the latest
partition with ``_batch_id < N`` — an at-least-once replay of batch N
re-reads the same predecessor state and deterministically rewrites its
own output, so re-delivery is byte-idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import KMV_K, kmv_hash

__all__ = ["streaming_kmv", "read_kmv_sketch"]


def _read_state(spark: SparkSession, state_dir: str, before_batch: int):
    from pyspark.errors import AnalysisException

    try:
        st = spark.read.parquet(state_dir).filter(F.col("_batch_id") < before_batch)
    except AnalysisException:
        return None
    prev = st.agg(F.max("_batch_id").alias("b")).first()["b"]
    if prev is None:
        return None
    return st.filter(F.col("_batch_id") == prev)


def streaming_kmv(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    key_col: str,
    group_cols: list[str],
    k: int = KMV_K,
):
    """Start the stream; returns the StreamingQuery. State rows:
    (*group_cols, h, rn, _batch_id) — ≤ k rows per group, forever."""
    from pyspark.sql.window import Window

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fresh = batch_df.select(
            *group_cols, kmv_hash(F.col(key_col)).alias("h")
        ).distinct()
        prev = _read_state(spark, state_dir, batch_id)
        merged = (
            fresh
            if prev is None
            else fresh.unionByName(prev.select(*group_cols, "h")).distinct()
        )
        w = Window.partitionBy(*group_cols).orderBy("h")
        sk = merged.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= k
        )
        (
            sk.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("_batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(state_dir)
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_kmv_sketch(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest sketch in ``kmv_build``'s schema (*group_cols, h, rn) —
    feed straight into ``kmv_estimate`` / ``kmv_set_ops``."""
    st = spark.read.parquet(state_dir)
    latest = st.agg(F.max("_batch_id").alias("b"))
    cur = st.join(F.broadcast(latest), st["_batch_id"] == F.col("b"))
    return cur.drop("_batch_id", "b")
