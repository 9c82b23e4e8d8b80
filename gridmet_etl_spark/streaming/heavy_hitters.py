"""Streaming heavy hitters: a Misra-Gries frequent-items summary
maintained across micro-batches — the 'which keys dominate this stream'
answer in O(capacity) state, where exact streaming counts would need a
counter per distinct key (unbounded at crawl scale).

Each micro-batch folds ``operators.sketch.mg_merge`` over (previous
summary, batch exact counts): pointwise sum, subtract the
(capacity+1)-th largest, keep positives. Guarantees carried in a 1-row
meta relation (n_total, deducted = Σ subtractions): every kept counter
underestimates by at most ``deducted`` ≤ n/(capacity+1), and any key with
true count > deducted is guaranteed present. The batch twin is
``mg_fold`` — identical merges in batch order, so stream == batch when
micro-batches match the fold's slices (pytest-pinned in
tests/test_round5b.py).

State layout (the line_stream.py discipline): each batch REPLACES the
summary by writing it under ``_batch_id=N`` partitions of ``state_dir``
(dynamic partition overwrite), and reads the latest partition with
``_batch_id < N`` — so an at-least-once replay of batch N re-reads the
same predecessor state and overwrites exactly its own output
(deterministic merge ⇒ byte-identical rewrite). Old partitions are
retention, not correctness (compact with a manifest-style TTL sweep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import mg_counts, mg_merge

__all__ = ["streaming_heavy_hitters", "read_heavy_hitters"]


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


def streaming_heavy_hitters(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    key_col: str,
    capacity: int = 64,
):
    """Start the stream; returns the StreamingQuery. State rows:
    (key, cnt, is_meta, n_total, deducted, _batch_id) — the summary plus
    one meta row (key NULL) carrying the error-bound accumulators."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        prev = _read_state(spark, state_dir, batch_id)
        prev_summary = None
        prev_n, prev_ded = 0, 0
        if prev is not None:
            prev = prev.cache()
            prev_summary = prev.filter(~F.col("is_meta")).select("key", "cnt")
            meta = prev.filter(F.col("is_meta")).select("n_total", "deducted").first()
            prev_n, prev_ded = meta["n_total"], meta["deducted"]
        counts = mg_counts(batch_df, key_col)
        new_summary, s_rel = mg_merge(prev_summary, counts, capacity)
        batch_n = batch_df.count()
        s_val = s_rel.first()["s"]
        out = new_summary.select(
            "key",
            "cnt",
            F.lit(False).alias("is_meta"),
            F.lit(prev_n + batch_n).cast("long").alias("n_total"),
            F.lit(prev_ded + s_val).cast("long").alias("deducted"),
        ).unionByName(
            spark.range(1).select(
                F.lit(None).cast(new_summary.schema["key"].dataType).alias("key"),
                F.lit(None).cast("long").alias("cnt"),
                F.lit(True).alias("is_meta"),
                F.lit(prev_n + batch_n).cast("long").alias("n_total"),
                F.lit(prev_ded + s_val).cast("long").alias("deducted"),
            )
        )
        (
            out.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("_batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(state_dir)
        )
        if prev is not None:
            prev.unpersist()

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_heavy_hitters(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest summary in ``mg_fold``'s report schema:
    (key, est, est_hi, n_total, deducted)."""
    st = spark.read.parquet(state_dir)
    latest = st.agg(F.max("_batch_id").alias("b"))
    cur = st.join(F.broadcast(latest), st["_batch_id"] == F.col("b"))
    return cur.filter(~F.col("is_meta")).select(
        "key",
        F.col("cnt").alias("est"),
        (F.col("cnt") + F.col("deducted")).alias("est_hi"),
        "n_total",
        "deducted",
    )
