"""Incremental NEAR-duplicate detection over a document stream: the
streaming twin of ``dedup.minhash_lsh_candidates``. Exact-fingerprint
streaming dedup (corpus_stream.py) misses edited re-posts; this catches
them by accumulating MinHash BAND KEYS as the cross-batch state.

Per micro-batch (foreachBatch):

  1. band keys for the batch docs (row-local signature minima — the same
     ``minhash_bands`` derivation as the batch operator, so a doc gets
     IDENTICAL keys whether it arrives in batch 0 or batch 40);
  2. flag decision = batch-side LEFT SEMI join against history band keys
     PLUS a per-bucket min-id comparison within the batch — a doc is
     flagged iff it shares ≥1 band with any earlier admitted doc (earlier
     batch, or same batch with lower id). Both stages are bucket-LINEAR:
     no pair relation is ever materialized, so hub band keys (the
     quadratic blowup the batch ``minhash_lsh_star`` exists for) cost
     one probe per batch band row;
  3. flagged/admitted decisions appended to ``flags_dir``; the batch's
     band keys appended to ``bands_dir`` (the state).

State shape: |docs| × n_bands rows of (band, band_key, doc_id) —
sketch-sized, independent of document length. The history join is
band-key-keyed (equi join, near-uniform 128-bit keys); at 100 TB the
bands relation is partitioned/bucketed by (band, band_key) so each batch
probes, never re-shuffles, the accumulated state.

Idempotence: both sinks are partitioned by ``_batch_id`` with dynamic
partition overwrite, and the history read excludes the current batch's
partition — an at-least-once replay overwrites exactly its own output
(the corpus_stream.py discipline).

Batch-equivalence (tested): with ``state="all"`` (default), streaming the
corpus in any batch split in doc_id order yields exactly the docs that
``minhash_lsh_candidates`` (batch) pairs with a lower-id partner —
flagged(d) ⇔ ∃ pair (a, d), a<d. The ``state="canonical"`` variant stores
only unflagged docs' bands (smaller state, greedy first-wins clustering:
a doc similar ONLY to an already-flagged doc is admitted) — a different,
also-legitimate dedup policy; pick it when state size dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import N_MINHASH_SEEDS, ROWS_PER_BAND, minhash_bands

__all__ = ["incremental_neardup"]


def _read_state(spark: SparkSession, bands_dir: str) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(bands_dir)
    except AnalysisException:
        return None


def incremental_neardup(
    stream: DataFrame,
    flags_dir: str,
    bands_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_seeds: int = N_MINHASH_SEEDS,
    rows_per_band: int = ROWS_PER_BAND,
    hash_fn: str = "xxhash64",
    state: str = "all",
):
    """Start the stream; returns the StreamingQuery. Appends
    (doc_id, is_neardup) to ``flags_dir`` and band keys to ``bands_dir``
    (every doc's with ``state="all"`` — exact batch parity; only admitted
    docs' with ``state="canonical"`` — greedy, smaller state)."""
    if state not in ("all", "canonical"):
        raise ValueError(f"state must be 'all' or 'canonical', got {state!r}")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        bands = minhash_bands(
            batch_df, text_col, id_col, k, n_seeds, rows_per_band, hash_fn
        ).select(F.col(id_col).alias("doc_id"), "band", "band_key")
        bands = bands.cache()
        history = _read_state(spark, bands_dir)
        # vs earlier batches (exclude own partition for replay safety).
        # LEFT SEMI, not inner: flagging needs EXISTS, and an inner join
        # is quadratic in bucket size — a hub band key with 10⁶ history
        # members would fan every batch hit out a million-fold before the
        # distinct (the batch minhash_lsh_star lesson, streaming form)
        if history is not None:
            hist_hit = (
                bands.join(
                    history.where(F.col("_batch_id") != batch_id)
                    .select("band", "band_key"),
                    ["band", "band_key"],
                    "left_semi",
                )
                .select("doc_id")
                .distinct()
            )
        else:
            hist_hit = spark.createDataFrame([], "doc_id long")
        # within-batch: lower id wins, higher id is the near-dup — join
        # the |buckets|-row per-bucket MIN relation instead of the
        # quadratic self-join (doc is a dup iff its bucket's min id is
        # lower; identical flags, bucket-LINEAR cost)
        mins = bands.groupBy("band", "band_key").agg(
            F.min("doc_id").alias("_m")
        )
        self_hit = (
            bands.join(mins, ["band", "band_key"])
            .where(F.col("doc_id") > F.col("_m"))
            .select("doc_id")
            .distinct()
        )
        dup_ids = hist_hit.union(self_hit).distinct().cache()
        flags = (
            batch_df.select(F.col(id_col).alias("doc_id"))
            .join(dup_ids.withColumn("is_neardup", F.lit(True)), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("is_neardup"), F.lit(False)).alias("is_neardup"),
                F.lit(batch_id).alias("_batch_id"),
            )
        )
        (
            flags.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(flags_dir)
        )
        state_bands = (
            bands.join(dup_ids, "doc_id", "left_anti")
            if state == "canonical"
            else bands
        ).select("doc_id", "band", "band_key", F.lit(batch_id).alias("_batch_id"))
        (
            state_bands.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(bands_dir)
        )
        dup_ids.unpersist()
        bands.unpersist()

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
