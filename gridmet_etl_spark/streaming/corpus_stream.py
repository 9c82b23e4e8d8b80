"""Streaming corpus ingestion: documents land as parquet files in a
landing dir; each micro-batch is cleaned, fingerprinted, deduped against
ALL previously admitted documents, decontaminated against the benchmark
fingerprint set, split-assigned, and appended to the manifest — the
incremental twin of plans/corpus.py (which is the batch/backfill path).

Cross-batch dedup state is a parquet directory of admitted fingerprints
(not in-memory state): each batch left-anti joins its fingerprints against
the seen-set, then writes the survivors' fingerprints under its own
``_batch_id=`` partition (dynamic overwrite → an at-least-once replay of a
batch overwrites its own partitions, never duplicates). Re-delivered files
therefore drop out — ingestion is idempotent under re-publish AND under
mid-batch crash/restart. At scale the seen-set read is a
fingerprint-column scan (32 B/doc) and the anti join shuffles only the
batch side; bucketing the seen-set by fingerprint makes it a bucket-local
join.

Dedup semantics across batches are FIRST-ARRIVED-wins (the streaming-
native choice: an admitted doc is immutable). The batch corpus_pipeline
keeps the LOWEST id per fingerprint instead; the two agree exactly when
ids are arrival-ordered (the normal case for ingest ids), and diverge
when a lower-id duplicate arrives after its twin was admitted.

Shard packing deliberately stays OUT of the streaming path: token-budget
packing needs a global prefix sum over the final corpus order, so it runs
as the batch export step (pack_shards) over the admitted manifest.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.sampling import deterministic_split
from ..operators.textops import clean_text, token_count

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _read_seen(spark: SparkSession, seen_dir: str) -> DataFrame | None:
    """Read the seen-fingerprint set, returning None before the first batch
    has written it. Uses a Spark read attempt, not a driver-local
    os.path.exists — the dir may live on HDFS/S3."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(seen_dir)
    except AnalysisException:
        return None


def stream_documents(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


def incremental_corpus(
    stream: DataFrame,
    eval_fps: DataFrame | None,
    manifest_dir: str,
    seen_dir: str,
    checkpoint: str,
    weights: dict[str, float] | None = None,
):
    """Start the streaming ingestion; returns the StreamingQuery (caller
    awaits/stops). ``eval_fps`` is a (fp) DataFrame of benchmark
    fingerprints (built once via ``benchmark_fingerprints``); None skips
    decontamination. Appends (doc_id, n_tokens, split) to ``manifest_dir``
    and admitted fingerprints to ``seen_dir``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cleaned = batch_df.select(
            "doc_id",
            F.md5(F.lower(clean_text(F.col("text")))).alias("fp"),
            token_count(clean_text(F.col("text"))).cast("long").alias("n_tokens"),
        )
        # within-batch dedup (keep lowest id), then cross-batch anti join
        w = Window.partitionBy("fp").orderBy("doc_id")
        batch_kept = (
            cleaned.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # Idempotence: both outputs are partitioned by _batch_id and written
        # with DYNAMIC partition overwrite, so a replayed batch (foreachBatch
        # is at-least-once) overwrites exactly its own partitions instead of
        # appending duplicates. The seen-set read EXCLUDES the current
        # batch's partition — a half-written previous attempt of this very
        # batch must not anti-join its own docs away.
        seen = _read_seen(spark, seen_dir)
        if seen is not None:
            batch_kept = batch_kept.join(
                seen.filter(F.col("_batch_id") != batch_id).select("fp"),
                "fp",
                "left_anti",
            )
        if eval_fps is not None:
            batch_kept = batch_kept.join(F.broadcast(eval_fps), "fp", "left_anti")
        admitted = deterministic_split(batch_kept, weights).select(
            "doc_id", "fp", "n_tokens", "split"
        )
        # cache: admitted is written twice (manifest + seen-set); without it
        # the second write would recompute the anti joins after the first
        # write already changed seen_dir
        admitted = admitted.cache()
        (
            admitted.select("doc_id", "n_tokens", "split", F.lit(batch_id).alias("_batch_id"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(manifest_dir)
        )
        (
            admitted.select("fp", F.lit(batch_id).alias("_batch_id"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(seen_dir)
        )
        admitted.unpersist()

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def benchmark_fingerprints(eval_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Benchmark fingerprint set for decontamination (build once, tiny)."""
    return (
        eval_docs.select(F.md5(F.lower(clean_text(F.col(text_col)))).alias("fp")).distinct()
    )
