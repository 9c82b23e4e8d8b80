"""Streaming corpus-wide LINE dedup: the incremental twin of
``operators.dedup.line_dedup`` (C4/RefinedWeb boilerplate removal). Docs
land as parquet files; each micro-batch splits them into lines, keeps only
lines whose exact text was never admitted before (earlier batch, or
earlier (doc_id, line_no) within this batch), reassembles the documents
from surviving lines, and appends them to the output manifest.

Cross-batch state is a parquet directory of admitted line DIGESTS (32 B
per distinct line ever kept — not line text, the corpus_stream.py
discipline): each batch left-anti joins its within-batch winners against
the seen-set, then writes its own kept digests under ``_batch_id=``
partitions with dynamic overwrite, so an at-least-once replay overwrites
exactly its own output and the history read excludes the current batch's
partition.

Semantics across batches are FIRST-ARRIVED-wins per line. When batches
arrive in (doc_id) order this equals the batch operator's
first-(doc_id, line_no)-occurrence rule EXACTLY (pytest-pinned:
stream == batch row-for-row, any split size); out-of-order arrival keeps
the earlier-arrived copy instead — the streaming-native policy.

Scale shape per batch: one digest-keyed window over the batch's duplicate
runs, one anti join that shuffles ONLY the batch side (the seen-set is a
32 B/line column scan, bucketable by digest), one doc-keyed reassembly agg
— line text never joins the history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import split_lines

__all__ = ["incremental_line_dedup"]


def _read_seen(spark: SparkSession, seen_dir: str) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(seen_dir)
    except AnalysisException:
        return None


def incremental_line_dedup(
    stream: DataFrame,
    out_dir: str,
    seen_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
):
    """Start the stream; returns the StreamingQuery. Appends
    (doc_id, n_lines, n_kept, text) to ``out_dir`` and kept line digests
    to ``seen_dir``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        lines = split_lines(batch_df, text_col, id_col, delim).cache()
        keyed = lines.select(
            F.col(id_col), "line_no", F.md5(F.col("line")).alias("_d")
        )
        w = Window.partitionBy("_d").orderBy(F.col(id_col), F.col("line_no"))
        winners = keyed.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") == 1
        )
        seen = _read_seen(spark, seen_dir)
        if seen is not None:
            winners = winners.join(
                seen.filter(F.col("_batch_id") != batch_id).select("_d"),
                "_d",
                "left_anti",
            )
        winners = winners.cache()
        kept = lines.join(
            winners.select(id_col, "line_no"), [id_col, "line_no"]
        )
        per_doc = kept.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("line_no"), F.col("line")))
                    ),
                    lambda s: s["line"],
                ),
                delim,
            ).alias("text"),
        )
        totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
        out = totals.join(per_doc, id_col, "left").select(
            id_col,
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text", F.lit("")).alias("text"),
            F.lit(batch_id).alias("_batch_id"),
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )
        (
            winners.select("_d", F.lit(batch_id).alias("_batch_id"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(seen_dir)
        )
        winners.unpersist()
        lines.unpersist()

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
