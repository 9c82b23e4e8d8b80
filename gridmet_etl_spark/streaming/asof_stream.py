"""Streaming as-of enrichment: the stream-static twin of
``operators.asof.asof_join``. Left events arrive as a stream; every
micro-batch is as-of joined (backward or forward, optional tolerance)
against a STATIC right table — the feature-store label-join shape at
ingest time ("annotate each event with the latest reference row at or
before it" — price marks, model versions, config snapshots).

Why foreachBatch and not a stateful operator: the right side is a static
snapshot, so the verdict is a pure function of (batch row, right table) —
NO cross-batch state, and at-least-once replays are byte-idempotent with
the dynamic ``_batch_id=`` partition overwrite (the manifest_sink /
line_stream / leakage_stream discipline). A genuinely streaming right
side would be a stream-stream interval join (Spark supports it with
watermarks) — but that changes semantics to windowed, not as-of; the
static-snapshot form is what batch parity can certify exactly.

Scale shape per batch: the as-of composition shuffles |batch| + |right|
rows once on the join key. When the right table is dimension-sized it
broadcasts; a fact-sized right side should be pre-bucketed by key. The
stream's payload columns ride the one exchange — nothing else moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.asof import asof_join

__all__ = ["streaming_asof_enrich"]


def streaming_asof_enrich(
    left_stream: DataFrame,
    right_static: DataFrame,
    out_dir: str,
    checkpoint: str,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
):
    """Start the enrichment; returns the StreamingQuery. Each output row
    is the batch-operator ``asof_join`` row plus ``_batch_id``; replaying
    a batch overwrites its own partition only."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        enriched = asof_join(
            batch_df,
            right_static,
            on=on,
            left_ts=left_ts,
            right_ts=right_ts,
            direction=direction,
            tolerance_seconds=tolerance_seconds,
        ).withColumn("_batch_id", F.lit(batch_id))
        (
            enriched.write.mode("overwrite")
            .partitionBy("_batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )

    return (
        left_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
