"""Streaming train→eval contamination gate: the incremental twin of
``operators.decontam.cross_split_leakage``. Eval documents arrive as a
stream; every micro-batch derives their 8-token line digests ROW-LOCALLY
and semi-joins them against a STATIC train digest set (built once from the
training corpus — stream-static joins are natively supported and
stateless), emitting per-document verdicts (contaminated / clean, with the
hit count) to an append sink.

Why a stream at all: benchmark sets and eval suites update continuously;
gating each incoming eval document AT INGEST — before it can reach an eval
store that training-data pipelines must never leak into — beats auditing
after the fact. The batch operator stays the corpus-wide report; this is
the admission check.

Scale shape per batch: digest derivation is a narrow projection (the
line_dedup expression); the semi join shuffles ONLY the batch's digest
rows when the train set is too big to broadcast (AQE picks broadcast when
it fits — 32 B/digest, so a 10⁹-line train corpus is a ~32 GB relation,
bucketable by digest). Document bodies never join anything. State: NONE
(the train set is a static table) — replays are idempotent because the
verdict is a pure function of (batch row, train set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_digests", "streaming_leakage_gate"]

_LINE_W = 8


def _line_digests(df: DataFrame, text_col: str, id_col: str, line_w: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"),
        F.split(F.col(text_col), " ").alias("_a"),
    ).select(
        "_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(_a), {line_w}),"
                f" st -> md5(array_join(slice(_a, st, {line_w}), ' ')))"
            )
        ).alias("d"),
    )


def train_digests(
    train: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_w: int = _LINE_W,
) -> DataFrame:
    """Distinct 8-token line digests of the training corpus — the static
    side of the gate. Persist it once (parquet, bucketed by ``d`` at
    scale); rebuilding per batch would rescan the corpus."""
    return _line_digests(train, text_col, id_col, line_w).select("d").distinct()


def streaming_leakage_gate(
    eval_stream: DataFrame,
    train_digest_table: DataFrame,
    out_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_w: int = _LINE_W,
):
    """Start the gate; returns the StreamingQuery. Writes one verdict row
    per eval document: (doc_id, n_digests, n_hits, contaminated,
    _batch_id). foreachBatch form: the per-document rollup runs WITHIN
    each micro-batch (batch-local groupBy, no cross-batch state), and the
    dynamic ``_batch_id=`` partition overwrite makes at-least-once
    replays byte-idempotent — the manifest_sink/line_stream discipline."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        digests = _line_digests(batch_df, text_col, id_col, line_w)
        hits = digests.join(F.broadcast(train_digest_table), "d", "left_semi")
        per_doc = (
            digests.groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_digests"))
            .join(
                hits.groupBy("_id").agg(F.count(F.lit(1)).alias("n_hits")),
                "_id",
                "left",
            )
            .na.fill({"n_hits": 0})
            .select(
                F.col("_id").alias(id_col),
                "n_digests",
                "n_hits",
                (F.col("n_hits") > 0).alias("contaminated"),
                F.lit(batch_id).alias("_batch_id"),
            )
        )
        (
            per_doc.write.mode("overwrite")
            .partitionBy("_batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )

    return (
        eval_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
