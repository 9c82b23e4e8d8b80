"""Training-sequence packing and token-budget allocation — the two
bookkeeping operators between a curated corpus and a training run.

``sequence_packing`` answers "what do my fixed-length training sequences
look like if I concatenate this corpus shard-by-shard and chunk at the
context length" (the GPT-style concat-and-chunk loader): how many
documents touch each pack, how many straddle a boundary, how full the
tail pack is. It is pure integer window arithmetic — no UDF, no data
movement beyond one shard-partitioned window.

``largest_remainder_alloc`` turns fractional mixture weights into INTEGER
per-source document/token quotas that sum exactly to the budget (Hamilton
/ largest-remainder apportionment — the standard way to avoid the
floor-everything shortfall and the round-everything overshoot).

Scale notes: packing is inherently sequential WITHIN a shard (pack ids
depend on every preceding document), so the shard is the parallelism
unit — at 100 TB you size shards like output files (the window is
shard-partitioned, never global). Allocation runs on a |sources|-row
relation.

Reference parity: engine-extension surface (the reference is a fixed
two-pipeline ETL, SURVEY §3); oracles are the contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sequence_packing", "largest_remainder_alloc"]


def sequence_packing(
    docs: DataFrame,
    budget: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing report per (shard, pack): documents are
    laid end-to-end in ``id_col`` order within each shard (whitespace
    token counts), then chunked into ``budget``-token packs. A document
    occupying token span [start, end) touches packs start//B ..
    (end-1)//B; its per-pack contribution is the span overlap — exact
    integers throughout.

    Output: (shard, pack_id, n_docs, n_boundary_docs, n_tokens,
    n_docs_started) — n_tokens == budget for every pack but a shard's
    last; n_boundary_docs counts documents split across either edge of
    this pack.

    Scale shape: one shard-partitioned cumulative window (the shard is
    the parallelism unit — size shards like output files), then a bounded
    explode: a document expands to ceil(len/B)+1 ≤ few rows, and the
    final rollup is an output-sized (shard, pack) partial agg."""
    b = F.lit(budget)
    base = docs.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("_n"),
    ).where(F.col("_n") > 0)
    w = Window.partitionBy("shard").orderBy("_id")
    spans = base.select(
        "shard",
        "_id",
        "_n",
        (
            F.coalesce(
                F.sum("_n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
        ).alias("_start"),
    ).withColumn("_end", F.col("_start") + F.col("_n"))
    p0 = F.expr("_start div " + str(budget))
    p1 = F.expr("(_end - 1) div " + str(budget))
    exploded = spans.select(
        "shard",
        "_id",
        "_start",
        "_end",
        p0.alias("_p0"),
        p1.alias("_p1"),
        F.explode(F.sequence(p0, p1)).alias("pack_id"),
    )
    contrib = exploded.select(
        "shard",
        F.col("pack_id").cast("int").alias("pack_id"),
        (
            F.least(F.col("_end"), (F.col("pack_id") + 1) * b)
            - F.greatest(F.col("_start"), F.col("pack_id") * b)
        ).alias("_tok"),
        (F.col("_p1") > F.col("_p0")).cast("long").alias("_boundary"),
        (F.col("_p0") == F.col("pack_id")).cast("long").alias("_started"),
    )
    return contrib.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_boundary").cast("long").alias("n_boundary_docs"),
        F.sum("_tok").cast("long").alias("n_tokens"),
        F.sum("_started").cast("long").alias("n_docs_started"),
    )


def largest_remainder_alloc(
    weights: DataFrame,
    budget: int,
    key_cols: Sequence[str] = ("source",),
    weight_col: str = "weight",
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of an integer ``budget``
    across groups proportionally to ``weight_col``: base quota
    floor(budget·w/Σw), then the leftover seats go to the largest
    fractional remainders (ties broken by key order — deterministic).
    Σ alloc == budget exactly, every alloc ≥ its floor — the two
    invariants naive rounding breaks.

    Integer discipline: remainders are compared as EXACT integers
    (budget·w·Σw-denominator cross-multiples when weights are integers;
    callers pass integer weights — token or doc counts — so no float
    enters the ranking). Output: (*key_cols, weight, base_quota,
    remainder_rank, extra, alloc). |groups|-row relation throughout."""
    keys = [F.col(k) for k in key_cols]
    tot = weights.agg(F.sum(F.col(weight_col).cast("long")).alias("_tw"))
    based = (
        weights.crossJoin(F.broadcast(tot))
        .select(
            *keys,
            F.col(weight_col).cast("long").alias("weight"),
            F.expr(f"CAST({budget} AS BIGINT) * {weight_col} div _tw").alias(
                "base_quota"
            ),
            # exact integer remainder of budget*w / tw, in tw-ths
            (
                F.lit(budget).cast("long") * F.col(weight_col).cast("long")
                % F.col("_tw")
            ).alias("_rem"),
        )
    )
    short = based.agg(
        (F.lit(budget) - F.sum("base_quota")).cast("long").alias("_k")
    )
    w = Window.orderBy(F.col("_rem").desc(), *keys)  # |groups| rows — bounded
    ranked = based.withColumn(
        "remainder_rank", F.row_number().over(w).cast("int")
    )
    return (
        ranked.crossJoin(F.broadcast(short))
        .select(
            *keys,
            "weight",
            "base_quota",
            "remainder_rank",
            (F.col("remainder_rank") <= F.col("_k")).cast("long").alias("extra"),
            (F.col("base_quota") + (F.col("remainder_rank") <= F.col("_k")).cast("long")).alias(
                "alloc"
            ),
        )
    )


def truncation_report(
    docs: DataFrame,
    budget: int,
    shard_col: str = "source",
    text_col: str = "text",
    scale: int = 10_000,
) -> DataFrame:
    """What a truncate-at-context-length loader (the concat-and-chunk
    alternative) would cost, per shard: documents exceeding ``budget``
    tokens, and the tokens a hard truncation throws away — the numbers
    that decide packing vs truncation for a corpus. One counting agg over
    a narrow projection; exact scaled-integer rates.

    Output: (shard, n_docs, n_tokens, n_over_budget, over_e4,
    tokens_lost, lost_e4)."""
    n = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = docs.select(F.col(shard_col).alias("shard"), n.alias("_n"))
    agg = base.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n").alias("n_tokens"),
        F.sum((F.col("_n") > budget).cast("long")).alias("n_over_budget"),
        F.sum(F.greatest(F.col("_n") - budget, F.lit(0))).alias("tokens_lost"),
    )
    return agg.select(
        "shard",
        "n_docs",
        "n_tokens",
        "n_over_budget",
        F.expr(f"n_over_budget * {scale} div n_docs").alias("over_e4"),
        "tokens_lost",
        F.expr(f"tokens_lost * {scale} div n_tokens").alias("lost_e4"),
    )
