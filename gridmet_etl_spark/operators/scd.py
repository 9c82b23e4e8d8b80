"""Slowly-changing-dimension (type 2) history build from an event/CDC log.

Extension surface (no reference counterpart): the standard warehouse shape
for turning a change log into a versioned dimension — each (key, attribute)
run becomes one row with ``[valid_from, valid_to)`` and an ``is_current``
flag.

Scale shape: ONE shuffle keyed by the dimension key (the window partition);
within each key the log is sorted by time and the run-length compression is
a lag/lead scan — no self-joins, no global windows. At 100 TB of change
log the shuffle carries (key, ts, attr) triples only; payload columns can
be re-attached by key afterwards. Per-key history fits an executor by
construction (a single business key's change count is bounded).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_col: str,
    ts_col: str,
) -> DataFrame:
    """Compress a change log into SCD2 intervals.

    For each key (ordered by ``ts_col``), consecutive rows with the same
    ``attr_col`` value collapse into one interval; a change opens a new
    one. Output: ``(*key_cols, attr_col, valid_from, valid_to,
    is_current)`` where ``valid_to`` is NULL on the open (current) row.
    Ties on ``ts_col`` are broken by the attribute value so the history is
    deterministic on replayed logs."""
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(attr_col))
    changed = df.select(*key_cols, ts_col, attr_col).withColumn(
        "_prev", F.lag(attr_col).over(w)
    ).where(
        F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
    )
    # changed now has one row per run start; valid_to = next run's start
    w2 = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(attr_col))
    return (
        changed.withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(
            *key_cols,
            attr_col,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def cdc_apply(
    snapshot: DataFrame,
    changelog: DataFrame,
    key_cols: Sequence[str],
    val_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an ordered change log to a snapshot — the materialize step of
    every CDC/lakehouse ingest (Debezium → table): per key, the HIGHEST
    ``seq_col`` change wins; op 'D' deletes the key, 'I'/'U' upsert the
    payload; keys never touched by the log pass through unchanged.

    Scale shape: the log first collapses to one winner row per key with
    ``max_by`` — a single key-partial-agg shuffle carrying |changed keys|
    rows (NOT a window sort over the full log). The snapshot then joins
    that winner relation full-outer on the key; with a 100 TB snapshot and
    a small daily delta the winner side broadcasts and the snapshot never
    shuffles. Output column set = (*key_cols, *val_cols).
    """
    keys = list(key_cols)
    vals = list(val_cols)
    winner = changelog.groupBy(*keys).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("_op"), *[F.col(v).alias(v) for v in vals]),
            F.col(seq_col),
        ).alias("_w")
    )
    snap = snapshot.select(*keys, *[F.col(v).alias(f"_s_{v}") for v in vals])
    joined = snap.join(winner, keys, "full_outer")
    alive = joined.where(
        F.col("_w").isNull() | (F.col("_w._op") != F.lit("D"))
    )
    out_vals = [
        F.when(F.col("_w").isNotNull(), F.col(f"_w.{v}"))
        .otherwise(F.col(f"_s_{v}"))
        .alias(v)
        for v in vals
    ]
    return alive.select(*keys, *out_vals)
