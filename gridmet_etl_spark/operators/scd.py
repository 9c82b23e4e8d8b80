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
