"""Incremental aggregate maintenance: keep a per-key aggregate table fresh
by merging a small delta's partial state into the existing state instead of
re-scanning history (the materialized-view refresh pattern every daily
pipeline needs at 100 TB — the reference's daily incremental append,
gridmet_etl/etl.py run-date flow, is the 1-key special case of this).

The state is ALGEBRAIC: (count, sum, min, max) merge with (sum, sum, min,
max), and avg derives at read time as sum/count — so refresh cost is
O(|delta| + |state|) with no history re-scan, and the merge is one
union + keyed re-aggregation (a single output-sized shuffle; with both
sides bucketed on the key it is shuffle-free). Non-algebraic aggregates
(exact distinct) need a sketch instead — that path is ``sketch.py``'s
HLL rollup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("cnt", "total", "vmin", "vmax")


def agg_state(df: DataFrame, keys: Sequence[str], val_col: str) -> DataFrame:
    """Per-key algebraic state: (keys, cnt, total, vmin, vmax)."""
    return df.groupBy(*keys).agg(
        F.count(val_col).alias("cnt"),
        F.sum(val_col).alias("total"),
        F.min(val_col).alias("vmin"),
        F.max(val_col).alias("vmax"),
    )


def merge_states(state: DataFrame, delta_state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge two state tables: union → one keyed re-aggregation with the
    MERGE functions (sum/sum/min/max). Keys present in either side
    survive; the exchange is output-sized."""
    return (
        state.select(*keys, *STATE_COLS)
        .unionByName(delta_state.select(*keys, *STATE_COLS))
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("total").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )


def refresh(
    history: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    val_col: str,
) -> DataFrame:
    """One refresh cycle: state(history) ⊕ state(delta). In production the
    history state is a stored table and only ``agg_state(delta)`` runs;
    both paths produce identical rows (pinned by the full-recompute
    oracle)."""
    return merge_states(agg_state(history, keys, val_col), agg_state(delta, keys, val_col), keys)


def with_read_time_cols(state: DataFrame) -> DataFrame:
    """Derived (non-algebraic at write time) columns: avg = total/cnt."""
    return state.withColumn("vavg", F.col("total") / F.col("cnt"))
