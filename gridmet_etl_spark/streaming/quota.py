"""Per-source token-budget quota enforcement — the streaming form of
budgeted corpus sampling: each source (domain, crawl, tenant) may
contribute at most ``budget`` tokens to the training mix; documents that
arrive after the quota is exhausted are flagged (and can be dropped or
routed to an overflow tier).

Two twins, batch-equivalent by construction:

- ``quota_filter`` (batch): running token total per source in a
  deterministic order (``order_col``), keep = cumulative total ≤ budget.
  One window over the source partition — the shuffle is source-keyed, the
  frame is ROWS UNBOUNDED PRECEDING (streaming-friendly prefix sum; no
  second pass). SQL-expressible, so it carries a DuckDB oracle.

- ``streaming_quota`` (stream): ``applyInPandasWithState`` holding ONE
  bigint per source key (the cumulative token count) — state is
  |sources| × 8 B regardless of stream length, the minimal-state design
  that survives an unbounded corpus stream. Rows within a micro-batch are
  applied in ``order_col`` order, so with AvailableNow over a static
  directory the stream output equals the batch twin row-for-row
  (asserted in tests/test_streaming.py).

(A ``transformWithStateInPandas`` variant was removed in round 4:
its Python state client needs protobuf, absent here, so the path could
never run — rationale recorded in COVERAGE.md §streaming.)

Scale: the batch window is a per-source prefix sum (partial agg quality:
one shuffle keyed by source, then a single sort within each source
partition — at 100 TB with millions of sources, partitions are
source-sharded and individually modest; a pathological mega-source is the
same skew as any hot group key and splits under AQE). The streaming path
never shuffles payloads at all — grouping keys route rows, the processor
emits decisions inline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

__all__ = [
    "quota_filter",
    "streaming_quota",
]

QUOTA_OUT_SCHEMA = (
    "source string, doc_id long, n_tokens long, cum_tokens long, kept boolean"
)


def quota_filter(
    docs: DataFrame,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """Batch twin: (source, doc_id, n_tokens, cum_tokens, kept). A doc is
    kept iff the running total INCLUDING it stays within budget —
    first-come-first-served in ``order_col`` order, the same decision rule
    the stateful processor applies row-by-row."""
    w = (
        Window.partitionBy(source_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.sum(F.col(tokens_col).cast("long")).over(w).alias("cum_tokens"),
    ).withColumn("kept", F.col("cum_tokens") <= F.lit(budget))


def streaming_quota(
    docs_stream: DataFrame,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin via ``applyInPandasWithState``: per-source cumulative
    token state (one bigint per key), quota decisions emitted inline.
    Append mode; no watermark needed — state never grows with time, only
    with |sources|."""

    def _update(key, pdfs, state: GroupState):
        (cum,) = state.get if state.exists else (0,)
        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            running = pdf["n_tokens"].astype("int64").cumsum() + cum
            frames.append(
                pd.DataFrame(
                    {
                        "source": key[0],
                        "doc_id": pdf["doc_id"].astype("int64"),
                        "n_tokens": pdf["n_tokens"].astype("int64"),
                        "cum_tokens": running,
                        "kept": running <= budget,
                    }
                )
            )
            if len(running):
                cum = int(running.iloc[-1])
        state.update((cum,))
        yield from frames

    keyed = docs_stream.select(
        F.col(source_col).alias("source"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    ).groupBy("source")
    return keyed.applyInPandasWithState(
        _update,
        outputStructType=QUOTA_OUT_SCHEMA,
        stateStructType="cum long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
