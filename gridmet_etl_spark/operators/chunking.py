"""Sliding-window document chunking for training-data pipelines: split each
document's token stream into overlapping fixed-size windows (the standard
pre-tokenization packing shape for long-context corpora).

Row-local and shuffle-free: window starts come from ``sequence`` and each
chunk is a ``slice`` of the per-row token array — the explode factor is
``ceil(n_tokens / stride)`` and the plan is a pure scan (Generate over
FileScan), so it runs at read speed over a 100 TB corpus and partitions
inherit the input layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import tokens


def chunk_windows(
    docs: DataFrame,
    window: int = 32,
    stride: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token windows of size ``window`` every ``stride`` tokens.

    Every start position ``0, stride, 2*stride, ... < n_tokens`` yields one
    chunk (trailing chunks are shorter than ``window``; a doc always yields
    at least one chunk). Output: (doc_id, chunk_id, chunk_text, n_tokens)
    with chunk_id the 0-based window index.
    """
    toks = tokens(text_col)
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride))
    exploded = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, F.lit(window))
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )
