"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set — the step every LLM training pipeline runs so
held-out benchmarks stay held out.

Two detection tiers, both join-based and shuffle-minimal:

- EXACT: normalized-text fingerprint (md5) equality — a semi join on a
  32-byte digest. At 100 TB the eval set is tiny (benchmarks are MBs), so
  this is a broadcast semi join: zero shuffle of the corpus.
- FUZZY: shared winnowing fingerprints (Schleimer/Wilkerson/Aiken) — any
  eval substring of length ≥ k+window-1 appearing verbatim in a training
  doc contributes a shared fingerprint; flag when the count of distinct
  shared fingerprints ≥ ``min_shared``. The eval fingerprint set is again
  broadcast-sized; the train side's fingerprints are computed map-side and
  the only aggregation is per (train doc, matched) counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import fingerprint, winnow_fingerprints


def decontaminate_exact(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag exact-duplicate contamination. Output: (doc_id, contaminated).
    The eval fingerprint set is distinct + broadcast → the corpus-side scan
    never shuffles."""
    eval_fps = eval_docs.select(fingerprint(F.col(text_col)).alias("fp")).distinct()
    fps = train.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    hit = (
        fps.join(F.broadcast(eval_fps), "fp", "left_semi")
        .select(F.col(id_col))
        .withColumn("contaminated", F.lit(True))
    )
    return (
        train.select(F.col(id_col))
        .join(hit, id_col, "left")
        .select(F.col(id_col), F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated"))
    )


def decontaminate_fuzzy(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 3,
) -> DataFrame:
    """Flag fuzzy contamination: training docs sharing ≥ ``min_shared``
    distinct winnowing fingerprints with ANY eval doc. Catches paraphrase-
    light copying that exact hashing misses (winnowing guarantees shared
    substrings of length ≥ k+window-1 surface at least one common
    fingerprint). Output: (doc_id, n_shared_fps, contaminated)."""
    eval_fps = (
        winnow_fingerprints(eval_docs, text_col, id_col, k, window)
        .select("fp")
        .distinct()
    )
    train_fps = winnow_fingerprints(train, text_col, id_col, k, window)
    shared = (
        train_fps.join(F.broadcast(eval_fps), "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_fps"))
    )
    return (
        train.select(F.col(id_col))
        .join(shared, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_shared_fps"), F.lit(0)).alias("n_shared_fps"),
            (F.coalesce(F.col("n_shared_fps"), F.lit(0)) >= min_shared).alias("contaminated"),
        )
    )
