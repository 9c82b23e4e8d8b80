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
from gridmet_etl_spark.contract_ext2 import EXT2_QUERIES  # noqa: E402
from gridmet_etl_spark.contract_ext3 import EXT3_QUERIES  # noqa: E402
from gridmet_etl_spark.contract_ext4 import EXT4_QUERIES  # noqa: E402
from gridmet_etl_spark.contract_ext5 import EXT5_QUERIES  # noqa: E402
from gridmet_etl_spark.contract_ext6 import EXT6_QUERIES  # noqa: E402
from gridmet_etl_spark.contract_ext7 import EXT7_QUERIES  # noqa: E402
from gridmet_etl_spark.contract_ext8 import EXT8_QUERIES  # noqa: E402
from gridmet_etl_spark.contract_ext9 import EXT9_QUERIES  # noqa: E402
from gridmet_etl_spark.contract_ext10 import EXT10_QUERIES  # noqa: E402

_MERGED = {
    **DOMAIN_QUERIES,
    **EXT_QUERIES,
    **EXT2_QUERIES,
    **EXT3_QUERIES,
    **EXT4_QUERIES,
    **EXT5_QUERIES,
    **EXT6_QUERIES,
    **EXT7_QUERIES,
    **EXT8_QUERIES,
    **EXT9_QUERIES,
    **EXT10_QUERIES,
}

# The driver caps its per-round oracle comparison at the first 50 queries
# in registration order, so ORDER decides coverage. Round-5 window:
# (0) the three r4 hash-mismatch queries, re-checked after the R=4
# rounding hardening (contract_ext7), then (1) the 40 new round-5 queries
# (contract_ext8 session A: 9, contract_ext9 session B: 10,
# contract_ext10 session C: 21 — the riskiest names go under the cap
# first), then (2) the oldest never-driver-checked backlog — 7 of its
# names fit under the cap (cooccurrence_topk..embed_covariance); the rest
# (entity_resolution through survivorship) queue for r6. Everything below
# the cap was green in a full tools/check_oracle.py sweep (282/282 at the
# end of session C). Audit trail: r1 = first 44 registry names,
# r2/r3/r4 = the 50-name windows recorded in CORRECTNESS_r0{2,3,4}.json.
_CHECK_FIRST = [
    # (0) r4 mismatches, re-verified post-hardening
    "kaplan_meier", "dsir_select", "lift_eval",
    # (1) new round-5 queries land here as they are added
    "kmv_distinct", "kmv_set_ops", "rrf_fusion", "link_prediction",
    "cuped_adjust", "ipw_ate", "did_estimate",
    "hilbert_layout", "curve_compare", "session_paths", "markov_attribution",
    "woe_iv", "tpcds_multiband", "feature_hash", "class_balance",
    "k_anonymity", "qini_uplift", "polygon_metrics", "dp_release",
    "holt_forecast", "f1_report", "rsi_indicator", "gini_lorenz",
    "logrank_test", "capture_recapture", "welch_ttest",
    "minhash_lsh_star", "line_dedup", "mixture_weights", "corpus_pipeline_v3", "jl_project", "tfidf_terms", "cms_join_size", "bias_als", "boilerplate_report",
    "mcv_stats", "equiheight_bins", "zone_map_prune", "join_order_advisor",
    "source_overlap", "ridge_regression",
    "selectivity_eval", "join_qerror", "layout_advisor", "heavy_hitters_mg",
    # (2) never driver-checked backlog, oldest-waiting first
    "cooccurrence_topk",
    "vocab_topk", "pii_flags", "cosine_topk_lsh",
    "kmeans_assign",
    "bpe_merges", "embed_covariance", "entity_resolution",
    "lm_scores", "containment_dups", "quota_filter", "minhash_estimate",
    "corpus_pipeline_v2", "lsh_recall", "hard_negatives", "bpe_compression",
    "cosine_topk", "simhash",
    "tpch_q15ish", "tpch_q17ish", "tpch_q21ish", "tpch_q22ish",
    "autocorr_daily", "ewma_daily", "scd2_users", "corr_matrix",
    "target_encode", "ref_integrity",
    # ---- driver cap (50) reached (28 backlog names fit; the rest queue) ----
    "skew_profile", "khop_reach",
    "heatwave_runs", "spi_index",
    "frost_dates", "heat_index",
    "overlap_join", "threshold_alerts", "centroid_classify", "knn_eval",
    "terrain_gradient", "seasonal_decomp", "temporal_split",
    "chi_square", "mann_whitney", "ks_test", "auc_eval",
    "trailing_features", "daily_ohlc", "survivorship",
    # previously-checked r3/r4 batch (green in CORRECTNESS_r04.json)
    "impute_median",
    "idw_interp", "dbscan_clusters", "item_similarity", "cdc_apply",
    "hist_quantiles", "bootstrap_ci", "logit_gd", "forecast_eval",
    "nb_language_id",
    "mrr_eval", "ppr_scores",
    "pca_power", "geo_knn", "sssp_hops", "weighted_median_pooled",
    "rolling_median", "kcore_nodes", "dedup_report", "rfm_segments",
    "basket_lift",
    "pq_codes", "hll_rollup", "scd2_pit_enrich", "twap_daily",
    "coreset_assign", "ndcg_eval", "multitouch_credit", "lpa_communities",
    "session_windows", "hits_scores", "psi_drift", "textrank_keywords",
    "cohort_ltv", "ivfpq_topk",
    "conversion_lag",
    "cumulative_users", "rebased_series", "theilsen_trend", "props_map",
    "calendar_gaps", "ab_test", "skyline_parts", "dow_anomaly",
    "rolling_actives", "benford_check", "embedding_stats",
    # ---- tail below has a green driver CORRECTNESS recording (r1–r3) ----
    "tpch_q2ish", "tpch_q3ish", "tpch_q4ish", "tpch_q6ish", "tpch_q8ish",
    "tpch_q9ish", "tpch_q10ish", "tpch_q11ish", "tpch_q12ish",
    "tpch_q14ish", "tpch_q20ish",
    "max_dup_spans", "calibration_eval", "incremental_refresh",
    "polygon_weights", "polygon_zonal_mean", "hex_density",
    "quantile_normalize", "cusum_changepoints",
    "rag_pipeline", "pq_topk",
    "funnel_steps", "retention_cohorts", "event_transitions",
    "triangle_count", "jaccard_join", "fuzzy_join", "mad_outliers",
    "ntile_bins", "percentile_cut", "char_entropy", "snapshot_diff",
    "coarsen_grid", "zorder_layout", "media_dedup", "trending_topk",
    "focal_mean", "topk_per_source", "trend_slope", "cross_correlation",
    "token_drift", "readability", "bilinear_interp", "degree_days",
    "climate_pipeline", "skew_join", "set_ops", "grouping_sets",
    "range_frame_sum", "weighted_median",
    "ivf_topk", "attribution_join",
    "weighted_mean", "gridmet_pipeline", "cfsv2_median_pipeline",
    "cfsv2_ensemble_pipeline", "tpch_weighted_mean", "tpch_q1",
    "tpch_join3", "tpch_window_topk", "tpch_topn", "tpch_semi_anti",
    "tpch_cube", "tpch_rollup", "tpch_q5ish", "tpch_q7ish",
    "tpch_q13ish", "tpch_q16ish", "tpch_q18ish", "tpch_q19ish",
    "tpch_above_avg", "tpch_outer_agg",
    "salted_agg", "range_join", "exact_dedup",
    "ngram_jaccard", "text_analysis", "bigram_topk", "events_props_json",
    "pivot_wide", "unpivot_long", "fill_pipeline", "qa_checks",
    "ensemble_median", "ensemble_stats", "ensemble_quantiles",
    "nearest_donor", "bbox_filter", "time_filter", "catalog_lookup",
    "weight_sum_qa", "physics_rh", "union_concat", "events_daily",
    "events_window", "events_moving_avg", "sessionize_batch", "media_stats",
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
