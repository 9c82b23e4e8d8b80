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
from gridmet_etl_spark.contract_ext11 import EXT11_QUERIES  # noqa: E402
from gridmet_etl_spark.contract_ext12 import EXT12_QUERIES  # noqa: E402

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
    **EXT11_QUERIES,
    **EXT12_QUERIES,
}

# The driver caps its per-round oracle comparison at the first 50 queries
# in registration order, so ORDER decides coverage. Round-7 window:
# (0) the 11 round-5 hash-red queries, re-certified after the root-cause
# fix (their DuckDB oracles emitted HUGEINT sum columns, which the
# driver's pandas fetch renders as float64 "88.0" vs Spark's int64 "88" —
# tools/type_parity.py found the exact 11 + 3 latent cases, all now CAST
# to BIGINT/DOUBLE in the oracle SQL); then (1) the 3 latent same-class
# fixes re-certified; (2) new round-6 queries; (3) ivf_topk, whose only
# driver record (r2) predates its oracle; (4) the never-driver-checked
# backlog, oldest first — the overflow queues for r7. Everything below
# the cap is green in the full tools/check_oracle.py sweep (lenient AND
# --strict driver-sim modes). Audit trail: the 50-name windows are in
# CORRECTNESS_r0{1..5}.json.
_CHECK_FIRST = [
    # (0) the 25 never-driver-checked names (no CORRECTNESS row in any of
    # r1-r6 under the 50-cap; judge strict-sim green r6) — certifying these
    # completes driver coverage of the whole registry (VERDICT r7 item 1)
    "auc_eval", "autocorr_daily", "centroid_classify",
    "chi_square", "corr_matrix", "daily_ohlc",
    "ewma_daily", "frost_dates", "heat_index",
    "heatwave_runs", "khop_reach", "knn_eval",
    "mann_whitney", "overlap_join", "ref_integrity",
    "scd2_users", "seasonal_decomp", "skew_profile",
    "spi_index", "survivorship", "target_encode",
    "temporal_split", "terrain_gradient", "threshold_alerts",
    "trailing_features",
    # (1) new round-7 queries (contract_ext12, both waves)
    "asof_forward_join", "gapfill_interp", "spearman_corr",
    "kruskal_wallis", "cramers_v", "winsorized_stats",
    "heaps_fit", "dup_ngrams", "rbo_overlap",
    "filter_cascade", "ppl_buckets",
    "fleiss_kappa", "wilcoxon_signed", "friedman_test",
    "ordinal_gamma", "window_funnel", "interdup_report",
    # (2) re-certify: output-shape fix this round (zero-candidate configs
    # now always emit their row, ADVICE r6)
    "lsh_band_sweep",
    # (3) rotating re-checks: flagships + the r6-changed float paths
    # (kmv_set_ops / ipw_ate / session_paths — VERDICT r7 item 6 watchlist;
    # six rotation slots ceded to the second-wave queries so the registry
    # stays 100% driver-certified)
    "weighted_mean", "gridmet_pipeline", "tpch_q1",
    "corpus_pipeline_v3", "kmv_set_ops", "ipw_ate",
    "session_paths",
    # ---- driver cap (50) reached; everything below has a green driver
    # CORRECTNESS recording from an earlier round (r1-r6) ----
    "kaplan_meier", "dsir_select", "lift_eval",
    "curve_compare", "k_anonymity", "f1_report",
    "logrank_test", "boilerplate_report", "zone_map_prune",
    "selectivity_eval", "heavy_hitters_mg", "ks_test",
    "class_balance", "histogram_docs", "zipf_fit",
    "weighted_ess", "token_budget_alloc", "ivf_nprobe_sweep",
    "cohen_kappa", "cv_folds", "novelty_curve",
    "truncation_report", "source_jsd", "source_entropy",
    "pii_flags", "cosine_topk_lsh", "kmeans_assign",
    "bpe_merges", "embed_covariance", "entity_resolution",
    "lm_scores", "containment_dups", "quota_filter",
    "minhash_estimate", "corpus_pipeline_v2", "lsh_recall",
    "hard_negatives", "bpe_compression", "cosine_topk",
    "simhash", "tpch_q15ish", "tpch_q17ish",
    "tpch_q21ish", "tpch_q22ish", "kmv_distinct",
    "rrf_fusion", "link_prediction", "cuped_adjust",
    "did_estimate", "hilbert_layout", "markov_attribution",
    "woe_iv", "tpcds_multiband", "feature_hash",
    "qini_uplift", "polygon_metrics", "dp_release",
    "holt_forecast", "rsi_indicator", "gini_lorenz",
    "capture_recapture", "welch_ttest", "line_dedup",
    "mixture_weights", "jl_project", "tfidf_terms",
    "cms_join_size", "bias_als", "mcv_stats",
    "equiheight_bins", "join_order_advisor", "source_overlap",
    "ridge_regression", "join_qerror", "layout_advisor",
    "cooccurrence_topk", "vocab_topk", "impute_median",
    "idw_interp", "dbscan_clusters", "item_similarity",
    "cdc_apply", "hist_quantiles", "bootstrap_ci",
    "logit_gd", "forecast_eval", "nb_language_id",
    "mrr_eval", "ppr_scores", "pca_power",
    "geo_knn", "sssp_hops", "weighted_median_pooled",
    "rolling_median", "kcore_nodes", "dedup_report",
    "rfm_segments", "basket_lift", "pq_codes",
    "hll_rollup", "scd2_pit_enrich", "twap_daily",
    "coreset_assign", "ndcg_eval", "multitouch_credit",
    "lpa_communities", "session_windows", "hits_scores",
    "psi_drift", "textrank_keywords", "cohort_ltv",
    "ivfpq_topk", "conversion_lag", "cumulative_users",
    "rebased_series", "theilsen_trend", "props_map",
    "calendar_gaps", "ab_test", "skyline_parts",
    "dow_anomaly", "rolling_actives", "benford_check",
    "embedding_stats", "tpch_q2ish", "tpch_q3ish",
    "tpch_q4ish", "tpch_q6ish", "tpch_q8ish",
    "tpch_q9ish", "tpch_q10ish", "tpch_q11ish",
    "tpch_q12ish", "tpch_q14ish", "tpch_q20ish",
    "max_dup_spans", "calibration_eval", "incremental_refresh",
    "polygon_weights", "polygon_zonal_mean", "hex_density",
    "quantile_normalize", "cusum_changepoints", "rag_pipeline",
    "pq_topk", "funnel_steps", "retention_cohorts",
    "event_transitions", "triangle_count", "jaccard_join",
    "fuzzy_join", "mad_outliers", "ntile_bins",
    "percentile_cut", "char_entropy", "snapshot_diff",
    "coarsen_grid", "zorder_layout", "media_dedup",
    "trending_topk", "focal_mean", "topk_per_source",
    "trend_slope", "cross_correlation", "token_drift",
    "readability", "bilinear_interp", "degree_days",
    "climate_pipeline", "skew_join", "set_ops",
    "grouping_sets", "range_frame_sum", "weighted_median",
    "attribution_join", "cfsv2_median_pipeline", "tpch_weighted_mean",
    "tpch_join3", "tpch_window_topk", "tpch_topn",
    "tpch_semi_anti", "tpch_cube", "tpch_rollup",
    "tpch_q5ish", "tpch_q7ish", "tpch_q13ish",
    "tpch_q16ish", "tpch_q18ish", "tpch_q19ish",
    "tpch_above_avg", "tpch_outer_agg", "salted_agg",
    "range_join", "ngram_jaccard", "text_analysis",
    "bigram_topk", "events_props_json", "pivot_wide",
    "unpivot_long", "fill_pipeline", "qa_checks",
    "ensemble_median", "ensemble_stats", "ensemble_quantiles",
    "nearest_donor", "bbox_filter", "time_filter",
    "catalog_lookup", "weight_sum_qa", "physics_rh",
    "union_concat", "events_daily", "events_window",
    "events_moving_avg", "sessionize_batch", "media_stats",
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
