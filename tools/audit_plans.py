#!/usr/bin/env python
"""Physical-plan audit across the ENTIRE contract query set: execute every
query at sf0.01 and tabulate the scale-relevant plan properties —
shuffle count, broadcast joins, Python eval nodes, cartesian products,
single-partition exchanges, sort-merge joins. Writes docs/PLAN_AUDIT.md.

Red flags it would surface: a Python eval in a non-multimodal/non-np path,
a CartesianProduct anywhere, a SinglePartition exchange feeding a
data-bearing operator, a sort-merge join where a broadcast was intended.

Run: ``python tools/audit_plans.py``
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gridmet_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# queries where Python appears BY DESIGN (Arrow-vectorized numpy kernels)
EXPECTED_PYTHON = {
    "cosine_topk_np", "kmeans_assign", "repetition_stats", "theilsen_trend",
    # one-pass numpy Gram partials (Arrow mapInPandas by design);
    # pca_power iterates on top of the same covariance kernel
    "embed_covariance", "pca_power",
    # PQ codebook train/encode: Arrow numpy argmin kernels by design (the
    # literal-expression form exceeds codegen limits — see operators/pq.py)
    "pq_codes", "pq_topk",
    # IVF-PQ rides the same Arrow encode kernel as pq_codes
    "ivfpq_topk",
}
# queries whose plan legitimately contains SortAggregate nodes. Spark can
# only use HashAggregate when every aggregation buffer is a mutable
# fixed-width type; MIN/MAX over STRING falls back to SortAggregate (sorts
# the full input per partition). That downgrade killed the r9 sf1 minhash
# bench (>80 GB spill — dedup.py _seed_hash), so any query NOT listed here
# that picks up a SortAggregate is flagged. Listed = the string/struct
# aggregation is by design AND its sorted input is bounded (sign_test was
# caught by this column in r10 — a struct min/max sorted ALL of lineitem —
# and fixed with a packed-BIGINT order key; see contract_ext20.py):
EXPECTED_SORTAGG = {
    # md5 oracle path: MIN over hex STRINGS is the cross-engine
    # bit-parity contract (DuckDB has md5, not xxhash64); the sorted
    # relation is the oracle-scope shingle explode. The SCALE path is
    # hash_fn="xxhash64" (LONG buffers → HashAggregate), plan-guarded by
    # tests/test_plans_physical.py::test_minhash_signature_plan_hash_aggregate
    "minhash_estimate", "minhash_lsh", "minhash_lsh_star",
    # digest fingerprints: min/max(md5) per group is the order-insensitive
    # content-parity readout these audit queries EXIST to produce; at scale
    # a content fingerprint rides the xxhash64 LONG digest (exact_dedup's)
    "jsonl_scan", "media_stats",
    # delta-bounded: cdc_apply's max_by(struct, seq) sorts the CDC DELTA
    # per partition with map-side partial_max_by (|changed keys| rows out);
    # the 100-TB snapshot side never sorts — one shuffle total, which beats
    # the HashAggregate alternative (max-seq agg + a second join shuffle)
    "cdc_apply",
    # bounded relations: dbscan's min_by runs over the eps-neighborhood
    # edge list of the bounded point set (documented quadratic-oracle
    # query); grubbs_stat's max(struct) is a 1-row worst-deviation pick
    # over the |days| rollup; hist_quantiles' min_by runs over the
    # |bins|-row bucket histogram; obv_trend's max(struct(day, obv)) runs
    # over the per-region |days|-bounded daily rollup
    "dbscan_clusters", "grubbs_stat", "hist_quantiles", "obv_trend",
}
# queries whose plan legitimately contains one tiny single-partition stage
# (global top-k merge, per-group offsets, catalog limit 1, global sort of a
# bounded result)
EXPECTED_SINGLE = {
    "tpch_topn", "catalog_lookup", "vocab_topk", "shard_pack",
    "corpus_pipeline", "pack_sequences", "cosine_topk", "cosine_topk_np", "cosine_topk_lsh",
    "ivf_topk", "kmeans_assign",
    # corpus_pipeline_v2 = corpus_pipeline's |groups|-row shard-offset
    # window PLUS quota_filter's |sources|-row quota-offset window — two
    # bounded offset relations, same shape as the whitelisted originals
    "corpus_pipeline_v2",
    # global SCALAR aggregates: the final single-partition stage merges the
    # map-side partials into one row — bounded by construction
    "tpch_q19ish", "qa_checks",
    # corpus-stats scalar rows (N, avg doclen / bigram totals) broadcast
    # back into the scoring join; the single-partition stage carries 1 row
    "bm25_topk", "tfidf_topk", "pmi_bigrams", "lm_scores",
    # funnel step counts are global SCALAR aggregates (one row per step,
    # three steps); ntile_bins is the documented bounded-relation global
    # sort (histogram_fixed is the unbounded twin)
    "funnel_steps", "ntile_bins",
    # token_drift's corpus totals are one scalar row broadcast back into
    # the scoring join (same shape as bm25/tfidf corpus stats)
    "token_drift",
    # cumulative_users' global window runs over the bounded |days| relation
    # (the user-keyed min is the corpus-sized stage); conversion_lag's
    # final stage is a scalar distribution row; ntile-style bounded sorts
    "cumulative_users", "conversion_lag",
    # rolling_actives' bounds relation is a 1-row (min_day, max_day) scalar
    "rolling_actives",
    # one wide agg row exploded into per-column profile rows
    "profile_lineitem",
    # session-B scalar stages: corr_matrix is ONE global agg row (exploded
    # into C(n,2) pair rows); target_encode / tpch_q15ish / tpch_q22ish
    # broadcast a 1-row global mean/max/avg; tpch_q17ish returns a single
    # summary row; ref_integrity unions four 1-row FK-check aggregates
    "corr_matrix", "target_encode", "tpch_q15ish", "tpch_q17ish",
    "tpch_q22ish", "ref_integrity",
    # rank statistics: global_rank/ks prefix sums are the two-level
    # range-partition design — the ONLY single-partition window runs over
    # the |partitions|-row offset relation (≤ defaultParallelism rows);
    # plus 1-row scalar finals (grand total / U / D / AUC)
    "mann_whitney", "ks_test", "auc_eval", "chi_square",
    # TPC-H completion scalars: q6/q14 end in ONE global summary row; q11's
    # single-partition stage is the 1-row total-value broadcast (the HAVING
    # threshold), same shape as tpch_q15ish/q22ish above
    "tpch_q6ish", "tpch_q14ish", "tpch_q11ish",
    # quantile_normalize: global_rank's |partitions|-row offset cumsum is
    # the one single-partition window (same shape as mann_whitney etc.)
    "quantile_normalize",
    # rfm quintiles: the ntile global sort runs over the BOUNDED
    # per-customer rollup (documented bounded-relation sort, ntile_bins
    # twin); basket_lift / dedup_report end in 1-row scalar broadcasts
    "rfm_segments", "basket_lift", "dedup_report",
    # pca_power's iteration relations are d-row / d²-row bounded by
    # construction (norm/sign/Rayleigh are 1-row scalar broadcasts, the
    # sign-pin window sorts the d-row loading vector); sssp_hops broadcasts
    # a 1-row max-key scalar into the edge generator and starts from a
    # 1-row seed relation
    "pca_power", "sssp_hops",
    # logit_gd's weight state is ONE row per GD round (scalar gradient
    # aggregates, same shape as pca_power's Rayleigh/norm rows)
    "logit_gd",
    # nb/dsir corpus statistics are 1-row scalars (vocab size, LM token
    # totals) broadcast into the scoring join — bm25/tfidf shape
    "nb_language_id", "dsir_select",
    # forecast_eval broadcasts a 1-row global max-day split point
    "forecast_eval",
    # lift_eval: global_rank's |partitions|-row offset cumsum + the
    # n_bins-row cumulative window + a 1-row totals scalar — all bounded
    "lift_eval",
    # ppr_scores: 1-row seed-count scalar + the |seeds|-row teleport
    # relation (a 3-row createDataFrame is single-partition by
    # construction); the per-round full-outer joins are frontier-sized
    "ppr_scores",
    # mixture_weights: the normalization terms are a 1-row global scalar
    # (Σ size, Σ size^α over the |sources|-row aggregate) broadcast back —
    # the single-partition stage merges |sources| partial rows into 1
    "mixture_weights",
    # corpus_pipeline_v3 inherits mixture_weights' 1-row normalization
    # scalar (its only single-partition stage; the components loop is
    # frontier-sized, dedup/LSH stages digest/band-keyed)
    "corpus_pipeline_v3",
    # tfidf_terms: the 1-row corpus-size scalar N broadcast into the
    # scoring join (bm25/nb shape)
    "tfidf_terms",
    # cms_join_size: the whole point is that the output is ONE scalar row
    # (min over 4 depth-row inner products of ≤4×256-cell sketches)
    "cms_join_size",
    # round-7 bounded stages: heaps_fit's checkpoint cumsum + OLS run over
    # the n_buckets(=10)-row relation and a 1-row fit scalar; rbo_overlap's
    # windows run over ≤k(=32)-row rank/depth relations plus a 1-row
    # summary scalar; kruskal_wallis uses the two-level distributed prefix
    # (|partitions|-row offset window, mann_whitney shape) + 1-row
    # H/tie scalars; cramers_v broadcasts 1-row grand-total/dims scalars;
    # filter_cascade is ONE global agg row unpivoted to |rules| rows;
    # ppl_buckets inherits lm_scores' 1-row corpus-stat scalars
    "heaps_fit", "rbo_overlap", "kruskal_wallis", "cramers_v",
    "filter_cascade", "ppl_buckets",
    # round-7 second wave: fleiss/wilcoxon/friedman/gamma end in 1-row
    # scalar agreement/statistic relations (cohen_kappa shape); wilcoxon
    # additionally uses the shared distributed prefix (|partitions|-row
    # offset window, mann_whitney shape); window_funnel's level rollup is
    # a ≤|steps|-row relation
    "fleiss_kappa", "wilcoxon_signed", "friedman_test", "ordinal_gamma",
    "window_funnel",
    # round-8 bounded stages: kendall_tau runs its pair join on the
    # |levels|²-bounded cell relation + 1-row C/D/tie/total scalars
    # (ordinal_gamma shape); permutation_test's decision relation is
    # |n_perm|(=48) rows + a 1-row observed scalar; ap_at_k inherits
    # cosine_topk's whitelisted global top-k merge + per-query k-row
    # windows; inter_event_gaps reports over a 7-row bucket relation +
    # 1-row total; degree_assortativity ends in 1-row moment/count
    # scalars; bloom_fpr_sweep's config relation is a 3-row
    # createDataFrame + 1-row member/probe counts (the position set is
    # m-bounded); neyman_alloc's wmax/total are 1-row scalars and the
    # largest-remainder rank window runs over the |strata|-row relation;
    # propensity_match_att ends in 1-row matched/total scalars;
    # hill_tail_index is a TakeOrdered(k+1) + (k+1)-row term relation +
    # 1-row scalars
    "kendall_tau", "permutation_test", "ap_at_k", "inter_event_gaps",
    "degree_assortativity", "bloom_fpr_sweep", "neyman_alloc",
    "propensity_match_att", "hill_tail_index",
    # round-8 wave 3: mcnemar is ONE global agg row; cochran_q reduces
    # the user×3-type grid to 1-row integer scalars (the 3-row literal
    # types relation is single-partition by construction); log_odds
    # ends in a TakeOrdered top-k + k-row rank window over the
    # vocabulary-sized scored relation + 1-row totals; info_gain's
    # entropy relations are |classes| / |values×classes|-bounded with
    # 1-row quantized sums; runs_test operates on the |days|-bounded
    # daily series by contract (documented bounded global window)
    "mcnemar_test", "cochran_q", "log_odds_words", "info_gain",
    "runs_test",
    # bias_als trains by broadcasting |users|/|items|-row bias relations;
    # its 1-row global-mean scalar is the only single-partition stage
    "bias_als",
    # session-B planner stats: equiheight_bins broadcasts the 1-row total
    # count into the bucket expression (global_rank's |partitions|-row
    # offset cumsum is the other bounded stage, mann_whitney shape);
    # zone_map_prune has only the global_rank offset stage (the report
    # aggregates the |zones|-row stats relation); join_order_advisor is
    # BUILT from three 1-row stats aggregates crossJoined broadcast — no
    # data-bearing stage exists at all; ridge_regression reduces to one
    # global agg row (means pass + moments pass), Cramer runs on that row
    "equiheight_bins", "zone_map_prune", "join_order_advisor",
    "ridge_regression",
    # mcv_stats: per-column non-null totals are a |cols|-row aggregate
    # broadcast into the frac projection (bm25 corpus-stats shape)
    "mcv_stats",
    # CBO-validation trio: selectivity_eval reduces the |buckets|-row
    # histogram and the 1-row actual-count scalar; join_qerror is built
    # entirely from 1-row stats/actual-count aggregates crossJoined
    # broadcast; layout_advisor's windows (per-layout score avg, global
    # best pick) run over the |layouts×predicates| report relation
    # (9 rows) — all bounded by construction
    "selectivity_eval", "join_qerror", "layout_advisor",
    # heavy_hitters_mg: each merge round's (capacity+1)-th-largest scalar is
    # a 1-row aggregate over a TakeOrdered(capacity+1) relation, and the
    # deduction/total accumulators are 1-row unions — all bounded by the
    # capacity constant, never by data
    "heavy_hitters_mg",
    # session-C causal trio: every single-partition stage is a scalar or
    # near-scalar merge — cuped_adjust's global moment row g (1 row), the
    # 2-row per-arm relation split into two 1-row arm relations and
    # crossJoined; ipw_ate's |strata|-row (4) aggregate + 1-row totals;
    # did_estimate's 2-row cells → two 1-row arm relations. The only
    # data-sized stage in each is the user-grain partial-agg rollup.
    "cuped_adjust", "ipw_ate", "did_estimate",
    # rrf_fusion: fusion runs entirely on candidate lists (two top-50
    # relations from bm25's TakeOrdered and cosine's WindowGroupLimit);
    # the rank windows sort ≤ depth rows and the fused global window ≤
    # 2·depth rows, plus bm25's 1-row corpus-stats scalar — all bounded by
    # the candidate-depth constant, never by corpus size
    "rrf_fusion",
    # curve_compare: two global_rank |partitions|-row offset cumsums (the
    # mann_whitney shape) over the |cells| relation, then everything runs
    # on the |zones|-row (≤ 25 per curve) stats relations
    "curve_compare",
    # qini_uplift: lift_eval's exact shape — global_rank's
    # |partitions|-row offset cumsum, the n_bins-row cumulative window,
    # and a 1-row final-bin totals scalar
    "qini_uplift",
    # tpcds_multiband: ONE global conditional-agg row (16 aggregates)
    # exploded into 8 band rows — the corr_matrix/profile_lineitem shape
    "tpcds_multiband",
    # woe_iv: 1-row min/max bounds scalar broadcast into the bin
    # expression, then the n_bins-row relation and its 1-row class-total
    # and IV scalars — bm25 corpus-stats shape
    "woe_iv",
    # welch_ttest: the cuped shape — one user-grain rollup is the only
    # data-sized stage; the moment row and the t/df arithmetic are 1-row
    "welch_ttest",
    # gini_lorenz: lift_eval's shape — global_rank's |partitions|-row
    # offset cumsum, a 1-row totals scalar, and the n_points-row
    # cumulative window
    "gini_lorenz",
    # logrank_test: the at-risk range join runs on the per-(group, time)
    # COUNT relation (time-grid-sized); O/E/V, group sizes, and the final
    # row are 1-row scalar merges
    "logrank_test",
    # f1_report: consumes centroid_classify's confusion relation
    # (|classes|² ≤ 25 rows) — marginals, tp, MACRO and MICRO are all
    # bounded aggregates/unions of it; the data-sized work (centroid
    # train + assignment) is the already-whitelisted classifier
    "f1_report",
    # markov_attribution: the ONE data-sized stage is the sessionize/
    # transition pass (user-partitioned windows); every later stage —
    # the 50 value-iteration joins, START filters, removal-effect and
    # share scalars — runs on the |vocab|²-bounded (≤ ~26-row) transition-
    # probability relation and 1-row scalars
    "markov_attribution",
    # round-6 batch. zipf_fit: the data-sized stages are the vocab count
    # agg + TakeOrdered top-k; the rank window and the regression agg run
    # on the k(=200)-row relation, and the (n_types, n_tokens) scalar is
    # a 1-row broadcast. token_budget_alloc: EVERYTHING after the
    # per-source token-count agg runs on the |sources|-row relation (the
    # remainder-rank window sorts ≤ |sources| rows) plus 1-row total and
    # shortfall scalars. (weighted_ess / split_leakage_audit /
    # sequence_packing have no global-window stage and are not listed.)
    "zipf_fit", "token_budget_alloc",
    # lsh_band_sweep: per-config candidate sets are band-key self-joins
    # (data-sized, parallel); the 1-row truth-count scalar crossJoins into
    # the |configs|(=5)-row stats relation — the only single stage
    "lsh_band_sweep",
    # ivf_nprobe_sweep: hit/scan conditional aggs reduce to 1-row scalars
    # crossJoined and exploded into the |probes|(=5)-row output; the
    # probe-rank window partitions by query (bounded query batch)
    "ivf_nprobe_sweep",
    # cohen_kappa: everything after the one counting agg runs on the
    # |categories|²-bounded confusion rollup; the two single-partition
    # stages merge it into the 1-row (n, n_agree) and (pe_num) scalars
    "cohen_kappa",
    # novelty_curve: the 1-row max-id scalar broadcast + the cumulative
    # window over the n_buckets(=10)-row rollup; digest relations carry
    # the data-sized work (distinct + min agg, digest-keyed)
    "novelty_curve",
    # source_jsd: TakeOrdered global top-k(=100) vocabulary + the
    # |sources|-row totals broadcast; all pair arithmetic runs on the
    # |pairs|×k-bounded frame
    "source_jsd",
    # round-8 wave 2 (ext14) bounded stages: jarque_bera/partial_corr end
    # in 1-row (or |segments|-row) moment scalars — welch shape;
    # brown_forsythe's parts/quantized-sum relations are |groups|(=3)-row
    # + 1-row scalars (its median window partitions BY GROUP over the
    # ≤|distinct values| histogram); theil_u's lag window runs over the
    # |days|-bounded daily rollup by contract (runs_test shape) + 1-row
    # per-lag scalars; decision_stump's cumulative/argmax windows run
    # over the |distinct feature values|(≤50)-row histogram + 1-row
    # winner; funcdep_audit reduces each pair to a 1-row strength scalar
    # (ref_integrity union shape)
    "jarque_bera", "partial_corr", "brown_forsythe", "theil_u",
    "decision_stump", "funcdep_audit",
    # round-8 wave 3 (ext15) bounded stages: rdd_estimate / iv_wald /
    # brier_decomp end in 1-row moment/ratio scalars (welch shape; brier's
    # bin relation is |bins|(=10) rows quantize-summed); nelson_aalen
    # mirrors kaplan_meier (per-group |distinct durations| windows, no
    # global stage); hurst_exponent's lag/row_number window runs over the
    # |days|-bounded daily rollup by contract (runs_test/theil_u shape)
    # and its block/size/OLS relations are |blocks|-, |sizes|(=4)- and
    # 1-row bounded; slope_one's deviation matrix is |items|²-bounded and
    # the candidate grid IS the deliverable; clustering_coeff inherits
    # triangle_count's degree-oriented wedge bound (no global stage)
    "rdd_estimate", "iv_wald", "brier_decomp", "nelson_aalen",
    "hurst_exponent", "slope_one", "clustering_coeff",
    # round-8 wave 4 (ext16) bounded stages: grubbs_stat ends in 1-row
    # moment + worst-row scalars (TakeOrdered-1 deviation pick);
    # ljung_box / page_hinkley / return_levels operate on the
    # |days|-bounded daily rollup by contract (runs_test shape) — their
    # lag/cumsum/row_number windows are documented bounded global stages,
    # and the |lags|-row Q / |periods|-row level relations plus 1-row
    # moment scalars close them
    "grubbs_stat", "ljung_box", "page_hinkley", "return_levels",
    # round-8 wave 5 (ext17): mann_kendall's row_number window runs over
    # the |days|-bounded daily rollup by contract and the pair join is
    # |days|²-bounded (documented; ends in 1-row S/var scalars);
    # cramer_von_mises' cumulative window runs over the |distinct
    # values|-sized histogram + a 1-row U scalar; vocab_coverage reduces
    # to the |distinct counts|-sized frequency-of-frequencies + 1 row
    "mann_kendall", "cramer_von_mises", "vocab_coverage",
    # round-8 wave 6 (ext18): cliffs_delta's cumulative window runs over
    # the |distinct values|-sized histogram + a 1-row dominance scalar;
    # odds_ratio is ONE global agg row; km_median composes kaplan_meier's
    # whitelisted per-group |durations|-sized windows + a |groups|-row
    # final agg; seasonal_strength reduces the decomposition to
    # |series|-row moment scalars (its windows inherit seasonal_decomp's
    # certified per-series shape)
    "cliffs_delta", "odds_ratio", "km_median", "seasonal_strength",
    # round-8 wave 7 (ext19): anova/bartlett end in |k|-row quantized-term
    # relations + 1-row F/chi2 scalars (the brown_forsythe shape);
    # morans_i reduces two equi self-joins on shifted grid keys to 1-row
    # moment/edge scalars (no global window at all — listed for its
    # 1-row crossJoin merge)
    "anova_oneway", "bartlett", "morans_i",
    # round-9 wave 1 (ext20): mood_median/sign_test/pinball_loss compose
    # exact_quantiles' two-level bucket plan (bounded |partitions|-row
    # offset relations) + |k|-row term relations + 1-row scalars;
    # turning_points/durbin_watson/page_trend run their lag windows over
    # the |days|-bounded daily rollup by contract (runs_test shape)
    "mood_median", "sign_test", "pinball_loss",
    "turning_points", "durbin_watson", "page_trend",
    # round-9 waves 2-7 (ext21-ext26): gearys_c/getis_ord/semivariogram
    # merge shifted-equi-join edge relations into 1-row (or k-lag-row)
    # moment scalars — the morans_i shape; capm_beta/sharpe_sortino/
    # var_cvar/granger/kendall_w lag windows run over |days|/|months|-
    # bounded daily rollups and end in k-row or 1-row moment relations;
    # dunn_pairs composes kruskal_wallis' whitelisted distributed-prefix
    # offsets + a k²-row pair relation; t_closeness densifies over the
    # |bands|-row global cumulative; candidate_keys/reident_risk/
    # cohens_d/ca_trend/mcc_eval end in 1-row (or |combos|-row) audit
    # scalars; hdr_quantiles' cumulative runs over the ≤|octaves|·16-row
    # bucket histogram + limit-1 picks
    "gearys_c", "getis_ord", "semivariogram",
    "capm_beta", "kendall_w", "dunn_pairs", "t_closeness",
    "candidate_keys", "reident_risk", "cohens_d", "ca_trend",
    "mcc_eval", "hdr_quantiles",
    # ext26-ext28: granger_lead's market-lag window runs over the
    # |days|-bounded daily rollup (capm_beta shape); ripley_k merges the
    # offset-join pair counts into a ≤max_r-row cumulative + 1-row
    # extent scalar; abc_classes' cumulative window runs over the
    # |catalog keys| relation by contract (docstring states the
    # two-level-prefix alternative for near-continuous keys);
    # trigram_paths' top-k window runs over the |event_types|³-bounded
    # trigram relation; yoy_growth ranks inside a TakeOrdered 20-row
    # relation (listed for its bounded final window)
    "granger_lead", "ripley_k", "abc_classes", "trigram_paths",
    "yoy_growth",
    # ext29-ext30: theil/atkinson end in 1-row quantized-ln-sum scalars
    # (+ theil's k-groups between relation); palma composes gini_lorenz's
    # whitelisted global_rank offset stages + a 1-row share scalar;
    # nmi_assoc reduces the bounded contingency relation to three 1-row
    # entropy scalars; chao1 reduces the |distinct counts| frequency-of-
    # frequencies to one row
    "theil_index", "atkinson_index", "palma_ratio", "nmi_assoc",
    "chao1_richness",
    # ext31-ext33: esd_outliers runs k bounded rounds of 1-row moment
    # scalars + TakeOrdered-1 argmax picks over the |days| relation;
    # binseg_split's cumulative window runs over the |days|-bounded
    # daily rollup (runs_test shape) + a TakeOrdered-1 pick;
    # qte_quartiles composes exact_quantiles' whitelisted two-level
    # bucket stages per arm (mood/pinball precedent); apriori_triples
    # ends in a TakeOrdered-10 + broadcast singles; rmst_survival
    # composes kaplan_meier's certified per-group |durations| windows
    # (km_median precedent) + a |groups|-row area agg; gk_lambda /
    # somers_d reduce bounded contingency relations to 1-row scalars
    "esd_outliers", "binseg_split", "qte_quartiles", "apriori_triples",
    "rmst_survival", "gk_lambda_assoc", "somers_d_eval",
}

# ``--bench`` mode: the same sortagg/cartesian scan over bench.py's
# EXTRA_BENCH + CALL_TIMED builders (plan-only, no timing) — the scale
# showcase isn't reachable from the contract registry, so without this the
# r9 minhash downgrade could recur in a stress entry unnoticed.
EXPECTED_SORTAGG_BENCH = {
    # max_by(right-row struct, ts) bucket summary: the same (key, bucket)
    # relation is ALREADY sorted for the in-bucket carry window, so the
    # SortAggregate adds one map-local sort of the right rows and its
    # output is the bounded |keys × buckets| summary; a hash two-pass
    # (max-ts agg + join-back) would change tie semantics on an
    # oracle-backed operator for a map-local sort it still mostly pays
    "asof_hub20_12M_bucketed",
    # cdc_apply's delta-bounded max_by — same written bound as the
    # contract-side whitelist entry
    "cdc_10M_snapshot",
}
EXPECTED_CARTESIAN_BENCH = {
    # kmv_set_ops' pair frame: a crossJoin of the DISTINCT-groups relation
    # with itself (ga < gb) — |groups|²-bounded by construction (the k-row
    # sketches are the input; the corpus never rescans). The bench scan is
    # plan-only so AQE hasn't replanned; the EXECUTED contract twin
    # (kmv_set_ops row in the main table) shows 0 cartesians — at runtime
    # the tiny side becomes a BroadcastNestedLoopJoin.
    "kmv_setops_24M_keys",
}


def final_plan(df) -> str:
    df.collect()
    full = df._jdf.queryExecution().executedPlan().toString()
    return full.split("== Initial Plan ==")[0]


def bench_audit() -> None:
    """Plan-only sortagg/cartesian scan of bench.py's builders (no timing,
    no execution): appends a section to docs/PLAN_AUDIT.md."""
    import bench

    spark = get_spark(app_name="plan_audit_bench")
    lines = [
        "",
        "## Bench builders (plan-only scan, `tools/audit_plans.py --bench`)",
        "",
        "| builder | sortagg | cartesian | ok |",
        "|---|---|---|---|",
    ]
    bad = []
    names = list(bench.EXTRA_BENCH) + list(bench.CALL_TIMED)
    for name in names:
        builder = bench.EXTRA_BENCH.get(name) or bench.CALL_TIMED[name]
        try:
            plan = builder(spark)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            lines.append(f"| {name} | ERROR: {str(e)[:60]} | | ✗ |")
            bad.append(name)
            continue
        n_sortagg = plan.count("SortAggregate")
        n_cart = plan.count("CartesianProduct")
        ok = (n_cart == 0 or name in EXPECTED_CARTESIAN_BENCH) and (
            n_sortagg == 0 or name in EXPECTED_SORTAGG_BENCH
        )
        if not ok:
            bad.append(name)
        lines.append(
            f"| {name} | {n_sortagg} | {n_cart} | {'✓' if ok else '✗'} |"
        )
    lines += ["", f"**Bench result: {len(names) - len(bad)}/{len(names)} clean.**"]
    if bad:
        lines.append(f"Flagged: {', '.join(bad)}")
    out = os.path.join(REPO, "docs", "PLAN_AUDIT.md")
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended bench section to {out}; flagged: {bad or 'none'}")


def main() -> None:
    import __spark_entry__ as entry

    # the driver-facing merged registry — always the FULL query surface
    queries = entry.ALL_QUERIES
    spark = get_spark(app_name="plan_audit")

    lines = [
        "# PLAN AUDIT — every contract query's executed physical plan (sf0.01)",
        "",
        "Generated by `python tools/audit_plans.py`. Columns: data exchanges",
        "(shuffles, broadcast excluded), broadcast joins, sort-merge joins,",
        "Python eval nodes (Arrow/batch), cartesian products, single-partition",
        "exchanges, SortAggregate nodes (the HashAggregate downgrade that",
        "full-sorts its input per partition — the r9 minhash 80-GB-spill",
        "class). `ok` = no unexplained red flag (Python only in the",
        "vectorized-by-design queries; single-partition only in bounded",
        "merge/offset stages; no cartesian products anywhere; SortAggregate",
        "only in the written EXPECTED_SORTAGG whitelist).",
        "",
        "| query | exch | bcast | smj | python | cartesian | single-part | sortagg | ok |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    bad = []
    for name, (fn, _sql) in sorted(queries.items()):
        try:
            plan = final_plan(fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            lines.append(f"| {name} | ERROR: {str(e)[:60]} | | | | | | | ✗ |")
            bad.append(name)
            continue
        n_exch = plan.count("Exchange") - plan.count("BroadcastExchange")
        n_bcast = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
        n_smj = plan.count("SortMergeJoin")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas")
        n_cart = plan.count("CartesianProduct")
        n_single = plan.count("SinglePartition")
        n_sortagg = plan.count("SortAggregate")
        ok = (
            n_cart == 0
            and (n_py == 0 or name in EXPECTED_PYTHON)
            and (n_single == 0 or name in EXPECTED_SINGLE)
            and (n_sortagg == 0 or name in EXPECTED_SORTAGG)
        )
        if not ok:
            bad.append(name)
        lines.append(
            f"| {name} | {n_exch} | {n_bcast} | {n_smj} | {n_py} | {n_cart} |"
            f" {n_single} | {n_sortagg} | {'✓' if ok else '✗'} |"
        )
    lines += ["", f"**Result: {len(queries) - len(bad)}/{len(queries)} clean.**"]
    if bad:
        lines.append(f"Flagged: {', '.join(bad)}")
    out = os.path.join(REPO, "docs", "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; flagged: {bad or 'none'}")


if __name__ == "__main__":
    if "--bench" in sys.argv:
        bench_audit()
    else:
        main()
