"""Cross-config stability check: run contract queries under SEVERAL Spark
session shapes (shuffle partitions / parallelism a driver might use) and
compare each against its DuckDB oracle with the driver's canonicalization.

Why this exists: driver hash mismatches that do NOT reproduce under the
house session (round 4: kaplan_meier/dsir_select/lift_eval) come from
environment-sensitive float paths — sum-order jitter meeting a rounding
half-way boundary. This harness varies the things an environment can vary.
The structural defenses are (1) coarser rounding for transcendental chains
(contract_ext7._RKM) and (2) NEVER rounding intermediates that feed more
arithmetic (bias_als: per-round rounding QUANTIZES values onto the rounding
grid, making exact half-way boundaries common instead of measure-zero).

Usage: python tools/stability_check.py [query ...]
       (default: the float-sensitive watchlist below)
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# queries whose outputs pass through transcendental / chained-float paths
WATCHLIST = [
    "kaplan_meier", "dsir_select", "lift_eval", "bias_als",
    "mixture_weights", "jl_project", "corpus_pipeline_v3", "logit_gd",
    "ppr_scores", "lm_scores", "tfidf_terms",
    # session-B float paths: ridge solves Cramer on ROUNDED correlations
    # (the rounded-input→deterministic-arithmetic design this verifies);
    # selectivity_eval sums per-bucket frac·n doubles; layout_advisor
    # averages rounded prune fractions; mcv_stats emits count/total fracs
    "ridge_regression", "selectivity_eval", "layout_advisor", "mcv_stats",
    # session-C float paths: CUPED theta/variance moments, IPW
    # Horvitz-Thompson sums, DiD cell means (double partial-agg order),
    # and the KMV estimator divisions (single exact-operand divisions —
    # expected rock-stable; listed to prove it)
    "cuped_adjust", "ipw_ate", "did_estimate", "kmv_distinct", "kmv_set_ops",
    # 10-round value-iteration float chain (the pagerank class)
    "markov_attribution",
    # single-ln WOE path (pmi/lm class)
    "woe_iv",
    # decile-cumulative float ratios over the global rank (lift_eval class)
    "qini_uplift",
    # seeded-Laplace ln path (single transcendental per row)
    "dp_release",
    # 29-step chained smoothing recursion on rounded inputs (should be
    # bit-stable by construction; listed to prove it)
    "holt_forecast",
    # O-E/variance float accumulations over the event-time grid
    "logrank_test", "gini_lorenz",
    # moment-sum t statistic (cuped class)
    "welch_ttest",
    # round-6 float paths: zipf_fit divides exact e6-quantized integer
    # regression sums (expected rock-stable by construction — listed to
    # prove it); weighted_ess divides exact cents-quantized Σw/Σw²
    "zipf_fit", "weighted_ess",
    # round-6-changed estimators re-checked per VERDICT r7 item 6:
    # session_paths joined kmv_set_ops/ipw_ate (already above) on the
    # watchlist after its exact-membership conversion fix
    "session_paths",
    # round-7 float paths: spearman/kruskal divide exact 2·r̄ integer rank
    # sums (floor-quantized positive H terms); cramers_v sums e9-quantized
    # cell terms; winsorized/heaps/rbo divide exact integers; the
    # interpolation chain in gapfill_interp runs fixed-order IEEE ops on
    # e6-exact daily means; ppl_buckets ntiles on the rounded nll
    "spearman_corr", "kruskal_wallis", "cramers_v", "winsorized_stats",
    "heaps_fit", "rbo_overlap", "gapfill_interp", "ppl_buckets",
    # round-7 second wave: all statistics divide exact integers in fixed
    # expression order (fleiss P̄/P̄_e, wilcoxon z, friedman χ², gamma)
    "fleiss_kappa", "wilcoxon_signed", "friedman_test", "ordinal_gamma",
    # round-8 float paths: bloom_fpr_sweep's analytic column is a pow
    # chain (rounded 4, the exp∘ln discipline); hill divides an exact
    # e6-quantized ln-term sum; neyman's sd/weight chain quantizes
    # max-normalized before the exact largest-remainder seats; kendall/
    # assortativity/permutation/ap/gaps/matching divide exact integers
    "bloom_fpr_sweep", "hill_tail_index", "neyman_alloc", "kendall_tau",
    "degree_assortativity", "permutation_test", "ap_at_k",
    "inter_event_gaps", "propensity_match_att",
    # round-8 wave 3: log_odds/info_gain are ln chains (rounded 4,
    # max-normalized e12 entropy sums); mcnemar/cochran/runs divide
    # exact integers
    "mcnemar_test", "cochran_q", "log_odds_words", "info_gain",
    "runs_test",
    # round-8 waves 4-6 (ext14/15/16): jarque_bera combines DECIMAL raw
    # moments in fixed order; brown_forsythe quantizes the between-group
    # terms; partial_corr/rdd/iv/grubbs/gumbel divide exact decimal sums;
    # theil/ljung divide exact decimal sums (ljung's Q quantizes the
    # |lags| relation); hurst is a quantized-mean + quantized-OLS double
    # chain (the most float-sensitive new path); brier's decomposition
    # quantizes bin terms; nelson/page_hinkley ride ordered-frame running
    # float sums (the kaplan_meier precedent this re-verifies); bollinger
    # decides breaches on exact integers (listed to prove the display
    # doubles are stable too)
    "jarque_bera", "brown_forsythe", "partial_corr", "theil_u",
    "max_drawdown", "bollinger_breakouts", "funcdep_audit",
    "decision_stump", "clustering_coeff", "slope_one", "rdd_estimate",
    "iv_wald", "nelson_aalen", "hurst_exponent", "brier_decomp",
    "grubbs_stat", "ljung_box", "return_levels", "page_hinkley",
    # round-8 wave 5: MK divides exact integer S/var; CvM divides an
    # exact decimal U; coverage divides exact counts
    "mann_kendall", "cramer_von_mises", "vocab_coverage",
    # round-8 wave 6: cliffs divides exact decimal dominance counts;
    # odds_ratio is a ln/exp CI chain on exact cells; km_median picks on
    # the certified rounded KM curve; seasonal_strength divides exact e6
    # moment sums
    "cliffs_delta", "odds_ratio", "km_median", "seasonal_strength",
    # round-8 wave 7: anova divides quantized decimal sums; bartlett is
    # a ln chain over quantized signed terms (the most float-sensitive
    # of the wave); morans_i is one division of exact decimal forms
    "anova_oneway", "bartlett", "morans_i",
    # round-9 waves (ext20-ext30): mood/sign/page/turning/DW/pinball
    # divide exact integers or quantized decimal sums; the spatial trio
    # divides exact decimal moments (getis_ord per-cell z is the widest
    # float surface — two sqrts per cell); the finance family divides
    # exact e6-return moments (capm/sharpe/granger are moment chains,
    # var_cvar is pure order statistics); kendall_w/dunn divide exact
    # rank sums; err_eval's cascade product is exact-dyadic by design
    # (listed to prove it); theil/atkinson/nmi/hellinger are ln/exp
    # chains over e12-quantized sums (the most float-sensitive round-9
    # paths); hdr/spc/mcc/abc/hhi/palma decide on exact integers
    "mood_median", "sign_test", "page_trend", "turning_points",
    "durbin_watson", "pinball_loss",
    "gearys_c", "getis_ord", "semivariogram", "ripley_k",
    "var_cvar", "capm_beta", "sharpe_sortino", "stoch_osc", "obv_trend",
    "t_closeness", "candidate_keys", "reident_risk",
    "dunn_pairs", "kendall_w", "ca_trend", "cohens_d",
    "hdr_quantiles", "spc_rules", "err_eval", "mcc_eval",
    "granger_lead", "trigram_paths", "abc_classes", "hhi_concentration",
    "yoy_growth", "price_elasticity",
    "hellinger_sources", "burstiness_fano", "gini_impurity",
    "theil_index", "atkinson_index", "palma_ratio",
    "nmi_assoc", "chao1_richness",
    # round-9 waves 12-14: ESD/binseg decide on exact integers (argmax
    # keys) with double studentized/gain displays; QTE is pure order
    # statistics; apriori divides exact supports; RMST re-quantizes the
    # rounded KM curve into exact integer step areas; lambda/D divide
    # exact cell counts
    "esd_outliers", "binseg_split", "qte_quartiles", "apriori_triples",
    "rmst_survival", "gk_lambda_assoc", "somers_d_eval",
]

SESSIONS = [
    {"master": "local[16]", "sp": "64"},
    {"master": "local[16]", "sp": "11"},
    {"master": "local[4]", "sp": "200"},
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _ms(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_canon(r[i]) for i in order) for r in rows)


def main(names):
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    targets = names or [n for n in WATCHLIST if n in oracles]

    con = duckdb.connect()
    con.execute("SET threads=16")
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    want = {}
    for n in targets:
        res = con.execute(oracles[n])
        want[n] = _ms([d[0] for d in res.description], res.fetchall())

    failures = []
    for cfg in SESSIONS:
        spark = (
            SparkSession.builder.appName("stability_check")
            .master(cfg["master"])
            .config("spark.sql.shuffle.partitions", cfg["sp"])
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        for n in targets:
            sdf = queries[n](spark, SF_DIR)
            ok = _ms(sdf.columns, sdf.collect()) == want[n]
            print(f"{cfg['master']:>10s}/sp={cfg['sp']:<4s} {n:24s} "
                  f"{'OK' if ok else 'MISMATCH'}")
            if not ok:
                failures.append((cfg, n))
        spark.stop()
    print(f"\n{'STABLE' if not failures else 'UNSTABLE'}: "
          f"{len(targets)} queries x {len(SESSIONS)} sessions, "
          f"{len(failures)} mismatches")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
