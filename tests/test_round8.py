"""Round-8 regression tests: the five ADVICE r8 fixes.

Each test pins a defect the oracle gate could not see (degenerate inputs,
overflow regimes, hostile identifiers) — reference behaviors derived from
textbook definitions, not from the reference implementation.
"""

import math

import pytest
from pyspark.sql import functions as F


# -- rbo_overlap: depth >= 50 terms (old code overflowed d*2^d at d >= 58) --


def _ranking(spark, items):
    return spark.createDataFrame(
        [(str(it), i + 1) for i, it in enumerate(items)], "item string, rank int"
    )


def _rbo_exact(a_items, b_items, k):
    """Driver-side float reference: RBO(p=1/2) truncated at k."""
    total = 0.0
    for d in range(1, k + 1):
        ov = len(set(a_items[:d]) & set(b_items[:d]))
        total += ov / d * 2.0 ** (-d)
    return total


def test_rbo_depth_past_50_no_overflow(spark):
    from gridmet_etl_spark.operators.scoring import rbo_overlap

    # k = 64 exercises depths 50..64 where the old denominator
    # depth * 2^depth overflows int64 from depth 58 (garbage terms)
    a_items = list(range(64))
    b_items = list(range(32)) + list(range(200, 232))
    out = rbo_overlap(
        _ranking(spark, a_items), _ranking(spark, b_items), k=64
    ).collect()
    assert len(out) == 64
    rbo = out[0]["rbo"]
    expected = _rbo_exact([str(i) for i in a_items], [str(i) for i in b_items], 64)
    assert abs(rbo - expected) < 1e-6
    # every depth >= 50 term is exactly 0, so the k=64 RBO must equal the
    # k=49 RBO (truncation point is invisible past depth 49)
    out49 = rbo_overlap(
        _ranking(spark, a_items), _ranking(spark, b_items), k=49
    ).collect()
    assert abs(rbo - out49[0]["rbo"]) < 1e-12


def test_rbo_k_cap_enforced(spark):
    from gridmet_etl_spark.operators.scoring import rbo_overlap

    a = _ranking(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="4000"):
        rbo_overlap(a, a, k=4001)


# -- kruskal_wallis: N = 1 degenerate (0/0 tie correction -> NaN) ----------


def test_kruskal_single_row_no_nan(spark):
    from gridmet_etl_spark.operators.stats import kruskal_wallis

    one = spark.createDataFrame([(1, "a")], "v long, g string")
    row = kruskal_wallis(one, "v", "g").collect()[0]
    assert row["n"] == 1
    assert not math.isnan(row["h_corrected"])
    assert row["h_corrected"] == 0.0


# -- fleiss_kappa: m = 1 (single rater) degenerate (x/0 -> Inf/NaN) --------


def test_fleiss_single_rater_no_nan(spark):
    from gridmet_etl_spark.operators.stats import fleiss_kappa

    one_rater = spark.createDataFrame(
        [(1, "yes"), (2, "no"), (3, "yes")], "item long, category string"
    )
    row = fleiss_kappa(one_rater).collect()[0]
    assert row["m_raters"] == 1
    for c in ("pbar", "pe", "kappa"):
        assert not math.isnan(row[c]) and not math.isinf(row[c]), c
        assert row[c] == 0.0, c


# -- cramers_v: max-normalized quantization still matches textbook chi2 ----


def test_cramers_v_textbook(spark):
    from gridmet_etl_spark.operators.stats import cramers_v

    # classic 2x2: [[10, 20], [30, 5]] -> chi2 = 65*(10*5-20*30)^2 /
    # (30*35*40*25) = exact 21.131547619... (with N multiplier form)
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20 + [("b", "x")] * 30 + [("b", "y")] * 5
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = cramers_v(df, "r", "c").collect()[0]
    n = 65
    chi2 = n * (10 * 5 - 20 * 30) ** 2 / (30 * 35 * 40 * 25)
    assert abs(out["chi2"] - chi2) < 1e-4
    assert abs(out["cramers_v"] - math.sqrt(chi2 / n)) < 1e-4


def test_cramers_v_separated_groups_no_saturation(spark):
    from gridmet_etl_spark.operators.stats import cramers_v

    # perfect association with one dominant cell: the largest (O-E)^2/E
    # term dwarfs the others — relative quantization keeps the small
    # terms' contribution; the old absolute e9 form would saturate once a
    # term passed ~9.2e9 (not reachable in-test, but the RATIO discipline
    # is checkable: chi2 for perfect association == N * min(r-1, c-1))
    rows = [("a", "x")] * 500 + [("b", "y")] * 3 + [("c", "z")] * 2
    df = spark.createDataFrame(rows, "r string, c string")
    out = cramers_v(df, "r", "c").collect()[0]
    assert abs(out["chi2"] - 2 * 505) < 1e-3  # N * min(r-1,c-1) = 505*2
    assert abs(out["cramers_v"] - 1.0) < 1e-6


# -- spearman_corr: pairwise-complete NULL semantics -----------------------


def test_spearman_nulls_pairwise_complete(spark):
    from gridmet_etl_spark.operators.stats import spearman_corr

    complete = [(1.0, 2.0), (2.0, 4.0), (3.0, 1.0), (4.0, 8.0), (5.0, 7.0)]
    with_nulls = complete + [(None, 9.0), (6.0, None), (None, None)]
    a = spark.createDataFrame(complete, "x double, y double")
    b = spark.createDataFrame(with_nulls, "x double, y double")
    ra = spearman_corr(a, "x", "y").collect()[0]
    rb = spearman_corr(b, "x", "y").collect()[0]
    # NULL rows must not inflate n or perturb the surviving rows' ranks
    assert rb["n"] == ra["n"] == len(complete)
    assert abs(rb["rho"] - ra["rho"]) < 1e-12


# -- filter_cascade: hostile rule names (quote/space/comma/backtick) -------


def test_filter_cascade_hostile_rule_names(spark):
    from gridmet_etl_spark.operators.quality import filter_cascade

    hostile = ["has space", "quo'te", "com,ma", "back`tick"]
    df = spark.createDataFrame(
        [
            (1, True, True, True, True),
            (2, False, True, True, True),   # unique kill of rule 0
            (3, True, False, False, True),  # shared kill of rules 1+2
            (4, True, True, True, True),
        ],
        ["doc_id"] + [f"c{i}" for i in range(4)],
    )
    for i, name in enumerate(hostile):
        df = df.withColumnRenamed(f"c{i}", name)
    out = {r["rule"]: r for r in filter_cascade(df, hostile).collect()}
    assert set(out) == set(hostile)
    assert out["has space"]["n_failed"] == 1
    assert out["has space"]["n_unique_kills"] == 1
    assert out["quo'te"]["n_failed"] == 1
    assert out["quo'te"]["n_unique_kills"] == 0  # shadowed by com,ma
    assert out["com,ma"]["n_unique_kills"] == 0
    assert out["back`tick"]["n_failed"] == 0
    row = next(iter(out.values()))
    assert row["n_docs"] == 4 and row["n_survivors"] == 2


# ===== round-8 ext13 operators =============================================


def test_kendall_tau_textbook(spark):
    from gridmet_etl_spark.operators.stats import kendall_tau_b

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (2, 4)], "x int, y int"
    )
    r = kendall_tau_b(df, "x", "y").collect()[0]
    # C=4, D=0, n0x2=12, t2x=4, t2y=0 -> 8/sqrt(96)
    assert r["concordant"] == 4 and r["discordant"] == 0
    assert r["n1_ties_x"] == 2 and r["n2_ties_y"] == 0
    assert abs(r["tau_b"] - 8 / math.sqrt(96)) < 1e-6

    perfect = spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "x int, y int"
    )
    assert kendall_tau_b(perfect, "x", "y").collect()[0]["tau_b"] == 1.0


def test_permutation_test_effect_and_null(spark):
    from gridmet_etl_spark.operators.stats import permutation_test

    # strong separation: treated values 100, control 1 -> p = 1/(P+1)
    rows = [(i, 1, 100) for i in range(20)] + [(i + 20, 0, 1) for i in range(20)]
    df = spark.createDataFrame(rows, "rid long, t int, v long")
    r = permutation_test(df, "rid", "t", "v", n_perm=24).collect()[0]
    assert r["p_value"] == pytest.approx(1 / 25, abs=1e-6)
    assert r["mean_diff"] == pytest.approx(99.0)

    # degenerate null: constant outcome -> every permutation as extreme
    flat = spark.createDataFrame(
        [(i, i % 2, 7) for i in range(30)], "rid long, t int, v long"
    )
    rn = permutation_test(flat, "rid", "t", "v", n_perm=24).collect()[0]
    assert rn["p_value"] == 1.0


def test_ap_at_k_hand_case(spark):
    from gridmet_etl_spark.operators.retrieval import average_precision_at_k

    hits = spark.createDataFrame(
        [(1, i + 1, rel, 3) for i, rel in enumerate([1, 0, 1, 0, 0])],
        "query_id long, rank int, rel int, n_rel_total long",
    )
    r = average_precision_at_k(hits, k=5).collect()[0]
    assert r["n_rel_topk"] == 2
    # (1/1 + 2/3)/3 with floor-e9 terms
    assert r["ap"] == pytest.approx((1_000_000_000 + 666_666_666) / 3e9, abs=1e-6)


def test_bloom_fpr_sweep_shapes(spark):
    from gridmet_etl_spark.operators.decontam import bloom_fpr_sweep

    docs = spark.createDataFrame(
        [(i, f"doc number {i} content {i * 7}") for i in range(200)],
        "doc_id long, text string",
    )
    members = docs.filter(F.col("doc_id") % 2 == 0)
    probes = docs.filter(F.col("doc_id") % 2 == 1)
    cfgs = ((64, 2), (1 << 16, 5))
    out = {(r["m_bits"], r["k_hashes"]): r
           for r in bloom_fpr_sweep(members, probes, configs=cfgs).collect()}
    assert set(out) == {(64, 2), (1 << 16, 5)}
    tiny, big = out[(64, 2)], out[(1 << 16, 5)]
    assert tiny["n_members"] == 100 and tiny["n_probes"] == 100
    # 100 members in 64 bits saturates the filter; 2^16 bits stays clean
    assert tiny["fpr_measured"] > 0.5
    assert big["fpr_measured"] < 0.05
    assert 0.0 <= big["fpr_analytic"] <= 1.0


def test_inter_event_gaps_buckets(spark):
    from datetime import datetime, timedelta

    from gridmet_etl_spark.operators.funnel import inter_event_gaps

    t0 = datetime(2024, 5, 1)
    rows = [
        (1, t0),
        (1, t0 + timedelta(seconds=5)),      # gap 5s -> bucket 1 (<=10)
        (1, t0 + timedelta(seconds=125)),    # gap 120s -> bucket 3 (<=600)
        (2, t0),
        (2, t0 + timedelta(seconds=7200)),   # gap 7200s -> bucket 5 (<=86400)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["bucket"]: r for r in inter_event_gaps(ev).collect()}
    assert len(out) == 7  # every bucket emits, zeros included
    assert out[1]["n"] == 1 and out[3]["n"] == 1 and out[5]["n"] == 1
    assert out[0]["n"] == 0 and out[6]["n"] == 0
    assert sum(r["pct"] for r in out.values()) == pytest.approx(1.0, abs=1e-5)
    assert out[6]["hi_inclusive_s"] is None  # open last bucket


def test_degree_assortativity_numpy_golden(spark):
    import numpy as np

    from gridmet_etl_spark.operators.graph import degree_assortativity

    edges = [(1, 10), (1, 11), (1, 12), (2, 10), (3, 13), (4, 13), (4, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = degree_assortativity(df).collect()[0]
    src_deg = {s: sum(1 for a, _ in edges if a == s) for s, _ in edges}
    dst_deg = {d: sum(1 for _, b in edges if b == d) for _, d in edges}
    x = np.array([src_deg[s] for s, _ in edges], dtype=float)
    y = np.array([dst_deg[d] for _, d in edges], dtype=float)
    expected = np.corrcoef(x, y)[0, 1]
    assert r["n_edges"] == len(edges)
    assert r["r"] == pytest.approx(expected, abs=1e-6)

    # constant degrees -> zero variance -> guarded 0.0
    reg = spark.createDataFrame([(1, 10), (2, 11)], "src long, dst long")
    assert degree_assortativity(reg).collect()[0]["r"] == 0.0


def test_neyman_allocation_invariants(spark):
    from gridmet_etl_spark.operators.sampling import neyman_allocation

    # stratum a: constant (sd=0); stratum b: spread -> b takes the budget
    rows = [("a", 5)] * 50 + [("b", v) for v in range(100)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in neyman_allocation(df, ["g"], "v", 1000).collect()}
    assert out["a"]["alloc"] + out["b"]["alloc"] == 1000
    assert out["a"]["sd"] == 0.0 and out["a"]["alloc"] == 0
    assert out["b"]["alloc"] == 1000

    # all-constant strata: proportional fallback, exact budget
    flat = spark.createDataFrame(
        [("a", 5)] * 30 + [("b", 7)] * 10, "g string, v long"
    )
    out2 = {r["g"]: r for r in neyman_allocation(flat, ["g"], "v", 100).collect()}
    assert out2["a"]["alloc"] + out2["b"]["alloc"] == 100
    assert out2["a"]["alloc"] == 75 and out2["b"]["alloc"] == 25


def test_propensity_match_att_constructed(spark):
    from gridmet_etl_spark.operators.causal import propensity_match_att

    # within each stratum: treated outcome = control + 10, equal arms
    rows = []
    uid = 0
    for s in range(3):
        for i in range(8):
            rows.append((uid, 20 + s * 5 + 10, 1, s)); uid += 1
            rows.append((uid, 20 + s * 5, 0, s)); uid += 1
    units = spark.createDataFrame(rows, "user_id long, y long, t int, stratum int")
    r = propensity_match_att(units).collect()[0]
    assert r["n_matched"] == 24 and r["n_unmatched_treated"] == 0
    # outcomes are constant per (stratum, arm), so any pairing gives +10
    assert r["att"] == pytest.approx(10.0)

    # shortage: 3 treated vs 1 control in one stratum
    short = spark.createDataFrame(
        [(1, 30, 1, 0), (2, 31, 1, 0), (3, 32, 1, 0), (4, 20, 0, 0)],
        "user_id long, y long, t int, stratum int",
    )
    rs = propensity_match_att(short).collect()[0]
    assert rs["n_matched"] == 1 and rs["n_unmatched_treated"] == 2


def test_hill_tail_index_pareto(spark):
    import numpy as np

    from gridmet_etl_spark.operators.textops import hill_tail_index

    # deterministic Pareto order statistics with tail index alpha=2:
    # v_i = (n/i)^(1/2), i=1..n
    n, alpha, k = 5000, 2.0, 100
    vals = [(float((n / i) ** (1 / alpha)),) for i in range(1, n + 1)]
    df = spark.createDataFrame(vals, "v double")
    r = hill_tail_index(df, "v", k=k).collect()[0]
    v = np.array([x[0] for x in vals])
    top = np.sort(v)[::-1][: k + 1]
    terms = np.floor((np.log(top) - np.log(top[-1])) * 1e6)
    expected_mean = terms.sum() / 1e6 / k
    assert r["k"] == k and r["n"] == n
    assert r["hill_mean"] == pytest.approx(expected_mean, abs=1e-3)
    assert abs(r["alpha"] - alpha) < 0.25  # estimator near the true index


# ===== round-8 wave 3 ======================================================


def test_mcnemar_textbook(spark):
    from gridmet_etl_spark.operators.stats import mcnemar_test

    rows = (
        [(True, True)] * 30 + [(False, False)] * 10
        + [(True, False)] * 5 + [(False, True)] * 15
    )
    df = spark.createDataFrame(rows, "ca boolean, cb boolean")
    r = mcnemar_test(df, "ca", "cb").collect()[0]
    assert (r["a_only"], r["b_only"]) == (5, 15)
    assert r["chi2"] == pytest.approx((abs(5 - 15) - 1) ** 2 / 20)

    agree = spark.createDataFrame([(True, True)] * 5, "ca boolean, cb boolean")
    assert mcnemar_test(agree, "ca", "cb").collect()[0]["chi2"] == 0.0


def test_cochran_q_brute(spark):
    from gridmet_etl_spark.operators.stats import cochran_q

    # classic 3-treatment example
    grid = []
    marks = [
        (1, 1, 1), (1, 1, 0), (1, 1, 0), (0, 1, 0), (1, 0, 0),
        (0, 1, 1), (1, 1, 0), (0, 0, 0), (1, 1, 1), (0, 1, 0),
    ]
    for b, row in enumerate(marks):
        for t, hit in enumerate(row):
            grid.append((b, t, hit))
    df = spark.createDataFrame(grid, "b long, t int, hit int")
    r = cochran_q(df, "b", "t", "hit").collect()[0]
    k = 3
    cj = [sum(row[t] for row in marks) for t in range(k)]
    ri = [sum(row) for row in marks]
    tg = sum(cj)
    q = (k - 1) * (k * sum(c * c for c in cj) - tg * tg) / (
        k * tg - sum(x * x for x in ri)
    )
    assert r["k"] == 3 and r["t_grand"] == tg
    assert r["q"] == pytest.approx(q, abs=1e-6)


def test_log_odds_direction_and_antisymmetry(spark):
    from gridmet_etl_spark.operators.textops import log_odds_words

    a = spark.createDataFrame(
        [(1, "alpha alpha alpha shared shared")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "beta beta beta shared shared")], "doc_id long, text string"
    )
    out = {r["word"]: r for r in log_odds_words(a, b, k=10).collect()}
    assert out["alpha"]["z"] > 0 and out["beta"]["z"] < 0
    swapped = {r["word"]: r for r in log_odds_words(b, a, k=10).collect()}
    assert swapped["alpha"]["z"] == pytest.approx(-out["alpha"]["z"], abs=1e-9)
    assert swapped["beta"]["z"] == pytest.approx(-out["beta"]["z"], abs=1e-9)


def test_info_gain_extremes(spark):
    from gridmet_etl_spark.operators.mlprep import info_gain

    # perfect: feature == target; useless: constant feature
    rows = [("en", "en_src", "x")] * 30 + [("de", "de_src", "x")] * 10
    df = spark.createDataFrame(rows, "lang string, good string, bad string")
    out = {r["feature"]: r for r in info_gain(df, "lang", ["good", "bad"]).collect()}
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert out["good"]["h_target"] == pytest.approx(h, abs=1e-3)
    assert out["good"]["info_gain"] == pytest.approx(h, abs=1e-3)  # IG == H
    assert out["bad"]["info_gain"] == pytest.approx(0.0, abs=1e-3)


def test_runs_test_patterns(spark):
    from datetime import date, timedelta

    from gridmet_etl_spark.operators.timeseries import runs_test

    d0 = date(2024, 1, 1)
    # alternating: runs = n (maximum) -> z > 0
    alt = spark.createDataFrame(
        [(d0 + timedelta(days=i), i % 2 == 0) for i in range(20)],
        "day date, above boolean",
    )
    ra = runs_test(alt, "day", "above").collect()[0]
    assert ra["runs"] == 20 and ra["z"] > 0
    # two blocks: runs = 2 (minimum) -> z < 0
    blk = spark.createDataFrame(
        [(d0 + timedelta(days=i), i < 10) for i in range(20)],
        "day date, above boolean",
    )
    rb = runs_test(blk, "day", "above").collect()[0]
    assert rb["runs"] == 2 and rb["z"] < 0
    # hand z for the block case: n1=n0=10, mu=11, var=2*100*(200-20)/(400*19)
    mu = 2 * 10 * 10 / 20 + 1
    var = 2 * 10 * 10 * (2 * 10 * 10 - 20) / (20 * 20 * 19)
    assert rb["z"] == pytest.approx((2 - mu) / math.sqrt(var), abs=1e-6)
