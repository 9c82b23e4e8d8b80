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
