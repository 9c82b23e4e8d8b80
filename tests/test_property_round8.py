"""Hypothesis properties for the round-8 ext13 operators — invariants
against brute-force Python references:

- kendall_tau_b: equals the O(n²) pairwise definition exactly (C, D, tie
  counts) for ANY integer pairs; τ ∈ [−1, 1]; symmetric in (x, y);
  invariant under strictly monotone transforms.
- permutation_test: p ∈ [1/(P+1), 1]; n_extreme counts every permutation
  at least once when the observed statistic is 0 (constant values).
- average_precision_at_k: equals the textbook AP computed driver-side on
  any rel vector; ∈ [0, 1].
- degree_assortativity: matches numpy corrcoef of edge endpoint degrees
  on any random digraph (guarded degenerate variance → 0).
- neyman_allocation: Σ alloc == budget for any strata/values; every
  alloc ≥ base quota ≥ 0.
- hill_tail_index: matches the numpy Hill computation (same e6
  quantization) on any positive sample.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


def _kendall_brute(pairs):
    c = d = 0
    n = len(pairs)
    for i in range(n):
        for j in range(i + 1, n):
            (xa, ya), (xb, yb) = pairs[i], pairs[j]
            s = (xa - xb) * (ya - yb)
            if s > 0:
                c += 1
            elif s < 0:
                d += 1
    from collections import Counter

    t2x = sum(t * (t - 1) for t in Counter(x for x, _ in pairs).values())
    t2y = sum(t * (t - 1) for t in Counter(y for _, y in pairs).values())
    n0x2 = n * (n - 1)
    den = (n0x2 - t2x) * (n0x2 - t2y)
    tau = 0.0 if den <= 0 else 2.0 * (c - d) / math.sqrt(den)
    return c, d, t2x // 2, t2y // 2, tau


@settings(**_SETTINGS)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=5),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_kendall_matches_bruteforce(spark, pts):
    from gridmet_etl_spark.operators.stats import kendall_tau_b

    df = spark.createDataFrame(pts, "x int, y int")
    [r] = kendall_tau_b(df, "x", "y").collect()
    c, d, n1, n2, tau = _kendall_brute(pts)
    assert (r.concordant, r.discordant) == (c, d)
    assert (r.n1_ties_x, r.n2_ties_y) == (n1, n2)
    assert abs(r.tau_b - round(tau, 6)) < 1e-9
    assert -1.0 <= r.tau_b <= 1.0
    # symmetry in (x, y)
    [rs] = kendall_tau_b(
        df.selectExpr("y as x", "x as y"), "x", "y"
    ).collect()
    assert rs.tau_b == pytest.approx(r.tau_b, abs=1e-9)
    # strictly monotone transform invariance
    [rm] = kendall_tau_b(
        df.selectExpr("x * 7 - 3 as x", "y"), "x", "y"
    ).collect()
    assert rm.tau_b == pytest.approx(r.tau_b, abs=1e-9)


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=20), min_size=6, max_size=24),
    seed=st.integers(min_value=0, max_value=99),
)
def test_permutation_p_bounds(spark, vals, seed):
    from gridmet_etl_spark.operators.stats import permutation_test

    n_perm = 12
    rows = [(i, (i * 7 + seed) % 3 == 0, v) for i, v in enumerate(vals)]
    # need both groups non-empty
    if not any(t for _, t, _ in rows) or all(t for _, t, _ in rows):
        return
    df = spark.createDataFrame(
        [(i, int(t), v) for i, t, v in rows], "rid long, t int, v long"
    )
    [r] = permutation_test(df, "rid", "t", "v", n_perm=n_perm).collect()
    # p is reported rounded to 6 digits, so compare against the rounded
    # theoretical floor (1/(P+1) truncates slightly at 6 digits)
    assert round(1 / (n_perm + 1), 6) <= r.p_value <= 1.0
    assert 0 <= r.n_extreme <= n_perm


@settings(**_SETTINGS)
@given(
    rels=st.lists(st.booleans(), min_size=1, max_size=10),
    extra_rel=st.integers(min_value=0, max_value=5),
)
def test_ap_matches_textbook(spark, rels, extra_rel):
    from gridmet_etl_spark.operators.retrieval import average_precision_at_k

    k = len(rels)
    n_rel_total = sum(rels) + extra_rel
    hits = spark.createDataFrame(
        [(1, i + 1, int(rel), n_rel_total) for i, rel in enumerate(rels)],
        "query_id long, rank int, rel int, n_rel_total long",
    )
    [r] = average_precision_at_k(hits, k=k).collect()
    # textbook with the same floor-e9 term discipline
    cum, s = 0, 0
    for i, rel in enumerate(rels, start=1):
        if rel:
            cum += 1
            s += cum * 10**9 // i
    denom = min(n_rel_total, k)
    expected = 0.0 if denom <= 0 else s / (denom * 1e9)
    assert r.ap == pytest.approx(round(expected, 6), abs=1e-9)
    assert 0.0 <= r.ap <= 1.0


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=10, max_value=16),
        ),
        min_size=2,
        max_size=40,
        unique=True,
    )
)
def test_assortativity_matches_numpy(spark, edges):
    import numpy as np

    from gridmet_etl_spark.operators.graph import degree_assortativity

    df = spark.createDataFrame(edges, "src long, dst long")
    [r] = degree_assortativity(df).collect()
    from collections import Counter

    sd, dd = Counter(s for s, _ in edges), Counter(d for _, d in edges)
    x = np.array([sd[s] for s, _ in edges], dtype=float)
    y = np.array([dd[d] for _, d in edges], dtype=float)
    if x.std() == 0 or y.std() == 0:
        assert r.r == 0.0
    else:
        assert r.r == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-6)


@settings(**_SETTINGS)
@given(
    groups=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=2,
        max_size=60,
    ),
    budget=st.integers(min_value=1, max_value=5000),
)
def test_neyman_budget_exact(spark, groups, budget):
    from gridmet_etl_spark.operators.sampling import neyman_allocation

    df = spark.createDataFrame(groups, "g string, v long")
    rows = neyman_allocation(df, ["g"], "v", budget).collect()
    assert sum(r.alloc for r in rows) == budget
    for r in rows:
        assert r.alloc >= r.base_quota >= 0


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.floats(min_value=0.1, max_value=1e6, allow_nan=False,
                  allow_infinity=False),
        min_size=5,
        max_size=120,
    ),
    k=st.integers(min_value=2, max_value=20),
)
def test_hill_matches_numpy(spark, vals, k):
    import numpy as np

    from gridmet_etl_spark.operators.textops import hill_tail_index

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    [r] = hill_tail_index(df, "v", k=k).collect()
    top = np.sort(np.array(vals))[::-1][: k + 1]
    terms = np.floor((np.log(top) - np.log(top[-1])) * 1e6)
    m = len(top)
    expected_mean = 0.0 if m - 1 <= 0 else terms.sum() / 1e6 / (m - 1)
    assert r.hill_mean == pytest.approx(round(expected_mean, 4), abs=1e-9)
    assert r.k == m - 1
