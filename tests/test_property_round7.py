"""Hypothesis properties for the round-7 operators — invariants that hold
for ANY input, complementing the hand-golden tests:

- spearman: rho ∈ [−1, 1]; invariant under any strictly monotone
  transform of either column; exactly symmetric in (x, y).
- kruskal: H ≥ 0; invariant under strictly monotone value transforms
  (rank statistics see only the order).
- winsorized: lo ≤ winsorized_mean ≤ hi; trimmed/winsorized means lie
  within the raw data's range; n_trimmed < n.
- rbo: ∈ [0, 1]; identical rankings → 1; symmetric in (a, b).
- gapfill: observed rows pass through; every interpolated value lies
  between its bracketing observed values.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=3,
        max_size=40,
    )
)
def test_spearman_bounds_symmetry_monotone_invariance(spark, pts):
    from gridmet_etl_spark.operators.stats import spearman_corr

    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], ["x", "y"]
    )
    [r] = spearman_corr(df, "x", "y").collect()
    assert -1.0 <= r.rho <= 1.0
    [rs] = spearman_corr(df, "y", "x").collect()
    assert rs.rho == pytest.approx(r.rho, abs=1e-9)
    # strictly monotone transform of x: ranks identical -> rho identical
    mono = df.selectExpr("CAST(x * 7 + 1000 AS DOUBLE) AS x", "y")
    [rm] = spearman_corr(mono, "x", "y").collect()
    assert rm.rho == pytest.approx(r.rho, abs=1e-9)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=4,
        max_size=40,
    )
)
def test_kruskal_nonnegative_and_monotone_invariant(spark, vals):
    from gridmet_etl_spark.operators.stats import kruskal_wallis

    if len({g for g, _ in vals}) < 2:
        vals = vals + [("a", 0), ("b", 1)]
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in vals], ["g", "v"]
    )
    rows = kruskal_wallis(df, "v", "g").collect()
    h = rows[0].h
    assert h >= 0.0 and rows[0].h_corrected >= 0.0
    mono = df.selectExpr("g", "CAST(v * 3 + 7 AS DOUBLE) AS v")
    rows2 = kruskal_wallis(mono, "v", "g").collect()
    assert rows2[0].h == pytest.approx(h, abs=1e-9)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=1,
        max_size=60,
    )
)
def test_winsorized_bounds(spark, vals):
    from gridmet_etl_spark.operators.stats import winsorized_stats

    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    [r] = winsorized_stats(df, "v").collect()
    assert r.lo_bound <= r.hi_bound
    assert min(vals) <= r.winsorized_mean <= max(vals)
    assert min(vals) <= r.trimmed_mean <= max(vals)
    assert r.lo_bound <= r.winsorized_mean <= r.hi_bound
    # degenerate n (empty trim core) reports n_trimmed == n with the
    # winsorized fallback; otherwise the core is non-empty
    assert 0 <= r.n_trimmed <= r.n == len(vals)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    perm=st.permutations(list(range(16))),
    data=st.data(),
)
def test_rbo_bounds_and_symmetry(spark, perm, data):
    from gridmet_etl_spark.operators.scoring import rbo_overlap

    a_items = list(range(100, 116))
    b_items = [100 + p for p in perm]

    def rk(items):
        return spark.createDataFrame(
            [(it, i + 1) for i, it in enumerate(items)], ["item", "rank"]
        )

    ab = rbo_overlap(rk(a_items), rk(b_items), k=16).collect()
    assert 0.0 <= ab[0].rbo <= 1.0
    ba = rbo_overlap(rk(b_items), rk(a_items), k=16).collect()
    assert ba[0].rbo == pytest.approx(ab[0].rbo, abs=1e-12)
    same = rbo_overlap(rk(a_items), rk(a_items), k=16).collect()
    assert same[0].rbo >= ab[0].rbo  # self-agreement is maximal


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=2,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_gapfill_interpolates_between_neighbors(spark, obs):
    import datetime as dt

    from gridmet_etl_spark.operators.timeseries import gapfill_interp

    base = dt.date(2024, 3, 1)
    obs = sorted(obs)
    daily = spark.createDataFrame(
        [("s", base + dt.timedelta(days=d), float(v)) for d, v in obs],
        ["k", "day", "value"],
    )
    rows = sorted(
        gapfill_interp(daily, ["k"], "day", "value").collect(),
        key=lambda r: r.day,
    )
    assert len(rows) == obs[-1][0] - obs[0][0] + 1
    by_day = {(r.day - base).days: r for r in rows}
    for d, v in obs:
        assert not by_day[d].is_filled
        assert by_day[d].value == pytest.approx(v, abs=1e-6)
    # every filled day lies between its bracketing observed values
    days = [d for d, _ in obs]
    for (d0, v0), (d1, v1) in zip(obs, obs[1:]):
        lo, hi = min(v0, v1), max(v0, v1)
        for d in range(d0 + 1, d1):
            r = by_day[d]
            assert r.is_filled and lo - 1e-6 <= r.value <= hi + 1e-6
            assert r.gap_fill_src_span == d1 - d0
    del days


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),           # user
            st.integers(min_value=0, max_value=600),          # minute
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    ),
    window_s=st.sampled_from([600, 3600, 36000]),
)
def test_window_funnel_properties(spark, events, window_s):
    """Level counts partition the step-1 users; totals are monotone in
    window size (a wider window can only deepen chains, never lose
    users); levels are within [1, k]."""
    import datetime as dt

    from pyspark.sql import functions as F

    from gridmet_etl_spark.operators.funnel import window_funnel

    base = dt.datetime(2024, 1, 1, 8, 0)
    rows = [
        (u, base + dt.timedelta(minutes=m), t) for u, m, t in events
    ]
    e = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    steps = ["view", "click", "purchase"]
    out = {r.level: r.n_users for r in window_funnel(e, steps, window_s).collect()}
    anchors = {u for u, _, t in events if t == "view"}
    assert sum(out.values()) == len(anchors)
    assert all(1 <= lv <= 3 for lv in out)

    wide = {
        r.level: r.n_users
        for r in window_funnel(e, steps, window_s * 10).collect()
    }
    # cumulative users at-or-above each level never shrink with the window
    for lv in (1, 2, 3):
        at_least_narrow = sum(n for v, n in out.items() if v >= lv)
        at_least_wide = sum(n for v, n in wide.items() if v >= lv)
        assert at_least_wide >= at_least_narrow

    with pytest.raises(ValueError, match="distinct"):
        window_funnel(e, ["view", "view"], window_s)
