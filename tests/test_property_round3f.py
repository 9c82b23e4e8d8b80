"""Hypothesis property tests for the session-E operators: CDC apply vs a
sequential dict replay, histogram-quantile error bounds vs exact
quantiles, IDW range containment, Kaplan–Meier vs a sequential reference,
item-cosine symmetry. Generation driver-side, few examples — these
complement the fixed goldens in test_round3f."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    snap=st.dictionaries(st.integers(0, 9), st.floats(0, 100, allow_nan=False), max_size=6),
    log=st.lists(
        st.tuples(
            st.integers(0, 9),                      # key
            st.integers(0, 20),                     # seq
            st.sampled_from(["I", "U", "D"]),       # op
            st.floats(0, 100, allow_nan=False),     # value
        ),
        max_size=12,
    ),
)
def test_cdc_apply_matches_sequential_replay(spark, snap, log):
    """cdc_apply == replaying the log sorted by seq into a dict (ties on
    seq resolved identically: max_by picks the max-seq struct, and our
    generator dedups (key, seq) to keep winners unambiguous)."""
    seen = set()
    clean = []
    for k, s, op, v in log:
        if (k, s) not in seen:
            seen.add((k, s))
            clean.append((k, s, op, v))
    from gridmet_etl_spark.operators.scd import cdc_apply

    snap_df = spark.createDataFrame(
        [(k, v) for k, v in snap.items()] or [(None, None)], "k int, v double"
    ).where(F.col("k").isNotNull())
    log_df = spark.createDataFrame(
        clean or [(None, None, None, None)], "k int, seq int, op string, v double"
    ).where(F.col("k").isNotNull())
    got = {r.k: r.v for r in cdc_apply(snap_df, log_df, ["k"], ["v"]).collect()}
    state = dict(snap)
    winners = {}
    for k, s, op, v in clean:
        if k not in winners or s > winners[k][0]:
            winners[k] = (s, op, v)
    for k, (_s, op, v) in winners.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert set(got) == set(state)
    for k in state:
        assert got[k] == pytest.approx(state[k], nan_ok=True)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.floats(0, 1000, allow_nan=False), min_size=5, max_size=60),
    q=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]),
)
def test_hist_quantile_error_bounded_by_bin_width(spark, vals, q):
    from gridmet_etl_spark.operators.sketch import hist_merge_quantiles, hist_rollup

    bins = 32
    lo, hi = 0.0, 1000.0
    width = (hi - lo) / bins
    df = spark.createDataFrame([(("g"), float(v)) for v in vals], "g string, x double")
    roll = hist_rollup(df, ["g"], "x", lo=lo, hi=hi, bins=bins)
    est = hist_merge_quantiles(roll, ["g"], [q], lo=lo, hi=hi, bins=bins).collect()[0].est
    sv = sorted(vals)
    # exact continuous-rank quantile bracket: the estimate must fall
    # within one bin width of SOME value at the target rank neighborhood
    r = q * len(sv)
    idx = min(len(sv) - 1, max(0, math.ceil(r) - 1))
    assert abs(est - sv[idx]) <= width + 1e-6


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.floats(40.0, 41.0, allow_nan=False),
            st.floats(-101.0, -100.0, allow_nan=False),
            st.floats(0, 50, allow_nan=False),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_idw_within_station_value_range(spark, pts):
    """An IDW estimate is a convex combination: min(v) ≤ idw ≤ max(v)."""
    from gridmet_etl_spark.operators.geo import idw_interpolate

    st_df = spark.createDataFrame(
        [(i, la, lo, v) for i, (la, lo, v) in enumerate(pts)],
        "station_id int, lat double, lon double, value double",
    )
    tg = spark.createDataFrame([(1, 40.5, -100.5)], "target_id int, lat double, lon double")
    out = idw_interpolate(
        st_df, tg, radius_km=150.0, cell_deg=2.0, max_abs_lat=41.0
    ).collect()
    if out:
        v = [p[2] for p in pts]
        assert min(v) - 1e-6 <= out[0].idw_value <= max(v) + 1e-6


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    subj=st.lists(
        st.tuples(st.integers(1, 15), st.booleans()), min_size=1, max_size=25
    )
)
def test_kaplan_meier_matches_sequential(spark, subj):
    from gridmet_etl_spark.operators.stats import kaplan_meier

    df = spark.createDataFrame(
        [("g", t, int(e)) for t, e in subj], "g string, dur int, ev int"
    )
    got = {r.t: (r.n_risk, r.d, r.surv) for r in kaplan_meier(
        df, ["g"], "dur", "ev"
    ).collect()}
    # sequential reference
    times = sorted({t for t, e in subj if e})
    s = 1.0
    for t in times:
        n = sum(1 for tt, _ in subj if tt >= t)
        d = sum(1 for tt, e in subj if tt == t and e)
        s *= 1 - d / n
        assert got[t][0] == n and got[t][1] == d
        assert got[t][2] == pytest.approx(s, abs=1e-5)
    assert set(got) == set(times)
