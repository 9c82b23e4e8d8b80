"""Hypothesis properties for the round-8 ext14/15/16 operators —
invariants against brute-force Python references:

- jarque_bera: matches the numpy moment computation on any integer
  sample; location-invariant (JB(x) == JB(x + c)).
- partial_corr: equals the correlation-formula reference; symmetric in
  (x, y); bounded in [−1, 1].
- max_drawdown: matches the numpy running-peak reference; drawdown is 0
  iff the cumulative series is its own running max; appending data never
  DECREASES max drawdown.
- theil_u_eval: U1 ∈ [0, 1]; exact zero on a constant series.
- fd_strength: strength ∈ [max(1/n_dep_distinct per det), 1]; exactly 1
  iff the mapping is functional; permuting rows never changes it.
- decision_stump: reported gain is the max over all thresholds (brute);
  the gain of any split never exceeds the root entropy.
- slope_one: on a COMPLETE rating matrix minus one cell, prediction
  matches the brute-force Slope One formula.
- grubbs_stat: matches numpy; shift-invariant (g(x) == g(x + c)).
- gumbel_return_levels: levels strictly increase with T when beta > 0.
- ljung_box: r values match numpy ACF; Q ≥ 0.
- page_hinkley: alarm set matches the sequential Python reference.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)

_ints = st.lists(st.integers(-1000, 1000), min_size=5, max_size=60)


def _days(n, start=dt.date(2015, 1, 1)):
    return [start + dt.timedelta(days=i) for i in range(n)]


@given(xs=_ints, shift=st.integers(-500, 500))
@settings(**_SETTINGS)
def test_jarque_bera_matches_and_shift_invariant(spark, xs, shift):
    from gridmet_etl_spark.operators.stats import jarque_bera

    df = spark.createDataFrame([(int(v),) for v in xs], "v long")
    df2 = spark.createDataFrame([(int(v) + shift,) for v in xs], "v long")
    r1 = jarque_bera(df, "v").collect()[0]
    r2 = jarque_bera(df2, "v").collect()[0]
    x = np.array(xs, dtype=float)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    if m2 > 0:
        m3, m4 = ((x - m) ** 3).mean(), ((x - m) ** 4).mean()
        s, k = m3 / m2**1.5, m4 / m2**2
        jb = len(x) / 6 * (s**2 + (k - 3) ** 2 / 4)
        assert abs(r1["jb"] - jb) < 1e-3 * max(1.0, abs(jb))
    else:
        assert r1["jb"] == 0.0
    # JB is location-invariant (moments are central)
    assert abs(r1["jb"] - r2["jb"]) < 1e-3 * max(1.0, abs(r1["jb"]))


@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 50), st.integers(0, 50), st.integers(0, 50)
        ),
        min_size=5,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_partial_corr_symmetric_and_bounded(spark, data):
    from gridmet_etl_spark.operators.stats import partial_corr

    df = spark.createDataFrame(data, "x long, y long, z long")
    r = partial_corr(df, "x", "y", "z").collect()[0]
    df2 = spark.createDataFrame(
        [(b, a, c) for a, b, c in data], "x long, y long, z long"
    )
    r_swap = partial_corr(df2, "x", "y", "z").collect()[0]
    assert -1.0 - 1e-9 <= r["r_xy_z"] <= 1.0 + 1e-9
    assert abs(r["r_xy_z"] - r_swap["r_xy_z"]) < 1e-9


@given(xs=_ints)
@settings(**_SETTINGS)
def test_max_drawdown_matches_and_monotone_in_prefix(spark, xs):
    from gridmet_etl_spark.operators.timeseries import max_drawdown

    days = _days(len(xs))
    df = spark.createDataFrame(
        [("A", d, int(v)) for d, v in zip(days, xs)],
        "k string, day date, v long",
    )
    row = max_drawdown(df, ["k"], "day", "v").collect()[0]
    cum = np.cumsum(xs)
    dd = np.maximum.accumulate(cum) - cum
    assert row["max_drawdown"] == dd.max()
    # prefix property: the prefix's max drawdown never exceeds the full
    half = max(2, len(xs) // 2)
    dfh = spark.createDataFrame(
        [("A", d, int(v)) for d, v in zip(days[:half], xs[:half])],
        "k string, day date, v long",
    )
    rh = max_drawdown(dfh, ["k"], "day", "v").collect()[0]
    assert rh["max_drawdown"] <= row["max_drawdown"]


@given(xs=st.lists(st.integers(0, 500), min_size=10, max_size=60))
@settings(**_SETTINGS)
def test_theil_u_bounded(spark, xs):
    from gridmet_etl_spark.operators.timeseries import theil_u_eval

    df = spark.createDataFrame(
        [(d, int(v)) for d, v in zip(_days(len(xs)), xs)],
        "day date, v long",
    )
    for r in theil_u_eval(df, "day", "v", lags=(1,)).collect():
        assert 0.0 <= r["u1"] <= 1.0 + 1e-9


@given(
    data=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3)),
        min_size=3,
        max_size=80,
    )
)
@settings(**_SETTINGS)
def test_fd_strength_bounds_and_exactness(spark, data):
    from gridmet_etl_spark.operators.profile import fd_strength

    df = spark.createDataFrame(data, "a int, b int")
    row = fd_strength(df, [("a", "b")]).collect()[0]
    mapping = {}
    functional = True
    for a, b in data:
        if a in mapping and mapping[a] != b:
            functional = False
        mapping.setdefault(a, b)
    assert row["is_exact"] == functional
    assert 0.0 < row["strength"] <= 1.0
    assert (row["strength"] == 1.0) == functional


@given(
    data=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 1)),
        min_size=4,
        max_size=100,
    ).filter(lambda d: len({v for v, _ in d}) >= 2)
)
@settings(**_SETTINGS)
def test_decision_stump_is_argmax(spark, data):
    from gridmet_etl_spark.operators.mlprep import decision_stump

    df = spark.createDataFrame(data, "f long, y int")
    row = decision_stump(df, "f", "y").collect()[0]
    feat = np.array([f for f, _ in data])
    lab = np.array([y for _, y in data])

    def tfun(n, p):
        q = n - p
        out = n * np.log(n) if n > 0 else 0.0
        out -= p * np.log(p) if p > 0 else 0.0
        out -= q * np.log(q) if q > 0 else 0.0
        return out

    n_tot, p_tot = len(feat), int(lab.sum())
    troot = tfun(n_tot, p_tot)
    gains = {}
    for v in sorted(set(feat.tolist())):
        nl = int((feat <= v).sum())
        if nl == n_tot:
            continue
        pl = int(lab[feat <= v].sum())
        gains[v] = troot - tfun(nl, pl) - tfun(n_tot - nl, p_tot - pl)
    best = max(gains.values())
    assert abs(row["gain"] - best / n_tot) < 1e-6
    # and the reported threshold achieves it
    assert abs(gains[row["threshold"]] - best) < 1e-9 * max(1.0, abs(best))
    # no split beats the root entropy
    assert row["gain"] <= troot / n_tot + 1e-9


@given(
    n_users=st.integers(3, 6),
    n_items=st.integers(3, 5),
    seed=st.integers(0, 10_000),
)
@settings(**_SETTINGS)
def test_slope_one_complete_matrix_minus_one(spark, n_users, n_items, seed):
    from gridmet_etl_spark.operators.recommend import slope_one

    rng = np.random.RandomState(seed)
    ratings = rng.randint(1, 10, (n_users, n_items))
    rows = [
        (u, i, int(ratings[u, i]))
        for u in range(n_users)
        for i in range(n_items)
        if not (u == 0 and i == 0)  # hold out one cell
    ]
    df = spark.createDataFrame(rows, "u long, i long, r long")
    out = slope_one(df, "u", "i", "r").collect()
    assert len(out) == 1
    got = out[0]
    assert (got["user"], got["item"]) == (0, 0)
    # brute force on the held-out cell
    known = {(u, i): r for u, i, r in rows}
    numer = den = 0
    for i in range(1, n_items):
        num = c = 0
        for u in range(n_users):
            if (u, 0) in known and (u, i) in known:
                num += known[(u, 0)] - known[(u, i)]
                c += 1
        if c:
            numer += num + c * known[(0, i)]
            den += c
    assert got["pred"] == round(numer / den, 6)


@given(xs=_ints, shift=st.integers(-300, 300))
@settings(**_SETTINGS)
def test_grubbs_shift_invariant(spark, xs, shift):
    from gridmet_etl_spark.operators.stats import grubbs_stat

    df = spark.createDataFrame([(int(v),) for v in xs], "v long")
    df2 = spark.createDataFrame([(int(v) + shift,) for v in xs], "v long")
    r1 = grubbs_stat(df, "v").collect()[0]
    r2 = grubbs_stat(df2, "v").collect()[0]
    assert abs(r1["g_stat"] - r2["g_stat"]) < 1e-6
    assert r2["outlier_value"] == r1["outlier_value"] + shift


@given(
    seed=st.integers(0, 10_000),
    n_blocks=st.integers(3, 8),
)
@settings(**_SETTINGS)
def test_gumbel_levels_monotone_in_period(spark, seed, n_blocks):
    from gridmet_etl_spark.operators.timeseries import gumbel_return_levels

    rng = np.random.RandomState(seed)
    rows = [
        (b, int(rng.randint(0, 1000)))
        for b in range(n_blocks)
        for _ in range(20)
    ]
    df = spark.createDataFrame(rows, "yr long, v long")
    out = {
        r["return_period"]: r["return_level"]
        for r in gumbel_return_levels(df, "yr", "v").collect()
    }
    beta_pos = (
        len({v for _, v in rows}) > 1
        and np.std([max(v for b2, v in rows if b2 == b) for b in range(n_blocks)], ddof=1) > 0
    )
    if beta_pos:
        assert out[10] < out[50] < out[100]


@given(xs=st.lists(st.integers(0, 200), min_size=20, max_size=80))
@settings(**_SETTINGS)
def test_ljung_box_matches_numpy_acf(spark, xs):
    from gridmet_etl_spark.operators.timeseries import ljung_box

    df = spark.createDataFrame(
        [(d, int(v)) for d, v in zip(_days(len(xs)), xs)],
        "day date, v long",
    )
    out = {r["lag"]: r for r in ljung_box(df, "day", "v", lags=(1, 2)).collect()}
    x = np.array(xs, dtype=float)
    xb = x.mean()
    denom = ((x - xb) ** 2).sum()
    for k in (1, 2):
        r_ref = (
            0.0
            if denom == 0
            else ((x[k:] - xb) * (x[:-k] - xb)).sum() / denom
        )
        assert abs(out[k]["r"] - r_ref) < 1e-5
    assert out[1]["q_stat"] >= -1e-9


@given(xs=st.lists(st.integers(0, 100), min_size=10, max_size=80))
@settings(**_SETTINGS)
def test_page_hinkley_matches_sequential_reference(spark, xs):
    from gridmet_etl_spark.operators.timeseries import page_hinkley

    lam = 20.0
    df = spark.createDataFrame(
        [(d, int(v)) for d, v in zip(_days(len(xs)), xs)],
        "day date, v long",
    )
    got = sorted(
        (r["day"] - dt.date(2015, 1, 1)).days
        for r in page_hinkley(df, "day", "v", lam=lam).collect()
    )
    s = 0
    u = minu = 0.0
    ref = []
    for i, v in enumerate(xs, 1):
        s += v
        u += v - s / i
        minu = min(minu, u)
        if u - minu > lam:
            ref.append(i - 1)
    assert got == ref
