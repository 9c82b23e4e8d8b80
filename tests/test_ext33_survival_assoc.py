"""Round-9 ext33 tests: references for km_rmst (lifelines-free KM area
replay), gk_lambda, and somers_d."""

import numpy as np


def test_rmst_matches_km_replay(spark):
    from gridmet_etl_spark.operators.stats import km_rmst

    rng = np.random.RandomState(5)
    dur = rng.randint(1, 40, 500)
    ev = (rng.rand(500) < 0.8).astype(int)
    df = spark.createDataFrame(
        [("A", int(d), int(e)) for d, e in zip(dur, ev)],
        "g string, dur long, ev int",
    )
    tau = 30
    out = km_rmst(df, ["g"], "dur", "ev", tau=tau, km_digits=6).collect()[0]
    # replay KM + trapezoid-free step area in numpy
    times = np.unique(dur[ev == 1])
    s = 1.0
    prev_t = 0
    area = 0.0
    s_curve = []
    for t in np.unique(dur):
        n_risk = (dur >= t).sum()
        d = ((dur == t) & (ev == 1)).sum()
        if d > 0:
            s_new = s * (1 - d / n_risk)
            s_curve.append((t, s_new))
            s = s_new
    s = 1.0
    prev_t = 0
    for t, s_at in s_curve:
        if t > tau:
            break
        area += s * (t - prev_t)
        s, prev_t = round(s_at, 6), int(t)
    area += s * (tau - prev_t)
    assert abs(out["rmst"] - area) < 1e-4
    assert 0 < out["rmst"] <= tau


def test_rmst_no_events_before_tau_full_horizon(spark):
    from gridmet_etl_spark.operators.stats import km_rmst

    # events exist but only one lands before tau; the area integrates
    # the single step (the all-censored/no-early-event case emits tau —
    # see test_rmst_all_censored_group_emits_tau)
    rows = [("A", 10, 1)] + [("A", 50, 1)] * 9
    df = spark.createDataFrame(rows, "g string, dur long, ev int")
    out = km_rmst(df, ["g"], "dur", "ev", tau=30).collect()[0]
    # S drops to 0.9 at t=10: area = 1*10 + 0.9*20 = 28
    assert abs(out["rmst"] - 28.0) < 1e-9


def test_gk_lambda_perfect_and_independent(spark):
    from gridmet_etl_spark.operators.stats import gk_lambda

    # perfect prediction: y = x
    rows = [(i % 4, i % 4) for i in range(400)]
    df = spark.createDataFrame(rows, "x int, y int")
    out = gk_lambda(df, "x", "y").collect()[0]
    assert out["lambda_yx"] == 1.0 and out["lambda_xy"] == 1.0
    # independence-ish: y constant -> lambda 0 (mode always right anyway)
    rows = [(i % 4, 0) for i in range(400)]
    out = gk_lambda(spark.createDataFrame(rows, "x int, y int"), "x", "y").collect()[0]
    assert out["lambda_yx"] == 0.0


def test_gk_lambda_matches_hand_table(spark):
    from gridmet_etl_spark.operators.stats import gk_lambda

    # classic 2x2: rows x=0: (60, 40); x=1: (20, 80); n=200
    rows = (
        [(0, 0)] * 60 + [(0, 1)] * 40 + [(1, 0)] * 20 + [(1, 1)] * 80
    )
    out = gk_lambda(spark.createDataFrame(rows, "x int, y int"), "x", "y").collect()[0]
    # sum row maxes = 60+80=140; mode_y = max(80, 120)=120
    assert abs(out["lambda_yx"] - (140 - 120) / (200 - 120)) < 1e-9


def test_somers_d_matches_bruteforce_and_auc(spark):
    from gridmet_etl_spark.operators.stats import somers_d

    rng = np.random.RandomState(7)
    x = rng.randint(0, 10, 800)
    y = (rng.rand(800) < (x + 1) / 12).astype(int)  # y likelier at high x
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], "x int, y int"
    )
    out = somers_d(df, "x", "y").collect()[0]
    c = d = t = 0
    for i in range(800):
        for j in range(800):
            if x[i] < x[j]:
                if y[i] < y[j]:
                    c += 1
                elif y[i] > y[j]:
                    d += 1
                else:
                    t += 1
    assert (out["concordant"], out["discordant"], out["ties_y"]) == (c, d, t)
    assert abs(out["d_yx"] - (c - d) / (c + d + t)) < 1e-6
    # AUC identity: condition pairs on the binary OUTCOME differing and
    # penalize predictor ties — i.e. somers_d(y, x) — equals 2*AUC - 1
    out_xy = somers_d(df, "y", "x").collect()[0]
    pos = x[y == 1]
    neg = x[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum() + 0.5 * (
        pos[:, None] == neg[None, :]
    ).sum()
    auc = wins / (len(pos) * len(neg))
    assert abs(out_xy["d_yx"] - (2 * auc - 1)) < 1e-6


def test_rmst_all_censored_group_emits_tau(spark):
    """A group with zero events keeps S(t) = 1 on [0, tau]: RMST = tau
    exactly, not a silently dropped row."""
    from gridmet_etl_spark.operators.stats import km_rmst

    rows = [("cens", 50, 0)] * 20 + [("evt", 10, 1)] * 20
    df = spark.createDataFrame(rows, "g string, dur long, ev int")
    out = {r["g"]: r for r in km_rmst(df, ["g"], "dur", "ev", tau=30).collect()}
    assert out["cens"]["rmst"] == 30.0
    assert out["cens"]["final_surv"] == 1.0
    assert out["cens"]["t_last"] == 0
    assert out["evt"]["rmst"] < 30.0
