"""Round-3 session-C operators: IDW interpolation, DBSCAN, item-item
cosine, CDC apply, histogram-quantile rollup, Poisson-bootstrap CI."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# idw_interpolate
# ---------------------------------------------------------------------------


def test_idw_exact_small(spark):
    from gridmet_etl_spark.operators.geo import haversine_km, idw_interpolate

    st = spark.createDataFrame(
        [
            Row(station_id=1, lat=40.0, lon=-100.0, value=10.0),
            Row(station_id=2, lat=40.1, lon=-100.0, value=20.0),
            Row(station_id=3, lat=40.0, lon=-100.2, value=30.0),
            Row(station_id=4, lat=45.0, lon=-90.0, value=99.0),  # far away
        ]
    )
    tg = spark.createDataFrame([Row(target_id=7, lat=40.05, lon=-100.1)])
    out = idw_interpolate(st, tg, radius_km=50.0, cell_deg=1.0).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_stations == 3  # station 4 is out of radius
    # replicate the arithmetic driver-side
    import pandas as pd  # noqa: F401

    def hav(lat1, lon1, lat2, lon2):
        from math import asin, cos, radians, sin, sqrt

        dlat = radians(lat2 - lat1)
        dlon = radians(lon2 - lon1)
        a = sin(dlat / 2) ** 2 + cos(radians(lat1)) * cos(radians(lat2)) * sin(dlon / 2) ** 2
        return 2 * 6371.0 * asin(sqrt(a))

    num = den = 0.0
    for s in [(40.0, -100.0, 10.0), (40.1, -100.0, 20.0), (40.0, -100.2, 30.0)]:
        d = round(hav(40.05, -100.1, s[0], s[1]), 6)
        num += s[2] / d**2
        den += 1.0 / d**2
    assert abs(row.idw_value - num / den) < 1e-5


def test_idw_zero_distance_snap(spark):
    from gridmet_etl_spark.operators.geo import idw_interpolate

    st = spark.createDataFrame(
        [
            Row(station_id=1, lat=40.0, lon=-100.0, value=10.0),
            Row(station_id=2, lat=40.0, lon=-100.0, value=30.0),
            Row(station_id=3, lat=40.2, lon=-100.0, value=99.0),
        ]
    )
    tg = spark.createDataFrame([Row(target_id=1, lat=40.0, lon=-100.0)])
    row = idw_interpolate(st, tg, radius_km=50.0, cell_deg=1.0).collect()[0]
    # two stations sit ON the target: estimate is their average, the far
    # station is ignored by the snap rule
    assert row.idw_value == pytest.approx(20.0)


def test_idw_blocked_equals_brute(spark):
    """Cell-blocked IDW == brute-force IDW on a deterministic cloud."""
    from gridmet_etl_spark.operators.geo import haversine_km, idw_interpolate

    n = 300
    st = spark.range(1, n + 1).select(
        F.col("id").alias("station_id"),
        (35.0 + (F.col("id") * 48271 % 1000) / 1000.0 * 8.0).alias("lat"),
        (-110.0 + (F.col("id") * 69621 % 1000) / 1000.0 * 10.0).alias("lon"),
        ((F.col("id") * 7919) % 500 / 5.0).alias("value"),
    )
    tg = spark.range(1, 40).select(
        F.col("id").alias("target_id"),
        (35.0 + (F.col("id") * 50993 % 1000) / 1000.0 * 8.0).alias("lat"),
        (-110.0 + (F.col("id") * 73471 % 1000) / 1000.0 * 10.0).alias("lon"),
    )
    blocked = {
        r.target_id: (r.n_stations, r.idw_value)
        for r in idw_interpolate(st, tg, radius_km=40.0, cell_deg=1.0).collect()
    }
    # brute force via cross join
    t = tg.select(
        F.col("target_id"), F.col("lat").alias("tlat"), F.col("lon").alias("tlon")
    )
    s = st.select(
        F.col("lat").alias("slat"), F.col("lon").alias("slon"), "value"
    )
    cand = t.crossJoin(s).withColumn(
        "d",
        F.round(
            haversine_km(F.col("tlat"), F.col("tlon"), F.col("slat"), F.col("slon")), 6
        )
        + F.lit(0.0),
    ).where(F.col("d") <= 40.0)
    brute = (
        cand.groupBy("target_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value") / (F.col("d") * F.col("d")))
                / F.sum(F.lit(1.0) / (F.col("d") * F.col("d")))
            ).alias("v"),
        )
        .collect()
    )
    assert blocked
    for r in brute:
        nb, vb = blocked[r.target_id]
        assert nb == r.n
        assert vb == pytest.approx(r.v, abs=1e-5)


# ---------------------------------------------------------------------------
# dbscan_geo
# ---------------------------------------------------------------------------


def test_dbscan_roles_and_labels(spark):
    from gridmet_etl_spark.operators.cluster import dbscan_geo

    # two dense blobs + one isolated noise point; 0.1° ≈ 11 km
    rows = []
    for i, (la, lo) in enumerate(
        [(40.0, -100.0), (40.05, -100.0), (40.0, -100.05), (40.05, -100.05)]
    ):
        rows.append(Row(point_id=i + 1, lat=la, lon=lo))
    for i, (la, lo) in enumerate([(42.0, -95.0), (42.05, -95.0), (42.0, -95.05)]):
        rows.append(Row(point_id=i + 10, lat=la, lon=lo))
    rows.append(Row(point_id=99, lat=48.0, lon=-80.0))
    pts = spark.createDataFrame(rows)
    out = {r.point_id: r for r in dbscan_geo(
        pts, eps_km=10.0, min_pts=3, cell_deg=0.5
    ).collect()}
    assert len(out) == 8
    # blob 1: all four points are mutually within ~7.8 km -> all core,
    # cluster id = min id = 1
    for pid in (1, 2, 3, 4):
        assert out[pid].role == "core" and out[pid].cluster_id == 1
    # blob 2: 3 points pairwise within ~7.8 km -> core cluster 10
    for pid in (10, 11, 12):
        assert out[pid].role == "core" and out[pid].cluster_id == 10
    assert out[99].role == "noise" and out[99].cluster_id is None


def test_dbscan_border_point(spark):
    from gridmet_etl_spark.operators.cluster import dbscan_geo

    # 3 cores in a tight knot; one point within eps of a core but with
    # only 1 neighbor -> border; min_pts=3
    pts = spark.createDataFrame(
        [
            Row(point_id=1, lat=40.0, lon=-100.0),
            Row(point_id=2, lat=40.02, lon=-100.0),
            Row(point_id=3, lat=40.0, lon=-100.02),
            Row(point_id=4, lat=40.10, lon=-100.0),  # ~8.9 km from 2 only
        ]
    )
    out = {r.point_id: r for r in dbscan_geo(
        pts, eps_km=10.0, min_pts=3, cell_deg=0.5
    ).collect()}
    assert out[1].role == "core"
    assert out[4].role == "border"
    assert out[4].cluster_id == 1


# ---------------------------------------------------------------------------
# item_cosine_topk
# ---------------------------------------------------------------------------


def test_item_cosine_basic(spark):
    from gridmet_etl_spark.operators.recommend import item_cosine_topk

    rows = []
    # items A,B co-occur in 3 baskets; A alone in 1; C with B once
    for b in (1, 2, 3):
        rows += [Row(basket_id=b, item_id="A"), Row(basket_id=b, item_id="B")]
    rows += [Row(basket_id=4, item_id="A")]
    rows += [Row(basket_id=5, item_id="B"), Row(basket_id=5, item_id="C")]
    facts = spark.createDataFrame(rows)
    out = {
        (r.item_id, r.other_id): r
        for r in item_cosine_topk(facts, k=3, min_cooc=2).collect()
    }
    # cooc(A,B)=3, nA=4, nB=4 -> cosine 3/4
    assert out[("A", "B")].cooc == 3
    assert out[("A", "B")].cosine == pytest.approx(0.75)
    assert out[("B", "A")].cosine == pytest.approx(0.75)
    # (B,C) pruned by min_cooc=2
    assert ("B", "C") not in out


def test_item_cosine_mega_basket_guard(spark):
    from gridmet_etl_spark.operators.recommend import item_cosine_topk

    rows = [Row(basket_id=1, item_id=f"i{j}") for j in range(50)]
    rows += [
        Row(basket_id=b, item_id=it)
        for b in (2, 3)
        for it in ("x", "y")
    ]
    facts = spark.createDataFrame(rows)
    out = item_cosine_topk(facts, k=3, min_cooc=2, max_basket=10).collect()
    # mega-basket dropped entirely; only (x,y) survives
    assert {(r.item_id, r.other_id) for r in out} == {("x", "y"), ("y", "x")}


# ---------------------------------------------------------------------------
# cdc_apply
# ---------------------------------------------------------------------------


def test_cdc_apply_semantics(spark):
    from gridmet_etl_spark.operators.scd import cdc_apply

    snap = spark.createDataFrame(
        [Row(k=1, v=10.0), Row(k=2, v=20.0), Row(k=3, v=30.0)]
    )
    log = spark.createDataFrame(
        [
            Row(k=1, seq=1, op="U", v=11.0),
            Row(k=1, seq=2, op="U", v=12.0),  # last writer wins
            Row(k=2, seq=1, op="D", v=None),  # delete
            Row(k=4, seq=1, op="I", v=40.0),  # insert new key
            Row(k=5, seq=1, op="I", v=50.0),
            Row(k=5, seq=2, op="D", v=None),  # insert then delete -> absent
        ]
    )
    out = {r.k: r.v for r in cdc_apply(snap, log, ["k"], ["v"]).collect()}
    assert out == {1: 12.0, 3: 30.0, 4: 40.0}


# ---------------------------------------------------------------------------
# hist_rollup / hist_merge_quantiles
# ---------------------------------------------------------------------------


def test_hist_quantiles_accuracy_and_mergeability(spark):
    from gridmet_etl_spark.operators.sketch import hist_merge_quantiles, hist_rollup

    df = spark.range(1, 10001).select(
        (F.col("id") % 4).alias("fine"),
        F.lit("all").alias("coarse"),
        (F.col("id").cast("double")).alias("x"),
    )
    roll = hist_rollup(df, ["coarse", "fine"], "x", lo=0.0, hi=10000.0, bins=100)
    # merge across fine keys == histogram built directly on coarse key
    direct = hist_rollup(df, ["coarse"], "x", lo=0.0, hi=10000.0, bins=100)
    merged_counts = {
        (r.coarse, r.bin): r.cnt
        for r in roll.groupBy("coarse", "bin").agg(F.sum("cnt").alias("cnt")).collect()
    }
    for r in direct.collect():
        assert merged_counts[(r.coarse, r.bin)] == r.cnt
    q = {
        r.q: r.est
        for r in hist_merge_quantiles(
            roll, ["coarse"], [0.25, 0.5, 0.9], lo=0.0, hi=10000.0, bins=100
        ).collect()
    }
    # uniform 1..10000: quantile q ~= 10000q; bin width 100 bounds error
    assert abs(q[0.25] - 2500) <= 100
    assert abs(q[0.5] - 5000) <= 100
    assert abs(q[0.9] - 9000) <= 100


def test_hist_quantiles_extremes(spark):
    from gridmet_etl_spark.operators.sketch import hist_merge_quantiles, hist_rollup

    df = spark.createDataFrame([Row(g="a", x=float(v)) for v in (5, 5, 5, 5)])
    roll = hist_rollup(df, ["g"], "x", lo=0.0, hi=10.0, bins=10)
    q = {
        r.q: r.est
        for r in hist_merge_quantiles(
            roll, ["g"], [0.0, 1.0], lo=0.0, hi=10.0, bins=10
        ).collect()
    }
    # all mass in bin 5 ([5,6)): q=0 -> bin lower edge, q=1 -> upper edge
    assert q[0.0] == pytest.approx(5.0)
    assert q[1.0] == pytest.approx(6.0)


# ---------------------------------------------------------------------------
# bootstrap_ci
# ---------------------------------------------------------------------------


def test_bootstrap_ci_covers_mean(spark):
    from gridmet_etl_spark.operators.stats import bootstrap_ci

    df = spark.range(1, 2001).select(
        F.lit("g").alias("grp"),
        F.col("id").alias("rid"),
        ((F.col("id") * 48271 % 997).cast("double") / 10.0).alias("x"),
    )
    row = bootstrap_ci(df, ["grp"], "x", "rid", n_boot=64).collect()[0]
    assert row.ci_lo <= row.mean_est <= row.ci_hi
    # CI width for n=2000 uniform-ish data: sd ~ 28.8, se ~ 0.64;
    # 95% CI should be within a few standard errors, and nondegenerate
    assert 0.1 < (row.ci_hi - row.ci_lo) < 10.0


def test_bootstrap_weight_distribution(spark):
    """Poisson(1) weights: mean ~1, deterministic across calls."""
    from gridmet_etl_spark.operators.stats import bootstrap_weight

    df = spark.range(0, 20000).select(
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast(
                "double"
            )
            / F.lit(4294967296.0)
        ).alias("u")
    )
    m = df.select(F.avg(bootstrap_weight(F.col("u"))).alias("m")).collect()[0].m
    assert m == pytest.approx(1.0, abs=0.05)
    m2 = df.select(F.avg(bootstrap_weight(F.col("u"))).alias("m")).collect()[0].m
    assert m == m2


# ---------------------------------------------------------------------------
# logistic_gd
# ---------------------------------------------------------------------------


def test_logistic_gd_learns_separable(spark):
    from gridmet_etl_spark.operators.mlprep import logistic_gd

    # y = 1 iff x > 0.5, perfectly separable on one feature
    df = spark.range(0, 2000).select(
        ((F.col("id") % 100) / 100.0).alias("x"),
        ((F.col("id") % 100) >= 50).cast("int").alias("y"),
    )
    row = logistic_gd(df, ["x"], "y", lr=2.0, rounds=5).collect()[0]
    # positive slope, loss below the w=0 baseline ln(2)=0.693
    assert row.w1 > 0
    assert row.log_loss < 0.693
    assert row.n == 2000


def test_logistic_gd_matches_numpy(spark):
    import numpy as np

    from gridmet_etl_spark.operators.mlprep import logistic_gd

    n = 500
    ids = np.arange(1, n + 1)
    x1 = (ids * 48271 % 1000) / 1000.0
    x2 = (ids * 69621 % 1000) / 1000.0
    y = ((x1 + 0.5 * x2) > 0.8).astype(float)
    rows = [Row(x1=float(a), x2=float(b), y=float(c)) for a, b, c in zip(x1, x2, y)]
    df = spark.createDataFrame(rows)
    out = logistic_gd(df, ["x1", "x2"], "y", lr=1.0, rounds=3).collect()[0]
    # replicate with the same per-round rounding
    w = np.zeros(3)
    X = np.column_stack([np.ones(n), x1, x2])
    for _ in range(3):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = (p - y) @ X / n
        w = np.round(w - 1.0 * g, 6)
    assert out.w0 == pytest.approx(w[0], abs=2e-6)
    assert out.w1 == pytest.approx(w[1], abs=2e-6)
    assert out.w2 == pytest.approx(w[2], abs=2e-6)


# ---------------------------------------------------------------------------
# forecast_backtest
# ---------------------------------------------------------------------------


def test_forecast_backtest_semantics(spark):
    from gridmet_etl_spark.operators.timeseries import forecast_backtest

    # 1 series, 21 days: weekly pattern value = day-of-week, so snaive is
    # PERFECT (smape 0) in the holdout while naive is not
    rows = [
        Row(s="a", day=f"2024-01-{d:02d}", v=float((d % 7) + 1)) for d in range(1, 22)
    ]
    df = spark.createDataFrame(rows).select(
        "s", F.to_date("day").alias("day"), F.col("v")
    )
    out = {
        r.model: r
        for r in forecast_backtest(df, ["s"], "day", "v", season=7, test_days=7).collect()
    }
    assert out["snaive"].smape == pytest.approx(0.0)
    assert out["snaive"].n_scored == 7
    assert out["naive"].smape > 0


# ---------------------------------------------------------------------------
# Naive Bayes
# ---------------------------------------------------------------------------


def test_nb_classify_separable(spark):
    from gridmet_etl_spark.operators.nbayes import nb_classify, nb_train

    train = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="the cat sat on the mat"),
            Row(doc_id=2, lang="en", text="the dog ran in the park"),
            Row(doc_id=3, lang="fr", text="le chat dort sur le tapis"),
            Row(doc_id=4, lang="fr", text="le chien court dans le parc"),
        ]
    )
    test = spark.createDataFrame(
        [
            Row(doc_id=10, text="the cat ran"),
            Row(doc_id=11, text="le chat court"),
        ]
    )
    model, priors = nb_train(train, "lang")
    out = {r.doc_id: r.pred_label for r in nb_classify(test, model, priors).collect()}
    assert out == {10: "en", 11: "fr"}


def test_nb_smoothing_math(spark):
    import math as m

    from gridmet_etl_spark.operators.nbayes import nb_classify, nb_train

    train = spark.createDataFrame(
        [Row(doc_id=1, y="a", text="x x y"), Row(doc_id=2, y="b", text="z")]
    )
    model, priors = nb_train(train, "y")
    cells = {(r.token, r.label): r.logp for r in model.collect()}
    # vocab = {x, y, z}, V=3; class a: n_c=3 -> P(x|a)=(2+1)/(3+3)
    assert cells[("x", "a")] == pytest.approx(m.log(3 / 6))
    assert cells[("z", "a")] == pytest.approx(m.log(1 / 6))
    assert cells[("z", "b")] == pytest.approx(m.log(2 / 4))
    # a doc with only OOV tokens falls back to priors (tie -> 'a' by name)
    test = spark.createDataFrame([Row(doc_id=9, text="unseen words only")])
    out = nb_classify(test, model, priors).collect()[0]
    assert out.pred_label == "a"


def test_nb_vocab_cap(spark):
    from gridmet_etl_spark.operators.nbayes import nb_train

    train = spark.createDataFrame(
        [Row(doc_id=1, y="a", text="common common common rare")]
    )
    model, _ = nb_train(train, "y", max_vocab=1)
    toks = {r.token for r in model.collect()}
    assert toks == {"common"}


# ---------------------------------------------------------------------------
# Kaplan-Meier
# ---------------------------------------------------------------------------


def test_kaplan_meier_textbook(spark):
    from gridmet_etl_spark.operators.stats import kaplan_meier

    # classic toy: durations 1,2e 2c 3e 4c (e=event, c=censored)
    rows = [
        Row(g="x", dur=1, ev=1),
        Row(g="x", dur=2, ev=1),
        Row(g="x", dur=2, ev=0),
        Row(g="x", dur=3, ev=1),
        Row(g="x", dur=4, ev=0),
    ]
    out = {r.t: r for r in kaplan_meier(
        spark.createDataFrame(rows), ["g"], "dur", "ev"
    ).collect()}
    # t=1: n=5, d=1 -> S=4/5; t=2: n=4, d=1 -> S=4/5*3/4=3/5;
    # t=3: n=2, d=1 -> S=3/5*1/2=3/10; censored times emit no row
    assert set(out) == {1, 2, 3}
    assert out[1].n_risk == 5 and out[1].surv == pytest.approx(0.8)
    assert out[2].n_risk == 4 and out[2].surv == pytest.approx(0.6)
    assert out[3].n_risk == 2 and out[3].surv == pytest.approx(0.3)


def test_kaplan_meier_all_die_reaches_zero(spark):
    from gridmet_etl_spark.operators.stats import kaplan_meier

    rows = [Row(g="x", dur=d, ev=1) for d in (1, 2, 3)]
    out = {r.t: r.surv for r in kaplan_meier(
        spark.createDataFrame(rows), ["g"], "dur", "ev"
    ).collect()}
    assert out[3] == pytest.approx(0.0)
    assert out[2] == pytest.approx(1 / 3)


# ---------------------------------------------------------------------------
# DSIR selection
# ---------------------------------------------------------------------------


def test_dsir_prefers_target_like_docs(spark):
    from gridmet_etl_spark.operators.select import dsir_select, dsir_weights

    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta alpha beta"),
            Row(doc_id=2, text="gamma delta gamma delta"),
            Row(doc_id=3, text="alpha beta gamma delta"),
        ]
    )
    target = spark.createDataFrame(
        [Row(doc_id=99, text="alpha beta alpha alpha beta")]
    )
    w = {r.doc_id: r.weight for r in dsir_weights(corpus, target).collect()}
    # doc 1 is pure target vocabulary, doc 2 pure off-target
    assert w[1] > w[3] > w[2]
    sel = dsir_select(corpus, target, k=1).collect()
    assert sel[0].doc_id == 1 and sel[0].rnk == 1


def test_dsir_tokenless_doc_zero_weight(spark):
    from gridmet_etl_spark.operators.select import dsir_weights

    corpus = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="alpha")]
    )
    target = spark.createDataFrame([Row(doc_id=9, text="alpha")])
    w = {r.doc_id: (r.n_tokens, r.weight) for r in dsir_weights(corpus, target).collect()}
    assert w[1] == (0, 0.0)


# ---------------------------------------------------------------------------
# lift curve
# ---------------------------------------------------------------------------


def test_lift_curve_perfect_classifier(spark):
    from gridmet_etl_spark.operators.scoring import lift_curve

    # 100 rows, 20 positives, score == label: top-2 deciles capture all
    df = spark.range(0, 100).select(
        F.col("id").alias("rid"),
        (F.col("id") < 20).cast("int").alias("y"),
        (F.col("id") < 20).cast("double").alias("s"),
    )
    out = {r.bin: r for r in lift_curve(df, "y", "s", "rid", n_bins=10).collect()}
    assert len(out) == 10
    assert out[0].cum_capture == pytest.approx(0.5)   # 10/20
    assert out[1].cum_capture == pytest.approx(1.0)   # all positives found
    assert out[0].cum_lift == pytest.approx(5.0)      # 100% hit rate vs 20% base
    assert out[9].cum_lift == pytest.approx(1.0)      # full population
    assert sum(r.n for r in out.values()) == 100


def test_lift_curve_random_scores_lift_one(spark):
    from gridmet_etl_spark.operators.scoring import lift_curve

    # label independent of score -> every decile's lift ~ 1
    df = spark.range(0, 5000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 2).cast("int").alias("y"),
        ((F.col("id") * 2654435761 % 9973) / 9973.0).alias("s"),
    )
    out = lift_curve(df, "y", "s", "rid", n_bins=5).collect()
    for r in out:
        assert r.cum_lift == pytest.approx(1.0, abs=0.1)


# ---------------------------------------------------------------------------
# personalized PageRank / MRR
# ---------------------------------------------------------------------------


def test_ppr_mass_concentrates_near_seeds(spark):
    from gridmet_etl_spark.operators.graph import personalized_pagerank

    # chain 1->2->3->4->5 plus an unreachable island 10->11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.ppr for r in personalized_pagerank(
        edges, seeds, iters=3
    ).collect()}
    # teleport mass only at the seed; downstream decays by 0.85 per hop
    assert out[1] == pytest.approx(0.15, abs=1e-6)
    assert out[2] == pytest.approx(0.15 * 0.85, abs=1e-5)
    assert out[3] == pytest.approx(0.15 * 0.85**2, abs=1e-5)
    assert 10 not in out and 11 not in out  # unreachable island has no rows
    assert out[1] > out[2] > out[3]


def test_mrr_semantics(spark):
    from gridmet_etl_spark.operators.retrieval import mrr

    hits = spark.createDataFrame(
        [
            Row(query_id=1, rank=1, rel=0),
            Row(query_id=1, rank=2, rel=1),
            Row(query_id=1, rank=3, rel=1),
            Row(query_id=2, rank=1, rel=0),
            Row(query_id=2, rank=2, rel=0),
        ]
    )
    out = {r.query_id: r for r in mrr(hits).collect()}
    assert out[1].first_rel_rank == 2 and out[1].rr == pytest.approx(0.5)
    assert out[2].first_rel_rank is None and out[2].rr == 0.0
