"""gap_sessionize: unbucketed lag-window plan vs the bucket_seconds
segment-and-merge plan (VERDICT r8 item 6 — the last documented-only hub
bound). The bucketed plan must reproduce the unbucketed SESSION NUMBERING
bit-for-bit, including sessions spanning many buckets, empty buckets inside
a session's gap, and a hub key holding most of the stream."""

import random
from datetime import datetime, timedelta

import pytest

from gridmet_etl_spark.operators.sessionize import gap_sessionize, session_rollup


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def _mk_events(spark, n=600, hub_share=0.6, horizon_days=14, seed=9):
    rnd = random.Random(seed)
    base = datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        k = 0 if rnd.random() < hub_share else rnd.randint(1, 8)
        ts = base + timedelta(seconds=rnd.randint(0, horizon_days * 86400))
        rows.append((k, ts, float(i % 7), i))
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )


@pytest.mark.parametrize("bucket_seconds", [600, 3600, 86400, 86400 * 365])
def test_bucketed_equals_unbucketed_hub(spark, bucket_seconds):
    ev = _mk_events(spark)
    base = gap_sessionize(ev, gap_seconds=1800, order_cols=["event_id"])
    seg = gap_sessionize(
        ev, gap_seconds=1800, order_cols=["event_id"],
        bucket_seconds=bucket_seconds,
    )
    cols = ["user_id", "event_id", "session_idx"]
    assert _canon(seg.select(*cols).collect()) == _canon(
        base.select(*cols).collect()
    )


def test_session_spanning_many_buckets(spark):
    # one key, events every 10 minutes for 2 days: ONE session, even though
    # a 1-hour bucket splits it across 48 buckets (every boundary connects)
    base = datetime(2024, 3, 1)
    rows = [
        (1, base + timedelta(minutes=10 * i), 1.0, i) for i in range(288)
    ]
    # plus a second session after a 2-hour silence
    rows += [
        (1, base + timedelta(days=2, hours=2, minutes=10 * i), 1.0, 1000 + i)
        for i in range(5)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    seg = gap_sessionize(
        ev, gap_seconds=1800, order_cols=["event_id"], bucket_seconds=3600
    )
    idx = {r.event_id: r.session_idx for r in seg.collect()}
    assert all(idx[i] == 0 for i in range(288))
    assert all(idx[1000 + i] == 1 for i in range(5))


def test_empty_buckets_inside_gap(spark):
    # a 3-hour silence (three empty 1-hour buckets) still reads as ONE break,
    # and a 20-minute hop across a bucket boundary reads as NO break
    base = datetime(2024, 3, 1)
    ts = [
        base,
        base + timedelta(minutes=50),  # same bucket chain, <30min? no: 50min gap -> break
        base + timedelta(minutes=70),  # 20min after prev, crosses 1h boundary -> no break
        base + timedelta(hours=4, minutes=10),  # ~3h silence -> break
    ]
    ev = spark.createDataFrame(
        [(1, t, 1.0, i) for i, t in enumerate(ts)],
        "user_id long, ts timestamp, value double, event_id long",
    )
    for bs in (None, 3600):
        got = {
            r.event_id: r.session_idx
            for r in gap_sessionize(
                ev, gap_seconds=1800, order_cols=["event_id"], bucket_seconds=bs
            ).collect()
        }
        assert got == {0: 0, 1: 1, 2: 1, 3: 2}, bs


def test_rollup_matches_contract_shape(spark):
    ev = _mk_events(spark, n=200)
    out = session_rollup(
        gap_sessionize(ev, gap_seconds=1800, order_cols=["event_id"])
    )
    assert out.columns == [
        "user_id", "session_idx", "session_start", "session_end",
        "n_events", "sum_value",
    ]
    # session count conservation: rollup rows == distinct (key, session)
    n_sessions = (
        gap_sessionize(ev, gap_seconds=1800, order_cols=["event_id"])
        .select("user_id", "session_idx").distinct().count()
    )
    assert out.count() == n_sessions


def test_rollup_bucketed_identity(spark):
    ev = _mk_events(spark, n=500, hub_share=0.7, seed=4)
    base = session_rollup(
        gap_sessionize(ev, gap_seconds=1800, order_cols=["event_id"])
    )
    seg = session_rollup(
        gap_sessionize(
            ev, gap_seconds=1800, order_cols=["event_id"], bucket_seconds=7200
        )
    )
    assert _canon(seg.collect()) == _canon(base.collect())
