"""As-of join vs a brute-force pandas model; tolerance and direction."""

from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0), "a"),
            (1, datetime(2024, 1, 1, 12, 0), "b"),
            (2, datetime(2024, 1, 1, 9, 0), "c"),
            (3, datetime(2024, 1, 1, 9, 0), "d"),  # key with no right rows
        ],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 30), 10.0),
            (1, datetime(2024, 1, 1, 11, 0), 11.0),
            (1, datetime(2024, 1, 1, 12, 0), 12.0),  # equal-ts: inclusive
            (2, datetime(2024, 1, 1, 9, 30), 13.0),  # after left → no match
        ],
        "k long, ts timestamp, rv double",
    )
    return left, right


def test_backward_semantics(spark, sides):
    left, right = sides
    out = {
        (r.k, r.ts): (r.rv_right, r.ts_right)
        for r in asof_join(left, right, on="k").collect()
    }
    assert out[(1, datetime(2024, 1, 1, 10, 0))] == (10.0, datetime(2024, 1, 1, 9, 30))
    # equal timestamp is inclusive (ts_right <= ts_left)
    assert out[(1, datetime(2024, 1, 1, 12, 0))] == (12.0, datetime(2024, 1, 1, 12, 0))
    assert out[(2, datetime(2024, 1, 1, 9, 0))] == (None, None)
    assert out[(3, datetime(2024, 1, 1, 9, 0))] == (None, None)
    assert len(out) == 4  # left row count preserved


def test_forward_semantics(spark, sides):
    left, right = sides
    out = {
        (r.k, r.ts): r.rv_right
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert out[(1, datetime(2024, 1, 1, 10, 0))] == 11.0  # next at 11:00
    assert out[(2, datetime(2024, 1, 1, 9, 0))] == 13.0


def test_tolerance(spark, sides):
    left, right = sides
    out = {
        (r.k, r.ts): r.rv_right
        for r in asof_join(left, right, on="k", tolerance_seconds=600).collect()
    }
    # 10:00 matched 9:30 = 1800s > 600 → nulled; 12:00 matched 12:00 = 0s ok
    assert out[(1, datetime(2024, 1, 1, 10, 0))] is None
    assert out[(1, datetime(2024, 1, 1, 12, 0))] == 12.0


def test_bad_direction(spark, sides):
    left, right = sides
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", direction="sideways")


def test_against_pandas_merge_asof(spark):
    """Random-ish data vs pandas.merge_asof (the de-facto reference)."""
    import numpy as np

    rng = np.random.default_rng(7)
    lrows = [
        (int(k), datetime(2024, 1, 1, int(h), int(m)), float(v))
        for k, h, m, v in zip(
            rng.integers(0, 5, 60), rng.integers(0, 23, 60), rng.integers(0, 59, 60),
            rng.random(60),
        )
    ]
    rrows = [
        (int(k), datetime(2024, 1, 1, int(h), int(m)), float(v))
        for k, h, m, v in zip(
            rng.integers(0, 5, 40), rng.integers(0, 23, 40), rng.integers(0, 59, 40),
            rng.random(40),
        )
    ]
    # dedupe right on (k, ts) for deterministic ties (keep max rv)
    rpd = (
        pd.DataFrame(rrows, columns=["k", "ts", "rv"])
        .groupby(["k", "ts"], as_index=False)["rv"]
        .max()
    )
    lpd = pd.DataFrame(lrows, columns=["k", "ts", "lv"]).drop_duplicates(["k", "ts"])
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)
    got = {
        (r.k, r.ts): r.rv_right for r in asof_join(left, right, on="k").collect()
    }
    expected = pd.merge_asof(
        lpd.sort_values("ts"), rpd.sort_values("ts"), on="ts", by="k", direction="backward"
    )
    for _, row in expected.iterrows():
        g = got[(row.k, row.ts.to_pydatetime())]
        if pd.isna(row.rv):
            assert g is None
        else:
            assert g == pytest.approx(row.rv)


def test_null_right_payload_not_backfilled(spark):
    """A NULL in one right payload column must stay NULL in the matched
    output — not be silently backfilled from an older right row (the
    per-column last(ignorenulls) bug: the match must be one whole row)."""
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0), "L")], "k long, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0), 10.0, "old"),
            (1, datetime(2024, 1, 1, 11, 0), None, "new"),  # matched row, rv NULL
        ],
        "k long, ts timestamp, rv double, tag string",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row.tag_right == "new"
    assert row.rv_right is None  # NOT 10.0 from the older row
    assert row.ts_right == datetime(2024, 1, 1, 11, 0)


# -- segment-and-merge (bucket_seconds) hub-key fallback (round 8) ----------


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_bucketed_equals_unbucketed(spark, sides):
    left, right = sides
    for direction in ("backward", "forward"):
        base = asof_join(left, right, on="k", direction=direction)
        for bs in (60, 1800, 3600, 86400 * 365):
            seg = asof_join(
                left, right, on="k", direction=direction, bucket_seconds=bs
            )
            assert _canon(seg.collect()) == _canon(base.collect()), (
                direction, bs,
            )


def test_bucketed_equals_unbucketed_random(spark):
    # randomized equivalence incl. hub key: key 0 holds ~60% of all rows
    import random

    rnd = random.Random(8)
    base_ts = datetime(2024, 1, 1)
    from datetime import timedelta

    def mk(n, hub_share):
        rows = []
        for i in range(n):
            k = 0 if rnd.random() < hub_share else rnd.randint(1, 5)
            ts = base_ts + timedelta(seconds=rnd.randint(0, 7 * 86400))
            rows.append((k, ts, float(i)))
        return rows

    left = spark.createDataFrame(mk(300, 0.6), "k long, ts timestamp, lv double")
    right = spark.createDataFrame(mk(200, 0.6), "k long, ts timestamp, rv double")
    # dedup right (k, ts) so the match is unique -> deterministic compare
    right = right.groupBy("k", "ts").agg(F.max("rv").alias("rv"))
    for direction in ("backward", "forward"):
        base = _canon(
            asof_join(left, right, on="k", direction=direction).collect()
        )
        for bs in (3600, 86400):
            seg = _canon(
                asof_join(
                    left, right, on="k", direction=direction, bucket_seconds=bs
                ).collect()
            )
            assert seg == base, (direction, bs)


def test_bucketed_tolerance(spark, sides):
    left, right = sides
    base = _canon(
        asof_join(left, right, on="k", tolerance_seconds=600).collect()
    )
    seg = _canon(
        asof_join(
            left, right, on="k", tolerance_seconds=600, bucket_seconds=900
        ).collect()
    )
    assert seg == base


def test_window_funnel_hub_bucketed(spark):
    """One hub user with 20% of events: funnel levels identical with and
    without the segment-and-merge path."""
    from datetime import timedelta

    from gridmet_etl_spark.operators.funnel import window_funnel

    base_ts = datetime(2024, 3, 1)
    rows = []
    # hub user 0: 400 events cycling through the steps
    for i in range(400):
        rows.append((0, ["view", "click", "buy"][i % 3],
                     base_ts + timedelta(seconds=i * 30)))
    # 80 normal users: a complete or partial chain each
    for u in range(1, 81):
        rows.append((u, "view", base_ts + timedelta(seconds=u)))
        if u % 2 == 0:
            rows.append((u, "click", base_ts + timedelta(seconds=u + 10)))
        if u % 4 == 0:
            rows.append((u, "buy", base_ts + timedelta(seconds=u + 20)))
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    args = (["view", "click", "buy"], 3600)
    base = _canon(window_funnel(ev, *args).collect())
    seg = _canon(window_funnel(ev, *args, hub_bucket_seconds=600).collect())
    assert seg == base
    assert sum(r[1] for r in base) == 81  # every user reaches some level
