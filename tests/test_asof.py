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
