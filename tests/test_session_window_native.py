"""Native session_window boundary semantics, pinned: an event at exactly
the previous window's end MERGES (a gap must exceed the timeout to
split — same `>` rule as the lag formulation), and the reported window
end is last event + gap."""

from pyspark.sql import functions as F


def _events(spark, ts_list):
    rows = [(1, t, 1.0) for t in ts_list]
    return spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )


def _native_sessions(df):
    return (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .count()
    )


def test_exact_gap_merges_native_session(spark):
    df = _events(spark, ["2024-01-01 00:00:00", "2024-01-01 00:30:00"])
    assert _native_sessions(df) == 1  # boundary event joins the window


def test_over_gap_splits_native_session(spark):
    df = _events(spark, ["2024-01-01 00:00:00", "2024-01-01 00:30:00.000001"])
    assert _native_sessions(df) == 2


def test_window_end_is_last_event_plus_gap(spark):
    df = _events(spark, ["2024-01-01 00:00:00", "2024-01-01 00:10:00"])
    row = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .select("session_window.*")
        .first()
    )
    assert str(row.start) == "2024-01-01 00:00:00"
    assert str(row.end) == "2024-01-01 00:40:00"
