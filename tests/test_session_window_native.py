"""Native session_window boundary semantics: a gap of exactly the timeout
starts a NEW session (half-open windows), where the lag-`>` formulation
keeps it — the documented divergence between the two sessionizers."""

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


def test_exact_gap_splits_native_session(spark):
    df = _events(spark, ["2024-01-01 00:00:00", "2024-01-01 00:30:00"])
    assert _native_sessions(df) == 2  # half-open: [00:00, 00:30) excludes


def test_sub_gap_merges_native_session(spark):
    df = _events(spark, ["2024-01-01 00:00:00", "2024-01-01 00:29:59"])
    assert _native_sessions(df) == 1


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
