"""Online-SPC streaming twin: stream drain equals the batch twin's alarm
rows exactly (the drift.py parity discipline), state carries across
micro-batches, and the online rules fire on planted anomalies."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.sources.readers import read_events
from gridmet_etl_spark.streaming.events import run_available_now, stream_events

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("spc_src")
    df = read_events(spark, os.path.join(SF_DIR, "events.parquet"))
    df.write.mode("overwrite").parquet(str(d / "batch"))
    return str(d / "batch")


def test_streaming_spc_matches_batch(spark, events_dir, tmp_path):
    from gridmet_etl_spark.streaming.spc_stream import (
        spc_alarms_batch,
        streaming_spc_alarms,
    )

    stream = stream_events(spark, events_dir)
    alarms = streaming_spc_alarms(
        stream, key_col="user_id", ts_col="ts", value_col="value",
        min_baseline=5,
    )
    out = str(tmp_path / "out")
    run_available_now(alarms, out, str(tmp_path / "ck"))
    got = {
        (r["key"], r["ts"], round(r["value"], 6), r["z"], r["r1"], r["r4"])
        for r in spark.read.parquet(out).collect()
    }

    batch = spark.read.parquet(events_dir).select("user_id", "ts", "value")
    want = {
        (r["user_id"], r["ts"], round(r["value"], 6), r["z"], r["r1"], r["r4"])
        for r in spc_alarms_batch(
            batch, ["user_id"], "ts", "value", min_baseline=5
        ).collect()
    }
    assert len(want) > 0
    assert got == want


def test_spc_batch_rules_fire_on_planted_anomalies(spark):
    from gridmet_etl_spark.streaming.spc_stream import spc_alarms_batch

    d0 = datetime.datetime(2024, 1, 1)
    vals = [10.0, 11.0, 9.0, 10.0, 12.0, 8.0, 10.0, 11.0, 9.0, 10.0,
            100.0,                                     # rule-1 spike
            10.0, 9.0, 11.0] + [30.0] * 9              # sustained shift
    rows = [
        (7, d0 + datetime.timedelta(hours=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = spc_alarms_batch(df, ["user_id"], "ts", "value").collect()
    spike = [r for r in out if r["value"] == 100.0]
    assert spike and spike[0]["r1"] == 1
    r4 = [r for r in out if r["r4"] == 1]
    assert r4  # the 8th consecutive 30.0 fires rule 4


def test_spc_stream_state_across_batches(spark, events_dir, tmp_path):
    from gridmet_etl_spark.streaming.events import EVENTS_SCHEMA
    from gridmet_etl_spark.streaming.spc_stream import streaming_spc_alarms

    src = str(tmp_path / "src2")
    base = spark.read.parquet(events_dir)
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    cut = base.agg(F.percentile_approx(tsu, 0.5)).collect()[0][0]
    base.filter(tsu <= cut).coalesce(1).write.mode("append").parquet(src)
    base.filter(tsu > cut).coalesce(1).write.mode("append").parquet(src)
    two = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out2 = str(tmp_path / "out2")
    run_available_now(
        streaming_spc_alarms(two, min_baseline=5), out2, str(tmp_path / "ck2")
    )
    one = stream_events(spark, events_dir)
    out1 = str(tmp_path / "out1")
    run_available_now(
        streaming_spc_alarms(one, min_baseline=5), out1, str(tmp_path / "ck1")
    )
    g2 = {tuple(r) for r in spark.read.parquet(out2).collect()}
    g1 = {tuple(r) for r in spark.read.parquet(out1).collect()}
    assert len(g1) > 0
    assert g1 == g2


def test_spc_batch_skips_nulls_like_stream(spark):
    """A null value must not occupy a baseline slot or reset the
    same-side run (the streaming twin skips NaN without advancing t)."""
    import datetime

    from gridmet_etl_spark.streaming.spc_stream import spc_alarms_batch

    d0 = datetime.datetime(2024, 1, 1)
    vals = [10.0, 11.0, 9.0, 10.0, 12.0, 8.0, 10.0, 11.0,
            30.0, 30.0, 30.0, 30.0, None, 30.0, 30.0, 30.0, 30.0]
    rows = [(1, d0 + datetime.timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = spc_alarms_batch(df, ["user_id"], "ts", "value", min_baseline=5)
    r4 = [r for r in out.collect() if r["r4"] == 1]
    # 8 consecutive 30.0s SPANNING the null row: run must not reset
    assert r4, "null value reset the same-side run"
