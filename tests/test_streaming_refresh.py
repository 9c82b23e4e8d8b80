"""Streaming incremental-aggregate refresh: the foreachBatch-merged state
table equals a full batch recompute over everything streamed, and replayed
batch ids are no-ops (exactly-once)."""

import time

from pyspark.sql import functions as F

from gridmet_etl_spark.operators.incremental import agg_state
from gridmet_etl_spark.streaming.event_source import SyntheticEventStream, event_row
from gridmet_etl_spark.streaming.refresh import (
    merge_batch_into_state,
    streaming_agg_refresh,
)


def test_stream_state_equals_batch_recompute(spark, tmp_path):
    spark.dataSource.register(SyntheticEventStream)
    n_rows = 300
    stream = (
        spark.readStream.format("event_stream")
        .option("rows_per_batch", "100")
        .option("n_users", "10")
        .option("max_rows", str(n_rows))
        .load()
    )
    state_dir = str(tmp_path / "state")
    q = streaming_agg_refresh(
        stream, state_dir, ["user_id"], "value", str(tmp_path / "ckpt")
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                got = spark.read.parquet(f"{state_dir}/state")
                if got.agg(F.sum("cnt")).first()[0] == n_rows:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    # batch twin: the same 300 generator rows aggregated in one pass
    rows = [event_row(i, 10) for i in range(n_rows)]
    batch = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    expect = {r["user_id"]: r for r in agg_state(batch, ["user_id"], "value").collect()}
    got = {r["user_id"]: r for r in spark.read.parquet(f"{state_dir}/state").collect()}
    assert set(got) == set(expect)
    for k, e in expect.items():
        g = got[k]
        assert g["cnt"] == e["cnt"]
        assert abs(g["total"] - e["total"]) < 1e-9
        assert g["vmin"] == e["vmin"] and g["vmax"] == e["vmax"]


def test_replayed_batch_is_noop(spark, tmp_path):
    state_dir = str(tmp_path / "st2")
    import os

    os.makedirs(state_dir, exist_ok=True)
    df = spark.createDataFrame([(1, 10.0), (1, 20.0), (2, 5.0)], "k int, v double")
    assert merge_batch_into_state(df, 0, state_dir, ["k"], "v") is True
    # replay of batch 0 must not double-count
    assert merge_batch_into_state(df, 0, state_dir, ["k"], "v") is False
    got = {r["k"]: r for r in spark.read.parquet(f"{state_dir}/state").collect()}
    assert got[1]["cnt"] == 2 and abs(got[1]["total"] - 30.0) < 1e-9
    # next batch merges
    df2 = spark.createDataFrame([(2, 7.0)], "k int, v double")
    assert merge_batch_into_state(df2, 1, state_dir, ["k"], "v") is True
    got = {r["k"]: r for r in spark.read.parquet(f"{state_dir}/state").collect()}
    assert got[2]["cnt"] == 2 and got[2]["vmax"] == 7.0
