"""Manifest sink: batch two-phase commit, failed-job atomicity, streaming
epoch idempotence (replayed batchId publishes nothing)."""

import glob
import os
import time

import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.sources.manifest_sink import (
    ManifestJsonlSink,
    _Staged,
    _StreamWriter,
    committed_files,
    read_manifest,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(ManifestJsonlSink)
    return spark


def test_batch_commit_publishes_manifest(registered, tmp_path):
    out = str(tmp_path / "ds")
    df = registered.range(0, 1000, 1, 8).select(
        "id", F.sha2(F.col("id").cast("string"), 256).alias("h")
    )
    df.write.format("manifest_jsonl").mode("append").option("path", out).save()
    entries = read_manifest(out)
    assert len(entries) == 1 and entries[0]["kind"] == "batch"
    assert sum(f["rows"] for f in entries[0]["files"]) == 1000
    assert not glob.glob(os.path.join(out, "_staging", "*"))
    back = registered.read.json(committed_files(out))
    assert back.count() == 1000
    assert back.agg(F.sum("id")).first()[0] == 999 * 1000 // 2


def test_failed_job_commits_nothing(registered, tmp_path):
    out = str(tmp_path / "ds_fail")

    @F.udf("long")
    def boom(x):
        if x == 500:
            raise ValueError("task failure")
        return x

    df = registered.range(0, 1000, 1, 8).select(boom("id").alias("id"))
    with pytest.raises(Exception):
        df.write.format("manifest_jsonl").mode("append").option("path", out).save()
    assert read_manifest(out) == []
    assert glob.glob(os.path.join(out, "*.jsonl")) == []  # nothing published


def test_stream_epochs_are_idempotent(registered, tmp_path):
    from gridmet_etl_spark.streaming.event_source import SyntheticEventStream

    registered.dataSource.register(SyntheticEventStream)
    out = str(tmp_path / "ds_stream")
    stream = (
        registered.readStream.format("event_stream")
        .option("rows_per_batch", "50")
        .option("max_rows", "150")
        .load()
    )
    q = (
        stream.writeStream.format("manifest_jsonl")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = sum(
                f["rows"] for e in read_manifest(out) for f in e["files"]
            )
            if rows >= 150:
                break
            time.sleep(1)
        assert rows == 150
    finally:
        q.stop()
    entries = [e for e in read_manifest(out) if e["files"]]
    batch_ids = [e["batch_id"] for e in entries]
    assert len(batch_ids) == len(set(batch_ids))  # one publish per epoch
    assert registered.read.json(committed_files(out)).count() == 150

    # unit-level replay: committing an already-published batchId is a no-op
    w = _StreamWriter({"path": out})
    os.makedirs(os.path.join(out, "_staging"), exist_ok=True)
    ghost = os.path.join(out, "_staging", "ghost.jsonl")
    open(ghost, "w").write('{"event_id": 999999}\n')
    n_before = len(read_manifest(out))
    w.commit([_Staged(file="ghost.jsonl", rows=1, bytes=20)], batch_ids[0])
    assert len(read_manifest(out)) == n_before  # no new entry
    assert not os.path.exists(ghost)  # replayed stage cleaned up


def test_time_travel_snapshots(registered, tmp_path):
    from gridmet_etl_spark.sources.manifest_sink import read_snapshot

    out = str(tmp_path / "tt")
    for lo in (0, 100, 200):
        registered.range(lo, lo + 100, 1, 2).write.format("manifest_jsonl").mode(
            "append"
        ).option("path", out).save()
    assert len(read_manifest(out)) == 3
    # latest sees all three commits; version=N sees exactly the first N
    assert read_snapshot(registered, out).count() == 300
    assert read_snapshot(registered, out, version=1).count() == 100
    v2 = read_snapshot(registered, out, version=2)
    assert v2.count() == 200
    assert v2.agg(F.max("id")).first()[0] == 199
    # version beyond history behaves like latest; version=0 is empty
    assert read_snapshot(registered, out, version=99).count() == 300
    empty = read_snapshot(registered, out, version=0, schema="id long")
    assert empty.count() == 0


def test_empty_snapshot_requires_schema(registered, tmp_path):
    from gridmet_etl_spark.sources.manifest_sink import read_snapshot

    out = str(tmp_path / "never_committed")
    os.makedirs(out, exist_ok=True)
    with pytest.raises(ValueError):
        read_snapshot(registered, out)
    assert read_snapshot(registered, out, schema="id long").count() == 0
