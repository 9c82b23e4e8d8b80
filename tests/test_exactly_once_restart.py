"""End-to-end exactly-once across a restart: the replayable event_stream
source + the batchId-idempotent manifest sink, stopped mid-stream and
resumed from the checkpoint, must publish every event exactly once."""

import time

from gridmet_etl_spark.sources.manifest_sink import (
    ManifestJsonlSink,
    committed_files,
    read_manifest,
)
from gridmet_etl_spark.streaming.event_source import (
    SyntheticEventStream,
    event_row,
)


def test_restart_resumes_without_duplicates(spark, tmp_path):
    spark.dataSource.register(SyntheticEventStream)
    spark.dataSource.register(ManifestJsonlSink)
    out, ckpt = str(tmp_path / "ds"), str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("event_stream")
            .option("rows_per_batch", "40")
            .option("n_users", "10")
            .option("max_rows", "200")
            .load()
            .writeStream.format("manifest_jsonl")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def published_rows():
        return sum(f["rows"] for e in read_manifest(out) for f in e["files"])

    q = start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline and published_rows() < 80:
            time.sleep(0.5)
        assert published_rows() >= 80
    finally:
        q.stop()  # mid-stream shutdown

    q2 = start()  # resume from the SAME checkpoint
    try:
        deadline = time.time() + 60
        while time.time() < deadline and published_rows() < 200:
            time.sleep(0.5)
    finally:
        q2.stop()

    # exactly once: every event id 0..199 appears EXACTLY once
    got = sorted(
        r.event_id for r in spark.read.json(committed_files(out)).collect()
    )
    assert got == list(range(200))
    # and the published batch ids are unique
    ids = [e["batch_id"] for e in read_manifest(out) if e["files"]]
    assert len(ids) == len(set(ids))
    # spot-check payload fidelity against the pure generator
    row42 = spark.read.json(committed_files(out)).where("event_id = 42").first()
    assert row42.user_id == event_row(42, 10)[2]
