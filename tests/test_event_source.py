"""Streaming Python data source: offset progression, deterministic replay,
and an end-to-end readStream → windowed agg → memory sink pipeline."""

import time

from pyspark.sql import functions as F

from gridmet_etl_spark.streaming.event_source import (
    SyntheticEventStream,
    _EventStreamReader,
    event_row,
)


def test_reader_offsets_and_replay():
    r = _EventStreamReader({"rows_per_batch": "10", "n_users": "7"})
    assert r.initialOffset() == {"id": 0}
    rows, nxt = r.read({"id": 0})
    rows = list(rows)
    assert nxt == {"id": 10} and len(rows) == 10
    assert rows[3] == event_row(3, 7)
    replay = list(r.readBetweenOffsets({"id": 0}, {"id": 10}))
    assert replay == rows  # bit-identical regeneration
    rows2, nxt2 = r.read(nxt)
    assert nxt2 == {"id": 20}
    assert list(rows2)[0][0] == 10  # no overlap, no gap


def test_reader_bounded_by_max_rows():
    r = _EventStreamReader({"rows_per_batch": "10", "max_rows": "15"})
    _, nxt = r.read({"id": 0})
    rows2, nxt2 = r.read(nxt)
    assert nxt2 == {"id": 15} and len(list(rows2)) == 5
    rows3, nxt3 = r.read(nxt2)
    assert nxt3 == {"id": 15} and list(rows3) == []


def test_end_to_end_stream_pipeline(spark, tmp_path):
    spark.dataSource.register(SyntheticEventStream)
    stream = (
        spark.readStream.format("event_stream")
        .option("rows_per_batch", "100")
        .option("n_users", "10")
        .option("max_rows", "300")
        .load()
    )
    agg = stream.withWatermark("ts", "10 minutes").groupBy(
        F.window("ts", "1 minute"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_v"))
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_src_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        total = -1
        while time.time() < deadline:
            total = spark.sql("SELECT coalesce(sum(n), 0) FROM ev_src_agg").first()[0]
            if total == 300:
                break
            time.sleep(1)
        assert total == 300
        # oracle: the same 300 rows generated driver-side
        rows = [event_row(i, 10) for i in range(300)]
        import collections

        golden = collections.Counter(
            (r[1].replace(second=0), r[3]) for r in rows
        )
        got = {
            (r["window"].start, r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM ev_src_agg").collect()
        }
        assert got == dict(golden)
    finally:
        q.stop()
