"""Replayable synthetic event stream — a Python streaming data source
(Spark 4 ``SimpleDataSourceStreamReader``), the harness twin of a Kafka
topic for this engine's streaming operators:

    spark.dataSource.register(SyntheticEventStream)
    stream = (spark.readStream.format("event_stream")
              .option("rows_per_batch", "500")
              .option("n_users", "50").load())

Semantics the real bus would give you, reproduced exactly:

- **Monotonic offsets** (``{"id": n}``): each micro-batch claims the next
  ``rows_per_batch`` event ids; the engine checkpoints the offset, so
  stop/restart resumes — not repeats — the sequence.
- **Replayability**: every row is a PURE FUNCTION of its id (crc32-spread
  user, cycling type, derived value/timestamp), so
  ``readBetweenOffsets(start, end)`` regenerates a failed batch
  bit-identically — the property exactly-once sinks rely on.
- **Event time**: ``ts`` advances one second per event from a fixed epoch,
  so watermark/window semantics are deterministic in tests.

This is the missing third leg of the streaming story: the operators
(windows/sessionize/dedup/joins/quota) are batch-equivalence-tested, the
sinks are idempotence-tested, and with this source the whole
readStream → transform → writeStream pipeline runs against a real
offset-tracked source with no filesystem staging.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timedelta, timezone

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

FORMAT_NAME = "event_stream"

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


def event_row(i: int, n_users: int) -> tuple:
    """The pure id → event function (shared by the source and by test
    oracles): crc32 spreads users so per-user order is still ts order."""
    user = zlib.crc32(f"u{i}".encode()) % n_users
    return (
        i,
        (_EPOCH + timedelta(seconds=i)).replace(tzinfo=None),
        user,
        EVENT_TYPES[i % len(EVENT_TYPES)],
        (i % 1000) / 10.0,
    )


class _EventStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self._rows = int(options.get("rows_per_batch", "100"))
        self._users = int(options.get("n_users", "20"))
        self._max = int(options.get("max_rows", "0"))  # 0 = unbounded

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API name)
        return {"id": 0}

    def read(self, start: dict):
        lo = int(start["id"])
        hi = lo + self._rows
        if self._max:
            hi = min(hi, self._max)
        return (
            iter([event_row(i, self._users) for i in range(lo, hi)]),
            {"id": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [event_row(i, self._users) for i in range(int(start["id"]), int(end["id"]))]
        )


class SyntheticEventStream(DataSource):
    """``spark.readStream.format("event_stream")`` — offset-tracked,
    replayable synthetic events."""

    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return STREAM_SCHEMA

    def simpleStreamReader(self, schema):  # noqa: N802 (Spark API name)
        return _EventStreamReader(self.options)
