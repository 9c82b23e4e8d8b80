"""Per-key Page–Hinkley drift monitoring: alarm when a key's metric
drifts above its own evolving mean — the online changepoint monitor a
long-running ingest attaches to throughput/quality metrics (the batch
``operators/timeseries.page_hinkley`` generalized to keyed streams).

Two twins with identical event-time-order semantics (per key, sequential
recurrence m̄_t = S_t/t, U_t = Σ(x_i − m̄_i − δ), alarm rows wherever
U_t − min U > λ):

- ``page_hinkley_keyed`` (batch): three frames over ONE per-key sort
  (running sum, running U, running min) — a single shuffle.
- ``streaming_page_hinkley``: ``applyInPandasWithState`` with O(1) state
  per key (t, Σx, U, min U, last applied (event-time, value) pair) — a
  100 TB stream costs |keys| × ~48 bytes of state. Late data beyond the
  watermark is dropped by the engine; rows at or behind the applied
  (ts, value) frontier are skipped (the alerts-twin convention, which
  also makes exact-duplicate replays idempotent).

Float discipline: both twins run the SAME sequential recurrence in the
same order, so their doubles match bit-for-bit; ties on event time order
by value in both. Parity caveat (inherent to incremental state): an event
whose ts EQUALS the applied frontier but whose value is SMALLER, arriving
only in a LATER micro-batch, cannot be retroactively ordered before the
already-applied peer — the streaming twin drops it (frontier skip) rather
than apply it out of order, while a batch re-run would include it.
Missing values (None or NaN — pandas delivers float-column nulls as NaN)
are skipped by both twins without advancing the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_DRIFT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("ph", DoubleType()),
        StructField("excess", DoubleType()),
    ]
)
_DRIFT_STATE = StructType(
    [
        StructField("t", LongType()),
        StructField("s", DoubleType()),
        StructField("u", DoubleType()),
        StructField("minu", DoubleType()),
        StructField("last_us", LongType()),
        StructField("last_v", DoubleType()),
    ]
)


def page_hinkley_keyed(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    delta: float = 0.0,
    lam: float = 50.0,
) -> DataFrame:
    """Batch twin: per-key Page–Hinkley alarm rows in event-time order.

    Output: (*keys, ts, value, ph, excess) for rows with
    U_t − min U > λ."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(ts_col, value_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    x = F.col(value_col).cast("double")
    stepped = (
        df.withColumn("_s", F.sum(x).over(run))
        .withColumn("_i", F.row_number().over(w))
        .withColumn(
            "_u", x - F.col("_s") / F.col("_i") - F.lit(float(delta))
        )
        .withColumn("_U", F.sum("_u").over(run))
        .withColumn("_minU", F.min("_U").over(run))
    )
    return stepped.filter(
        F.col("_U") - F.col("_minU") > F.lit(float(lam))
    ).select(
        *keys,
        F.col(ts_col),
        x.alias("value"),
        (F.round(F.col("_U"), 6) + F.lit(0.0)).alias("ph"),
        (F.round(F.col("_U") - F.col("_minU"), 6) + F.lit(0.0)).alias(
            "excess"
        ),
    )


def streaming_page_hinkley(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    delta: float = 0.0,
    lam: float = 50.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin: emits (key, ts, value, ph, excess) for every
    event where the key's Page–Hinkley excess exceeds λ."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        (k,) = key
        t, s, u, minu, last_us, last_v = (
            state.get
            if state.exists
            else (0, 0.0, 0.0, 0.0, 0, float("-inf"))
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        alarms = []
        # frontier is snapshotted at batch start: rows at or behind the
        # PRIOR batches' applied (ts, value) pair are either already applied
        # or unorderable against an applied equal-ts peer — drop, don't
        # reorder. Duplicates WITHIN this batch stay > the snapshot and are
        # all processed, matching the batch twin's (ts, value) sort.
        f_us, f_v = last_us, last_v
        if len(batch):
            batch = batch.sort_values([ts_col, value_col])
            for ts, v in zip(batch[ts_col], batch[value_col]):
                # pandas delivers float-column nulls as NaN, not None —
                # pd.isna covers both (a raw NaN would poison s/u forever)
                if pd.isna(v):
                    continue
                us = int(pd.Timestamp(ts).value // 1000)
                x = float(v)
                if (us, x) <= (f_us, f_v):
                    continue
                t += 1
                s += x
                u += x - s / t - delta
                minu = min(minu, u)
                if u - minu > lam:
                    alarms.append((us, x, round(u, 6), round(u - minu, 6)))
                last_us, last_v = us, x
        state.update(
            (int(t), float(s), float(u), float(minu), int(last_us), float(last_v))
        )
        if alarms:
            yield pd.DataFrame(
                {
                    "key": [k] * len(alarms),
                    "ts": [pd.Timestamp(a[0], unit="us") for a in alarms],
                    "value": [a[1] for a in alarms],
                    "ph": [a[2] for a in alarms],
                    "excess": [a[3] for a in alarms],
                }
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=_DRIFT_SCHEMA,
            stateStructType=_DRIFT_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
