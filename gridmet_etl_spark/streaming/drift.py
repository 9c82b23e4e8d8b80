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
  per key (t, Σx, U, min U, last applied event-time) — a 100 TB stream
  costs |keys| × ~40 bytes of state. Late data beyond the watermark is
  dropped by the engine; rows behind the applied state are skipped
  (the alerts-twin convention).

Float discipline: both twins run the SAME sequential recurrence in the
same order, so their doubles match bit-for-bit; ties on event time order
by value in both.
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
        t, s, u, minu, last_us = (
            state.get if state.exists else (0, 0.0, 0.0, 0.0, 0)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        alarms = []
        if len(batch):
            batch = batch.sort_values([ts_col, value_col])
            for ts, v in zip(batch[ts_col], batch[value_col]):
                us = int(pd.Timestamp(ts).value // 1000)
                if us < last_us or v is None:
                    continue
                x = float(v)
                t += 1
                s += x
                u += x - s / t - delta
                minu = min(minu, u)
                if u - minu > lam:
                    alarms.append((us, x, round(u, 6), round(u - minu, 6)))
                last_us = us
        state.update((int(t), float(s), float(u), float(minu), int(last_us)))
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
