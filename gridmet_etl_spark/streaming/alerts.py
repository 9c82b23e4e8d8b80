"""Threshold-crossing alerting: emit one alert when a key's metric rises
above a threshold, then stay silent until it has dropped back below
(hysteresis suppression) — the monitoring primitive behind freshness/SLA
gates (the reference's Gridmet_current.py availability gate generalized to
per-key metric streams).

Two twins with identical position-order semantics (an alert fires on a
below→above transition in event-time order; the series' first observation
alerts if already above):

- ``threshold_alerts`` (batch): one lag window keyed by the series —
  ONE shuffle, output is |transitions|-sized.
- ``streaming_threshold_alerts``: ``applyInPandasWithState`` with O(1)
  state per key (last observed "above" flag + last event-time), so a
  100 TB stream costs |keys| × ~16 bytes of state. Late data beyond the
  watermark is dropped by the engine; within-batch rows process in
  event-time order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_ALERT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)
_ALERT_STATE = StructType(
    [StructField("above", BooleanType()), StructField("last_us", LongType())]
)


def threshold_alerts(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    threshold: float,
) -> DataFrame:
    """Batch twin: rows where the value crosses from ≤ threshold (or series
    start) to > threshold, in ``order_col`` order per key."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(order_col)
    prev = F.lag(value_col).over(w)
    return (
        df.withColumn("_prev", prev)
        .where(
            (F.col(value_col) > threshold)
            & (F.col("_prev").isNull() | (F.col("_prev") <= threshold))
        )
        .select(*keys, order_col, value_col)
    )


def streaming_threshold_alerts(
    stream: DataFrame,
    threshold: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin over a keyed metric stream: emits (key, ts, value)
    once per below→above transition with hysteresis suppression."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        (k,) = key
        above, last_us = (state.get if state.exists else (False, 0))
        batch = pd.concat(list(pdfs), ignore_index=True)
        alerts = []
        if len(batch):
            batch = batch.sort_values(ts_col)
            for ts, v in zip(batch[ts_col], batch[value_col]):
                us = int(pd.Timestamp(ts).value // 1000)
                if us < last_us:
                    continue  # out-of-order behind applied state: skip
                now_above = v is not None and float(v) > threshold
                if now_above and not above:
                    alerts.append((us, float(v)))
                above, last_us = now_above, us
        state.update((bool(above), int(last_us)))
        if alerts:
            yield pd.DataFrame(
                {
                    "key": [k] * len(alerts),
                    "ts": [pd.Timestamp(a[0], unit="us") for a in alerts],
                    "value": [a[1] for a in alerts],
                }
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=_ALERT_SCHEMA,
            stateStructType=_ALERT_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
