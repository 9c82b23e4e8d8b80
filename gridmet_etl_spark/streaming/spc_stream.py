"""Per-key ONLINE control-chart alarms: the streaming twin of the batch
``operators/timeseries.control_chart_rules`` idea, restated for a live
stream where the baseline must be the PAST only (the batch operator
scores each day against the series' full-history moments — fine
retrospectively, impossible online).

Semantics (both twins, identical event-time order): for each event, the
key's baseline is the running mean/sd of the STRICTLY PRIOR values
(prior count t, prior sum s, prior sum-of-squares q); alarm rules:
  rule 1 — |z| > 3 with z = (x − s/t)/sd, sd the prior sample sd;
  rule 4 — the 8th consecutive value on the same side of the evolving
           prior mean (sign of x − s/t; a zero side resets the run).
Alarms only once the baseline holds ≥ ``min_baseline`` points.

- ``spc_alarms_batch``: prior-frame windows (rowsBetween(…, −1)) over one
  per-key (ts, value) sort — the running sums accumulate left-to-right in
  exactly the order the stream applies them, so doubles match the
  streaming twin bit-for-bit (the page_hinkley twin-parity discipline;
  S − x ≠ Σ_{i<t} x_i in floats, which is why the PRIOR frame is used
  rather than subtracting the current row).
- ``streaming_spc_alarms``: ``applyInPandasWithState``, O(1) state per
  key (t, s, q, side, run, last applied (event-time, value) pair) —
  |keys| × ~56 bytes at any stream length. Late rows behind the applied
  frontier are dropped, not reordered; missing values are skipped
  without advancing the frontier (drift.py conventions).

Parity caveats (inherited from drift.py's frontier design): a SECOND
genuine event with an identical (event-time, value) pair arriving in a
LATER micro-batch is indistinguishable from a replay and is dropped by
the streaming twin (exact-duplicate replays stay idempotent), while the
batch twin scores both — within one micro-batch equal pairs all apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_SPC_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
        StructField("r1", IntegerType()),
        StructField("r4", IntegerType()),
    ]
)
_SPC_STATE = StructType(
    [
        StructField("t", LongType()),
        StructField("s", DoubleType()),
        StructField("q", DoubleType()),
        StructField("side", IntegerType()),
        StructField("run", LongType()),
        StructField("last_us", LongType()),
        StructField("last_v", DoubleType()),
    ]
)


def spc_alarms_batch(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    min_baseline: int = 8,
) -> DataFrame:
    """Batch twin: online-SPC alarm rows in event-time order.

    Output: (*keys, ts, value, z, r1, r4) for rows firing rule 1 or 4."""
    from pyspark.sql import Window

    x = F.col(value_col).cast("double")
    # drop missing values BEFORE ordering: the streaming twin skips NaN
    # rows without advancing t or resetting the run, so a null row here
    # must not occupy a row_number slot (it would inflate the prior count
    # and split the gaps-and-islands run, breaking bit-for-bit parity)
    df = df.filter(x.isNotNull() & ~F.isnan(x))
    w = Window.partitionBy(*keys).orderBy(ts_col, value_col)
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    tp = (F.row_number().over(w) - 1).cast("double")
    sp = F.coalesce(F.sum(x).over(prior), F.lit(0.0))
    qp = F.coalesce(F.sum(x * x).over(prior), F.lit(0.0))
    var_n = tp * qp - sp * sp
    sd = F.sqrt(var_n / (tp * (tp - 1.0)))
    z = F.when((tp < 2) | (var_n <= 0.0), F.lit(0.0)).otherwise(
        (x - sp / tp) / sd
    )
    diff = x - sp / tp
    side = (
        F.when(tp < 1, F.lit(0))
        .when(diff > 0, F.lit(1))
        .when(diff < 0, F.lit(-1))
        .otherwise(F.lit(0))
    )
    stepped = df.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        x.alias("_x"),
        tp.alias("_tp"),
        z.alias("_z"),
        side.alias("_side"),
    )
    # same-side run length via gaps-and-islands on the identical order
    w2 = Window.partitionBy(*keys).orderBy("_ts", "_x")
    ws = Window.partitionBy(*keys, "_side").orderBy("_ts", "_x")
    runs = stepped.withColumn(
        "_isl", F.row_number().over(w2) - F.row_number().over(ws)
    )
    wr = Window.partitionBy(*keys, "_side", "_isl").orderBy("_ts", "_x")
    flagged = runs.withColumn(
        "_run",
        F.when(F.col("_side") == 0, F.lit(0)).otherwise(
            F.row_number().over(wr)
        ),
    )
    out = flagged.select(
        *keys,
        F.col("_ts").alias("ts"),
        F.col("_x").alias("value"),
        (F.round(F.col("_z"), 6) + F.lit(0.0)).alias("z"),
        (
            (F.col("_tp") >= min_baseline) & (F.abs(F.col("_z")) > 3.0)
        ).cast("int").alias("r1"),
        (
            (F.col("_tp") >= min_baseline) & (F.col("_run") >= 8)
        ).cast("int").alias("r4"),
    )
    return out.filter((F.col("r1") + F.col("r4")) > 0)


def streaming_spc_alarms(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    min_baseline: int = 8,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin: emits (key, ts, value, z, r1, r4) alarm rows."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        import math

        import pandas as pd

        (k,) = key
        t, s, q, side, run, last_us, last_v = (
            state.get
            if state.exists
            else (0, 0.0, 0.0, 0, 0, 0, float("-inf"))
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        alarms = []
        f_us, f_v = last_us, last_v
        if len(batch):
            batch = batch.sort_values([ts_col, value_col])
            for ts, v in zip(batch[ts_col], batch[value_col]):
                if pd.isna(v):
                    continue
                us = int(pd.Timestamp(ts).value // 1000)
                x = float(v)
                if (us, x) <= (f_us, f_v):
                    continue
                # score against the PRIOR baseline (state before x)
                tp = float(t)
                var_n = tp * q - s * s
                if t < 2 or var_n <= 0.0:
                    z = 0.0
                else:
                    z = (x - s / tp) / math.sqrt(var_n / (tp * (tp - 1.0)))
                diff_side = 0
                if t >= 1:
                    d = x - s / tp
                    diff_side = 1 if d > 0 else (-1 if d < 0 else 0)
                run = run + 1 if (diff_side != 0 and diff_side == side) else (
                    1 if diff_side != 0 else 0
                )
                side = diff_side
                r1 = 1 if (t >= min_baseline and abs(z) > 3.0) else 0
                r4 = 1 if (t >= min_baseline and run >= 8) else 0
                if r1 or r4:
                    alarms.append((us, x, round(z, 6), r1, r4))
                t += 1
                s += x
                q += x * x
                last_us, last_v = us, x
        state.update(
            (
                int(t),
                float(s),
                float(q),
                int(side),
                int(run),
                int(last_us),
                float(last_v),
            )
        )
        if alarms:
            yield pd.DataFrame(
                {
                    "key": [k] * len(alarms),
                    "ts": [pd.Timestamp(a[0], unit="us") for a in alarms],
                    "value": [a[1] for a in alarms],
                    "z": [a[2] for a in alarms],
                    "r1": [a[3] for a in alarms],
                    "r4": [a[4] for a in alarms],
                }
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=_SPC_SCHEMA,
            stateStructType=_SPC_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
