"""Finance/risk window operators over keyed daily series.

The reference engine's consumers aggregate daily weather series
(rmcd-mscb/gridmet-etl etl.py daily output grain); these are the same
keyed-daily-series shapes applied to the risk readouts a trading/metrics
stack computes — historical VaR/CVaR, CAPM beta/alpha, Sharpe/Sortino,
the stochastic oscillator, and on-balance volume.

Determinism discipline (the contract-wide rules): every input series is
quantized to integer units (cents / e6-returns) at the caller; counts,
order statistics and cumulative sums are exact BIGINT/DECIMAL(38,0); each
published float is ONE fixed-operand-order double expression of exact
integers, written identically in the DuckDB oracles; displays round at
``ndigits``.

Scale shape: everything here is a per-key window or a per-key aggregate —
one shuffle on the series key, per-task state bounded by one key's days
(a daily series is ≤ ~37k rows per century — never a hub problem).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def _rnd(c: Column, ndigits: int) -> Column:
    return F.round(c, ndigits) + F.lit(0.0)


def historical_var(
    losses: DataFrame,
    keys: list[str],
    loss_col: str,
    alpha: float = 0.95,
    ndigits: int = 6,
) -> DataFrame:
    """Historical Value-at-Risk and CVaR (expected shortfall) per key.

    VaR_α = the ⌈α·n⌉-th order statistic of the integer loss column
    (exact — row_number ties are value-equivalent, so the picked VALUE is
    deterministic); CVaR_α = mean of all losses ≥ VaR_α (value-conditioned
    tail expectation — deterministic under ties, the standard estimator).

    Output (1 row/key): (keys..., n, var, cvar, worst) — var/cvar/worst
    reported in loss units / 100 (cents → currency).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(loss_col).asc())
    ranked = losses.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(*keys))
    )
    kth = ranked.filter(
        F.col("_rn") >= F.ceil(F.lit(alpha) * F.col("_n")).cast("long")
    ).groupBy(*keys).agg(F.min(loss_col).alias("_var"))
    tail = (
        losses.join(kth, keys)
        .filter(F.col(loss_col) >= F.col("_var"))
        .groupBy(*keys)
        .agg(
            F.sum(_dec(F.col(loss_col))).alias("_ts"),
            F.count(F.lit(1)).cast("long").alias("_tn"),
            F.min("_var").alias("_v"),
        )
    )
    base = losses.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(loss_col).alias("_worst"),
    )
    out = base.join(tail, keys)
    return out.select(
        *keys,
        F.col("n"),
        _rnd(F.col("_v").cast("double") / 100.0, ndigits).alias("var"),
        _rnd(
            F.col("_ts").cast("double") / F.col("_tn").cast("double") / 100.0,
            ndigits,
        ).alias("cvar"),
        _rnd(F.col("_worst").cast("double") / 100.0, ndigits).alias("worst"),
    )


def capm_beta(
    joined: DataFrame,
    keys: list[str],
    asset_col: str,
    market_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """CAPM beta/alpha/correlation of integer (e6-quantized) asset returns
    against market returns, per key.

    beta = (n·Σxy − Σx·Σy) / (n·Σyy − Σy²) over exact DECIMAL(38,0)
    moments (x = asset, y = market); alpha = (Σx − beta·Σy)/n in the same
    e6 return units; corr shares the numerator with two correctly-rounded
    sqrts. One aggregation pass, one row per key.
    """
    x = F.col(asset_col)
    y = F.col(market_col)
    acc = joined.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(_dec(x)).alias("sx"),
        F.sum(_dec(y)).alias("sy"),
        F.sum(_dec(x) * y).alias("sxy"),
        F.sum(_dec(x) * x).alias("sxx"),
        F.sum(_dec(y) * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = n * F.col("sxy").cast("double") - sx * sy
    deny = n * F.col("syy").cast("double") - sy * sy
    denx = n * F.col("sxx").cast("double") - sx * sx
    beta = F.when(deny == 0.0, F.lit(0.0)).otherwise(num / deny)
    alpha = (sx - beta * sy) / n
    corr = F.when((denx <= 0.0) | (deny <= 0.0), F.lit(0.0)).otherwise(
        num / (F.sqrt(denx) * F.sqrt(deny))
    )
    return acc.select(
        *keys,
        F.col("n"),
        _rnd(beta, ndigits).alias("beta"),
        _rnd(alpha, ndigits).alias("alpha_e6"),
        _rnd(corr, ndigits).alias("corr"),
    )


def sharpe_sortino(
    returns: DataFrame,
    keys: list[str],
    r_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Sharpe and Sortino ratios of integer (e6-quantized) returns per key.

    sharpe = mean / sd (sample sd: sqrt((n·Σr² − (Σr)²)/(n·(n−1))));
    sortino = mean / downside deviation (sqrt(Σ min(r,0)² / n), 0 target).
    Exact integer moments, fixed-order double finishes, 0.0 guards where
    a denominator degenerates.
    """
    r = F.col(r_col)
    neg = F.when(r < 0, r).otherwise(F.lit(0))
    acc = returns.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(_dec(r)).alias("s"),
        F.sum(_dec(r) * r).alias("q"),
        F.sum(_dec(neg) * neg).alias("qd"),
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    q = F.col("q").cast("double")
    mean = s / n
    var_n = n * q - s * s
    sd = F.sqrt(var_n / (n * (n - F.lit(1.0))))
    dd = F.sqrt(F.col("qd").cast("double") / n)
    sharpe = F.when((F.col("n") < 2) | (var_n <= 0.0), F.lit(0.0)).otherwise(
        mean / sd
    )
    sortino = F.when(dd == 0.0, F.lit(0.0)).otherwise(mean / dd)
    return acc.select(
        *keys,
        F.col("n"),
        _rnd(mean, ndigits).alias("mean_e6"),
        _rnd(sharpe, ndigits).alias("sharpe"),
        _rnd(sortino, ndigits).alias("sortino"),
    )


def stochastic_oscillator(
    daily: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    k_window: int = 14,
    d_window: int = 3,
    hot: float = 80.0,
    cold: float = 20.0,
    ndigits: int = 6,
) -> DataFrame:
    """Stochastic oscillator %K/%D breach days per key.

    %K = 100·(v − min_w)/(max_w − min_w) over the trailing ``k_window``
    rows, quantized to an exact e6 integer the moment it is computed
    (k_e6 = round((v−mn)·1e8/(mx−mn))) so the %D moving average is a sum
    of INTEGERS — no float window accumulation ever crosses engines.
    Emits only full-window days where %K leaves the [cold, hot] band.

    Output: (keys..., day, value, k_pct, d_pct, zone) — zone +1 overbought
    / −1 oversold.
    """
    wk = (
        Window.partitionBy(*keys)
        .orderBy(time_col)
        .rowsBetween(-(k_window - 1), 0)
    )
    v = F.col(value_col)
    mn = F.min(value_col).over(wk)
    mx = F.max(value_col).over(wk)
    cnt = F.count(F.lit(1)).over(wk)
    k_e6 = F.when(mx == mn, F.lit(50_000_000).cast("long")).otherwise(
        F.round(
            (v - mn).cast("double") * 1e8 / (mx - mn).cast("double"), 0
        ).cast("long")
    )
    with_k = daily.select(
        *keys,
        F.col(time_col).alias("day"),
        v.alias("value"),
        cnt.alias("_ck"),
        k_e6.alias("_k"),
    ).filter(F.col("_ck") >= k_window)
    wd = (
        Window.partitionBy(*keys)
        .orderBy("day")
        .rowsBetween(-(d_window - 1), 0)
    )
    with_d = with_k.select(
        *keys,
        "day",
        "value",
        "_k",
        F.sum(_dec(F.col("_k"))).over(wd).alias("_dsum"),
        F.count(F.lit(1)).over(wd).alias("_cd"),
    ).filter(F.col("_cd") >= d_window)
    k_pct = F.col("_k").cast("double") / 1e6
    d_pct = F.col("_dsum").cast("double") / F.lit(float(d_window)) / 1e6
    return with_d.filter(
        (F.col("_k") > F.lit(int(hot * 1e6))) | (F.col("_k") < F.lit(int(cold * 1e6)))
    ).select(
        *keys,
        "day",
        "value",
        _rnd(k_pct, ndigits).alias("k_pct"),
        _rnd(d_pct, ndigits).alias("d_pct"),
        F.when(F.col("_k") > F.lit(int(hot * 1e6)), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("int")
        .alias("zone"),
    )


def obv_trend(
    daily: DataFrame,
    keys: list[str],
    time_col: str,
    price_col: str,
    vol_col: str,
) -> DataFrame:
    """On-balance volume summary per key: OBV_t = Σ_{u≤t} sign(Δprice_u)
    · volume_u (first day contributes 0). Exact integer cumulative sums;
    summary = (final, max, min, n_days) — the "is volume confirming the
    trend" readout, all-BIGINT output.
    """
    w = Window.partitionBy(*keys).orderBy(time_col)
    prev = F.lag(price_col).over(w)
    sign = (
        F.when(prev.isNull(), F.lit(0))
        .when(F.col(price_col) > prev, F.lit(1))
        .when(F.col(price_col) < prev, F.lit(-1))
        .otherwise(F.lit(0))
    )
    wc = Window.partitionBy(*keys).orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    stepped = daily.select(
        *keys,
        F.col(time_col).alias("_day"),
        F.sum(_dec(sign * F.col(vol_col))).over(wc).alias("_obv"),
    )
    pick = F.struct(F.col("_day").alias("d"), F.col("_obv").alias("o"))
    return stepped.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max(pick).getField("o").cast("long").alias("obv_final"),
        F.max(F.col("_obv")).cast("long").alias("obv_max"),
        F.min(F.col("_obv")).cast("long").alias("obv_min"),
    )
