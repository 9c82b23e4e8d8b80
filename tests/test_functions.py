"""F1-F5 physics/unit formulas vs independent numpy implementations
(reference: helper.py:175-227, etl.py:740, 737-739)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.functions.physics import (
    mean_humidity,
    pressure_at_elevation,
    relative_humidity,
    saturation_vapor_pressure,
)
from gridmet_etl_spark.functions.units import convert, convert_columns, kelvin_to_celsius


def _np_pressure(elev, t_avg):
    return 1013.25 * np.exp(-9.80665 * elev / (287.05 * t_avg))


def _np_svp(t_k):
    tc = t_k - 273.15
    return 6.1094 * np.exp(17.625 * tc / (tc + 243.04))


def _np_rh(tmax, tmin, sph, elev):
    t_avg = (tmax + tmin) / 2.0
    p = _np_pressure(elev, t_avg)
    e = sph * p / 0.622
    return e / _np_svp(t_avg) * 100.0


@pytest.fixture(scope="module")
def phys_df(spark):
    rows = [
        (290.0, 280.0, 0.008, 1500.0),
        (300.0, 288.0, 0.015, 10.0),
        (273.15, 263.15, 0.002, 3200.0),
        (310.0, 295.0, 0.019, 0.0),
    ]
    return spark.createDataFrame(rows, ["tmax_k", "tmin_k", "sph", "elev"])


def test_kelvin_to_celsius(spark, phys_df):
    out = phys_df.select(kelvin_to_celsius("tmax_k").alias("c")).toPandas()["c"]
    assert out.iloc[0] == pytest.approx(290.0 - 273.15, abs=1e-12)


def test_conversion_roundtrip(spark, phys_df):
    """Property: K→°C→K is identity."""
    out = phys_df.select(
        convert(convert("tmax_k", "K", "degC"), "degC", "K").alias("k"),
        "tmax_k",
    ).toPandas()
    assert np.allclose(out["k"], out["tmax_k"], atol=1e-10)


def test_unknown_conversion_raises():
    with pytest.raises(ValueError):
        convert("x", "K", "furlong")


def test_convert_columns(spark, phys_df):
    out = convert_columns(phys_df, {"tmax_k": ("K", "degC"), "tmin_k": ("K", "degC")}).toPandas()
    assert out["tmax_k"].iloc[0] == pytest.approx(16.85, abs=1e-10)
    assert out["sph"].iloc[0] == 0.008  # untouched


def test_pressure_and_svp(spark, phys_df):
    pdf = phys_df.toPandas()
    out = phys_df.select(
        pressure_at_elevation("elev", (F.col("tmax_k") + F.col("tmin_k")) / 2).alias("p"),
        saturation_vapor_pressure("tmax_k").alias("es"),
    ).toPandas()
    t_avg = (pdf["tmax_k"] + pdf["tmin_k"]) / 2
    assert np.allclose(out["p"], _np_pressure(pdf["elev"], t_avg), rtol=1e-12)
    assert np.allclose(out["es"], _np_svp(pdf["tmax_k"]), rtol=1e-12)


def test_relative_humidity(spark, phys_df):
    pdf = phys_df.toPandas()
    out = phys_df.select(
        relative_humidity("tmax_k", "tmin_k", "sph", "elev").alias("rh")
    ).toPandas()
    exp = _np_rh(pdf["tmax_k"], pdf["tmin_k"], pdf["sph"], pdf["elev"])
    assert np.allclose(out["rh"], exp, rtol=1e-12)
    assert (out["rh"] > 0).all()


def test_mean_humidity_intended_vs_bug_compat(spark):
    df = spark.createDataFrame([(40.0, 80.0)], ["rhmin", "rhmax"])
    good = df.select(mean_humidity("rhmin", "rhmax").alias("h")).collect()[0].h
    bug = df.select(mean_humidity("rhmin", "rhmax", bug_compat=True).alias("h")).collect()[0].h
    assert good == pytest.approx(60.0)  # (40+80)/2 — intended (etl.py:741-747 attrs)
    assert bug == pytest.approx(80.0)  # 40 + 80/2 — literal etl.py:740
