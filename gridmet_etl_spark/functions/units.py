"""Unit conversions (SURVEY §2.8 F1) — the engine's replacement for the
reference's pint quantify/to/dequantify round-trip (etl.py:461-464, 737-739).

Spark has no unit system; conversions are explicit Column expressions
(Catalyst-foldable, codegen'd) and the units registry in schemas.py carries
provenance. Only affine conversions exist in the reference surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KELVIN_OFFSET = 273.15

# (from_unit, to_unit) -> (scale, offset): out = in * scale + offset
_AFFINE = {
    ("K", "degC"): (1.0, -KELVIN_OFFSET),
    ("degC", "K"): (1.0, KELVIN_OFFSET),
    ("K", "degF"): (1.8, -459.67),
    ("mm", "in"): (1.0 / 25.4, 0.0),
    ("in", "mm"): (25.4, 0.0),
    ("m/s", "mph"): (2.2369362920544, 0.0),
}


def convert(col: Column | str, from_unit: str, to_unit: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if from_unit == to_unit:
        return c
    try:
        scale, offset = _AFFINE[(from_unit, to_unit)]
    except KeyError:
        raise ValueError(f"no conversion {from_unit} -> {to_unit}") from None
    return c * F.lit(scale) + F.lit(offset)


def kelvin_to_celsius(col: Column | str) -> Column:
    return convert(col, "K", "degC")


def convert_columns(df: DataFrame, conversions: dict[str, tuple[str, str]]) -> DataFrame:
    """Apply {column: (from, to)} conversions in one select (single projection,
    stays inside whole-stage codegen)."""
    exprs = []
    for name in df.columns:
        if name in conversions:
            f, t = conversions[name]
            exprs.append(convert(name, f, t).alias(name))
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)
