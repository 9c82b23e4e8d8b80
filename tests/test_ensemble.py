"""A3 ensemble median + E2 concat vs numpy goldens and permutation property."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.ensemble import concat_members, ensemble_median, ensemble_stats


@pytest.fixture(scope="module")
def ens_pd(fixdir):
    return pd.read_parquet(os.path.join(fixdir, "grid_ens.parquet"))


def test_median_matches_numpy(spark, grid_ens, ens_pd):
    sub = ens_pd[(ens_pd["var"] == "tmmx") & (ens_pd["i"] == 3) & (ens_pd["j"] == 4)]
    golden = sub.groupby("time")["value"].median()
    res = (
        ensemble_median(grid_ens.filter((F.col("var") == "tmmx") & (F.col("i") == 3) & (F.col("j") == 4)))
        .toPandas()
        .set_index("time")["value"]
    )
    assert len(res) == len(golden)
    for t, ev in golden.items():
        assert res.loc[t] == pytest.approx(ev, rel=1e-12)


def test_median_permutation_invariant(spark, grid_ens):
    """Property (§5): median unchanged under member relabeling."""
    sub = grid_ens.filter(F.col("var") == "pr").filter(F.col("i") < 3)
    permuted = sub.withColumn("ens", (F.col("ens") * 7 + 3) % 48)
    a = ensemble_median(sub).withColumnRenamed("value", "a")
    b = ensemble_median(permuted).withColumnRenamed("value", "b")
    joined = a.join(b, ["var", "time", "i", "j"])
    assert joined.filter(F.abs(F.col("a") - F.col("b")) > 1e-12).count() == 0


def test_ensemble_stats_consistency(spark, grid_ens):
    st = ensemble_stats(grid_ens.filter((F.col("var") == "sph") & (F.col("i") == 0))).toPandas()
    assert (st["n_members"] == 48).all()
    assert (st["ens_min"] <= st["ens_median"]).all()
    assert (st["ens_median"] <= st["ens_max"]).all()


def test_concat_members_tags(spark, grid):
    base = grid.filter((F.col("var") == "pr") & (F.col("time") == F.lit("1980-01-01"))).drop("ens")
    out = concat_members([base, base, base])
    assert out.count() == 3 * base.count()
    assert sorted(r.ens for r in out.select("ens").distinct().collect()) == [0, 1, 2]
