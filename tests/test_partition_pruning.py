"""SCALE.md's central storage claim, proven on a real partitioned tree:
with the landing layout `var=<v>/time=<date>/`, the P7 var projection and
P3 time range reach the scan as PartitionFilters (directory pruning), the
scan's own metrics show only the matching partitions/files were read, and
ReadSchema drops the unprojected columns."""

import glob
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def grid_small(grid):
    # bound the tree: 2 vars x 6 days of the seeded grid fixture
    days = sorted(r[0] for r in grid.select("time").distinct().collect())[:6]
    return grid.where(
        F.col("var").isin("tmmx", "tmmn") & F.col("time").isin(days)
    )


def _scan_info(df):
    """(scan node string, metrics dict) of the first parquet scan in the
    EXECUTED plan — call after an action so metrics are populated."""
    plan = df._jdf.queryExecution().executedPlan()
    node_str = next(
        ln for ln in plan.toString().splitlines() if "FileScan parquet" in ln
    )

    def walk(n):
        yield n
        for i in range(n.children().size()):
            yield from walk(n.children().apply(i))

    for n in walk(plan):
        if "Scan" in n.nodeName():
            metrics = {}
            it = n.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                metrics[kv._1()] = kv._2().value()
            return node_str, metrics
    raise AssertionError("no scan node found")


def test_var_time_predicates_prune_partitions(spark, grid_small, tmp_path):
    out = str(tmp_path / "landing")
    grid_small.write.partitionBy("var", "time").parquet(out)
    table = spark.read.parquet(out)
    days = sorted(r[0] for r in table.select("time").distinct().collect())
    lo, hi = days[1], days[3]
    q = table.where(
        (F.col("var") == "tmmx") & F.col("time").between(lo, hi)
    ).select("i", "j", "value")
    expect = grid_small.where(
        (F.col("var") == "tmmx") & F.col("time").between(lo, hi)
    ).count()
    assert q.count() == expect
    q.collect()
    node, metrics = _scan_info(q)
    tail = node.split("PartitionFilters")[1][:220]
    assert "var" in tail and "time" in tail
    # directory pruning: only the 3 matching (var, day) partitions read,
    # out of the 12 the tree holds
    n_all = len(glob.glob(os.path.join(out, "var=*", "time=*", "*.parquet")))
    assert metrics["numPartitions"] == 3 < n_all
    assert metrics["numFiles"] < n_all
    # column pruning: lat/lon/ens never leave the files
    assert "ReadSchema: struct<i:int,j:int,value:double>" in node


def test_unfiltered_scan_reads_everything(spark, grid_small, tmp_path):
    out = str(tmp_path / "landing2")
    grid_small.write.partitionBy("var", "time").parquet(out)
    table = spark.read.parquet(out)
    table.collect()
    _, metrics = _scan_info(table)
    n_all = len(glob.glob(os.path.join(out, "var=*", "time=*", "*.parquet")))
    assert metrics["numFiles"] == n_all
