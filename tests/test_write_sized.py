"""Output-file sizing and compaction: file counts land near the target,
rows survive byte-identically, sort_cols cluster files for pruning."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.sources.writers import compact_dataset, write_sized


def _parts(path):
    return glob.glob(os.path.join(path, "part-*.parquet"))


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A 64-way fragmented dataset (~6 MB of payload in 64 tiny files)."""
    src = str(tmp_path / "frag")
    (
        spark.range(0, 200_000, 1, 64)
        .select(
            F.col("id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .write.parquet(src)
    )
    return src


def test_write_sized_merges_small_partitions(spark, fragmented, tmp_path):
    df = spark.read.parquet(fragmented)
    assert len(_parts(fragmented)) == 64
    out = str(tmp_path / "sized")
    write_sized(df, out, target_mb=8)
    files = _parts(out)
    # ~6 MB at an 8 MB advisory target -> a handful of files, not 64
    assert 1 <= len(files) <= 8
    got = spark.read.parquet(out)
    assert got.count() == 200_000
    assert got.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]


def test_write_sized_sort_cols_cluster_files(spark, fragmented, tmp_path):
    out = str(tmp_path / "sorted")
    write_sized(spark.read.parquet(fragmented), out, target_mb=2, sort_cols=("id",))
    files = _parts(out)
    assert len(files) >= 2
    # rebalance-on-key + sortWithinPartitions => per-file id ranges are
    # tight clusters (parquet min/max pruning works); ranges must not all
    # span the whole id domain
    spans = []
    for f in files:
        mn, mx = (
            spark.read.parquet(f).agg(F.min("id"), F.max("id")).first()
        )
        spans.append((mn, mx))
    whole = 200_000
    assert sum(mx - mn for mn, mx in spans) < len(spans) * whole * 0.8
    got = spark.read.parquet(out)
    assert got.count() == 200_000


def test_compact_dataset_in_place(spark, fragmented):
    n_before = len(_parts(fragmented))
    compact_dataset(spark, fragmented, target_mb=8)
    assert len(_parts(fragmented)) < n_before
    got = spark.read.parquet(fragmented)
    assert got.count() == 200_000
    assert not os.path.exists(fragmented + "._compacting")
    assert not os.path.exists(fragmented + "._old")
