"""Streaming CDC materialization: foreachBatch upserts equal the batch
cdc_apply over the concatenated log; replays are no-ops; cross-batch
out-of-order seqs resolve last-writer-wins; deletes tombstone."""

from pyspark.sql import Row

from gridmet_etl_spark.operators.scd import cdc_apply
from gridmet_etl_spark.streaming.cdc_stream import apply_cdc_batch, read_current_state


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seq long, op string, v double"
    )


def test_cdc_batches_equal_batch_apply(spark, tmp_path):
    sd = str(tmp_path / "cdc")
    b0 = [(1, 1, "I", 10.0), (2, 1, "I", 20.0), (3, 1, "I", 30.0)]
    b1 = [(1, 2, "U", 11.0), (2, 2, "D", None), (4, 1, "I", 40.0)]
    b2 = [(1, 3, "U", 12.0), (3, 2, "D", None)]
    assert apply_cdc_batch(_log(spark, b0), 0, sd, ["k"], ["v"]) is True
    assert apply_cdc_batch(_log(spark, b1), 1, sd, ["k"], ["v"]) is True
    assert apply_cdc_batch(_log(spark, b2), 2, sd, ["k"], ["v"]) is True
    got = {r.k: r.v for r in read_current_state(spark, sd).collect()}
    # batch twin: empty snapshot + the whole log through cdc_apply
    snap = spark.createDataFrame([], "k long, v double")
    full = cdc_apply(snap, _log(spark, b0 + b1 + b2), ["k"], ["v"])
    expect = {r.k: r.v for r in full.collect()}
    assert got == expect == {1: 12.0, 4: 40.0}


def test_cdc_replay_is_noop(spark, tmp_path):
    sd = str(tmp_path / "cdc2")
    b0 = [(1, 1, "I", 10.0)]
    assert apply_cdc_batch(_log(spark, b0), 0, sd, ["k"], ["v"]) is True
    assert apply_cdc_batch(_log(spark, b0), 0, sd, ["k"], ["v"]) is False
    b1 = [(1, 2, "U", 99.0)]
    assert apply_cdc_batch(_log(spark, b1), 1, sd, ["k"], ["v"]) is True
    # replaying batch 1 changes nothing
    assert apply_cdc_batch(_log(spark, b1), 1, sd, ["k"], ["v"]) is False
    got = {r.k: r.v for r in read_current_state(spark, sd).collect()}
    assert got == {1: 99.0}


def test_cdc_out_of_order_seq_across_batches(spark, tmp_path):
    """A late batch carrying an OLDER seq must not overwrite newer state —
    the case naive per-batch apply gets wrong."""
    sd = str(tmp_path / "cdc3")
    assert apply_cdc_batch(_log(spark, [(1, 5, "U", 50.0)]), 0, sd, ["k"], ["v"])
    # late delivery of seq 3 (older change) in a LATER batch
    assert apply_cdc_batch(_log(spark, [(1, 3, "U", 30.0)]), 1, sd, ["k"], ["v"])
    got = {r.k: r.v for r in read_current_state(spark, sd).collect()}
    assert got == {1: 50.0}


def test_cdc_delete_tombstone_blocks_resurrection(spark, tmp_path):
    sd = str(tmp_path / "cdc4")
    assert apply_cdc_batch(_log(spark, [(1, 1, "I", 10.0)]), 0, sd, ["k"], ["v"])
    assert apply_cdc_batch(_log(spark, [(1, 4, "D", None)]), 1, sd, ["k"], ["v"])
    # late lower-seq update must NOT resurrect the deleted key
    assert apply_cdc_batch(_log(spark, [(1, 2, "U", 20.0)]), 2, sd, ["k"], ["v"])
    assert read_current_state(spark, sd).where("k = 1").count() == 0
    # but a genuinely NEWER insert does bring it back
    assert apply_cdc_batch(_log(spark, [(1, 6, "I", 60.0)]), 3, sd, ["k"], ["v"])
    got = {r.k: r.v for r in read_current_state(spark, sd).collect()}
    assert got == {1: 60.0}
