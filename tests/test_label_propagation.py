"""LPA: splits a weakly-bridged graph where CC floods it; deterministic
across repeated runs."""

from pyspark.sql import functions as F

from gridmet_etl_spark.operators.cluster import connected_components
from gridmet_etl_spark.operators.graph import label_propagation

# two 4-cliques {0..3} and {10..13} joined by one bridge 3-10
CLIQUE_A = [(a, b) for a in range(4) for b in range(4) if a < b]
CLIQUE_B = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
BARBELL = CLIQUE_A + CLIQUE_B + [(3, 10)]


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_lpa_splits_barbell_cc_floods_it(spark):
    edges = _edges(spark, BARBELL)
    comms = {r.node: r.community for r in label_propagation(edges, n_rounds=3).collect()}
    assert len({comms[n] for n in range(4)}) == 1
    assert len({comms[n] for n in range(10, 14)}) == 1
    assert comms[0] != comms[11]  # two communities survive the bridge
    cc = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert len(set(cc.values())) == 1  # CC floods everything to min id


def test_lpa_deterministic(spark):
    edges = _edges(spark, BARBELL)
    a = sorted(tuple(r) for r in label_propagation(edges, n_rounds=3).collect())
    b = sorted(tuple(r) for r in label_propagation(edges, n_rounds=3).collect())
    assert a == b
