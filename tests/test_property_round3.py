"""Hypothesis properties for the round-3 operators: funnel monotonicity,
jaccard_join ≡ brute force, triangle counts vs an itertools model."""

from datetime import datetime, timedelta
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 5),          # user
            st.sampled_from("abc"),     # type
            st.integers(0, 500),        # minute offset
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_counts_monotone_nonincreasing(spark, events):
    from gridmet_etl_spark.operators.funnel import funnel_conversion

    base = datetime(2024, 1, 1)
    rows = [
        (i, u, t, base + timedelta(minutes=m), 1.0)
        for i, (u, t, m) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    out = {r["step"]: r["n_users"] for r in funnel_conversion(df, ["a", "b", "c"]).collect()}
    assert out[1] >= out[2] >= out[3]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
        min_size=2,
        max_size=8,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_jaccard_join_equals_brute_force(spark, docs, threshold):
    from gridmet_etl_spark.operators.simjoin import jaccard_join

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], "doc_id long, text string"
    )
    got = {(r["a"], r["b"]): r["jaccard"] for r in jaccard_join(df, threshold).collect()}
    sets = {i: set(toks) for i, toks in enumerate(docs)}
    expect = {}
    for a, b in combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= threshold:
            expect[(a, b)] = round(j, 6)
    assert got == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=20
    )
)
def test_triangle_count_matches_model(spark, edges):
    from gridmet_etl_spark.operators.graph import triangle_count

    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges], "src string, dst string"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    und = {frozenset((a, b)) for a, b in edges if a != b}
    nodes = sorted({x for e in und for x in e})
    expect: dict[str, int] = {}
    for tri in combinations(nodes, 3):
        a, b, c = tri
        if all(frozenset(p) in und for p in ((a, b), (b, c), (a, c))):
            for v in tri:
                expect[f"n{v}"] = expect.get(f"n{v}", 0) + 1
    assert got == expect
