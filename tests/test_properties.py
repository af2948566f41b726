"""Property-based invariants (hypothesis) on randomly generated graphs —
complements the exact-fixture strategy (SURVEY §5) with algebraic laws that
must hold for EVERY input: rank conservation, method agreement, orientation
invariance."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from linkgraph import LinkGraph, connected_components, pagerank, triangle_count

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=30,
    unique=True,
)

PROP = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(edges=edge_lists)
@PROP
def test_pagerank_mass_conserved(spark, edges):
    df = spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges], ["src", "dst"])
    res = pagerank(LinkGraph(df), tol=0.0, max_iter=4)
    rows = res.ranks.collect()
    total = sum(r["pagerank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-9)  # dangling mass never leaks
    assert all(r["pagerank"] > 0 for r in rows)


@given(edges=edge_lists)
@PROP
def test_cc_methods_agree(spark, edges):
    df = spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges], ["src", "dst"])
    g = LinkGraph(df)
    # strategy pinned: this law compares the two DISTRIBUTED algorithms —
    # the auto gate would otherwise route both tiny inputs to the local plan
    a = {r["id"]: r["component"] for r in
         connected_components(g, method="two_star", with_sizes=False,
                              strategy="distributed").collect()}
    b = {r["id"]: r["component"] for r in
         connected_components(g, method="min_label", with_sizes=False,
                              strategy="distributed").collect()}
    # identical partitions — both label with the component-min id, so exact
    assert a == b


@given(edges=edge_lists)
@PROP
def test_cc_local_matches_distributed(spark, edges):
    df = spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges], ["src", "dst"])
    g = LinkGraph(df)
    loc = {r["id"]: r["component"] for r in
           connected_components(g, with_sizes=False, strategy="local").collect()}
    dist = {r["id"]: r["component"] for r in
            connected_components(g, with_sizes=False,
                                 strategy="distributed").collect()}
    assert loc == dist


@given(edges=edge_lists)
@PROP
def test_pagerank_local_matches_distributed(spark, edges):
    df = spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges], ["src", "dst"])
    g = LinkGraph(df)
    loc = {r["id"]: r["pagerank"] for r in
           pagerank(g, tol=0.0, max_iter=4, strategy="local").ranks.collect()}
    dist = {r["id"]: r["pagerank"] for r in
            pagerank(g, tol=0.0, max_iter=4, strategy="distributed").ranks.collect()}
    assert set(loc) == set(dist)
    assert all(abs(loc[k] - dist[k]) < 1e-12 for k in loc)


@given(edges=edge_lists, data=st.data())
@PROP
def test_triangle_count_orientation_invariant(spark, edges, data):
    flips = data.draw(st.lists(st.booleans(), min_size=len(edges), max_size=len(edges)))
    oriented = [(f"n{b}", f"n{a}") if f else (f"n{a}", f"n{b}")
                for (a, b), f in zip(edges, flips)]
    g1 = LinkGraph(spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges],
                                         ["src", "dst"]))
    g2 = LinkGraph(spark.createDataFrame(oriented, ["src", "dst"]))
    assert triangle_count(g1) == triangle_count(g2)
