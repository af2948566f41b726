"""Motif finder — closed-form fixtures on a hand-built digraph.

Graph:  1→2, 2→3, 3→1 (directed triangle), 2→4 (tail), 4→5, 5→4 (2-cycle).
"""

import pytest

from linkgraph import LinkGraph, find_pattern

EDGES = [(1, 2), (2, 3), (3, 1), (2, 4), (4, 5), (5, 4)]


def _g(spark):
    return LinkGraph(spark.createDataFrame(EDGES, ["src", "dst"]))


def test_chain_and_unification(spark):
    g = _g(spark)
    rows = {
        (r["a"], r["b"], r["c"])
        for r in find_pattern(g, "(a)-[]->(b); (b)-[]->(c)").collect()
    }
    # every directed 2-path, including around the triangle and 4↔5 cycle
    assert (1, 2, 3) in rows and (2, 3, 1) in rows and (2, 4, 5) in rows
    assert (4, 5, 4) in rows  # a=c is allowed (no implicit distinctness)
    assert (1, 2, 4) in rows
    assert all(len(t) == 3 for t in rows)


def test_directed_triangle(spark):
    g = _g(spark)
    tri = {
        (r["a"], r["b"], r["c"])
        for r in find_pattern(g, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)").collect()
    }
    # the 1→2→3→1 triangle in its 3 rotations; 4↔5 is only a 2-cycle
    assert tri == {(1, 2, 3), (2, 3, 1), (3, 1, 2)}


def test_negation(spark):
    g = _g(spark)
    open_walks = {
        (r["a"], r["b"], r["c"])
        for r in find_pattern(
            g, "(a)-[]->(b); (b)-[]->(c); !(c)-[]->(a)"
        ).collect()
    }
    assert (1, 2, 3) not in open_walks  # triangle closes
    assert (1, 2, 4) in open_walks      # tail does not
    # the 4→5→4 walk binds c=a=4; the negated edge is the absent self-loop
    # 4→4, so the row is kept
    assert (4, 5, 4) in open_walks


def test_edge_vars_and_anonymous(spark):
    g = _g(spark)
    out = find_pattern(g, "(a)-[e]->(b)").collect()
    assert len(out) == len(EDGES)
    r = next(x for x in out if x["a"] == 1)
    assert r["e"]["src"] == 1 and r["e"]["dst"] == 2
    # anonymous source: one row per in-edge of each b
    out2 = find_pattern(g, "()-[]->(b)").groupBy("b").count().collect()
    indeg = {r["b"]: r["count"] for r in out2}
    assert indeg[4] == 2  # from 2 and from 5


def test_pattern_validation(spark):
    g = _g(spark)
    for bad in [
        "",
        "(a)->(b)",
        "!(a)-[]->(b)",                      # all-negative
        "(a)-[]->(b); !(a)-[x]->(b)",        # named negated edge
        "(a)-[]->(b); !(a)-[]->(z)",         # negation introduces var
        "(a)-[e]->(b); (b)-[e]->(a)",        # edge var bound twice
        "(a)-[]->(a)",                       # self-loop term
    ]:
        with pytest.raises(ValueError):
            find_pattern(g, bad).collect()


def test_negated_self_loop_and_var_collisions(spark):
    from pyspark.sql import functions as F

    # graph with one self-loop: 1→1, plus 1→2, 2→3
    g = LinkGraph(
        spark.createDataFrame([(1, 1), (1, 2), (2, 3)], ["src", "dst"])
    )
    rows = {
        (r["a"], r["b"])
        for r in find_pattern(g, "(a)-[]->(b); !(a)-[]->(a)").collect()
    }
    # edges FROM 1 are dropped (1 has a self-loop; the 1→1 row also binds
    # a=1), edges from 2 survive
    assert rows == {(2, 3)}
    # edge var colliding with a vertex var in the same term
    with pytest.raises(ValueError):
        find_pattern(g, "(x)-[x]->(b)").collect()
    # later vertex var colliding with an earlier edge var
    with pytest.raises(ValueError):
        find_pattern(g, "(a)-[x]->(b); (b)-[]->(x)").collect()
    # negated endpoint that is an edge var
    with pytest.raises(ValueError):
        find_pattern(g, "(a)-[x]->(b); !(x)-[]->(b)").collect()
