"""split_disconnected_communities: the Leiden-paper defect repaired —
disconnected communities split into components, modularity never drops,
connected communities keep their partition."""

import pytest

from linkgraph import LinkGraph, modularity, split_disconnected_communities


def _partition(rows):
    from collections import defaultdict

    d = defaultdict(set)
    for i, lab in rows:
        d[lab].add(i)
    return sorted(frozenset(v) for v in d.values())


def test_split_repairs_disconnected_community(spark):
    # community "bad" = two triangles with NO edge between them (the
    # pathological Louvain output); community "ok" = a connected path
    pairs = (
        [("a", "b"), ("b", "c"), ("c", "a")]
        + [("x", "y"), ("y", "z"), ("z", "x")]
        + [("p", "q"), ("q", "r")]
        + [("c", "p")]  # inter-community edge so the graph is connected
    )
    g = LinkGraph(spark.createDataFrame(pairs, ["src", "dst"]), keys={"directed": False})
    labels = spark.createDataFrame(
        [(v, "bad") for v in "abcxyz"] + [(v, "ok") for v in "pqr"],
        ["id", "label"],
    )
    fixed = split_disconnected_communities(g, labels)
    got = _partition([(r["id"], r["label"]) for r in fixed.collect()])
    assert got == _partition(
        [(v, 1) for v in "abc"] + [(v, 2) for v in "xyz"] + [(v, 3) for v in "pqr"]
    )
    # modularity strictly increases when a disconnected community splits
    q_before = modularity(g, labels)
    q_after = modularity(g, fixed)
    assert q_after > q_before


def test_split_noop_on_connected_partition(spark):
    pairs = [("a", "b"), ("b", "c"), ("x", "y")]
    g = LinkGraph(spark.createDataFrame(pairs, ["src", "dst"]), keys={"directed": False})
    labels = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("x", 2), ("y", 2)], ["id", "label"]
    )
    fixed = split_disconnected_communities(g, labels)
    assert _partition([(r["id"], r["label"]) for r in fixed.collect()]) == _partition(
        [("a", 1), ("b", 1), ("c", 1), ("x", 2), ("y", 2)]
    )
    assert modularity(g, fixed) == pytest.approx(modularity(g, labels), abs=1e-12)


def test_split_isolated_member_becomes_singleton(spark):
    # "s" labeled with {a,b} but has no edge to either -> singleton
    pairs = [("a", "b"), ("s", "t")]
    g = LinkGraph(spark.createDataFrame(pairs, ["src", "dst"]), keys={"directed": False})
    labels = spark.createDataFrame(
        [("a", 9), ("b", 9), ("s", 9), ("t", 7)], ["id", "label"]
    )
    fixed = {r["id"]: r["label"] for r in split_disconnected_communities(g, labels).collect()}
    assert fixed["a"] == fixed["b"] != fixed["s"]
    assert fixed["s"] == "s" and fixed["t"] == "t"


# ------------------------------------------------- attribute assortativity


def test_attribute_assortativity_networkx_parity(spark):
    import math

    import networkx as nx

    from linkgraph import attribute_assortativity

    pairs = (
        [("a", "b"), ("b", "c"), ("c", "a")]          # red triangle
        + [("x", "y"), ("y", "z")]                     # blue path
        + [("a", "x"), ("c", "z")]                     # cross edges
    )
    attr = {"a": "red", "b": "red", "c": "red", "x": "blue", "y": "blue", "z": "blue"}
    g = LinkGraph(spark.createDataFrame(pairs, ["src", "dst"]), keys={"directed": False})
    adf = spark.createDataFrame(list(attr.items()), ["id", "attr"])
    got = attribute_assortativity(g, adf)
    G = nx.Graph(pairs)
    nx.set_node_attributes(G, attr, "color")
    exp = nx.attribute_assortativity_coefficient(G, "color")
    assert got == pytest.approx(exp, abs=1e-12)

    # directed
    gd = LinkGraph(spark.createDataFrame(pairs, ["src", "dst"]))
    Gd = nx.DiGraph(pairs)
    nx.set_node_attributes(Gd, attr, "color")
    assert attribute_assortativity(gd, adf) == pytest.approx(
        nx.attribute_assortativity_coefficient(Gd, "color"), abs=1e-12
    )

    # perfectly assortative / degenerate single-category
    g1 = LinkGraph(
        spark.createDataFrame([("a", "b"), ("x", "y")], ["src", "dst"]),
        keys={"directed": False},
    )
    a_same = spark.createDataFrame(
        [("a", "r"), ("b", "r"), ("x", "u"), ("y", "u")], ["id", "attr"]
    )
    assert attribute_assortativity(g1, a_same) == pytest.approx(1.0, abs=1e-12)
    a_one = spark.createDataFrame(
        [("a", "r"), ("b", "r"), ("x", "r"), ("y", "r")], ["id", "attr"]
    )
    assert math.isnan(attribute_assortativity(g1, a_one))


def test_numeric_assortativity_networkx_parity(spark):
    import math

    import networkx as nx

    from linkgraph import numeric_assortativity

    pairs = (
        [("a", "b"), ("b", "c"), ("c", "a")]
        + [("x", "y"), ("y", "z")]
        + [("a", "x"), ("c", "z")]
    )
    vals = {"a": 3, "b": 3, "c": 5, "x": 8, "y": 8, "z": 13}
    g = LinkGraph(spark.createDataFrame(pairs, ["src", "dst"]), keys={"directed": False})
    adf = spark.createDataFrame(list(vals.items()), ["id", "attr"])
    G = nx.Graph(pairs)
    nx.set_node_attributes(G, vals, "v")
    assert numeric_assortativity(g, adf) == pytest.approx(
        nx.numeric_assortativity_coefficient(G, "v"), abs=1e-9
    )

    # directed
    gd = LinkGraph(spark.createDataFrame(pairs, ["src", "dst"]))
    Gd = nx.DiGraph(pairs)
    nx.set_node_attributes(Gd, vals, "v")
    assert numeric_assortativity(gd, adf) == pytest.approx(
        nx.numeric_assortativity_coefficient(Gd, "v"), abs=1e-9
    )

    # zero variance -> NaN
    a_const = spark.createDataFrame([(n, 7) for n in "abcxyz"], ["id", "attr"])
    assert math.isnan(numeric_assortativity(g, a_const))
