"""Public partition metrics: modularity and cut/conductance vs networkx
and closed forms."""

import pytest

from linkgraph import LinkGraph, cut_metrics, modularity


def _g(spark, edges, weighted=False):
    cols = ["src", "dst", "weight"] if weighted else ["src", "dst"]
    return LinkGraph(spark.createDataFrame(edges, cols), keys={"directed": False})


def _labels(spark, mapping):
    return spark.createDataFrame(list(mapping.items()), ["id", "label"])


def test_modularity_vs_networkx(spark):
    import networkx as nx

    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),       # triangle
        ("d", "e"), ("e", "f"), ("d", "f"),       # triangle
        ("c", "d"),                                # bridge
    ]
    part = {"a": 0, "b": 0, "c": 0, "d": 1, "e": 1, "f": 1}
    got = modularity(_g(spark, edges), _labels(spark, part))
    G = nx.Graph(edges)
    want = nx.community.modularity(G, [{"a", "b", "c"}, {"d", "e", "f"}])
    assert got == pytest.approx(want, abs=1e-12)


def test_modularity_weighted_and_resolution(spark):
    import networkx as nx

    edges = [("a", "b", 2.0), ("b", "c", 1.0), ("c", "d", 3.0)]
    part = {"a": 0, "b": 0, "c": 1, "d": 1}
    got = modularity(_g(spark, edges, weighted=True), _labels(spark, part))
    G = nx.Graph()
    G.add_weighted_edges_from(edges)
    want = nx.community.modularity(G, [{"a", "b"}, {"c", "d"}], weight="weight")
    assert got == pytest.approx(want, abs=1e-12)
    # resolution shifts the degree penalty exactly linearly
    g2 = modularity(
        _g(spark, edges, weighted=True), _labels(spark, part), resolution=2.0
    )
    q0 = modularity(
        _g(spark, edges, weighted=True), _labels(spark, part), resolution=0.0
    )
    assert g2 == pytest.approx(q0 + 2 * (got - q0), abs=1e-12)


def test_cut_metrics_closed_form(spark):
    # path a-b-c-d, split {a,b} | {c,d}: one crossing edge (b,c)
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    part = {"a": 0, "b": 0, "c": 1, "d": 1}
    rows = {
        r["label"]: r
        for r in cut_metrics(_g(spark, edges), _labels(spark, part)).collect()
    }
    # vol(0) = deg a + deg b = 1 + 2 = 3; vol(1) = 2 + 1 = 3; 2m = 6
    assert rows[0]["volume"] == 3.0 and rows[1]["volume"] == 3.0
    assert rows[0]["cut_weight"] == 1.0 and rows[1]["cut_weight"] == 1.0
    assert rows[0]["conductance"] == pytest.approx(1 / 3)
    assert rows[1]["conductance"] == pytest.approx(1 / 3)


def test_cut_metrics_whole_graph_is_null(spark):
    # a single community holding everything: min(vol, 2m - vol) = 0 ->
    # conductance undefined (null), cut 0
    edges = [("a", "b"), ("b", "c")]
    part = {"a": 7, "b": 7, "c": 7}
    [r] = cut_metrics(_g(spark, edges), _labels(spark, part)).collect()
    assert r["cut_weight"] == 0.0 and r["conductance"] is None


def test_modularity_no_edges_raises(spark):
    g = LinkGraph(
        spark.createDataFrame([], "src string, dst string"),
        keys={"directed": False},
    )
    with pytest.raises(ValueError):
        modularity(g, _labels(spark, {"a": 0}))


def test_cut_metrics_isolated_community_row(spark):
    # review regression: a community whose nodes have no edges must still
    # emit a row (volume 0, cut 0, conductance null), not vanish
    from linkgraph import LinkGraph
    from pyspark.sql import functions as F

    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    nodes = spark.createDataFrame([("a",), ("b",), ("z",)], ["id"])
    g = LinkGraph(edges, nodes=nodes, keys={"directed": False})
    part = _labels(spark, {"a": 0, "b": 0, "z": 9})
    rows = {r["label"]: r for r in cut_metrics(g, part).collect()}
    assert 9 in rows
    assert rows[9]["volume"] == 0.0
    assert rows[9]["cut_weight"] == 0.0
    assert rows[9]["conductance"] is None


def test_quotient_graph_contraction(spark):
    from linkgraph import LinkGraph, quotient_graph
    from pyspark.sql import functions as F

    # two triangles bridged by one weight-5 edge; parity-free labels
    edges = spark.createDataFrame(
        [
            ("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0),
            ("d", "e", 2.0), ("e", "f", 2.0), ("d", "f", 2.0),
            ("c", "d", 5.0),
        ],
        ["src", "dst", "weight"],
    )
    part = _labels(spark, {"a": 0, "b": 0, "c": 0, "d": 1, "e": 1, "f": 1})
    g = LinkGraph(edges, keys={"directed": False})
    q = {(r["src"], r["dst"]): r["weight"] for r in quotient_graph(g, part).collect()}
    assert q == {(0, 0): 3.0, (1, 1): 6.0, (0, 1): 5.0}
    q2 = {
        (r["src"], r["dst"]): r["weight"]
        for r in quotient_graph(g, part, keep_self_loops=False).collect()
    }
    assert q2 == {(0, 1): 5.0}
    # unlabeled endpoints drop their edges
    partial = _labels(spark, {"a": 0, "b": 0})
    q3 = {(r["src"], r["dst"]): r["weight"] for r in quotient_graph(g, partial).collect()}
    assert q3 == {(0, 0): 1.0}


def test_cut_metrics_ignores_phantom_label_ids(spark):
    # review regression: label ids absent from the graph must not
    # fabricate zero-volume communities
    from linkgraph import LinkGraph

    g = LinkGraph(
        spark.createDataFrame([("a", "b")], ["src", "dst"]),
        keys={"directed": False},
    )
    part = _labels(spark, {"a": 0, "b": 0, "ghost": 42})
    rows = {r["label"] for r in cut_metrics(g, part).collect()}
    assert rows == {0}
