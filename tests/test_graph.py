"""Core LinkGraph API — parity with reference Graph semantics
(unit_tests/test_core_graph.py known answers, FIXTURES.md F2)."""

import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph
from tests.fixtures import PERSON_EDGES, PERSON_NODES


@pytest.fixture(scope="module")
def person_graph(spark):
    e = spark.createDataFrame(PERSON_EDGES, ["Person_A", "Person_B", "Duration"])
    n = spark.createDataFrame([(x,) for x in PERSON_NODES], ["Name"])
    return LinkGraph(
        e,
        nodes=n,
        keys={"src": "Person_A", "dst": "Person_B", "weight": "Duration", "id": "Name"},
    )


def test_counts(person_graph):
    assert person_graph.number_of_nodes() == 7
    assert person_graph.number_of_edges() == 10
    assert person_graph.is_directed
    assert person_graph.is_weighted


def test_degrees(person_graph):
    deg = {r["id"]: r["degree"] for r in person_graph.degree().collect()}
    ind = {r["id"]: r["in_degree"] for r in person_graph.in_degree().collect()}
    out = {r["id"]: r["out_degree"] for r in person_graph.out_degree().collect()}
    # Known answers from reference unit_tests/test_core_graph.py:116-158
    assert deg["Alice"] == 3
    assert ind["Alice"] == 0
    assert out["Alice"] == 3
    assert sum(deg.values()) == 2 * person_graph.number_of_edges()


def test_node_inference(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    g = LinkGraph(e)
    assert g.number_of_nodes() == 3
    assert not g.is_weighted
    assert g.weighted_degree().filter(F.col("id") == "b").collect()[0][1] == 2.0


def test_undirected_doubling(spark):
    e = spark.createDataFrame(PERSON_EDGES, ["src", "dst", "weight"])
    g = LinkGraph(e, keys={"directed": False})
    # graph.py:542-548: union with reversed, dedup → 20 edges
    assert g.number_of_edges() == 20
    assert not g.is_directed


def test_bad_columns_raise(spark):
    e = spark.createDataFrame([("a", "b")], ["x", "y"])
    with pytest.raises(ValueError):
        LinkGraph(e)


def test_grouped_adjacency(spark):
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 2.0), ("b", "c", 1.0)], ["src", "dst", "weight"]
    )
    g = LinkGraph(e)
    adj = {r["src"]: r for r in g.grouped_adjacency().collect()}
    assert adj["a"]["deg"] == 2
    assert [x["dst"] for x in adj["a"]["adj"]] == ["b", "c"]


def test_grouped_adjacency_hub_split(spark):
    """Above hub_threshold a source is salted into bounded (src, _salt)
    groups whose arrays union to the full edge list; non-hubs stay single
    rows with _salt 0."""
    rows = [("h", f"d{i}", 1.0) for i in range(200)] + [("a", "b", 1.0)]
    g = LinkGraph(spark.createDataFrame(rows, ["src", "dst", "weight"]))
    out = g.grouped_adjacency(hub_threshold=50, hub_buckets=8).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    assert len(by_src["a"]) == 1 and by_src["a"][0]["_salt"] == 0
    hub_rows = by_src["h"]
    assert 1 < len(hub_rows) <= 8
    assert all(r["deg"] < 200 for r in hub_rows)
    dsts = sorted(x["dst"] for r in hub_rows for x in r["adj"])
    assert dsts == sorted(f"d{i}" for i in range(200))
    assert sum(r["deg"] for r in hub_rows) == 200


def test_ego_subgraph(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], ["src", "dst"]
    )
    g = LinkGraph(e)
    nodes, edges = g.ego_subgraph("a", depth=1)
    ids = {r["id"] for r in nodes.collect()}
    assert ids == {"a", "b"}
    nodes2, edges2 = g.ego_subgraph("a", depth=2)
    assert {r["id"] for r in nodes2.collect()} == {"a", "b", "c"}
    assert edges2.count() == 2


def test_encode_ids(spark):
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 1.0)], ["src", "dst", "weight"]
    )
    from linkgraph import pagerank

    g = LinkGraph(e)
    enc, mapping = g.encode_ids(check_collisions=True)
    assert enc.number_of_nodes() == 3 and enc.number_of_edges() == 3
    assert dict(enc.edges.dtypes)["src"] == "bigint"
    # pagerank on encoded graph, decoded through the mapping, matches raw run
    raw = {r["id"]: r["pagerank"] for r in pagerank(g, tol=0.0, max_iter=8).ranks.collect()}
    enc_res = pagerank(enc, tol=0.0, max_iter=8).ranks
    dec = {
        r["id"]: r["pagerank"]
        for r in enc_res.join(
            mapping, enc_res["id"] == mapping["code"]
        ).select(mapping["id"], "pagerank").collect()
    }
    assert all(abs(raw[k] - dec[k]) < 1e-12 for k in raw)


def test_from_pandas(spark):
    """Reference test_core_graph.py:13-27 analogue: pandas construction."""
    import pandas as pd

    e = pd.DataFrame({"a": ["x", "y"], "b": ["y", "z"], "w": [1.0, 2.0]})
    n = pd.DataFrame({"node": ["x", "y", "z"], "kind": ["p", "p", "q"]})
    g = LinkGraph.from_pandas(
        e, n, keys={"src": "a", "dst": "b", "weight": "w", "id": "node"}
    )
    assert g.number_of_nodes() == 3 and g.number_of_edges() == 2
    assert g.is_weighted
    got = {(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()}
    assert got == {("x", "y", 1.0), ("y", "z", 2.0)}
    assert "kind" in g.nodes.columns


def test_from_networkx(spark):
    import networkx as nx

    nxg = nx.Graph()
    nxg.add_edge("a", "b", weight=3.0)
    nxg.add_edge("b", "c", weight=1.0)
    g = LinkGraph.from_networkx(nxg)
    assert not g.is_directed
    assert g.number_of_nodes() == 3
    # undirected: both orientations materialized
    assert g.number_of_edges() == 4
    wd = {r["id"]: r["weighted_degree"] for r in g.weighted_degree().collect()}
    assert wd["b"] == pytest.approx(8.0)  # (3+1) doubled orientation


def test_moebius_json_payload(spark):
    """Moebius viz JSON shape (reference moebius.py:226-310): nodes carry
    id/count/_int_id, links carry source/target/_int_id."""
    import json

    from linkgraph.viz import moebius_json

    edges = [("c", x) for x in ["a", "b", "d"]] + [("a", "b")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]), keys={"directed": False})
    payload = json.loads(moebius_json(g, "c", depth=1))
    ids = {n["id"] for n in payload["nodes"]}
    assert ids == {"c", "a", "b", "d"}
    counts = {n["id"]: n["count"] for n in payload["nodes"]}
    assert counts["c"] == 6  # degree in the doubled undirected graph
    int_ids = [n["_int_id"] for n in payload["nodes"]]
    assert len(set(int_ids)) == len(int_ids)
    link_ids = [l["_int_id"] for l in payload["links"]]
    assert len(set(link_ids)) == len(link_ids)
    assert all({"source", "target", "_int_id"} <= set(l) for l in payload["links"])


def test_reference_api_conveniences(spark):
    """Name-parity accessors for the reference's Graph properties
    (graph.py:286-347,349-365,410-459) returning DataFrames."""
    g = LinkGraph(spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]))
    assert g.edges_colnames == ["src", "dst"]
    assert g.nodes_colnames == ["id"]
    assert len(g.nodes_as_pandas()) == 3
    assert g.edges_as_dataframe().count() == 3
    pr = {r["id"]: r["pagerank"] for r in g.pagerank(tol=1e-7).collect()}
    assert sum(pr.values()) == pytest.approx(1.0)
    cc = g.connected_components()
    assert cc.select("component").distinct().count() == 1
    cl = {r["id"]: r["closeness"] for r in g.closeness_centrality().collect()}
    assert all(v > 0 for v in cl.values())  # 3-cycle: every node reaches all
    bc = g.betweenness_centrality()
    assert bc.count() == 3


def test_from_networkx_edge_cases(spark):
    import networkx as nx

    # edge-less graph with nodes
    g0 = nx.Graph()
    g0.add_nodes_from(["a", "b"])
    lg0 = LinkGraph.from_networkx(g0)
    assert lg0.number_of_nodes() == 2 and lg0.number_of_edges() == 0

    # attribute present on only one edge -> NULL on the other, not a crash
    g1 = nx.DiGraph()
    g1.add_edge("a", "b", kind="strong")
    g1.add_edge("b", "c")
    lg1 = LinkGraph.from_networkx(g1)
    kinds = {(r["src"], r["dst"]): r["kind"] for r in lg1.edges.collect()}
    assert kinds[("a", "b")] == "strong" and kinds[("b", "c")] is None


def test_iterators_and_repr(person_graph):
    nodes = list(person_graph.iter_nodes())
    assert len(nodes) == 7 and all("id" in d for d in nodes)
    edges = list(person_graph.iter_edges())
    assert len(edges) == 10 and all("src" in d and "dst" in d for d in edges)
    s = str(person_graph)
    assert "7 nodes" in s and "10 edges" in s and "is_directed: True" in s
    assert "LinkGraph(directed=True" in repr(person_graph)


def test_to_networkx_roundtrip(spark):
    import networkx as nx

    e = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 1.0)], ["src", "dst", "weight"]
    )
    g = LinkGraph(e)
    nxg = LinkGraph(e).to_networkx()
    assert isinstance(nxg, nx.DiGraph)
    assert sorted(nxg.nodes) == ["a", "b", "c"]
    assert nxg["a"]["b"]["weight"] == 2.0
    # round-trip through from_networkx preserves structure
    g2 = LinkGraph.from_networkx(nxg, spark=spark)
    assert g2.number_of_nodes() == 3 and g2.number_of_edges() == 2
    with pytest.raises(ValueError):
        g.to_networkx(max_nodes=2)
