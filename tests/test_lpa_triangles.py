"""LPA structural tests + triangle counts vs networkx oracle."""

import networkx as nx
import pytest

from linkgraph import (
    LinkGraph,
    label_propagation,
    triangle_count,
    triangle_counts_per_vertex,
)
from tests.fixtures import karate_edges, random_digraph


def test_lpa_disconnected_cliques(spark):
    def clique(prefix, k):
        names = [f"{prefix}{i}" for i in range(k)]
        return [(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]

    edges = clique("a", 4) + clique("b", 5) + clique("c", 3)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    labels = {r["id"]: r["label"] for r in label_propagation(g).collect()}
    # each clique converges to one label; cliques don't merge
    groups = {}
    for node, lab in labels.items():
        groups.setdefault(lab, set()).add(node[0])
    assert all(len(members) == 1 for members in groups.values())
    assert len({lab for n, lab in labels.items() if n.startswith("a")}) == 1
    assert len({lab for n, lab in labels.items() if n.startswith("b")}) == 1


def test_lpa_deterministic(spark):
    edges = random_digraph(50, 0.1, seed=5)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    a = sorted(label_propagation(g, max_iter=10).collect())
    b = sorted(label_propagation(g, max_iter=10).collect())
    assert a == b


def _nx_graph(edges):
    g = nx.Graph()
    g.add_edges_from([(e[0], e[1]) for e in edges])
    return g


def test_triangles_karate(spark):
    edges = karate_edges()
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    ref = nx.triangles(_nx_graph(edges))
    assert triangle_count(g) == sum(ref.values()) // 3
    got = {r["id"]: r["triangles"] for r in triangle_counts_per_vertex(g).collect()}
    assert got == ref


@pytest.mark.parametrize("seed", [1, 4])
def test_triangles_random(spark, seed):
    edges = random_digraph(80, 0.08, seed=seed)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    ref = nx.triangles(_nx_graph(edges))
    got = {r["id"]: r["triangles"] for r in triangle_counts_per_vertex(g).collect()}
    # zero-filled over all nodes present in edges
    for k, v in ref.items():
        assert got[k] == v
    assert triangle_count(g) == sum(ref.values()) // 3


def test_triangle_none(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert triangle_count(g) == 0


def test_lpa_checkpoint_resume_equivalence(spark, tmp_ckpt):
    """LPA interrupted mid-superstep-loop and resumed must produce bit-exact
    labels vs an uninterrupted run (BASELINE.json:14 resumability — third
    resumable loop after pagerank and two-star CC). Synchronous LPA is
    deterministic, so the label table is the entire superstep state."""
    from linkgraph.checkpoint import CheckpointManager

    edges = random_digraph(60, 0.06, seed=21)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))

    full = label_propagation(g, max_iter=12)
    mgr = CheckpointManager(tmp_ckpt, spark)
    # interrupt after 2 supersteps (max_iter=2 simulates a killed run)
    label_propagation(g, max_iter=2, checkpoint=mgr, checkpoint_interval=2)
    assert mgr.latest_step() == 2
    man = mgr.manifest(2)
    assert [h["step"] for h in man["metrics"]["history"]] == [1, 2]
    assert man["tables"]["labels"]["partition_rows"]  # per-partition lineage

    resumed = label_propagation(g, max_iter=10, checkpoint=mgr, resume=True)
    a = {r["id"]: r["label"] for r in full.collect()}
    b = {r["id"]: r["label"] for r in resumed.collect()}
    assert a == b
    # resume from a converged snapshot iterates zero supersteps
    last = mgr.latest_step()
    assert mgr.manifest(last)["metrics"]["converged"]
    again = label_propagation(g, checkpoint=mgr, resume=True)
    assert {r["id"]: r["label"] for r in again.collect()} == a


def test_clustering_karate(spark):
    from linkgraph import average_clustering, local_clustering_coefficient

    edges = karate_edges()
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    ref = nx.clustering(_nx_graph(edges))
    got = {r["id"]: r["lcc"] for r in local_clustering_coefficient(g).collect()}
    for k, v in ref.items():
        assert got[k] == pytest.approx(v, abs=1e-12), k
    assert average_clustering(g) == pytest.approx(
        nx.average_clustering(_nx_graph(edges)), abs=1e-12
    )


def test_clustering_random_with_self_loops(spark):
    from linkgraph import local_clustering_coefficient

    edges = random_digraph(60, 0.09, seed=9)
    # self-loops must be ignored (networkx clustering drops them too)
    looped = edges + [(s, s, 1.0) for s, _, _ in edges[:5]]
    g = LinkGraph(spark.createDataFrame(looped, ["src", "dst", "weight"]))
    nxg = _nx_graph(edges)
    ref = nx.clustering(nxg)
    got = {r["id"]: r["lcc"] for r in local_clustering_coefficient(g).collect()}
    for k, v in ref.items():
        assert got[k] == pytest.approx(v, abs=1e-12), k


def test_assortativity_karate(spark):
    from linkgraph import degree_assortativity

    edges = karate_edges()
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    ref = nx.degree_assortativity_coefficient(_nx_graph(edges))
    assert degree_assortativity(g) == pytest.approx(ref, rel=1e-9)


def test_assortativity_directed(spark):
    from linkgraph import degree_assortativity

    edges = random_digraph(60, 0.08, seed=3)
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    nxg = nx.DiGraph()
    nxg.add_edges_from((s, d) for s, d, _ in edges)
    ref = nx.degree_assortativity_coefficient(nxg)  # default x='out', y='in'
    assert degree_assortativity(g) == pytest.approx(ref, rel=1e-9)


def test_assortativity_star_is_minus_one(spark):
    from linkgraph import degree_assortativity

    edges = [("c", f"l{i}") for i in range(6)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    assert degree_assortativity(g) == pytest.approx(-1.0)


def test_assortativity_regular_graph_is_nan(spark):
    import math

    from linkgraph import degree_assortativity

    # directed 3-cycle: all out/in degrees 1 → zero variance → nan (ANSI
    # corr divide-by-zero is converted, matching networkx's nan)
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    assert math.isnan(degree_assortativity(g))


def test_effective_size_karate(spark):
    from linkgraph import effective_size

    edges = karate_edges()
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    ref = nx.effective_size(_nx_graph(edges))
    got = {r["id"]: r["effective_size"] for r in effective_size(g).collect()}
    for k, v in ref.items():
        assert got[k] == pytest.approx(v, abs=1e-12), k


def test_effective_size_star_and_isolate(spark):
    from linkgraph import effective_size

    # star center: 3 alters, no ties -> ES = 3; leaves -> 1; isolate -> 0.0
    edges = [("c", "a"), ("c", "b"), ("c", "d")]
    nodes = spark.createDataFrame([("c",), ("a",), ("b",), ("d",), ("z",)], ["id"])
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]), nodes=nodes)
    got = {r["id"]: r["effective_size"] for r in effective_size(g).collect()}
    assert got == {"c": 3.0, "a": 1.0, "b": 1.0, "d": 1.0, "z": 0.0}


def test_global_efficiency_matches_networkx(spark):
    from linkgraph import global_efficiency

    edges = karate_edges()
    g = LinkGraph(
        spark.createDataFrame(edges, ["src", "dst"]), keys={"directed": False}
    )
    want = nx.global_efficiency(_nx_graph(edges))
    assert global_efficiency(g) == pytest.approx(want, abs=1e-12)


def test_global_efficiency_trivial(spark):
    from linkgraph import global_efficiency

    one = LinkGraph(
        spark.createDataFrame([("a", "a")], ["src", "dst"]),
        nodes=spark.createDataFrame([("a",)], ["id"]),
    )
    assert global_efficiency(one) == 0.0
