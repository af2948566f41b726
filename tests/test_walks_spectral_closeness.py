"""Random walker (F7 semantics), node2vec walk counts, spectral clustering
co-membership (F6), closeness vs networkx oracle."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph
from linkgraph.algorithms.closeness import closeness_centrality
from linkgraph.algorithms.node2vec import Node2Vec, node2vec_walks
from linkgraph.algorithms.random_walker import random_walks
from linkgraph.algorithms.spectral import spectral_clustering

# F7 dead-end graph: (A,B,2),(B,C,1),(C,B,4),(C,D,3); D is a dead end
F7 = [("A", "B", 2.0), ("B", "C", 1.0), ("C", "B", 4.0), ("C", "D", 3.0)]


@pytest.fixture(scope="module")
def f7(spark):
    df = spark.createDataFrame(F7, ["src", "dst", "weight"])
    return LinkGraph(df)


def test_random_walker_paths(spark, f7):
    res = random_walks(f7, "A", num_epochs=3).collect()
    # expansion from A: A->B->C->{B,D} = 2 paths of length 4
    paths = sorted(tuple(r["random_walks"]) for r in res)
    assert paths == [("A", "B", "C", "B"), ("A", "B", "C", "D")]
    for r in res:
        ws = r["weights"]
        assert ws[0] == 1.0
        assert len(ws) == len(r["random_walks"])
        # probability product decreases monotonically
        assert all(ws[i + 1] <= ws[i] + 1e-12 for i in range(len(ws) - 1))
    # probabilities of extensions from a node sum to the parent probability
    by_prefix = {tuple(r["random_walks"]): r["weights"][-1] for r in res}
    assert by_prefix[("A", "B", "C", "B")] + by_prefix[("A", "B", "C", "D")] == (
        pytest.approx(1.0)
    )


def test_random_walker_dead_end_freezes(spark, f7):
    res = random_walks(f7, "D", num_epochs=4).collect()
    assert len(res) == 1
    assert list(res[0]["random_walks"]) == ["D"]


def test_random_walker_edge_sampling(spark, f7):
    full = random_walks(f7, "A", num_epochs=6).count()
    capped = random_walks(f7, "A", num_epochs=6, n_sampling_edges=1).count()
    assert capped <= full  # sampling reduces walk count (reference :15-32)
    assert capped == 1


def test_node2vec_walk_counts(spark, f7):
    # reference test_ml_spark_node2vec.py:104-127 — sampling_ratio=1,
    # 2 epochs: node D is a dead end, its length-1 path is dropped → 3 paths
    w1 = node2vec_walks(f7, sampling_ratio=1.0, num_epochs=2, num_paths_per_node=1)
    assert w1.count() == 3
    w3 = node2vec_walks(f7, sampling_ratio=1.0, num_epochs=2, num_paths_per_node=3)
    assert w3.count() == 9
    # walks follow edges
    for r in w1.collect():
        p = list(r["random_walks"])
        edges = {(s, d) for s, d, _ in F7}
        assert all((p[i], p[i + 1]) in edges for i in range(len(p) - 1))


def test_node2vec_walks_deterministic(spark, f7):
    a = sorted(map(str, node2vec_walks(f7, 1.0, 3, 1, seed=5).collect()))
    b = sorted(map(str, node2vec_walks(f7, 1.0, 3, 1, seed=5).collect()))
    assert a == b


def test_node2vec_embeddings(spark, f7, tmp_path):
    m = Node2Vec(dimension=4, num_epochs=3, w2v_min_count=1, seed=1).fit(f7)
    emb = m.embedding()
    assert emb.count() <= 4 and "word" in emb.columns
    sim = m.get_most_similar_nodes("B", k=2)
    assert sim.count() == 2
    # save/load roundtrip
    path = str(tmp_path / "w2v")
    m.save(path)
    m2 = Node2Vec.load(path)
    assert m2.embedding().count() == emb.count()


def test_spectral_two_cliques(spark):
    def clique(members):
        return [(a, b, 1.0) for i, a in enumerate(members) for b in members[i + 1:]]

    edges = clique(["a", "b", "c", "d"]) + clique(["x", "y", "z", "w"]) + [
        ("a", "x", 0.1)
    ]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    res = spectral_clustering(g, k=2, max_iter=20)
    labels = {r["id"]: r["cluster"] for r in res.labels.collect()}
    assert len(labels) == 8
    assert len({labels[v] for v in "abcd"}) == 1
    assert len({labels[v] for v in "xyzw"}) == 1
    assert labels["a"] != labels["x"]
    assert -0.5 <= res.modularity <= 1.0


def test_spectral_bad_k(spark):
    g = LinkGraph(spark.createDataFrame([("a", "b", 1.0)], ["src", "dst", "weight"]))
    with pytest.raises(ValueError):
        spectral_clustering(g, k=1)


def test_closeness_matches_networkx(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("b", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    g = LinkGraph(df, keys={"directed": False})
    got = {r["id"]: r["closeness"] for r in closeness_centrality(g).collect()}
    nxg = nx.Graph(edges)
    ref = nx.closeness_centrality(nxg)
    for k, v in ref.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_closeness_landmarks_subset(spark):
    edges = [("a", "b"), ("b", "c")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]), keys={"directed": False})
    got = {r["id"]: r["closeness"] for r in
           closeness_centrality(g, landmarks=["a"]).collect()}
    # d(a,a)=0 → closeness 0 (deviation doc'd); d(b→a)=1 → 2/1; d(c→a)=2 → 2/2
    assert got["b"] == pytest.approx(2.0)
    assert got["c"] == pytest.approx(1.0)
    assert got["a"] == 0.0


def test_node2vec_hub_split_sampling(spark):
    """A hub source above hub_threshold is split into salt buckets, so no
    single task sorts/holds the whole hub edge list (VERDICT r1 item 4)."""
    from linkgraph.algorithms.node2vec import _sampling_tables, node2vec_walks

    n_hub = 20_000
    hub_edges = spark.range(n_hub).selectExpr(
        "'hub' as src", "concat('t', id) as dst", "1.0 as weight"
    )
    tail = spark.createDataFrame([("a", "hub", 1.0)], ["src", "dst", "weight"])
    g = LinkGraph(hub_edges.unionByName(tail))

    bucket_cdf, adjacency = _sampling_tables(g, hub_threshold=1000, buckets=8)
    hub_rows = adjacency.filter("id = 'hub'").collect()
    assert len(hub_rows) == 8  # split, not one giant array
    sizes = [len(r["cdf"]) for r in hub_rows]
    assert max(sizes) < n_hub / 2  # bounded per-bucket arrays
    assert sum(sizes) == n_hub
    barr = bucket_cdf.filter("id = 'hub'").collect()[0]["barr"]
    assert len(barr) == 8 and abs(barr[-1]["cum"] - 1.0) < 1e-12

    # walks still work end-to-end across the split hub
    walks = node2vec_walks(
        g, sampling_ratio=1.0, num_epochs=2, seed=11,
        hub_threshold=1000, hub_buckets=8,
    ).collect()
    hub_walks = [r["random_walks"] for r in walks if r["random_walks"][0] == "hub"]
    assert hub_walks and all(w[1].startswith("t") for w in hub_walks)


def test_node2vec_walk_cache_roundtrip(spark, f7, tmp_path):
    """path_cache blocks + load_file reproduce the same Word2Vec model as the
    original fit (reference test_ml_spark_node2vec.py:129-151 analogue)."""
    from linkgraph.algorithms.node2vec import Node2Vec

    cache = str(tmp_path / "walks")
    n2v = Node2Vec(
        dimension=4, num_epochs=4, num_paths_per_node=4, batch_size=2,
        path_cache=cache, w2v_min_count=1, seed=5,
    ).fit(f7)
    import os

    assert sorted(os.listdir(cache)) == ["block=0", "block=1"]

    reloaded = Node2Vec.load_file(
        cache, dimension=4, w2v_min_count=1, seed=5,
    )
    a = {r["word"]: list(r["vector"]) for r in n2v.embedding().collect()}
    b = {r["word"]: list(r["vector"]) for r in reloaded.embedding().collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9)


def test_walker_topk_cap_properties(spark):
    """Weighted top-k fan-out cap: exactly k extensions per active path from
    a high-degree node, all following real edges (two-phase hub-safe rank)."""
    hub_edges = [("h", f"t{i}", float(i % 7 + 1)) for i in range(500)]
    g = LinkGraph(spark.createDataFrame(hub_edges, ["src", "dst", "weight"]))
    res = random_walks(g, "h", num_epochs=1, n_sampling_edges=5).collect()
    assert len(res) == 5  # exactly k extensions
    targets = {r["random_walks"][1] for r in res}
    assert len(targets) == 5 and all(t.startswith("t") for t in targets)
    # deterministic across runs (seeded per-(edge, epoch) uniforms)
    again = {tuple(r["random_walks"]) for r in
             random_walks(g, "h", num_epochs=1, n_sampling_edges=5).collect()}
    assert again == {tuple(r["random_walks"]) for r in res}


def test_node2vec_refit_clears_stale_cache_blocks(spark, f7, tmp_path):
    """Re-fitting into the same path_cache with a larger batch_size must not
    mix walk blocks from the previous fit into the Word2Vec input."""
    from linkgraph.algorithms.node2vec import Node2Vec
    import os

    cache = str(tmp_path / "walks2")
    Node2Vec(dimension=4, num_epochs=3, num_paths_per_node=4, batch_size=1,
             path_cache=cache, w2v_min_count=1, seed=5).fit(f7)
    assert len(os.listdir(cache)) == 4
    m = Node2Vec(dimension=4, num_epochs=3, num_paths_per_node=2, batch_size=2,
                 path_cache=cache, w2v_min_count=1, seed=5).fit(f7)
    assert sorted(os.listdir(cache)) == ["block=0"]
    # 2 runs x 3 non-dead-end starts = 6 cached walks, not 6 + stale 12
    assert m.paths_.count() == 6


def test_node2vec_zero_weight_edges_uniform(spark):
    """All-zero out-weights degrade to uniform sampling, not NaN CDFs."""
    from linkgraph.algorithms.node2vec import node2vec_walks

    edges = [("s", f"t{i}", 0.0) for i in range(4)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))
    seen = set()
    for seed in range(6):
        for r in node2vec_walks(g, 1.0, 1, 1, seed=seed).collect():
            if r["random_walks"][0] == "s":
                seen.add(r["random_walks"][1])
    assert len(seen) > 1  # NaN CDF would deterministically pick one target


def test_harmonic_matches_networkx(spark):
    from linkgraph import harmonic_centrality

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("b", "d"),
             ("x", "y")]  # disconnected pair: harmonic handles it natively
    df = spark.createDataFrame(edges, ["src", "dst"])
    g = LinkGraph(df, keys={"directed": False})
    got = {r["id"]: r["harmonic"] for r in harmonic_centrality(g).collect()}
    ref = nx.harmonic_centrality(nx.Graph(edges))
    assert set(got) == set(ref)
    for k, v in ref.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_harmonic_landmarks_subset(spark):
    from linkgraph import harmonic_centrality

    edges = [("a", "b"), ("b", "c")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    got = {r["id"]: r["harmonic"] for r in
           harmonic_centrality(g, landmarks=["a"]).collect()}
    # 1/d(b→a)=1, 1/d(c→a)=0.5, landmark itself contributes 0
    assert got["b"] == pytest.approx(1.0)
    assert got["c"] == pytest.approx(0.5)
    assert got["a"] == 0.0


# ---------------------------------------------------------------------------
# shortest_paths_weighted (Bellman-Ford supersteps, beyond reference)


def test_sssp_matches_dijkstra(spark):
    import random

    import networkx as nx

    from linkgraph import LinkGraph, shortest_paths_weighted

    rng = random.Random(5)
    nodes = [f"n{i}" for i in range(30)]
    edges = sorted({
        (a, b) for a in nodes for b in nodes if a != b and rng.random() < 0.12
    })
    wedges = [(a, b, float(1 + (hash((a, b)) % 9))) for a, b in edges]
    g = LinkGraph(spark.createDataFrame(wedges, ["src", "dst", "weight"]))
    got = {r["id"]: r["dist"] for r in
           shortest_paths_weighted(g, sources=["n0"]).collect()}
    nxg = nx.DiGraph()
    nxg.add_weighted_edges_from(wedges)
    exp = nx.single_source_dijkstra_path_length(nxg, "n0")
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_sssp_multi_source_undirected(spark):
    import networkx as nx

    from linkgraph import LinkGraph, shortest_paths_weighted

    wedges = [(f"n{i}", f"n{i+1}", float(i + 1)) for i in range(9)]
    g = LinkGraph(spark.createDataFrame(wedges, ["src", "dst", "weight"]),
                  keys={"directed": False})
    got = {r["id"]: r["dist"] for r in
           shortest_paths_weighted(g, sources=["n0", "n9"]).collect()}
    nxg = nx.Graph()
    nxg.add_weighted_edges_from(wedges)
    exp = nx.multi_source_dijkstra_path_length(nxg, {"n0", "n9"})
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_sssp_parallel_edges_keep_cheapest(spark):
    from linkgraph import LinkGraph, shortest_paths_weighted

    wedges = [("a", "b", 5.0), ("a", "b", 2.0), ("b", "c", 1.0)]
    g = LinkGraph(spark.createDataFrame(wedges, ["src", "dst", "weight"]))
    got = {r["id"]: r["dist"] for r in
           shortest_paths_weighted(g, sources=["a"]).collect()}
    assert got == {"a": 0.0, "b": 2.0, "c": 3.0}


def test_sssp_restricts_to_node_table_and_drops_phantom_sources(spark):
    from linkgraph import LinkGraph, shortest_paths_weighted

    nodes = spark.createDataFrame([("a",), ("b",)], ["id"])
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "x", 1.0)], ["src", "dst", "weight"]
    )
    g = LinkGraph(edges, nodes=nodes)
    got = {r["id"]: r["dist"] for r in
           shortest_paths_weighted(g, sources=["a", "ghost"]).collect()}
    # x is outside the node table (no output row); ghost seeds nothing
    assert got == {"a": 0.0, "b": 1.0}
    with pytest.raises(ValueError):
        shortest_paths_weighted(g, sources=[])


def test_weighted_distances_match_dijkstra_per_landmark(spark):
    import random

    from linkgraph import LinkGraph, shortest_path_lengths_weighted

    rng = random.Random(21)
    nodes = [f"n{i}" for i in range(20)]
    wedges = sorted({
        (a, b) for a in nodes for b in nodes if a != b and rng.random() < 0.15
    })
    wedges = [(a, b, float(1 + (hash((a, b)) % 7))) for a, b in wedges]
    g = LinkGraph(spark.createDataFrame(wedges, ["src", "dst", "weight"]))
    lms = ["n0", "n3", "n7"]
    got = {(r["id"], r["landmark"]): r["dist"] for r in
           shortest_path_lengths_weighted(g, landmarks=lms).collect()}
    nxg = nx.DiGraph()
    nxg.add_weighted_edges_from(wedges)
    for lm in lms:
        if lm not in nxg:
            continue
        # dist id -> landmark follows edge direction = dijkstra on reversed
        exp = nx.single_source_dijkstra_path_length(nxg.reverse(), lm)
        for node, v in exp.items():
            assert got[(node, lm)] == pytest.approx(v, abs=1e-9), (node, lm)
        # unreached pairs have no row
        for node in nxg.nodes:
            if node not in exp:
                assert (node, lm) not in got


def test_weighted_closeness_path_closed_form(spark):
    from linkgraph import LinkGraph, weighted_closeness_centrality

    wedges = [(f"n{i}", f"n{i+1}", float(i + 1)) for i in range(4)]
    g = LinkGraph(spark.createDataFrame(wedges, ["src", "dst", "weight"]))
    got = {r["id"]: r["closeness"] for r in
           weighted_closeness_centrality(g).collect()}
    # prefix T_k = k(k+1)/2; dist(i->j) = T_j - T_i for j >= i
    T = [k * (k + 1) // 2 for k in range(5)]
    for i in range(5):
        s = sum(T[j] - T[i] for j in range(i, 5))
        assert got[f"n{i}"] == pytest.approx(4.0 / s if s else 0.0), i


def test_eccentricity_and_diameter_path(spark):
    from linkgraph import LinkGraph, diameter_lower_bound, eccentricity

    edges = [(f"n{i}", f"n{i+1}") for i in range(6)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    got = {r["id"]: r["ecc"] for r in eccentricity(g).collect()}
    # directed path: node i reaches j >= i, farthest is n6 at distance 6-i
    assert got == {f"n{i}": 6 - i for i in range(7)}
    assert diameter_lower_bound(g) == 6


def test_eccentricity_matches_networkx_undirected(spark):
    import random

    from linkgraph import LinkGraph, eccentricity

    rng = random.Random(31)
    nodes = [f"n{i}" for i in range(16)]
    edges = sorted({(a, b) for a in nodes for b in nodes
                    if a < b and rng.random() < 0.3})
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]),
                  keys={"directed": False})
    nxg = nx.Graph()
    nxg.add_edges_from(edges)
    if nx.is_connected(nxg):
        exp = nx.eccentricity(nxg)
        got = {r["id"]: r["ecc"] for r in eccentricity(g).collect()}
        assert got == exp


def test_reciprocity(spark):
    import networkx as nx

    from linkgraph import LinkGraph, reciprocity

    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "c"),
             ("a", "c")]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    nxg = nx.DiGraph()
    nxg.add_edges_from(edges)
    assert reciprocity(g) == pytest.approx(nx.overall_reciprocity(nxg))
    import math
    assert math.isnan(reciprocity(
        LinkGraph(spark.createDataFrame([("x", "x")], ["src", "dst"]))))
