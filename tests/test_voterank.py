"""voterank: exact python replay (same rules, same float op order),
networkx parity on tie-free graphs, early stop, directed semantics."""

import networkx as nx
import pytest

from linkgraph import LinkGraph, voterank


def _replay(edges_directed, nodes, k):
    """Python replay of the engine's exact rules: score = Σ ability of
    out-neighbors, elect max (ties: min id), zero the winner's ability,
    decrement out-neighbors by 1/(Σdeg/n) floored at 0."""
    out = {v: set() for v in nodes}
    for s, d in edges_directed:
        out[s].add(d)
    m = len({(s, d) for s, d in edges_directed})
    delta = 1.0 / (m / len(nodes))
    a = {v: 1.0 for v in nodes}
    elected = []
    for rnd in range(k):
        scores = {
            v: sum(a[w] for w in sorted(out[v])) for v in nodes if v not in
            {e[1] for e in elected} and out[v]
        }
        if not scores:
            break
        win = min(scores, key=lambda v: (-scores[v], v))
        if scores[win] <= 0:
            break
        elected.append((rnd + 1, win, scores[win]))
        a[win] = 0.0
        for w in out[win]:
            a[w] = max(0.0, a[w] - delta)
    return elected


def _sym(pairs):
    return list({(s, d) for s, d in pairs} | {(d, s) for s, d in pairs})


def test_voterank_replay_undirected(spark):
    # two overlapping stars + a chain: repeated elections interact via the
    # shared leaves, exercising the decrement
    pairs = (
        [("h1", f"l{i}") for i in range(6)]
        + [("h2", f"l{i}") for i in range(3, 9)]
        + [("c0", "c1"), ("c1", "c2")]
    )
    g = LinkGraph(
        spark.createDataFrame(pairs, ["src", "dst"]), keys={"directed": False}
    )
    got = [(r["rank"], r["id"], round(r["score"], 9)) for r in voterank(g, 4).collect()]
    edges = _sym(pairs)
    nodes = sorted({v for e in pairs for v in e})
    assert got == [(r, w, round(s, 9)) for r, w, s in _replay(edges, nodes, 4)]


def test_voterank_networkx_parity_tie_free(spark):
    # distinct degrees at each election -> no ties -> nx order is forced
    pairs = [("h", f"x{i}") for i in range(7)] + [
        ("m", "x0"),
        ("m", "x1"),
        ("m", "x2"),
        ("m", "x3"),
        ("s", "x0"),
        ("s", "x1"),
    ]
    g = LinkGraph(
        spark.createDataFrame(pairs, ["src", "dst"]), keys={"directed": False}
    )
    got = [r["id"] for r in voterank(g, 3).collect()]
    G = nx.Graph(pairs)
    assert got == nx.voterank(G, 3)


def test_voterank_directed_votes_out_neighbors(spark):
    # a -> b, a -> c, b -> c: score(a)=2 wins round 1; then b (score 1 via
    # c's untouched ability... c was decremented as a's out-neighbor)
    pairs = [("a", "b"), ("a", "c"), ("b", "c")]
    g = LinkGraph(spark.createDataFrame(pairs, ["src", "dst"]))
    got = [(r["id"], r["score"]) for r in voterank(g, 3).collect()]
    nodes = ["a", "b", "c"]
    assert got == [(w, s) for _, w, s in _replay(pairs, nodes, 3)]
    G = nx.DiGraph(pairs)
    assert [i for i, _ in got] == nx.voterank(G, 3)


def test_voterank_early_stop_and_validation(spark):
    # a-b: electing a zeroes b's ability (delta=1), so round 2's best
    # score is 0 -> early stop after one row (networkx agrees)
    pairs = [("a", "b")]
    g = LinkGraph(
        spark.createDataFrame(pairs, ["src", "dst"]), keys={"directed": False}
    )
    rows = voterank(g, 5).collect()
    assert [(r["rank"], r["id"]) for r in rows] == [(1, "a")]
    assert nx.voterank(nx.Graph(pairs), 5) == ["a"]
    with pytest.raises(ValueError):
        voterank(g, 0)


# ------------------------------------------------------------- rich club


def _nx_rc(pairs):
    G = nx.Graph(pairs)
    return nx.rich_club_coefficient(G, normalized=False)


def _got_rc(spark, pairs):
    from linkgraph import rich_club_coefficient

    g = LinkGraph(
        spark.createDataFrame(pairs, ["src", "dst"]), keys={"directed": False}
    )
    return {
        r["k"]: (r["n_nodes"], r["n_edges"], r["rc"])
        for r in rich_club_coefficient(g).collect()
    }


def test_rich_club_networkx_parity(spark):
    # core K4 + peripheral spokes: a genuine rich club
    pairs = (
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
        + [("a", f"p{i}") for i in range(4)]
        + [("b", "p0"), ("p0", "p1")]
    )
    got = _got_rc(spark, pairs)
    exp = _nx_rc(pairs)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][2] == exp[k], (k, got[k], exp[k])


def test_rich_club_gapped_degrees_and_star(spark):
    # star: hub degree n, leaves degree 1 -> big k gap exercises the
    # interval expansion (constant runs of k between present degrees)
    pairs = [("h", f"l{i}") for i in range(9)]
    got = _got_rc(spark, pairs)
    exp = _nx_rc(pairs)
    assert got.keys() == exp.keys()  # k = 0..? (N_k >= 2 cutoff)
    for k in exp:
        assert got[k][2] == exp[k]
    # path graph: all degrees <= 2
    pairs2 = [("x0", "x1"), ("x1", "x2"), ("x2", "x3")]
    got2 = _got_rc(spark, pairs2)
    exp2 = _nx_rc(pairs2)
    assert got2.keys() == exp2.keys()
    for k in exp2:
        assert got2[k][2] == exp2[k]


def test_rich_club_directed_raises(spark):
    from linkgraph import rich_club_coefficient

    g = LinkGraph(spark.createDataFrame([("a", "b")], ["src", "dst"]))
    with pytest.raises(ValueError):
        rich_club_coefficient(g)
