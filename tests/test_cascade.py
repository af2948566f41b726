"""Independent-cascade simulation — linkgraph/algorithms/cascade.py.

The replay tests recompute the md5 coins and the live-edge BFS in pure
Python (hashlib + dict/set), so they pin the draw law and the activation
semantics without networkx.
"""

import hashlib

import pytest

from linkgraph.algorithms.cascade import ic_influence, ic_live_edges, ic_spread
from linkgraph.graph import LinkGraph

B60 = 1 << 60


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _live(edges, directed, p, trial, seed):
    out = []
    for u, v in edges:
        a, b = (u, v) if directed else (min(u, v), max(u, v))
        if _h60(f"ic:{seed}:{trial}:{a}:{b}") < int(p * B60):
            out.append((u, v))
            if not directed:
                out.append((v, u))
    return out

def _reach(live, seeds):
    """{node: bfs_round} from the seed set over live arcs."""
    adj = {}
    for u, v in live:
        adj.setdefault(u, []).append(v)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    r = 0
    while frontier:
        r += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = r
                    nxt.append(v)
        frontier = nxt
    return dist


EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("a", "e"), ("e", "f"),
    ("f", "g"), ("g", "a"), ("d", "h"), ("h", "i"), ("i", "j"),
    ("b", "f"), ("c", "g"), ("e", "i"),
]


def _graph(spark, directed=True):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    return LinkGraph(df, keys={"directed": directed})


def test_live_edges_match_replay(spark):
    g = _graph(spark)
    got = {
        (r["trial"], r["src"], r["dst"])
        for r in ic_live_edges(g, p=0.55, n_trials=4, seed=7).collect()
    }
    want = {
        (t, u, v)
        for t in range(1, 5)
        for u, v in _live(EDGES, True, 0.55, t, 7)
    }
    assert got == want and got  # non-degenerate at p=0.55


def test_undirected_shared_coin(spark):
    g = _graph(spark, directed=False)
    rows = ic_live_edges(g, p=0.5, n_trials=6, seed=3).collect()
    arcs = {(r["trial"], r["src"], r["dst"]) for r in rows}
    # both directions of an undirected edge go live together
    assert all((t, v, u) in arcs for t, u, v in arcs)


def test_spread_matches_replay(spark):
    g = _graph(spark)
    got = {
        (r["trial"], r["id"]): r["round"]
        for r in ic_spread(g, ["a"], p=0.6, n_trials=5, seed=11).collect()
    }
    want = {}
    for t in range(1, 6):
        for node, rnd in _reach(_live(EDGES, True, 0.6, t, 11), ["a"]).items():
            want[(t, node)] = rnd
    assert got == want


def test_p_one_reaches_everything_p_zero_only_seeds(spark):
    g = _graph(spark)
    full = ic_spread(g, ["a"], p=1.0, n_trials=2, seed=1).collect()
    # the whole graph is reachable from a when every arc is live
    assert {r["id"] for r in full} == {u for e in EDGES for u in e}
    none = ic_spread(g, ["a"], p=0.0, n_trials=2, seed=1).collect()
    assert {(r["trial"], r["id"], r["round"]) for r in none} == {
        (1, "a", 0), (2, "a", 0)
    }


def test_max_rounds_caps_depth(spark):
    g = _graph(spark)
    rows = ic_spread(g, ["a"], p=1.0, n_trials=1, max_rounds=1).collect()
    assert max(r["round"] for r in rows) == 1
    assert {r["id"] for r in rows if r["round"] == 1} == {"b", "e"}


def test_influence_matches_replay(spark):
    g = _graph(spark)
    got = {
        r["id"]: r["spread_millionths"]
        for r in ic_influence(
            g, ["a", "d", "j"], p=0.6, n_trials=5, seed=11
        ).collect()
    }
    for cand in ("a", "d", "j"):
        total = sum(
            len(_reach(_live(EDGES, True, 0.6, t, 11), [cand]))
            for t in range(1, 6)
        )
        assert got[cand] == round(1e6 * total / 5), cand
    # j is a sink: spread is exactly 1 per trial
    assert got["j"] == 1_000_000


def test_validation(spark):
    g = _graph(spark)
    with pytest.raises(ValueError, match="p must be"):
        ic_live_edges(g, p=1.5, n_trials=1)
    with pytest.raises(ValueError, match="n_trials"):
        ic_live_edges(g, p=0.5, n_trials=0)
    with pytest.raises(ValueError, match="seeds"):
        ic_spread(g, [], p=0.5)
    with pytest.raises(ValueError, match="candidates"):
        ic_influence(g, [], p=0.5)


def test_greedy_seeds_matches_replay(spark):
    from linkgraph.algorithms.cascade import ic_greedy_seeds

    g = _graph(spark)
    cands = ["a", "d", "g", "j"]
    got = ic_greedy_seeds(
        g, cands, k=2, p=0.6, n_trials=5, seed=11
    ).collect()
    # python greedy over the same replayed reach sets
    sets = {
        c: {
            (t, node)
            for t in range(1, 6)
            for node in _reach(_live(EDGES, True, 0.6, t, 11), [c])
        }
        for c in cands
    }
    covered, want = set(), []
    for rank in (1, 2):
        best = min(
            (c for c in cands if c not in [w[0] for w in want]),
            key=lambda c: (-len(sets[c] - covered), c),
        )
        gain = len(sets[best] - covered)
        covered |= sets[best]
        want.append((best, rank, round(1e6 * gain / 5), round(1e6 * len(covered) / 5)))
    assert [(r["id"], r["rank"], r["marginal_millionths"], r["total_millionths"])
            for r in sorted(got, key=lambda r: r["rank"])] == want
    # second pick's marginal can't exceed the first (submodularity)
    assert want[1][2] <= want[0][2]


def test_greedy_guard_and_k_validation(spark):
    from linkgraph.algorithms.cascade import ic_greedy_seeds

    g = _graph(spark)
    with pytest.raises(ValueError, match="max_reach_rows"):
        ic_greedy_seeds(g, ["a"], k=1, p=1.0, n_trials=2, max_reach_rows=3)
    with pytest.raises(ValueError, match="k must be"):
        ic_greedy_seeds(g, ["a"], k=0)
