"""SALSA — closed-form parity against the explicitly-built alternating-walk
Markov chains (component-weighted stationary vectors, per Lempel & Moran)."""

import random

import numpy as np
import pytest

from linkgraph import LinkGraph, salsa


def _truth(edges):
    """Stationary hub/authority vectors of the explicit two-step chains."""
    E = sorted(set(edges))
    outs, ins = {}, {}
    for u, v in E:
        outs.setdefault(u, []).append(v)
        ins.setdefault(v, []).append(u)

    def chain(nodeset, back, fwd):
        n = len(nodeset)
        pos = {v: i for i, v in enumerate(nodeset)}
        P = np.zeros((n, n))
        for a in nodeset:
            for u in back[a]:
                for w in fwd[u]:
                    P[pos[a], pos[w]] += (1 / len(back[a])) * (1 / len(fwd[u]))
        seen = {}
        comp = 0
        for s in range(n):
            if s in seen:
                continue
            stack = [s]
            seen[s] = comp
            while stack:
                x = stack.pop()
                for y in range(n):
                    if (P[x, y] > 0 or P[y, x] > 0) and y not in seen:
                        seen[y] = comp
                        stack.append(y)
            comp += 1
        score = np.zeros(n)
        for c in range(comp):
            members = [i for i in range(n) if seen[i] == c]
            sub = P[np.ix_(members, members)]
            w, V = np.linalg.eig(sub.T)
            k = np.argmin(abs(w - 1))
            pi = abs(V[:, k].real)
            pi /= pi.sum()
            for j, i in enumerate(members):
                score[i] = (len(members) / n) * pi[j]
        return dict(zip(nodeset, score))

    return chain(sorted(ins), ins, outs), chain(sorted(outs), outs, ins)


def _check(spark, edges):
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))
    got = {
        r["id"]: (r["hub_score"], r["authority_score"])
        for r in salsa(g).collect()
    }
    a_t, h_t = _truth(edges)
    for v, (h, a) in got.items():
        assert a == pytest.approx(a_t.get(v, 0.0), abs=1e-9), (v, "auth")
        assert h == pytest.approx(h_t.get(v, 0.0), abs=1e-9), (v, "hub")
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0)


def test_chain_role_split(spark):
    # x→h→a: the UNDIRECTED graph is one component, but the authority chain
    # has two singleton components {h},{a} — the classic SALSA pitfall
    _check(spark, [("x", "h"), ("h", "a")])


def test_co_citation(spark):
    _check(spark, [("x", "h1"), ("y", "h1"), ("h1", "a1")])


def test_diamond_with_tail(spark):
    _check(
        spark,
        [("u", "a"), ("u", "b"), ("v", "a"), ("v", "b"), ("a", "z")],
    )


def test_random_digraphs(spark):
    random.seed(5)
    nodes = [f"v{i}" for i in range(10)]
    for _ in range(2):
        edges = sorted(
            {(a, b) for a in nodes for b in nodes if a != b and random.random() < 0.15}
        )
        _check(spark, edges)


def test_duplicate_edges_collapse(spark):
    a = salsa(
        LinkGraph(
            spark.createDataFrame(
                [("x", "h"), ("x", "h"), ("h", "a")], ["src", "dst"]
            )
        )
    ).collect()
    b = salsa(
        LinkGraph(
            spark.createDataFrame([("x", "h"), ("h", "a")], ["src", "dst"])
        )
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
