"""Shared graph fixtures (FIXTURES.md F2/F3/F10) + random-graph helpers."""

import networkx as nx

# F2 — toy person graph (reference unit_tests/test_core_graph.py:12-27)
PERSON_EDGES = [
    ("Alice", "Bob", 3),
    ("Alice", "Carol", 2),
    ("Alice", "Dave", 1),
    ("Bob", "Carol", 4),
    ("Carol", "Dave", 2),
    ("Dave", "Eve", 5),
    ("Eve", "Frank", 1),
    ("Frank", "Gary", 2),
    ("Gary", "Eve", 3),
    ("Bob", "Dave", 1),
]
PERSON_NODES = ["Alice", "Bob", "Carol", "Dave", "Eve", "Frank", "Gary"]


def karate_edges():
    """F10 — Zachary's karate club, public dataset via networkx."""
    g = nx.karate_club_graph()
    return [(int(u), int(v)) for u, v in g.edges()]


def random_digraph(n, p, seed, weighted=False):
    g = nx.gnp_random_graph(n, p, seed=seed, directed=True)
    rng = nx.utils.create_random_state(seed)
    edges = []
    for u, v in g.edges():
        w = float(rng.randint(1, 10)) if weighted else 1.0
        edges.append((int(u), int(v), w))
    return edges


def edges_df(spark, rows, cols=("src", "dst", "weight")):
    return spark.createDataFrame(rows, list(cols)[: len(rows[0])])
