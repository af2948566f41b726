"""s_core — weighted-degree core (Eidsaa & Almaas s-core)."""

import pytest
from pyspark.sql import functions as F

from linkgraph import s_core
from linkgraph.graph import LinkGraph


def _g(spark, rows, directed=False):
    return LinkGraph(
        spark.createDataFrame(rows, "src string, dst string, weight double"),
        keys={"directed": directed},
    )


def _ids(df):
    return {r["id"] for r in df.collect()}


def test_tails_peel_core_survives(spark):
    # K4 a,b,c,d all edge weight 3 (wdeg 9 each) + 1-weight pendants
    rows = []
    for i, x in enumerate("abcd"):
        for y in "abcd"[i + 1 :]:
            rows.append((x, y, 3.0))
    rows += [("a", "p1", 1.0), ("b", "p2", 1.0)]
    g = _g(spark, rows)
    assert _ids(s_core(g, 5.0)) == {"a", "b", "c", "d"}
    assert _ids(s_core(g, 9.1)) == set()  # 9 < 9.1 kills the clique too
    assert _ids(s_core(g, 1.0)) == {"a", "b", "c", "d", "p1", "p2"}


def test_cascade_peeling(spark):
    # chain with increasing weights: dropping the light end cascades.
    # edges: (c0,c1,1),(c1,c2,2),(c2,c3,3): wdeg c0=1, c1=3, c2=5, c3=3
    # s=3: round1 drops c0 -> c1 wdeg 2 -> round2 drops c1 -> c2 wdeg 3,
    # c3 wdeg 3 -> stable core {c2, c3}
    g = _g(spark, [("c0", "c1", 1.0), ("c1", "c2", 2.0), ("c2", "c3", 3.0)])
    assert _ids(s_core(g, 3.0)) == {"c2", "c3"}


def test_reciprocal_arcs_sum(spark):
    # directed u->v 2.0 and v->u 2.5: undirected strength 4.5
    g = _g(spark, [("u", "v", 2.0), ("v", "u", 2.5)], directed=True)
    assert _ids(s_core(g, 4.5)) == {"u", "v"}
    assert _ids(s_core(g, 4.6)) == set()


def test_s_zero_returns_all_nodes(spark):
    g = _g(spark, [("a", "b", 1.0)])
    assert _ids(s_core(g, 0.0)) == {"a", "b"}


def test_matches_kcore_on_unit_weights(spark):
    from linkgraph import k_core

    rows = [
        ("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0), ("c", "d", 1.0)
    ]
    g = _g(spark, rows)
    assert _ids(s_core(g, 2.0)) == _ids(k_core(g, 2))
