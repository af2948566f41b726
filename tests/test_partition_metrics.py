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


def _agreement_reference(pairs_a, pairs_b):
    """Pure-python NMI (sqrt) + ARI over two id->label dicts."""
    import math
    from collections import Counter

    ids = sorted(set(pairs_a) & set(pairs_b))
    n = len(ids)
    cont = Counter((pairs_a[i], pairs_b[i]) for i in ids)
    am = Counter(pairs_a[i] for i in ids)
    bm = Counter(pairs_b[i] for i in ids)
    if n == 0 or (len(am) <= 1 and len(bm) <= 1):
        return {"n": n, "mi": 0.0, "nmi": 1.0, "ari": 1.0}
    mi = sum(
        nij / n * math.log(n * nij / (am[a] * bm[b]))
        for (a, b), nij in cont.items()
    )
    ha = -sum(c / n * math.log(c / n) for c in am.values())
    hb = -sum(c / n * math.log(c / n) for c in bm.values())
    nmi = 0.0 if ha * hb <= 0 else mi / math.sqrt(ha * hb)
    pair_ij = sum(c * (c - 1) / 2 for c in cont.values())
    pa = sum(c * (c - 1) / 2 for c in am.values())
    pb = sum(c * (c - 1) / 2 for c in bm.values())
    total = n * (n - 1) / 2
    expected = pa * pb / total if total else 0.0
    denom = (pa + pb) / 2 - expected
    ari = 1.0 if denom == 0 else (pair_ij - expected) / denom
    return {"n": n, "mi": mi, "nmi": nmi, "ari": ari}


def test_partition_agreement_vs_reference(spark):
    from linkgraph import partition_agreement

    a = {x: l for x, l in zip("abcdef", [0, 0, 0, 1, 1, 1])}
    b = {x: l for x, l in zip("abcdef", [0, 0, 1, 1, 2, 2])}
    got = partition_agreement(
        _labels(spark, a), _labels(spark, b), label_col_a="label", label_col_b="label"
    )
    want = _agreement_reference(a, b)
    assert got["n"] == 6
    for k in ("mi", "nmi", "ari"):
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_partition_agreement_identical_and_degenerate(spark):
    from linkgraph import partition_agreement

    a = {x: l for x, l in zip("abcdef", [0, 0, 1, 1, 2, 2])}
    got = partition_agreement(
        _labels(spark, a), _labels(spark, a), label_col_a="label", label_col_b="label"
    )
    assert got["nmi"] == pytest.approx(1.0, abs=1e-12)
    assert got["ari"] == pytest.approx(1.0, abs=1e-12)

    # both trivial (single cluster) -> perfect agreement by convention
    one = {x: 0 for x in "abc"}
    got = partition_agreement(
        _labels(spark, one), _labels(spark, one), label_col_a="label", label_col_b="label"
    )
    assert got == {"n": 3, "mi": 0.0, "nmi": 1.0, "ari": 1.0}

    # exactly one trivial side -> nmi 0 (sqrt normalizer is 0)
    split = {"a": 0, "b": 1, "c": 2}
    got = partition_agreement(
        _labels(spark, one), _labels(spark, split), label_col_a="label", label_col_b="label"
    )
    assert got["nmi"] == 0.0

    # disjoint id sets -> empty join
    got = partition_agreement(
        _labels(spark, {"x": 0}), _labels(spark, {"y": 0}),
        label_col_a="label", label_col_b="label",
    )
    assert got["n"] == 0


def test_partition_agreement_only_co_labeled_ids(spark):
    from linkgraph import partition_agreement

    a = {x: l for x, l in zip("abcdef", [0, 0, 0, 1, 1, 1])}
    b = {x: l for x, l in zip("abcd", [0, 0, 1, 1])}
    got = partition_agreement(
        _labels(spark, a), _labels(spark, b), label_col_a="label", label_col_b="label"
    )
    want = _agreement_reference(a, {k: b[k] for k in "abcd"})
    assert got["n"] == 4
    for k in ("mi", "nmi", "ari"):
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
