"""Estimator-class API parity (reference BaseClass, core/base.py:4-45):
get_params() from the constructor signature, repr as ClassName(k=v, ...),
str() listing fitted attributes; fit() stores scikit-style *_ results that
agree with the functional API."""

import pytest
from pyspark.sql import functions as F

from linkgraph import (
    Embeddings,
    GraphEmbedding,
    LinkGraph,
    LouvainCommunities,
    Node2Vec,
    SparkRandomWalker,
    SparkSpreadingActivation,
    SpectralClustering,
    Transition,
)


@pytest.fixture(scope="module")
def two_clique(spark):
    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((f"n{base+i}", f"n{base+j}", 1.0))
    edges.append(("n0", "n4", 0.1))
    return LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]))


def test_get_params_and_repr():
    lc = LouvainCommunities(max_pass=3)
    p = lc.get_params()
    assert p["max_pass"] == 3 and p["min_modularity_gain"] == 1e-3
    assert list(p) == sorted(p)  # sorted-name contract
    assert repr(lc).startswith("LouvainCommunities(")
    assert "max_pass=3" in repr(lc)
    s = str(lc)
    assert "Object of class LouvainCommunities" in s
    assert "State attributes" not in s  # unfitted

    sc = SpectralClustering(n_clusters=4)
    assert sc.get_params() == {"n_clusters": 4, "max_iterations": 10}
    assert repr(Transition()) == "Transition()"

    n2v = Node2Vec(dimension=16)
    assert n2v.get_params()["dimension"] == 16
    assert "w2v_min_count" in n2v.get_params()
    # get_params must report USER-PASSED values, not signature defaults
    emb = Embeddings(dimension=4, mean=2.0, sd=0.5, seed=7)
    p = emb.get_params()
    assert p["mean"] == 2.0 and p["sd"] == 0.5 and p["seed"] == 7
    assert repr(Embeddings(dimension=4)).startswith("Embeddings(")
    assert GraphEmbedding(dimension=4, n_jumps=10).get_params()["n_jumps"] == 10


def test_louvain_estimator_fit(two_clique):
    lc = LouvainCommunities().fit(two_clique)
    assert lc.modularity_ > 0.3
    labs = {r["id"]: r["cluster"] for r in lc.labels_.select("id", "cluster").collect()}
    assert len(set(labs.values())) == 2
    assert "State attributes" in str(lc) and "modularity_" in str(lc)


def test_spectral_estimator_fit(two_clique):
    sc = SpectralClustering(n_clusters=2, max_iterations=20).fit(two_clique)
    labs = {r["id"]: r["cluster"] for r in sc.labels_.collect()}
    a = {labs[f"n{i}"] for i in range(4)}
    b = {labs[f"n{i}"] for i in range(4, 8)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_transition_estimator(spark):
    g = LinkGraph(spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"]))
    t = Transition().fit(g)
    probs = {(r["src"], r["dst"]): r["prob"] for r in t.matrix_.collect()}
    assert probs[("a", "b")] == pytest.approx(0.5)
    assert probs[("c", "c")] == pytest.approx(1.0)  # dangling self-loop
    p2 = {(r["src"], r["dst"]): r["prob"] for r in t.to_power(2).collect()}
    assert p2[("a", "c")] == pytest.approx(1.0)  # a→b→c plus a→c→c
    with pytest.raises(ValueError, match="fit"):
        Transition().to_power(2)


def test_transition_to_pandas_reference_parity(spark):
    """Every assertion of the reference's TestTransition.test_to_pandas
    (unit_tests/test_ml_transition.py:75-127) on the same F5 graph."""
    import re

    edges = [("Madrid", "Bilbao", 50.0), ("Madrid", "Barcelona", 50.0),
             ("Bilbao", "Santander", 25.0), ("Bilbao", "Algorta", 75.0),
             ("Barcelona", "Reus", 25.0), ("Barcelona", "Andorra", 75.0)]
    g = LinkGraph(spark.createDataFrame(edges, ["src", "dst", "weight"]),
                  keys={"src": "src", "dst": "dst", "weight": "weight"})
    T = Transition()
    with pytest.raises(ValueError,
                       match=re.escape("Error: fit() must be called first.")):
        T.to_pandas(num_iterations=0)
    T.fit(g)

    tm = T.to_pandas()  # fit() parity assertions (reference :71)
    assert tm.loc["Madrid", "Bilbao"] == 0.5 and tm.loc["Algorta", "Algorta"] == 1

    tm = T.to_pandas(num_iterations=0)
    assert tm.loc["Madrid", "Bilbao"] == 0 and tm.loc["Andorra", "Andorra"] == 1

    tm = T.to_pandas(num_iterations=1)
    assert tm["Madrid"].sum() == 0 and tm["Barcelona"].sum() == 0.5
    assert (tm.loc["Madrid", "Algorta"] == 0
            and tm.loc["Bilbao", "Algorta"] == 0.75
            and tm.loc["Reus", "Reus"] == 1)

    for k in (2, 2000):
        tm = T.to_pandas(num_iterations=k)
        assert (tm["Madrid"].sum() == 0 and tm["Barcelona"].sum() == 0
                and tm["Bilbao"].sum() == 0)
        assert (tm.loc["Madrid", "Algorta"] == 0.375
                and tm.loc["Madrid", "Reus"] == 0.125)

    with pytest.raises(ValueError, match="guarded"):
        T.to_pandas(num_iterations=1, max_nodes=3)


def test_walker_and_spread_estimators(spark):
    g = LinkGraph(spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["src", "dst"]))
    rw = SparkRandomWalker(num_epochs=2)
    paths = rw.fit_predict(g, "a")
    assert paths is rw.paths_
    walks = [r["random_walks"] for r in paths.collect()]
    assert ["a", "b", "c"] in walks

    sa = SparkSpreadingActivation(attribute="inf", steps=1).fit(g, ["a"])
    cols = sa.influences_.columns
    assert "inf" in cols and "influence" not in cols
    total = sa.influences_.agg(F.sum("inf")).collect()[0][0]
    assert total == pytest.approx(1.0)
