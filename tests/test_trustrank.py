"""trustrank / spam_mass — seed-propagated trust (VLDB'04/'06 semantics)."""

import pytest
from pyspark.sql import functions as F

from linkgraph import pagerank, spam_mass, trustrank
from linkgraph.graph import LinkGraph


def _g(spark, rows, directed=False):
    df = spark.createDataFrame(rows, "src string, dst string")
    return LinkGraph(df, keys={"directed": directed})


def _two_triangles(spark):
    return _g(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z")],
    )


def test_trustrank_closed_form_with_dangling(spark):
    # directed s->a, seed {s}: a is dangling, its mass returns to the seed.
    # Fixpoint: tr(s) = 1/(1+d), tr(a) = d/(1+d).
    g = _g(spark, [("s", "a")], directed=True)
    out = {
        r["id"]: r["trustrank"]
        for r in trustrank(g, ["s"], damping=0.85, tol=1e-12, max_iter=300).collect()
    }
    assert out["s"] == pytest.approx(1 / 1.85, abs=1e-9)
    assert out["a"] == pytest.approx(0.85 / 1.85, abs=1e-9)


def test_unreachable_component_gets_zero_trust(spark):
    g = _two_triangles(spark)
    out = {
        r["id"]: r["trustrank"]
        for r in trustrank(g, ["a"], tol=1e-10, max_iter=200).collect()
    }
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)
    for v in ("x", "y", "z"):
        assert out[v] == 0.0
    assert out["a"] > out["b"] > 0  # seed holds the teleport


def test_seed_weight_normalization_invariance(spark):
    g = _two_triangles(spark)
    t1 = {r["id"]: r["trustrank"] for r in trustrank(g, {"a": 1.0, "b": 3.0}).collect()}
    t2 = {r["id"]: r["trustrank"] for r in trustrank(g, {"a": 2.0, "b": 6.0}).collect()}
    assert t1 == t2


def test_all_seeds_means_zero_spam_mass(spark):
    g = _two_triangles(spark)
    out = spam_mass(
        g, ["a", "b", "c", "x", "y", "z"], tol=1e-12, max_iter=300
    ).collect()
    for r in out:
        assert r["spam_mass"] == pytest.approx(0.0, abs=1e-9)
        assert r["relative_spam_mass"] == pytest.approx(0.0, abs=1e-6)
        assert r["trustrank"] == pytest.approx(r["pagerank"], abs=1e-9)


def test_spam_mass_flags_untrusted_component(spark):
    g = _two_triangles(spark)
    out = {r["id"]: r for r in spam_mass(g, ["a"], tol=1e-10, max_iter=200).collect()}
    # x/y/z receive zero trust: their whole rank is spam mass
    for v in ("x", "y", "z"):
        assert out[v]["relative_spam_mass"] == pytest.approx(1.0, abs=1e-9)
        assert out[v]["trustrank"] == 0.0
    # within the trusted component, relative mass orders by trust received:
    # seed < non-seed < untrusted (=1). Absolute mass stays positive here —
    # a 1-node core holds only 1/6 of the total teleport mass.
    assert out["a"]["relative_spam_mass"] < out["b"]["relative_spam_mass"] < 1.0
    # trustrank column carries the paper's n_g/N scaling (total = 1/6 here)
    total_tr = sum(r["trustrank"] for r in out.values())
    assert total_tr == pytest.approx(1 / 6, abs=1e-9)


def test_spam_mass_matches_manual_composition(spark):
    g = _two_triangles(spark)
    out = {r["id"]: r for r in spam_mass(g, ["a", "x"], tol=0.0, max_iter=4).collect()}
    pr = {r["id"]: r["pagerank"] for r in pagerank(g, tol=0.0, max_iter=4).ranks.collect()}
    tr = {
        r["id"]: r["trustrank"]
        for r in trustrank(g, ["a", "x"], tol=0.0, max_iter=4).collect()
    }
    for v, r in out.items():
        assert r["pagerank"] == pytest.approx(pr[v], abs=1e-12)
        assert r["trustrank"] == pytest.approx(tr[v] * 2 / 6, abs=1e-12)


def test_validation(spark):
    g = _two_triangles(spark)
    with pytest.raises(ValueError, match="non-empty"):
        trustrank(g, [])
    with pytest.raises(ValueError, match="no mass|no good seed"):
        spam_mass(g, ["phantom"])
    with pytest.raises(ValueError, match="no mass"):
        trustrank(g, ["phantom"])


def test_spam_mass_rejects_weighted_seed_dict(spark):
    # ADVICE r4: the n_good/N rescale is only the paper's PR_good under
    # UNIFORM good-core teleport; a weighted dict must be rejected, not
    # silently miscomputed.
    import pytest as _pytest

    from linkgraph.algorithms.trustrank import spam_mass

    g = LinkGraph(
        spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string"
        ),
        keys={"directed": True},
    )
    with _pytest.raises(ValueError, match="uniform"):
        spam_mass(g, {"a": 0.9, "b": 0.1}, max_iter=3)
    # equal-weight dicts are uniform — allowed (equivalent to a list)
    cols = spam_mass(g, {"a": 1.0, "b": 1.0}, max_iter=3).columns
    assert "spam_mass" in cols
