"""resolve_redirects — pointer-doubling chain resolution + cycle flags."""

import pytest
from pyspark.sql import functions as F

from linkgraph import resolve_redirects


def _df(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _by_id(df):
    return {
        r["id"]: (r["target"], r["hops"], r["on_cycle"]) for r in df.collect()
    }


def test_long_chain_resolves_with_exact_hops(spark):
    # chain u0 -> u1 -> ... -> u9 (terminal u9): hops(u_i) = 9 - i
    rows = [(f"u{i}", f"u{i+1}") for i in range(9)]
    out = _by_id(resolve_redirects(_df(spark, rows)))
    for i in range(10):
        assert out[f"u{i}"] == ("u9", 9 - i, False)


def test_tree_of_chains_converges_to_one_terminal(spark):
    # two branches merging: a->c, b->c, c->t
    out = _by_id(
        resolve_redirects(_df(spark, [("a", "c"), ("b", "c"), ("c", "t")]))
    )
    assert out["a"] == ("t", 2, False)
    assert out["b"] == ("t", 2, False)
    assert out["c"] == ("t", 1, False)
    assert out["t"] == ("t", 0, False)


def test_cycle_and_feeders_flagged(spark):
    # 3-cycle x->y->z->x with a feeder f->x, plus a clean chain a->b
    rows = [("x", "y"), ("y", "z"), ("z", "x"), ("f", "x"), ("a", "b")]
    out = _by_id(resolve_redirects(_df(spark, rows)))
    for v in ("x", "y", "z", "f"):
        assert out[v] == (None, None, True), v
    assert out["a"] == ("b", 1, False)
    assert out["b"] == ("b", 0, False)


def test_self_redirect_is_a_cycle(spark):
    out = _by_id(resolve_redirects(_df(spark, [("s", "s"), ("q", "s")])))
    assert out["s"] == (None, None, True)
    assert out["q"] == (None, None, True)


def test_non_functional_map_rejected(spark):
    with pytest.raises(ValueError, match="not functional"):
        resolve_redirects(_df(spark, [("a", "b"), ("a", "c")]))


def test_round_budget_is_logarithmic(spark):
    # a 33-node chain must resolve within ceil(log2(33))+1 = 7 doubling
    # rounds — pass max_rounds=7 explicitly to pin the bound
    rows = [(f"c{i}", f"c{i+1}") for i in range(32)]
    out = _by_id(resolve_redirects(_df(spark, rows), max_rounds=7))
    assert out["c0"] == ("c32", 32, False)
    assert not any(v[2] for v in out.values())


def test_plan_python_free(spark):
    out = resolve_redirects(_df(spark, [("a", "b")]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_rewrite_edges_canonicalizes_and_collapses(spark):
    from linkgraph import rewrite_edges

    # redirects: a->b->T, c->T; cycle x->y->x
    resolved = resolve_redirects(
        _df(spark, [("a", "b"), ("b", "T"), ("c", "T"), ("x", "y"), ("y", "x")])
    )
    edges = spark.createDataFrame(
        [
            ("p", "a", 2.0),   # -> (p, T, 2)
            ("p", "c", 3.0),   # -> (p, T, 3): collapses with above -> 5
            ("a", "q", 1.0),   # src rewrites -> (T, q, 1)
            ("p", "x", 9.0),   # cycle-bound dst: dropped
            ("T", "b", 4.0),   # -> (T, T): self-loop, dropped
            ("m", "n", 7.0),   # neither endpoint in map: unchanged
        ],
        "src string, dst string, weight double",
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in rewrite_edges(edges, resolved).collect()
    }
    assert got == {("p", "T"): 5.0, ("T", "q"): 1.0, ("m", "n"): 7.0}


def test_rewrite_edges_keep_cycles_and_loops(spark):
    from linkgraph import rewrite_edges

    resolved = resolve_redirects(_df(spark, [("x", "y"), ("y", "x"), ("a", "T")]))
    edges = spark.createDataFrame(
        [("p", "x", 1.0), ("T", "a", 1.0)], "src string, dst string, weight double"
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in rewrite_edges(
            edges, resolved, drop_cycles=False, drop_self_loops=False
        ).collect()
    }
    # cycle endpoint keeps its original id; T->a rewrites to the T self-loop
    assert got == {("p", "x"): 1.0, ("T", "T"): 1.0}


def test_rewrite_edges_unweighted_counts(spark):
    from linkgraph import rewrite_edges

    resolved = resolve_redirects(_df(spark, [("a", "T")]))
    edges = _df(spark, [("p", "a"), ("p", "T")])
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in rewrite_edges(edges, resolved).collect()
    }
    assert got == {("p", "T"): 2.0}
