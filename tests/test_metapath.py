"""metapath_walks — typed walks, md5-gumbel replay parity."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.metapath import metapath_walks
from linkgraph.graph import LinkGraph

EDGES = [
    # A -> B
    ("a1", "b1", 1.0), ("a1", "b2", 100.0),
    ("a2", "b2", 1.0), ("a2", "b3", 1.0),
    # B -> C (b3 is a dead end for step 2)
    ("b1", "c1", 1.0), ("b1", "c2", 2.0), ("b2", "c1", 1.0),
    # noise that must never be walked: wrong types / directions
    ("c1", "a1", 9.0), ("b2", "a2", 9.0),
]
TYPES = {
    "a1": "A", "a2": "A", "b1": "B", "b2": "B", "b3": "B",
    "c1": "C", "c2": "C",
}


def _g(spark):
    g = LinkGraph(
        spark.createDataFrame(EDGES, "src string, dst string, weight double"),
        keys={"directed": True},
    )
    t = spark.createDataFrame(list(TYPES.items()), "id string, type string")
    return g, t


def _key(seed, walk, step, dst, w):
    u60 = int(
        hashlib.md5(f"mp:{seed}:{walk}:{step}:{dst}".encode()).hexdigest()[:15],
        16,
    )
    u = (u60 + 0.5) / 2**60
    return math.log(w) + (-math.log(-math.log(u)))


def _replay(seed, walks_per_node, metapath):
    """Independent pure-python replay of the sampler."""
    out = {}
    adj = {}
    for s, d, w in EDGES:
        adj.setdefault(s, []).append((d, w))
    starts = [n for n, t in sorted(TYPES.items()) if t == metapath[0]]
    for start in starts:
        for rep in range(walks_per_node):
            wid = f"{start}#{rep}"
            path, curr = [start], start
            for step in range(len(metapath) - 1):
                cands = [
                    (d, w)
                    for d, w in adj.get(curr, [])
                    if TYPES[d] == metapath[step + 1]
                ]
                if not cands:
                    curr = None
                    break
                curr = max(
                    cands, key=lambda c: (_key(seed, wid, step, c[0], c[1]), c[0])
                )[0]
                path.append(curr)
            out[wid] = path
    return out


@pytest.mark.parametrize("seed,reps", [(42, 1), (7, 3)])
def test_walks_match_pure_python_replay(spark, seed, reps):
    g, t = _g(spark)
    got = {
        r["walk_id"]: list(r["path"])
        for r in metapath_walks(g, t, ["A", "B", "C"], reps, seed=seed).collect()
    }
    assert got == _replay(seed, reps, ["A", "B", "C"])


def test_types_and_dead_ends_respected(spark):
    g, t = _g(spark)
    rows = {
        r["walk_id"]: r
        for r in metapath_walks(g, t, ["A", "B", "C"], 1, seed=1).collect()
    }
    assert set(rows) == {"a1#0", "a2#0"}
    for r in rows.values():
        p = list(r["path"])
        assert TYPES[p[0]] == "A"
        for i, node in enumerate(p):
            assert TYPES[node] == ["A", "B", "C"][i]
        # a walk through b3 has no B->C edge: frozen, incomplete
        assert r["completed"] == (len(p) == 3)


def test_determinism_across_runs(spark):
    g, t = _g(spark)
    a = sorted(
        (r["walk_id"], tuple(r["path"]))
        for r in metapath_walks(g, t, ["A", "B"], 2, seed=9).collect()
    )
    b = sorted(
        (r["walk_id"], tuple(r["path"]))
        for r in metapath_walks(g, t, ["A", "B"], 2, seed=9).collect()
    )
    assert a == b


def test_validation(spark):
    g, t = _g(spark)
    with pytest.raises(ValueError, match="two types"):
        metapath_walks(g, t, ["A"])
    with pytest.raises(ValueError, match="walks_per_node"):
        metapath_walks(g, t, ["A", "B"], 0)


def _ps_expect():
    """Pure-python PathSim over EDGES for metapath [A, B, A]."""
    from collections import defaultdict

    n = defaultdict(float)
    for s, d, _ in EDGES:
        if TYPES[s] == "A" and TYPES[d] == "B":
            n[(s, d)] += 1
    xs = sorted({x for (x, _) in n})
    bs = sorted({b for (_, b) in n})
    C = {}
    for x in xs:
        for y in xs:
            C[(x, y)] = sum(n.get((x, b), 0) * n.get((y, b), 0) for b in bs)
    out = {}
    for x in xs:
        for y in xs:
            if x < y and C[(x, y)] > 0:
                out[(x, y)] = 2 * C[(x, y)] / (C[(x, x)] + C[(y, y)])
    return out


def test_pathsim_matches_formula(spark):
    from linkgraph.algorithms.metapath import pathsim

    g, t = _g(spark)
    got = {
        (r["x"], r["y"]): r["pathsim"]
        for r in pathsim(g, t, ["A", "B", "A"]).collect()
    }
    expect = _ps_expect()
    assert set(got) == set(expect)
    for kk, v in expect.items():
        assert got[kk] == pytest.approx(v, rel=1e-12), kk


def test_pathsim_topk_covers_both_orientations(spark):
    from linkgraph.algorithms.metapath import pathsim

    g, t = _g(spark)
    got = {
        (r["x"], r["y"]): r["rank"]
        for r in pathsim(g, t, ["A", "B", "A"], k=5).collect()
    }
    # every canonical pair appears in BOTH nodes' lists
    for x, y in _ps_expect():
        assert (x, y) in got and (y, x) in got


def test_pathsim_bridge_cap_drops_hub_bridges(spark):
    from linkgraph.algorithms.metapath import pathsim

    g, t = _g(spark)
    # b2 is shared by a1 and a2 (2 distinct A-neighbors); cap=1 kills it,
    # removing the only a1~a2 bridge
    out = pathsim(g, t, ["A", "B", "A"], bridge_cap=1).collect()
    assert out == []


def test_pathsim_validation(spark):
    from linkgraph.algorithms.metapath import pathsim

    g, t = _g(spark)
    with pytest.raises(ValueError, match="symmetric"):
        pathsim(g, t, ["A", "B", "C"])
    with pytest.raises(ValueError, match="k must"):
        pathsim(g, t, ["A", "B", "A"], k=0)


def test_parallel_edges_sum_before_sampling(spark):
    # ADVICE r4: parallel (u, v) edges share (walk, step, dst)-keyed gumbel
    # noise, so without pre-aggregation the draw is proportional to max(w)
    # instead of sum(w). The documented multigraph convention is SUM:
    # a1 with edges {b1: 60+60 (parallel), b2: 100} must sample exactly as
    # a simple graph with {b1: 120, b2: 100}.
    t = spark.createDataFrame(
        [("a1", "A"), ("b1", "B"), ("b2", "B")], "id string, type string"
    )
    multi = LinkGraph(
        spark.createDataFrame(
            [("a1", "b1", 60.0), ("a1", "b1", 60.0), ("a1", "b2", 100.0)],
            "src string, dst string, weight double",
        ),
        keys={"directed": True},
    )
    simple = LinkGraph(
        spark.createDataFrame(
            [("a1", "b1", 120.0), ("a1", "b2", 100.0)],
            "src string, dst string, weight double",
        ),
        keys={"directed": True},
    )
    for seed in (1, 7, 23):
        got_m = sorted(
            (r["walk_id"], tuple(r["path"]))
            for r in metapath_walks(multi, t, ["A", "B"], 4, seed=seed).collect()
        )
        got_s = sorted(
            (r["walk_id"], tuple(r["path"]))
            for r in metapath_walks(simple, t, ["A", "B"], 4, seed=seed).collect()
        )
        assert got_m == got_s


def test_pathsim_releases_its_pin(spark):
    """pathsim pins the count table internally; the pin must not outlive
    the call (one leaked persisted table per call otherwise)."""
    from linkgraph import LinkGraph
    from linkgraph.algorithms.metapath import pathsim
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [("s1", "p1"), ("s2", "p1"), ("s2", "p2"), ("s3", "p2")],
        ["src", "dst"],
    )
    g = LinkGraph(e, keys={"directed": True})
    types = g.nodes.select(
        "id", F.upper(F.substring("id", 1, 1)).alias("type")
    )
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    out = pathsim(g, types, ["S", "P", "S"], k=3)
    assert out.count() > 0  # result survives the released pin
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after <= before
