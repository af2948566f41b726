"""DSIR importance weights + Gumbel-top-k resampling: python replay
parity, OOV symmetry, determinism, guards."""

import math
import random
from collections import Counter

import pytest

from linkgraph.pipeline.text import importance_resample, importance_weights


def _docs(spark, corp):
    return spark.createDataFrame(
        [(i, t) for i, t in corp.items()], "doc_id long, text string"
    )


def _replay(corp, target_ids, a=1.0):
    tgt = Counter(w for d in target_ids for w in corp[d].split())
    src = Counter(w for d in corp for w in corp[d].split())
    V = len(set(tgt) | set(src))
    Nt, Ns = sum(tgt.values()), sum(src.values())
    out = {}
    for d, t in corp.items():
        toks = t.split()
        if not toks:
            continue
        out[d] = sum(
            math.log((tgt[w] + a) / (Nt + a * V))
            - math.log((src[w] + a) / (Ns + a * V))
            for w in toks
        )
    return out


def test_python_replay_parity(spark):
    rng = random.Random(0)
    vocab = [f"w{i}" for i in range(30)]
    corp = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 15)))
        for i in range(40)
    }
    corp[40] = ""  # empty doc: no row
    docs = _docs(spark, corp)
    target_ids = [i for i in range(40) if i % 5 == 0]
    got = {
        r["doc_id"]: r["log_ratio"]
        for r in importance_weights(
            docs, docs.filter(docs.doc_id.isin(target_ids))
        ).collect()
    }
    want = _replay(corp, target_ids)
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, d


def test_oov_only_doc_gets_length_constant(spark):
    # a doc whose tokens appear in NEITHER corpus model contributes only
    # the per-token normalization constant n·ln((Ns+aV)/(Nt+aV))
    corp = {1: "a b", 2: "a c", 3: "zz zz zz"}
    docs = _docs(spark, corp)
    target = docs.filter("doc_id = 1")
    got = {
        r["doc_id"]: r["log_ratio"]
        for r in importance_weights(docs, target).collect()
    }
    want = _replay(corp, [1])
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9
    # the zz-doc's own tokens ARE in the source model (it is part of the
    # pool): verify against the replay rather than assuming pure-constant


def test_resample_deterministic_and_seed_sensitive(spark):
    rng = random.Random(1)
    corp = {
        i: " ".join(rng.choice("abcdefgh") for _ in range(8)) for i in range(30)
    }
    docs = _docs(spark, corp)
    target = docs.filter("doc_id < 5")
    r1 = [r["doc_id"] for r in importance_resample(docs, target, k=6, seed=3).collect()]
    r2 = [r["doc_id"] for r in importance_resample(docs, target, k=6, seed=3).collect()]
    assert r1 == r2 and len(r1) == 6
    r3 = [r["doc_id"] for r in importance_resample(docs, target, k=6, seed=4).collect()]
    assert r1 != r3  # 8^30 corpora: identical draws would be a seed bug


def test_resample_k_exceeding_pool_returns_all_scored_docs(spark):
    corp = {1: "a", 2: "b", 3: ""}
    docs = _docs(spark, corp)
    got = importance_resample(docs, docs.filter("doc_id = 1"), k=10).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 2]  # empty doc has no row


def test_resample_favors_high_weight(spark):
    # one doc matches the target exactly, the rest are far: with k=1 the
    # matching doc must win for every seed (its log-weight dominates the
    # Gumbel noise scale)
    corp = {0: "x x x x x x x x x x x x x x x x x x x x"}
    corp.update({i: "y z " * 10 for i in range(1, 10)})
    docs = _docs(spark, corp)
    target = _docs(spark, {99: "x x x x x x"}).select("doc_id", "text")
    for seed in (1, 2, 3):
        got = importance_resample(docs, target, k=1, seed=seed).collect()
        assert [r["doc_id"] for r in got] == [0], seed


def test_guards(spark):
    docs = _docs(spark, {1: "a"})
    with pytest.raises(ValueError, match="smoothing"):
        importance_weights(docs, docs, smoothing=0.0)
    with pytest.raises(ValueError, match="k must be"):
        importance_resample(docs, docs, k=0)


def test_no_python_eval(spark):
    docs = _docs(spark, {1: "a b", 2: "c"})
    plan = importance_resample(docs, docs.filter("doc_id = 1"), k=1)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
