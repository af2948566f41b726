"""association_rules: hand-computed closed forms, python brute replay,
threshold/cap behavior, guards."""

import itertools
from collections import defaultdict

import pytest

from linkgraph.pipeline.rules import association_rules


def _df(spark, baskets):
    rows = [(g, i) for g, items in baskets.items() for i in items]
    return spark.createDataFrame(rows, "basket long, item string")


def _brute(baskets, min_support):
    n = len(baskets)
    item = defaultdict(int)
    pair = defaultdict(int)
    for items in baskets.values():
        s = sorted(set(items))
        for i in s:
            item[i] += 1
        for x, y in itertools.combinations(s, 2):
            pair[(x, y)] += 1
    out = {}
    for (x, y), pb in pair.items():
        if pb / n >= min_support:
            for a, c in ((x, y), (y, x)):
                out[(a, c)] = (
                    pb,
                    pb / n,
                    pb / item[a],
                    pb * n / (item[a] * item[c]),
                )
    return out


def test_closed_form(spark):
    baskets = {
        1: ["bread", "milk"],
        2: ["bread", "milk", "eggs"],
        3: ["bread"],
        4: ["milk"],
    }
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(_df(spark, baskets), "basket", "item", 0.0).collect()
    }
    r = got[("bread", "milk")]
    assert r["pair_baskets"] == 2
    assert r["support"] == pytest.approx(0.5)
    assert r["confidence"] == pytest.approx(2 / 3)   # bread in 3 baskets
    assert r["lift"] == pytest.approx((2 / 4) / ((3 / 4) * (3 / 4)))
    r2 = got[("milk", "bread")]
    assert r2["confidence"] == pytest.approx(2 / 3)
    assert r2["lift"] == pytest.approx(r["lift"])    # lift symmetric


@pytest.mark.parametrize("min_support", [0.0, 0.3, 0.6])
def test_brute_replay(spark, min_support):
    import random

    rng = random.Random(5)
    baskets = {
        g: rng.sample("abcdefgh", rng.randint(1, 5)) for g in range(40)
    }
    want = _brute(baskets, min_support)
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(
            _df(spark, baskets), "basket", "item", min_support
        ).collect()
    }
    assert set(got) == set(want)
    for k, (pb, sup, conf, lift) in want.items():
        r = got[k]
        assert r["pair_baskets"] == pb
        assert r["support"] == pytest.approx(sup, abs=1e-12)
        assert r["confidence"] == pytest.approx(conf, abs=1e-12)
        assert r["lift"] == pytest.approx(lift, abs=1e-12)


def test_min_confidence_filters(spark):
    baskets = {1: ["a", "b"], 2: ["a"], 3: ["a"], 4: ["a", "b"]}
    out = association_rules(
        _df(spark, baskets), "basket", "item", 0.0, min_confidence=0.9
    ).collect()
    # b->a has confidence 1.0; a->b only 0.5
    assert [(r["antecedent"], r["consequent"]) for r in out] == [("b", "a")]


def test_cap_bounds_hub_basket(spark):
    # one mega-basket with 6 items, cap=3: only the 3 lexicographically
    # first items pair up (3 pairs); item supports stay uncapped
    baskets = {1: list("abcdef"), 2: ["a", "z"]}
    out = association_rules(_df(spark, baskets), "basket", "item", 0.0, cap=3)
    got = {(r["antecedent"], r["consequent"]) for r in out.collect()}
    assert got == {("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
                   ("b", "c"), ("c", "b"), ("a", "z"), ("z", "a")}


def test_guards(spark):
    df = _df(spark, {1: ["a"]})
    with pytest.raises(ValueError):
        association_rules(df, "basket", "item", -0.1)
    empty = spark.createDataFrame([], "basket long, item string")
    with pytest.raises(ValueError):
        association_rules(empty, "basket", "item", 0.1)
