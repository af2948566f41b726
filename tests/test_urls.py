"""URL canonicalization + host/domain graph construction."""

from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline.urls import (
    host_graph,
    registered_domain,
    url_host,
    url_normalize,
    url_parts,
)

BATTERY = [
    "HTTPS://Site7.Example.CO.UK:443/p/7#top",
    "http://user:pw@site1.example.com:80",
    "https://site2.example.com:8443/x?q=2",
    "ftp://Host3.Org/path",
    "http://singlelabel5",
    "https://a.b.co.jp/",
    "http://www.example.com/a/b?x=1&y=2#frag",
]


def _one_col(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "url string")


def test_host_matches_stdlib(spark):
    df = url_parts(_one_col(spark, BATTERY))
    got = {r["url"]: r["host"] for r in df.collect()}
    for u in BATTERY:
        expect = urlsplit(u).hostname  # stdlib: lowercased, no port/userinfo
        assert got[u] == expect, u


def test_normalize_contract(spark):
    expected = {
        # default https port stripped, scheme+host lowercased, fragment gone
        "HTTPS://Site7.Example.CO.UK:443/p/7#top": "https://site7.example.co.uk/p/7",
        # userinfo stripped, default http port stripped, empty path -> /
        "http://user:pw@site1.example.com:80": "http://site1.example.com/",
        # non-default port kept, query kept
        "https://site2.example.com:8443/x?q=2": "https://site2.example.com:8443/x?q=2",
        "ftp://Host3.Org/path": "ftp://host3.org/path",
        "http://singlelabel5": "http://singlelabel5/",
        "https://a.b.co.jp/": "https://a.b.co.jp/",
        "http://www.example.com/a/b?x=1&y=2#frag": "http://www.example.com/a/b?x=1&y=2",
    }
    df = _one_col(spark, BATTERY).select("url", url_normalize("url").alias("n"))
    got = {r["url"]: r["n"] for r in df.collect()}
    assert got == expected


def test_non_urls_are_null(spark):
    bad = ["not a url", "", "relative/path", "mailto:x@y.z", "http//missing.colon"]
    df = url_parts(_one_col(spark, bad))
    for r in df.collect():
        assert r["host"] is None and r["url_normalized"] is None, r["url"]


def test_registered_domain(spark):
    cases = {
        "site7.example.co.uk": "example.co.uk",
        "a.b.co.jp": "b.co.jp",
        "www.example.com": "example.com",
        "example.com": "example.com",
        "singlelabel5": "singlelabel5",
        "deep.sub.tree.example.org": "example.org",
        "co.uk": "co.uk",  # bare suffix: only 2 labels exist -> itself
    }
    df = _one_col(spark, list(cases)).select(
        "url", registered_domain("url").alias("d")
    )
    got = {r["url"]: r["d"] for r in df.collect()}
    assert got == cases


def test_registered_domain_extra_suffixes(spark):
    df = _one_col(spark, ["x.web.example"]).select(
        registered_domain("url", extra_suffixes=("web.example",)).alias("d")
    )
    assert df.collect()[0]["d"] == "x.web.example"


def test_host_graph_rollup_and_weights(spark):
    pages = spark.createDataFrame(
        [
            ("http://A.com/1", "https://B.com/x"),
            ("http://a.com:80/2", "https://b.com:443/y#f"),  # same host pair
            ("http://a.com/3", "http://A.COM/4"),  # self-loop: dropped
            ("garbage", "http://b.com/z"),  # unparseable: dropped
            ("http://c.co.uk/", "http://b.com/"),
        ],
        "src_url string, dst_url string",
    )
    got = {(r["src"], r["dst"]): r["weight"] for r in host_graph(pages).collect()}
    assert got == {("a.com", "b.com"): 2, ("c.co.uk", "b.com"): 1}


def test_host_graph_domain_level_and_self_loop_keep(spark):
    pages = spark.createDataFrame(
        [
            ("http://x.shop.co.uk/1", "http://y.shop.co.uk/2"),
            ("http://x.shop.co.uk/1", "http://other.com/"),
        ],
        "src_url string, dst_url string",
    )
    lvl = host_graph(pages, level="registered_domain", drop_self_loops=False)
    got = {(r["src"], r["dst"]): r["weight"] for r in lvl.collect()}
    assert got == {("shop.co.uk", "shop.co.uk"): 1, ("shop.co.uk", "other.com"): 1}
    dropped = host_graph(pages, level="registered_domain")
    assert {(r["src"], r["dst"]) for r in dropped.collect()} == {
        ("shop.co.uk", "other.com")
    }
    with pytest.raises(ValueError, match="level"):
        host_graph(pages, level="page")


def test_plans_scan_fused_and_python_free(spark):
    df = url_parts(_one_col(spark, BATTERY))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan  # canonicalization is a pure projection
    hg = host_graph(
        spark.createDataFrame(
            [("http://a.com/", "http://b.com/")], "src_url string, dst_url string"
        )
    )
    hplan = hg._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in hplan
    # exactly the one algebraic shuffle, with a map-side partial aggregate
    assert hplan.count("Exchange") == 1
    assert "partial_count" in hplan


def test_anchor_profile_topk_and_ties(spark):
    from linkgraph.pipeline.urls import anchor_profile

    pages = spark.createDataFrame(
        [
            ("http://A.com/x", "Click Here"),
            ("http://a.com:80/y", "click now!"),
            ("http://a.com/z", "best widgets here"),
            ("garbage", "never counted"),
            ("http://b.co.uk/", "Widgets"),
        ],
        "dst_url string, anchor string",
    )
    out = anchor_profile(pages, k=2)
    got = {(r["dst"], r["rank"]): (r["term"], r["n"]) for r in out.collect()}
    # a.com terms: click=2, here=2, best=1, now=1, widgets=1
    # rank1 tie click/here -> 'click' by term asc
    assert got[("a.com", 1)] == ("click", 2)
    assert got[("a.com", 2)] == ("here", 2)
    assert got[("b.co.uk", 1)] == ("widgets", 1)
    assert all(r[1] <= 2 for r in got)


def test_anchor_profile_domain_level_merges_hosts(spark):
    from linkgraph.pipeline.urls import anchor_profile

    pages = spark.createDataFrame(
        [
            ("http://x.shop.co.uk/1", "deal"),
            ("http://y.shop.co.uk/2", "deal"),
        ],
        "dst_url string, anchor string",
    )
    out = anchor_profile(pages, k=1, level="registered_domain").collect()
    assert len(out) == 1 and out[0]["dst"] == "shop.co.uk" and out[0]["n"] == 2


def test_anchor_profile_plans_window_group_limit(spark):
    import pytest as _pytest

    from linkgraph.pipeline.urls import anchor_profile

    pages = spark.createDataFrame(
        [("http://a.com/", "x")], "dst_url string, anchor string"
    )
    plan = (
        anchor_profile(pages, k=3)._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan and ", Partial" in plan
    assert "EvalPython" not in plan
    with _pytest.raises(ValueError, match="k must"):
        anchor_profile(pages, k=0)


def test_url_path_segments(spark):
    from linkgraph.pipeline.urls import url_path_segments

    cases = {
        "http://a.com/x/y/z": ["x", "y", "z"],
        "http://a.com//x///y": ["x", "y"],  # empty segments collapse
        "http://a.com/x?q=1/notpath": ["x"],  # query excluded
        "http://a.com/x#frag/no": ["x"],  # fragment excluded
        "http://a.com": [],
        "garbage": None,
    }
    df = _one_col(spark, list(cases)).select(
        "url", url_path_segments("url").alias("s")
    )
    got = {r["url"]: r["s"] for r in df.collect()}
    assert got == cases


def test_path_prefix_counts(spark):
    from linkgraph.pipeline.urls import path_prefix_counts

    urls = [
        "http://a.com/docs/api/v1",
        "http://A.com/docs/api/v2",
        "http://a.com/docs/guide",
        "http://a.com/blog",
        "http://a.com/",
        "http://b.com/x",
        "garbage",
    ]
    out = path_prefix_counts(_one_col(spark, urls), max_depth=2)
    got = {(r["host"], r["prefix"], r["depth"]): r["n_pages"] for r in out.collect()}
    assert got == {
        ("a.com", "/", 0): 5,
        ("a.com", "/docs", 1): 3,
        ("a.com", "/docs/api", 2): 2,
        ("a.com", "/docs/guide", 2): 1,
        ("a.com", "/blog", 1): 1,
        ("b.com", "/", 0): 1,
        ("b.com", "/x", 1): 1,
    }


def test_path_prefix_counts_depth_zero_and_validation(spark):
    from linkgraph.pipeline.urls import path_prefix_counts

    out = path_prefix_counts(
        _one_col(spark, ["http://a.com/x/y"]), max_depth=0
    ).collect()
    assert len(out) == 1 and out[0]["prefix"] == "/" and out[0]["n_pages"] == 1
    with pytest.raises(ValueError, match="max_depth"):
        path_prefix_counts(_one_col(spark, ["http://a.com/"]), max_depth=-1)


def test_userinfo_stripped_at_last_at(spark):
    # dirty-crawl case: unencoded '@' inside the password — urllib cuts
    # userinfo at the LAST '@' (netloc.rpartition), and so must we
    from urllib.parse import urlsplit

    from linkgraph.pipeline.urls import url_host

    raw = "http://user:p@ss@example.com/x"
    df = spark.createDataFrame([(raw,)], ["url"])
    got = df.select(url_host("url").alias("h")).collect()[0]["h"]
    assert got == urlsplit(raw).hostname == "example.com"
