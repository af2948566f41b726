"""Property-based invariants (hypothesis) on randomly generated graphs —
complements the exact-fixture strategy (SURVEY §5) with algebraic laws that
must hold for EVERY input: rank conservation, method agreement, orientation
invariance."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from linkgraph import LinkGraph, connected_components, pagerank, triangle_count

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=30,
    unique=True,
)

PROP = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(edges=edge_lists)
@PROP
def test_pagerank_mass_conserved(spark, edges):
    df = spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges], ["src", "dst"])
    res = pagerank(LinkGraph(df), tol=0.0, max_iter=4)
    rows = res.ranks.collect()
    total = sum(r["pagerank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-9)  # dangling mass never leaks
    assert all(r["pagerank"] > 0 for r in rows)


@given(edges=edge_lists)
@PROP
def test_cc_methods_agree(spark, edges):
    df = spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges], ["src", "dst"])
    g = LinkGraph(df)
    # strategy pinned: this law compares the two DISTRIBUTED algorithms —
    # the auto gate would otherwise route both tiny inputs to the local plan
    a = {r["id"]: r["component"] for r in
         connected_components(g, method="two_star", with_sizes=False,
                              strategy="distributed").collect()}
    b = {r["id"]: r["component"] for r in
         connected_components(g, method="min_label", with_sizes=False,
                              strategy="distributed").collect()}
    # identical partitions — both label with the component-min id, so exact
    assert a == b


@given(edges=edge_lists)
@PROP
def test_cc_local_matches_distributed(spark, edges):
    df = spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges], ["src", "dst"])
    g = LinkGraph(df)
    loc = {r["id"]: r["component"] for r in
           connected_components(g, with_sizes=False, strategy="local").collect()}
    dist = {r["id"]: r["component"] for r in
            connected_components(g, with_sizes=False,
                                 strategy="distributed").collect()}
    assert loc == dist


@given(edges=edge_lists)
@PROP
def test_pagerank_local_matches_distributed(spark, edges):
    df = spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges], ["src", "dst"])
    g = LinkGraph(df)
    loc = {r["id"]: r["pagerank"] for r in
           pagerank(g, tol=0.0, max_iter=4, strategy="local").ranks.collect()}
    dist = {r["id"]: r["pagerank"] for r in
            pagerank(g, tol=0.0, max_iter=4, strategy="distributed").ranks.collect()}
    assert set(loc) == set(dist)
    assert all(abs(loc[k] - dist[k]) < 1e-12 for k in loc)


@given(edges=edge_lists, data=st.data())
@PROP
def test_triangle_count_orientation_invariant(spark, edges, data):
    flips = data.draw(st.lists(st.booleans(), min_size=len(edges), max_size=len(edges)))
    oriented = [(f"n{b}", f"n{a}") if f else (f"n{a}", f"n{b}")
                for (a, b), f in zip(edges, flips)]
    g1 = LinkGraph(spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges],
                                         ["src", "dst"]))
    g2 = LinkGraph(spark.createDataFrame(oriented, ["src", "dst"]))
    assert triangle_count(g1) == triangle_count(g2)


# ---------------------------------------------------------------- URLs

_scheme = st.sampled_from(["http", "HTTPS", "ftp", "Ws"])
_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-",
    min_size=1,
    max_size=6,
)
_host = st.lists(_label, min_size=1, max_size=4).map(".".join)
_port = st.sampled_from(["", ":80", ":443", ":8080", ":1"])
_user = st.sampled_from(["", "u@", "user:pw@"])
_path = st.sampled_from(["", "/", "/a", "/a/b?q=1", "/x#frag", "//y", "/%20z"])
_url = st.builds(
    lambda s, u, h, p, t: f"{s}://{u}{h}{p}{t}", _scheme, _user, _host, _port, _path
)
_garbage = st.text(
    alphabet="abc:/#?@. ", min_size=0, max_size=12
)


@given(urls=st.lists(st.one_of(_url, _garbage), min_size=5, max_size=30))
@PROP
def test_url_parser_matches_stdlib_and_normalize_is_idempotent(spark, urls):
    from urllib.parse import urlsplit

    from linkgraph.pipeline.urls import registered_domain, url_host, url_normalize

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        "url",
        url_host("url").alias("h"),
        url_normalize("url").alias("n"),
        registered_domain(url_host("url")).alias("d"),
    ).collect()
    renorm = {
        r["n"]: r["n2"]
        for r in spark.createDataFrame(
            [(r["n"],) for r in out if r["n"] is not None] or [("http://x/",)],
            "n string",
        )
        .select("n", url_normalize("n").alias("n2"))
        .collect()
    }
    for r in out:
        if r["h"] is not None:
            try:
                expect = urlsplit(r["url"]).hostname
            except ValueError:
                expect = None
            if expect is not None:
                assert r["h"] == expect, r["url"]
            # registered domain is a dot-suffix of the host
            assert r["h"] == r["d"] or r["h"].endswith("." + r["d"]), r["url"]
        if r["n"] is not None:
            # canonicalization is a fixpoint
            assert renorm[r["n"]] == r["n"], r["url"]
