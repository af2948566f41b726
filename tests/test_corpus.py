"""Corpus generator determinism, sha256 ingest invariant, edge derivation."""

import hashlib

from pyspark.sql import functions as F

from linkgraph.corpus import derive_edges, ingest, synthesize_corpus


def _gen(spark, **kw):
    kw.setdefault("n_files", 300)
    kw.setdefault("n_repos", 10)
    kw.setdefault("commits_per_file", 2)
    kw.setdefault("seed", 42)
    return synthesize_corpus(spark, **kw)


def test_schema_and_rowcount(spark):
    c = _gen(spark)
    assert c.columns == ["repo", "path", "commit", "lang", "content"]
    assert c.count() == 600


def test_deterministic(spark):
    a = sorted(_gen(spark).collect())
    b = sorted(_gen(spark).collect())
    assert a == b
    c = sorted(_gen(spark, seed=7).collect())
    assert a != c


def test_sha256_invariant(spark):
    """BASELINE.json:15 — per-row sha256(content) equality through ingest."""
    rows = ingest(_gen(spark)).select("content", "content_sha").limit(50).collect()
    assert rows
    for r in rows:
        assert hashlib.sha256(r["content"].encode()).hexdigest() == r["content_sha"]


def test_power_law_and_mega_commits(spark):
    c = _gen(spark, n_files=2000, n_repos=50).cache()
    per_repo = c.groupBy("repo").count().collect()
    counts = sorted((r["count"] for r in per_repo), reverse=True)
    assert counts[0] > 5 * counts[-1]  # hub repos exist
    per_commit = c.select("commit", "path").distinct().groupBy("commit").count()
    assert per_commit.agg(F.max("count")).collect()[0][0] > 20  # mega-commit
    c.unpersist()


def test_derived_edges(spark):
    c = _gen(spark).cache()
    e = derive_edges(c, cochange_cap=8).cache()
    rels = {r["rel"] for r in e.select("rel").distinct().collect()}
    assert rels == {"contains", "imports", "cochange"}

    n_files = c.select("repo", "path").distinct().count()
    assert e.filter("rel = 'contains'").count() == n_files

    # every import edge points at a file that exists
    paths = c.select(
        F.concat(F.lit("path:"), "repo", F.lit("/"), "path").alias("p")
    ).distinct()
    imp = e.filter("rel = 'imports'")
    dangling = imp.join(paths, imp["dst"] == paths["p"], "left_anti").count()
    assert dangling == 0
    assert imp.filter("src = dst").count() == 0

    # co-change cap: no path pairs beyond cap*(cap-1)/2 per commit
    assert e.filter("rel = 'cochange'").count() > 0
    assert e.filter("rel = 'cochange' and weight >= 1").count() == e.filter(
        "rel = 'cochange'"
    ).count()
    c.unpersist()
    e.unpersist()
