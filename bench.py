#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Headline queries:
- pagerank_corpus     — converged PageRank (tol 1e-6) over the synthetic
                        source-code-repo edge graph (BASELINE.json input_hint);
                        also reports edges/sec per superstep.
- cc_corpus           — large-star/small-star connected components, same graph
- lpa_corpus          — 5 LPA supersteps, same graph
- triangles_imports   — triangle count over the import-relation subgraph
- simhash_corpus      — 64-bit SimHash over the corpus content (JVM xxhash64
                        tokens + Arrow bit-vote)
- pagerank_copurchase — converged PageRank on the sf-dir supplier co-purchase graph
- weighted_degree     — weighted degree over sf-dir lineitem graph
- ann_cosine_top10    — brute-force cosine top-k over sf-dir embeddings
- dedup_exact         — exact duplicate grouping over sf-dir documents

Large-corpus section (LG_BENCH_FILES_LARGE, default 3000000 files → ~23M
edges; 0 disables): converged PageRank, converged two-star CC, and 5 LPA
supersteps at 10× the headline corpus — the size where skew knobs and memory
pressure actually engage on this host (BENCH/BASELINE.md §host capacity).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     LG_BENCH_FILES (corpus size, default 300000),
     LG_BENCH_FILES_LARGE (default 3000000, 0 = skip),
     SPARK_GRAFT_DRIVER_MEM (default 24g here: 23M-edge runs at 32 threads
     are GC-bound on the stock 8g heap — measured eff 0.497 vs 0.837).

The N→4N scaling-efficiency evidence (BASELINE.md §3) is produced by
scripts/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    n_files = int(os.environ.get("LG_BENCH_FILES", 300_000))
    n_files_large = int(os.environ.get("LG_BENCH_FILES_LARGE", 3_000_000))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from linkgraph import (
        LinkGraph,
        connected_components,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from linkgraph.corpus import derive_edges, ingest, synthesize_corpus
    from linkgraph.queries import (
        copurchase_edges,
        q_ann_cosine_top10,
        q_dedup_exact_documents,
        q_weighted_degree_lineitem,
    )
    from linkgraph.session import get_session

    spark = get_session("linkgraph-bench", cores=cpus, shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    extra: dict = {"cpus": cpus, "n_files": n_files}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 2)
        return out

    # ---- corpus setup (untimed as a query; recorded in extra) ----
    tmp = tempfile.mkdtemp(prefix="lg_bench_")
    t0 = time.time()
    corpus = ingest(
        synthesize_corpus(
            spark, n_files=n_files, n_repos=max(50, n_files // 1000),
            commits_per_file=2, seed=42, num_partitions=cpus * 2,
        )
    )
    corpus.write.mode("overwrite").parquet(f"{tmp}/corpus")
    corpus = spark.read.parquet(f"{tmp}/corpus")
    edges = derive_edges(corpus, cochange_cap=16)
    edges.write.mode("overwrite").parquet(f"{tmp}/edges")
    edges = spark.read.parquet(f"{tmp}/edges")
    m_edges = edges.count()
    extra["corpus_setup_sec"] = round(time.time() - t0, 2)
    extra["corpus_edges"] = m_edges

    # production path: dictionary-encode string node ids to longs before the
    # iterative loops — 8-byte shuffle keys instead of 20-40B strings.
    # Measured (A/B interleaved, 2.33M edges, local[32], quiet host):
    # converged pagerank 29.6/27.3s string vs 21.4/20.1s encoded (1.36x).
    g, _id_map = LinkGraph(edges.select("src", "dst", "weight")).encode_ids()

    def _pagerank_corpus():
        # strategy pinned: this entry IS the distributed-superstep throughput
        # metric (edges/sec/superstep); the auto gate must not reroute it.
        res = pagerank(g, tol=1e-6, max_iter=100, strategy="distributed")
        res.ranks.select(F.sum("pagerank")).collect()
        extra["pagerank_iterations"] = res.iterations
        extra["pagerank_converged"] = res.converged
        return res

    res = timed("pagerank_corpus", _pagerank_corpus)
    if res.iterations:
        extra["pagerank_edges_per_sec_per_superstep"] = round(
            res.num_edges * res.iterations / timings["pagerank_corpus"], 1
        )

    timed(
        "cc_corpus",
        lambda: connected_components(g, method="two_star")
        .groupBy("component_size").count().collect(),
    )
    timed("lpa_corpus", lambda: label_propagation(g, max_iter=5).limit(1).collect())

    def _closeness_corpus():
        # landmark-sampled closeness (the at-scale path; all-pairs is
        # size-guarded): 16 deterministic landmarks, frontier BFS
        from linkgraph import closeness_centrality

        lms = [r[0] for r in g.nodes.orderBy("id").limit(16).collect()]
        out = closeness_centrality(g, landmarks=lms, max_hops=20)
        extra["closeness_sum"] = round(
            out.agg(F.sum("closeness")).collect()[0][0] or 0.0, 3
        )

    timed("closeness_corpus", _closeness_corpus)

    def _betweenness_corpus():
        # source-sampled Brandes estimator (the at-scale path; exact is
        # driver-local + size-guarded): 8 deterministic sources, forward
        # sigma BFS + backward dependency sweep, hop-capped
        from linkgraph import betweenness_sampled

        # hop-bounded (k=8) betweenness: the standard bounded-distance
        # estimator — supersteps cost ~2 jobs/level, so the hop cap is the
        # wall knob, not the source count
        srcs = [r[0] for r in g.nodes.orderBy("id").limit(8).collect()]
        out = betweenness_sampled(g, sources=srcs, max_hops=8)
        extra["betweenness_sum"] = round(
            out.agg(F.sum("betweenness")).collect()[0][0] or 0.0, 3
        )

    timed("betweenness_corpus", _betweenness_corpus)

    def _kcore_corpus():
        # 2-core peeling at scale: algebraic degree agg + two semi-joins per
        # round, fixpoint on the surviving-edge count
        from linkgraph import k_core

        extra["kcore2_nodes"] = k_core(g, 2).count()

    timed("kcore2_corpus", _kcore_corpus)

    def _bridges_corpus():
        # cut structure at scale: Borůvka forest + BFS rooting + XOR-tag
        # leaf-peel (bridges.py). The corpus graph is 2-edge-connected
        # (repo hubs + co-change cliques), so the expected answer is 0 —
        # nothing short-circuits on that: the forest, rooting, and peel do
        # identical work either way.
        from linkgraph.algorithms.bridges import bridges as dist_bridges

        gb = LinkGraph(
            edges.select("src", "dst"), keys={"directed": False}
        ).encode_ids()[0]
        extra["bridges_corpus"] = dist_bridges(gb).count()

    timed("bridges_corpus", _bridges_corpus)

    def _scc_corpus():
        # directed stress for SCC: orient every corpus edge low→high id and
        # add the reverse direction for a deterministic 1/3 of edges — the
        # SCCs are the components of the symmetric subgraph, the rest is
        # DAG mass the trim rounds must dissolve (the honest mixed workload,
        # not symmetric-everything ≡ CC)
        from linkgraph import strongly_connected_components

        und = g.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        ).distinct()
        dedges = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
            und.filter(F.pmod(F.xxhash64("a", "b"), F.lit(3)) == 0).select(
                F.col("b").alias("src"), F.col("a").alias("dst")
            )
        )
        gd = LinkGraph(dedges)
        out = strongly_connected_components(
            gd, strategy="distributed", max_iter=400
        )
        extra["scc_components"] = out.select("scc").distinct().count()
        from linkgraph.algorithms import scc as _sccmod

        extra["scc_supersteps"] = dict(_sccmod.LAST_STATS)

    timed("scc_corpus", _scc_corpus)

    def _linkpred_corpus():
        # capped wedge enumeration + one algebraic groupBy; min_common=2
        # cuts the weak-candidate tail before the shuffle writes it
        from linkgraph import link_prediction_scores

        out = link_prediction_scores(g, max_neighbor_degree=64, min_common=2)
        extra["linkpred_pairs"] = out.count()

    timed("linkpred_corpus", _linkpred_corpus)

    def _mst_corpus():
        # distributed Boruvka over the weighted corpus graph (undirected
        # view): O(log V) pick/contract rounds, each one algebraic
        # min(struct) groupBy; contraction reuses the auto-gated CC solver
        from linkgraph import minimum_spanning_forest

        gu = LinkGraph(
            g.edges.select("src", "dst", "weight"), keys={"directed": False}
        )
        forest = minimum_spanning_forest(gu)
        extra["mst_edges"] = forest.count()

    timed("mst_corpus", _mst_corpus)

    def _anf_corpus():
        # HyperANF hop plot, 6 supersteps: per-node HLL state (lg_k=10 →
        # ~1KB dense, ~3% rel err), one join + hll_union_agg per hop
        from linkgraph import neighborhood_function

        nf = neighborhood_function(g, max_hops=6, method="hll", lg_k=10)
        extra["anf_pairs_by_hop"] = {
            int(r["hop"]): int(r["pairs"]) for r in nf.collect()
        }

    timed("anf_corpus", _anf_corpus)

    def _hyperball_corpus():
        # HyperBall per-node harmonic centrality, 6 hops: ANF's join +
        # hll_union_agg superstep plus a co-partitioned carry join for the
        # running (est, harmonic) columns — bounded state per node
        from linkgraph import hyperball_harmonic

        out = hyperball_harmonic(g, max_hops=6, method="hll", lg_k=10)
        extra["hyperball_harmonic_sum"] = round(
            out.agg(F.sum("harmonic")).collect()[0][0] or 0.0, 1
        )

    timed("hyperball_corpus", _hyperball_corpus)

    g_imp = LinkGraph(edges.filter("rel = 'imports'").select("src", "dst"))
    tri = timed("triangles_imports", lambda: triangle_count(g_imp))
    extra["triangles_imports"] = tri

    def _ktruss_imports():
        from linkgraph import k_truss

        extra["ktruss3_edges"] = k_truss(g_imp, 3).count()

    timed("ktruss3_imports", _ktruss_imports)

    def _structsim_imports():
        from linkgraph import structural_similarity

        out = structural_similarity(g_imp)
        extra["structsim_edges"] = out.count()
        extra["structsim_max_millionths"] = int(
            out.agg(F.max(F.round(F.col("similarity") * 1e6))).collect()[0][0] or 0
        )

    timed("structsim_imports", _structsim_imports)

    def _clique4_imports():
        from linkgraph import clique4_count

        extra["clique4_imports"] = clique4_count(g_imp)

    timed("clique4_imports", _clique4_imports)

    def _graphlet_orbits_imports():
        from linkgraph import graphlet_orbits4

        orb = graphlet_orbits4(g_imp)
        extra["gdv_o8_sum"] = int(
            orb.agg(F.sum("o8")).collect()[0][0] or 0
        )

    timed("graphlet_orbits_imports", _graphlet_orbits_imports)

    def _triad_census_imports():
        from linkgraph import triad_census

        row = triad_census(g_imp).collect()[0]
        extra["triads_030t"] = int(row["t030t"])

    timed("triad_census_imports", _triad_census_imports)

    def _critical_path_imports():
        # CPM earliest-finish over the imports subgraph oriented low→high id
        # (a DAG by construction — build-scheduling over the import relation);
        # deterministic per-file durations; rounds = longest dependency chain
        from linkgraph import critical_path

        dag = LinkGraph(
            g_imp.edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            ).filter("src <> dst")
        )
        dur = dag.nodes.select(
            "id", (F.pmod(F.xxhash64("id"), F.lit(10)) + 1).alias("duration")
        )
        out = critical_path(dag, dur)
        extra["critical_path_makespan"] = float(
            out.agg(F.max("earliest_finish")).collect()[0][0] or 0.0
        )

    timed("critical_path_imports", _critical_path_imports)

    def _pr_cop():
        # default auto strategy: a ~240k-edge graph takes the driver-local
        # plan (the engine's size-based physical choice) — ~100 BSP
        # supersteps here would be pure scheduler latency.
        gg = LinkGraph(copurchase_edges(spark, sf_dir), keys={"directed": False})
        r = pagerank(gg, tol=1e-6, max_iter=100)
        r.ranks.limit(1).collect()
        return r

    def _simhash_corpus():
        from linkgraph.pipeline.dedup import simhash

        d = corpus.select(
            F.col("path").alias("doc_id"), F.col("content").alias("text")
        )
        return simhash(d).agg(F.bit_xor("simhash")).collect()

    # Arrow/mapInPandas warmup OUTSIDE the timed region: the first
    # Python-worker+Arrow round-trip after JVM start costs 40-60 s on a
    # stealing host (documented mode, BENCH/BASELINE.md r4 A/B table — one
    # 41.5 s leg vs 3 s siblings). Warming on 2 rows makes the timed entry
    # measure the simhash kernel, not interpreter pool startup.
    simhash_warm = corpus.select(
        F.col("path").alias("doc_id"), F.col("content").alias("text")
    ).limit(2)
    from linkgraph.pipeline.dedup import simhash as _simhash_fn

    _simhash_fn(simhash_warm).collect()
    timed("simhash_corpus", _simhash_corpus)

    def _repetition_corpus():
        # Gopher-style repetition fractions: pure HOF column math, the
        # scan-bound text-quality pass (zero shuffle, zero Python)
        from linkgraph.pipeline.text import repetition_stats

        d = corpus.select(F.col("path").alias("doc_id"), F.col("content").alias("text"))
        return repetition_stats(d).agg(
            F.sum("dup_2gram_frac"), F.sum("n_words")
        ).collect()

    timed("repetition_corpus", _repetition_corpus)

    def _wl_corpus():
        # 2 WL refinement rounds: per round one edge join + one algebraic
        # multiset-hash groupBy (30-bit buckets, hub-safe); the role count
        # is the structural-diversity signal
        from linkgraph import wl_colors

        extra["wl_roles"] = (
            wl_colors(g, rounds=2).select("wl_color").distinct().count()
        )

    timed("wl_corpus", _wl_corpus)

    def _densest_corpus():
        # greedy peeling: O(log n) rounds x (degree agg + 2 semi-joins);
        # the corpus's dense co-change cores dominate the density
        from linkgraph import densest_subgraph

        nodes, density = densest_subgraph(g, epsilon=0.5)
        extra["densest_nodes"] = nodes.count()
        extra["densest_density"] = round(density, 2)

    timed("densest_corpus", _densest_corpus)

    def _tfidf_corpus():
        # two algebraic shuffles over the exploded token table (~15M rows
        # at 300k files) + broadcast df join — the aggregate-heavy text wall
        from linkgraph.pipeline.text import tfidf_top_terms

        d = corpus.select(F.col("path").alias("doc_id"), F.col("content").alias("text"))
        extra["tfidf_rows"] = tfidf_top_terms(d, k=3).count()

    timed("tfidf_corpus", _tfidf_corpus)

    def _dbh_corpus():
        # DBH vertex-cut placement of the full 2.3M-edge graph at 64 parts:
        # one degree aggregate + two node-keyed joins + md5 projection,
        # then the two metric aggregates — the placement-layer wall
        from linkgraph import dbh_edge_partition, partition_stats

        st = partition_stats(dbh_edge_partition(g, 64)).collect()[0]
        extra["dbh_replication_factor"] = round(st["replication_factor"], 3)
        extra["dbh_balance"] = round(st["balance"], 3)

    timed("dbh_partition_corpus", _dbh_corpus)

    def _cms_corpus():
        # count-min over the ~15M-token stream (width 4096 x depth 4):
        # explode scan + ONE aggregate whose key space is 16k cells
        # regardless of token count, then a 20-token lookup
        from linkgraph.pipeline.sketches import cms_lookup, count_min_sketch

        toks = corpus.select(
            F.explode(F.split("content", "\\s+")).alias("tok")
        ).filter(F.col("tok") != "")
        sk = count_min_sketch(toks, "tok", width=4096, depth=4).persist()
        extra["cms_cells"] = sk.count()
        probes = toks.limit(20).distinct()
        est = cms_lookup(sk, probes, "tok", width=4096, depth=4)
        extra["cms_probe_est_sum"] = est.agg(F.sum("est")).collect()[0][0]
        sk.unpersist()

    timed("cms_corpus_tokens", _cms_corpus)

    def _dupspan_corpus():
        # cross-doc duplicate-span signal over the 300k-file corpus: one
        # distinct-docs-per-span aggregate on 8-byte span hashes + one
        # per-doc count — the inter-document repetition wall
        from linkgraph.pipeline.dedup import duplicate_span_fraction

        d = corpus.select(F.col("path").alias("doc_id"), F.col("content").alias("text"))
        row = duplicate_span_fraction(d).agg(
            F.sum("n_dup_spans").alias("dup"), F.sum("n_spans").alias("all")
        ).collect()[0]
        extra["dupspan_dup_frac"] = round(
            (row["dup"] or 0) / max(row["all"] or 1, 1), 4
        )

    timed("dupspan_corpus", _dupspan_corpus)

    def _line_dedup_corpus():
        # cross-doc line-level boilerplate removal over the 300k-file
        # corpus: popular modules' import lines repeat across importers —
        # real removal pressure (min_docs=4: the corpus measures max 6-7
        # distinct importers per line at 20k files, so 8 never fires);
        # one distinct-docs-per-line aggregate on 8-byte line hashes +
        # the per-doc ordered rebuild
        from linkgraph.pipeline.dedup import drop_duplicate_lines

        d = corpus.select(
            F.col("path").alias("doc_id"), F.col("content").alias("text")
        )
        row = (
            drop_duplicate_lines(d, min_docs=4)
            .agg(
                F.sum("n_dropped").alias("dropped"),
                F.sum("n_lines").alias("lines"),
            )
            .collect()[0]
        )
        extra["line_dedup_dropped"] = int(row["dropped"] or 0)
        extra["line_dedup_lines"] = int(row["lines"] or 0)

    timed("line_dedup_corpus", _line_dedup_corpus)

    def _eigenvector_corpus():
        # 5 fixed supersteps of the L2-normalized (A+I)^T power iteration
        # (distributed plan; tol=0 skips the per-step delta action)
        from linkgraph import eigenvector_centrality

        eigenvector_centrality(g, max_iter=5, tol=0).agg(
            F.max("eigenvector")
        ).collect()

    timed("eigenvector_corpus", _eigenvector_corpus)

    timed("pagerank_copurchase", _pr_cop)
    timed("weighted_degree", lambda: q_weighted_degree_lineitem(spark, sf_dir).count())
    timed("ann_cosine_top10", lambda: q_ann_cosine_top10(spark, sf_dir).collect())
    timed("dedup_exact", lambda: q_dedup_exact_documents(spark, sf_dir).count())

    def _quant_ann():
        from linkgraph.pipeline.similarity import quantized_cosine_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        quantized_cosine_topk(emb, query_id=0, k=10).collect()

    timed("quantized_ann_top10", _quant_ann)

    def _bm25_docs():
        from linkgraph.pipeline.text import bm25_search

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bm25_search(docs, ["merge", "spark", "window"], k=10).collect()

    timed("bm25_documents", _bm25_docs)

    def _voterank_corpus():
        # 3 vote-then-weaken elections over the full corpus graph: each
        # round is one ability join + one algebraic sum + a top-1 collect
        from linkgraph import voterank

        voterank(g, 3).collect()

    timed("voterank_corpus", _voterank_corpus)

    def _prefix_jaccard_docs():
        # lossless prefix-filtered set-similarity self-join. The synthetic
        # documents share a 31-word vocabulary, so MOST pairs pass any
        # realistic threshold (57% at t=0.6) — prefix filtering can't beat
        # an output that is inherently quadratic in this degenerate data;
        # bound the bench slice so the wall measures the operator, not the
        # testdata's degeneracy
        from linkgraph.pipeline.dedup import prefix_jaccard_join

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("doc_id") < 1500
        )
        prefix_jaccard_join(docs, 0.9).count()

    timed("prefix_jaccard_docs", _prefix_jaccard_docs)

    def _knn_lsh_embeddings():
        # hyperplane-banded kNN graph over the embedding table (the 100 TB
        # candidate path: bucket join + exact rerank + WindowGroupLimit)
        from linkgraph.pipeline.similarity import knn_graph

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        knn_graph(emb, k=10, method="lsh").count()

    timed("knn_lsh_embeddings", _knn_lsh_embeddings)

    def _pca_embeddings():
        # one Arrow Gram fold over the vectors + driver eigh + map-only
        # projection — two data passes total
        from linkgraph.pipeline.pca import pca_project

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pca_project(emb, k=16).count()

    timed("pca_embeddings_k16", _pca_embeddings)

    def _avg_nbr_deg_corpus():
        # one degree aggregate + one edge×degree join + one avg — the
        # cheapest whole-graph statistic family (knn(k)/s-metric share it).
        # The corpus graph is directed; the statistic is undirected, so
        # symmetrize the already-encoded edge list
        from linkgraph import average_neighbor_degree

        gu = LinkGraph(g.edges.select("src", "dst"), keys={"directed": False})
        average_neighbor_degree(gu).count()

    timed("avg_neighbor_degree_corpus", _avg_nbr_deg_corpus)

    def _hitting_corpus():
        # 5 first-passage supersteps toward the 100 lowest node ids over
        # the full corpus graph — per-superstep budget equals pagerank's
        from linkgraph import hitting_times

        targets = [r["id"] for r in g.nodes.orderBy("id").limit(100).collect()]
        hitting_times(g, targets, max_iter=5, tol=0.0).values.count()

    timed("hitting_5step_corpus", _hitting_corpus)

    def _ic_spread_corpus():
        # independent-cascade diffusion from 8 deterministic seeds, 4
        # trials at p=0.05, 4 BFS rounds — the live-edge materialization
        # (one projection over edges x trials) plus the multi-trial
        # frontier loop, frontier-side-only shuffles
        from linkgraph import ic_spread

        seeds = [r["id"] for r in g.nodes.orderBy("id").limit(8).collect()]
        n = ic_spread(
            g, seeds, p=0.05, n_trials=4, max_rounds=4, seed=42
        ).count()
        extra["ic_spread_activations"] = n

    timed("ic_spread_corpus", _ic_spread_corpus)

    def _ppr_batch_corpus():
        # 64 seeds through ONE superstep loop, 5 fixed rounds — the
        # related-pages workload; state is sparse (seed, node), one
        # shuffle per round keyed (_s, dst)
        from linkgraph import personalized_pagerank_batch

        seeds = [r["id"] for r in g.nodes.orderBy("id").limit(64).collect()]
        n = personalized_pagerank_batch(g, seeds, tol=0.0, max_iter=5).count()
        extra["ppr_batch_state_rows"] = n

    timed("ppr_batch64_corpus", _ppr_batch_corpus)

    def _ppr_batch_pruned():
        # same job through the frontier-pruned transition table: per-round
        # scans touch only the frontier's hash buckets (A/B at 24M edges:
        # 2.1x and weather-stable — BENCH/ppr_batch_scaling_r4.md)
        import shutil
        import tempfile

        from linkgraph import personalized_pagerank_batch
        from linkgraph.io import write_transition_pruned

        d = tempfile.mkdtemp(prefix="lg_bench_trans_")
        try:
            t0 = time.time()
            write_transition_pruned(g, f"{d}/t", buckets=256)
            extra["ppr_pruned_write_sec"] = round(time.time() - t0, 2)
            seeds = [r["id"] for r in g.nodes.orderBy("id").limit(64).collect()]
            n = personalized_pagerank_batch(
                g, seeds, tol=0.0, max_iter=5, transition_path=f"{d}/t"
            ).count()
            extra["ppr_pruned_state_rows"] = n
        finally:
            shutil.rmtree(d, ignore_errors=True)

    timed("ppr_batch64_pruned_corpus", _ppr_batch_pruned)

    def _host_graph_lineitem():
        # page-level URL pairs synthesized from every lineitem row (messy
        # case/ports/fragments), rolled up to the weighted host graph —
        # canonicalization fuses into the scan, ONE algebraic pair-count
        # shuffle. The synthesized pages are MATERIALIZED first: a real
        # crawl reads URL strings from storage, and feeding the parser an
        # inline concat instead lets CollapseProject clone the
        # string-build into every regex call site (33.7 s -> 10.4 s
        # total with the Generate barrier inside host_graph; see
        # pipeline/urls.py)
        from linkgraph.pipeline.urls import host_graph

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pages = li.select(
            F.concat(
                F.lit("HTTPS://WWW.Supp-"),
                (F.col("l_suppkey") % 997).cast("string"),
                F.lit(".Example.CO.UK:443/l/"),
                F.col("l_orderkey").cast("string"),
            ).alias("src_url"),
            F.concat(
                F.lit("http://bot:x@Part-"),
                (F.col("l_partkey") % 1009).cast("string"),
                F.lit(".Example.COM:80/p/"),
                F.col("l_partkey").cast("string"),
                F.lit("#s"),
            ).alias("dst_url"),
        ).localCheckpoint(eager=True)
        extra["host_graph_edges"] = host_graph(pages).count()

    timed("host_graph_lineitem", _host_graph_lineitem)

    def _metapath_corpus():
        # typed-walk throughput at corpus scale (VERDICT r4 task #8): the
        # lineitem tripartite supplier→part→order graph (~same shape as the
        # hashed oracle query, 600k lineitem rows at sf0.1), 4 walks per
        # supplier, md5-gumbel draws. Plan: per step one join of walk state
        # against the pinned typed-edge slice + one max-struct aggregate.
        from linkgraph.algorithms.metapath import metapath_walks

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_suppkey", "l_partkey", "l_orderkey"
        )
        e1 = (
            li.groupBy("l_suppkey", "l_partkey")
            .agg(F.count(F.lit(1)).cast("double").alias("weight"))
            .select(
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
                F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
                "weight",
            )
        )
        e2 = (
            li.select("l_partkey", "l_orderkey")
            .distinct()
            .select(
                F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
                F.concat(F.lit("o"), F.col("l_orderkey")).alias("dst"),
                F.lit(1.0).alias("weight"),
            )
        )
        tg = LinkGraph(e1.unionByName(e2), keys={"directed": True})
        types = tg.nodes.select(
            "id", F.upper(F.substring("id", 1, 1)).alias("type")
        )
        walks = metapath_walks(tg, types, ["S", "P", "O"], 4, seed=11)
        extra["metapath_walks_completed"] = walks.filter("completed").count()

    timed("metapath_walks_corpus", _metapath_corpus)

    def _pathsim_corpus():
        # PathSim top-5 similar suppliers through shared parts, bridge_cap
        # engaged (drop stop-word parts with > 64 distinct suppliers) — the
        # capped inverted-index self-join shape at sf0.1 scale.
        from linkgraph.algorithms.metapath import pathsim

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        e = li.select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        )
        tg = LinkGraph(e, keys={"directed": True})
        types = tg.nodes.select(
            "id", F.upper(F.substring("id", 1, 1)).alias("type")
        )
        out = pathsim(tg, types, ["S", "P", "S"], k=5, bridge_cap=64)
        extra["pathsim_pairs"] = out.count()

    timed("pathsim_suppliers_corpus", _pathsim_corpus)

    def _ws_generate():
        # generator throughput: 10M-edge small-world ring, pure projection
        from linkgraph import watts_strogatz_graph

        watts_strogatz_graph(spark, n=2_000_000, k=10, p=0.1).count()

    timed("ws_generate_10m_edges", _ws_generate)

    shutil.rmtree(tmp, ignore_errors=True)

    # ---- large-corpus section: 10x the headline graph -------------------
    if n_files_large:
        tmp2 = tempfile.mkdtemp(prefix="lg_bench_3m_")
        t0 = time.time()
        corpus_l = synthesize_corpus(
            spark, n_files=n_files_large, n_repos=max(50, n_files_large // 1000),
            commits_per_file=2, seed=42, num_partitions=cpus * 2,
        ).persist()  # derive_edges scans the corpus in 3 relation branches —
        # cache the synthesis kernel's output instead of re-executing it per
        # branch (the headline path stages through parquet for the same
        # reason; a persist avoids writing 3M content rows to disk)
        derive_edges(corpus_l, cochange_cap=16).write.mode("overwrite").parquet(
            f"{tmp2}/edges"
        )
        corpus_l.unpersist()
        edges_l = spark.read.parquet(f"{tmp2}/edges")
        m_large = edges_l.count()
        extra["corpus_large_setup_sec"] = round(time.time() - t0, 2)
        extra["corpus_large_edges"] = m_large
        extra["n_files_large"] = n_files_large
        # production path at this size: dictionary-encoded long ids
        gl, _map = LinkGraph(edges_l.select("src", "dst", "weight")).encode_ids()

        def _pr_large():
            r = pagerank(gl, tol=1e-6, max_iter=100, strategy="distributed")
            r.ranks.select(F.sum("pagerank")).collect()
            extra["pagerank_3m_iterations"] = r.iterations
            extra["pagerank_3m_converged"] = r.converged
            return r

        r = timed("pagerank_corpus_3m", _pr_large)
        if r.iterations:
            extra["pagerank_3m_edges_per_sec_per_superstep"] = round(
                r.num_edges * r.iterations / timings["pagerank_corpus_3m"], 1
            )
        timed(
            "cc_corpus_3m",
            lambda: connected_components(
                gl, method="two_star", strategy="distributed"
            ).groupBy("component_size").count().collect(),
        )
        timed(
            "lpa_corpus_3m",
            lambda: label_propagation(gl, max_iter=5).limit(1).collect(),
        )
        shutil.rmtree(tmp2, ignore_errors=True)

    total = round(sum(timings.values()), 2)
    sf = 0.1 if "0.1" in sf_dir else (0.01 if "0.01" in sf_dir else None)

    # BASELINE.md-aligned extras: wall to 1e-6 convergence is the
    # pagerank_corpus timing; scaling efficiency comes from the latest
    # scripts/bench_scaling.py run (BENCH/BASELINE.md).
    extra["pagerank_wall_to_tol_sec"] = timings.get("pagerank_corpus")
    try:
        import re

        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "BASELINE.md")) as f:
            report = f.read()
        m = re.search(r"(\d+\.\d+)\*\* \(target", report)
        if m:
            extra["scaling_efficiency_n_to_4n"] = float(m.group(1))
        m = re.search(r"=\n(\d+\.\d+)\*\* — the engine extract", report)
        if m:
            extra["scaling_efficiency_capacity_normalized"] = float(m.group(1))
    except OSError:
        pass
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
