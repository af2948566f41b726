#!/usr/bin/env python
"""Per-query isolation harness for optimization work (guide §1.4).

NOT the frozen driver bench — ``bench.py`` stays the measurement contract.
This file reproduces bench.py's corpus setup bit-for-bit and runs a chosen
subset of its queries, each labeled (setJobDescription), timed per rep, with
optional ``.explain("formatted")`` dumps for the plan evidence the round
deliverable requires.

Usage:
    python bench_extra.py q1 q2 ...          # run named queries
    LG_REPS=3 python bench_extra.py q1       # repeat each query
    LG_PLAN_DIR=plans/r06 LG_PLAN_TAG=before python bench_extra.py q1
                                             # also dump <q>_<tag>.txt
    LG_LARGE=1 python bench_extra.py pagerank_corpus_3m cc_corpus_3m ...

Env mirrors bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, LG_BENCH_FILES,
LG_BENCH_FILES_LARGE.
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
    reps = int(os.environ.get("LG_REPS", 1))
    plan_dir = os.environ.get("LG_PLAN_DIR")
    plan_tag = os.environ.get("LG_PLAN_TAG", "before")
    want = sys.argv[1:]
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
    from linkgraph.session import get_session

    spark = get_session("linkgraph-bench-extra", cores=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext
    timings: dict[str, list[float]] = {}

    tmp = tempfile.mkdtemp(prefix="lg_benchx_")
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
    edges.count()

    g, _id_map = LinkGraph(edges.select("src", "dst", "weight")).encode_ids()
    g_imp = LinkGraph(edges.filter("rel = 'imports'").select("src", "dst"))

    out_df = {}  # name -> last returned DataFrame (for plan dumps)

    def _plan(name, df):
        if plan_dir and df is not None:
            os.makedirs(plan_dir, exist_ok=True)
            with open(f"{plan_dir}/{name}_{plan_tag}.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))

    # ---------- query closures (mirroring bench.py bodies) ----------
    Q = {}

    def q(fn):
        Q[fn.__name__] = fn
        return fn

    @q
    def pagerank_corpus():
        res = pagerank(g, tol=1e-6, max_iter=100, strategy="distributed")
        res.ranks.select(F.sum("pagerank")).collect()
        return res.ranks

    @q
    def cc_corpus():
        out = connected_components(g, method="two_star")
        out.groupBy("component_size").count().collect()
        return out

    @q
    def lpa_corpus():
        out = label_propagation(g, max_iter=5)
        out.limit(1).collect()
        return out

    @q
    def closeness_corpus():
        from linkgraph import closeness_centrality

        lms = [r[0] for r in g.nodes.orderBy("id").limit(16).collect()]
        out = closeness_centrality(g, landmarks=lms, max_hops=20)
        out.agg(F.sum("closeness")).collect()
        return out

    @q
    def betweenness_corpus():
        from linkgraph import betweenness_sampled

        srcs = [r[0] for r in g.nodes.orderBy("id").limit(8).collect()]
        out = betweenness_sampled(g, sources=srcs, max_hops=8)
        out.agg(F.sum("betweenness")).collect()
        return out

    @q
    def kcore2_corpus():
        from linkgraph import k_core

        out = k_core(g, 2)
        out.count()
        return out

    @q
    def bridges_corpus():
        from linkgraph.algorithms.bridges import bridges as dist_bridges

        gb = LinkGraph(
            edges.select("src", "dst"), keys={"directed": False}
        ).encode_ids()[0]
        out = dist_bridges(gb)
        print("bridges:", out.count())
        return out

    @q
    def scc_corpus():
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
        out = strongly_connected_components(gd, strategy="distributed", max_iter=400)
        print("scc components:", out.select("scc").distinct().count())
        from linkgraph.algorithms import scc as _sccmod

        print("scc supersteps:", dict(_sccmod.LAST_STATS))
        return out

    @q
    def linkpred_corpus():
        from linkgraph import link_prediction_scores

        out = link_prediction_scores(g, max_neighbor_degree=64, min_common=2)
        out.count()
        return out

    @q
    def mst_corpus():
        from linkgraph import minimum_spanning_forest

        gu = LinkGraph(
            g.edges.select("src", "dst", "weight"), keys={"directed": False}
        )
        out = minimum_spanning_forest(gu)
        print("mst edges:", out.count())
        return out

    @q
    def anf_corpus():
        from linkgraph import neighborhood_function

        out = neighborhood_function(g, max_hops=6, method="hll", lg_k=10)
        out.collect()
        return out

    @q
    def hyperball_corpus():
        from linkgraph import hyperball_harmonic

        out = hyperball_harmonic(g, max_hops=6, method="hll", lg_k=10)
        out.agg(F.sum("harmonic")).collect()
        return out

    @q
    def triangles_imports():
        print("triangles:", triangle_count(g_imp))
        return None

    @q
    def ktruss3_imports():
        from linkgraph import k_truss

        out = k_truss(g_imp, 3)
        out.count()
        return out

    @q
    def structsim_imports():
        from linkgraph import structural_similarity

        out = structural_similarity(g_imp)
        out.count()
        out.agg(F.max(F.round(F.col("similarity") * 1e6))).collect()
        return out

    @q
    def clique4_imports():
        from linkgraph import clique4_count

        print("clique4:", clique4_count(g_imp))
        return None

    @q
    def graphlet_orbits_imports():
        from linkgraph import graphlet_orbits4

        orb = graphlet_orbits4(g_imp)
        orb.agg(F.sum("o8")).collect()
        return orb

    @q
    def triad_census_imports():
        from linkgraph import triad_census

        out = triad_census(g_imp)
        row = out.collect()[0]
        print("t030t:", int(row["t030t"]))
        return out

    @q
    def critical_path_imports():
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
        out.agg(F.max("earliest_finish")).collect()
        return out

    @q
    def wl_corpus():
        from linkgraph import wl_colors

        out = wl_colors(g, rounds=2)
        out.select("wl_color").distinct().count()
        return out

    @q
    def densest_corpus():
        from linkgraph import densest_subgraph

        nodes, density = densest_subgraph(g, epsilon=0.5)
        nodes.count()
        return nodes

    @q
    def tfidf_corpus():
        from linkgraph.pipeline.text import tfidf_top_terms

        d = corpus.select(F.col("path").alias("doc_id"), F.col("content").alias("text"))
        out = tfidf_top_terms(d, k=3)
        out.count()
        return out

    @q
    def dbh_partition_corpus():
        from linkgraph import dbh_edge_partition, partition_stats

        st = partition_stats(dbh_edge_partition(g, 64)).collect()[0]
        print("dbh:", st["replication_factor"])
        return None

    @q
    def eigenvector_corpus():
        from linkgraph import eigenvector_centrality

        out = eigenvector_centrality(g, max_iter=5, tol=0)
        out.agg(F.max("eigenvector")).collect()
        return out

    @q
    def voterank_corpus():
        from linkgraph import voterank

        out = voterank(g, 3)
        out.collect()
        return out

    @q
    def prefix_jaccard_docs():
        from linkgraph.pipeline.dedup import prefix_jaccard_join

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("doc_id") < 1500
        )
        prefix_jaccard_join(docs, 0.9).count()
        return None

    @q
    def knn_lsh_embeddings():
        from linkgraph.pipeline.similarity import knn_graph

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        knn_graph(emb, k=10, method="lsh").count()
        return None

    @q
    def avg_neighbor_degree_corpus():
        from linkgraph import average_neighbor_degree

        gu = LinkGraph(g.edges.select("src", "dst"), keys={"directed": False})
        average_neighbor_degree(gu).count()
        return None

    @q
    def hitting_5step_corpus():
        from linkgraph import hitting_times

        targets = [r["id"] for r in g.nodes.orderBy("id").limit(100).collect()]
        out = hitting_times(g, targets, max_iter=5, tol=0.0).values
        out.count()
        return out

    @q
    def ic_spread_corpus():
        from linkgraph import ic_spread

        seeds = [r["id"] for r in g.nodes.orderBy("id").limit(8).collect()]
        ic_spread(g, seeds, p=0.05, n_trials=4, max_rounds=4, seed=42).count()
        return None

    @q
    def ppr_batch64_corpus():
        from linkgraph import personalized_pagerank_batch

        seeds = [r["id"] for r in g.nodes.orderBy("id").limit(64).collect()]
        personalized_pagerank_batch(g, seeds, tol=0.0, max_iter=5).count()
        return None

    @q
    def ppr_batch64_pruned_corpus():
        from linkgraph import personalized_pagerank_batch
        from linkgraph.io import write_transition_pruned

        d = tempfile.mkdtemp(prefix="lg_benchx_trans_")
        try:
            t0 = time.time()
            write_transition_pruned(g, f"{d}/t", buckets=256)
            print("pruned write sec:", round(time.time() - t0, 2))
            seeds = [r["id"] for r in g.nodes.orderBy("id").limit(64).collect()]
            out = personalized_pagerank_batch(
                g, seeds, tol=0.0, max_iter=5, transition_path=f"{d}/t"
            )
            out.count()
            if plan_dir:
                _plan("ppr_batch64_pruned_corpus", out)
        finally:
            shutil.rmtree(d, ignore_errors=True)
        return None

    @q
    def host_graph_lineitem():
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
        host_graph(pages).count()
        return None

    @q
    def metapath_walks_corpus():
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
        types = tg.nodes.select("id", F.upper(F.substring("id", 1, 1)).alias("type"))
        walks = metapath_walks(tg, types, ["S", "P", "O"], 4, seed=11)
        walks.filter("completed").count()
        return walks

    @q
    def pathsim_suppliers_corpus():
        from linkgraph.algorithms.metapath import pathsim

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        e = li.select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        )
        tg = LinkGraph(e, keys={"directed": True})
        types = tg.nodes.select("id", F.upper(F.substring("id", 1, 1)).alias("type"))
        pathsim(tg, types, ["S", "P", "S"], k=5, bridge_cap=64).count()
        return None

    # ---------- large-corpus section ----------
    if os.environ.get("LG_LARGE") == "1":
        tmp2 = tempfile.mkdtemp(prefix="lg_benchx_3m_")
        corpus_l = synthesize_corpus(
            spark, n_files=n_files_large, n_repos=max(50, n_files_large // 1000),
            commits_per_file=2, seed=42, num_partitions=cpus * 2,
        ).persist()
        derive_edges(corpus_l, cochange_cap=16).write.mode("overwrite").parquet(
            f"{tmp2}/edges"
        )
        corpus_l.unpersist()
        edges_l = spark.read.parquet(f"{tmp2}/edges")
        edges_l.count()
        gl, _map = LinkGraph(edges_l.select("src", "dst", "weight")).encode_ids()

        @q
        def pagerank_corpus_3m():
            r = pagerank(gl, tol=1e-6, max_iter=100, strategy="distributed")
            r.ranks.select(F.sum("pagerank")).collect()
            return r.ranks

        @q
        def cc_corpus_3m():
            out = connected_components(gl, method="two_star", strategy="distributed")
            out.groupBy("component_size").count().collect()
            return out

        @q
        def lpa_corpus_3m():
            out = label_propagation(gl, max_iter=5)
            out.limit(1).collect()
            return out

    # ---------- run ----------
    unknown = [w for w in want if w not in Q]
    if unknown:
        print("unknown queries:", unknown, "\navailable:", sorted(Q))
        sys.exit(2)
    for name in want:
        for rep in range(reps):
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = Q[name]()
            dt = round(time.time() - t0, 2)
            timings.setdefault(name, []).append(dt)
            print(f"### {name} rep{rep}: {dt}s", flush=True)
            sc.setJobDescription(None)
            if rep == 0:
                out_df[name] = df
        if plan_dir and out_df.get(name) is not None:
            _plan(name, out_df[name])

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"timings": timings}))


if __name__ == "__main__":
    main()
