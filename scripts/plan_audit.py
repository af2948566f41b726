"""Emit PLANS.md: `explain("formatted")` excerpts for representative queries
with the scale-relevant plan facts called out (pushdown, pruned read schema,
broadcast vs shuffle joins, whole-stage codegen, exchange count).

Usage: python scripts/plan_audit.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import io
import re
import sys

sys.path.insert(0, ".")


def fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def summarize(plan: str) -> list[str]:
    facts = []
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    nonempty = [p for p in pushed if p.strip()]
    if nonempty:
        facts.append(f"pushed filters reach the scan: {nonempty[:2]}")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        ncols = min(len(s.split(",")) for s in schemas)
        facts.append(f"column-pruned scan (narrowest read schema: {ncols} cols)")
    n_ex = len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange \(", plan))
    n_reuse = len(re.findall(r"ReusedExchange", plan))
    facts.append(
        f"{n_ex} exchange(s)" + (f" (+{n_reuse} reused, computed once)" if n_reuse else "")
    )
    n_bc = len(re.findall(r"BroadcastExchange|BroadcastHashJoin|BroadcastNestedLoopJoin", plan))
    if n_bc:
        facts.append(f"{n_bc} broadcast node(s) — small side never shuffled")
    n_wsc = len(re.findall(r"WholeStageCodegen", plan))
    if n_wsc:
        # pre-execution AdaptiveSparkPlan output omits codegen annotations,
        # so absence here is not meaningful — only report presence
        facts.append(f"{n_wsc} whole-stage-codegen span(s)")
    py = re.findall(
        r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas", plan
    )
    if py:
        kinds = sorted(set(py))
        if "BatchEvalPython" in kinds:
            facts.append("ROW-AT-A-TIME PYTHON PRESENT (BatchEvalPython) — bug")
        else:
            facts.append(f"Arrow-batched Python stage ({'/'.join(kinds)}) — documented kernel")
    else:
        facts.append("zero Python stages (fully JVM-side)")
    return facts


def clip(plan: str, max_lines: int = 40) -> str:
    lines = plan.splitlines()
    head = []
    for ln in lines:
        if ln.strip() == "" and head:
            break
        head.append(ln)
        if len(head) >= max_lines:
            head.append("... (clipped)")
            break
    return "\n".join(head)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from linkgraph import queries as Q
    from linkgraph.session import get_session

    spark = get_session("plan-audit", cores=4, shuffle_partitions=4)

    picks = [
        (
            "weighted_degree_lineitem",
            "scan → single hash aggregate; filters/pruning at the parquet scan",
        ),
        (
            "ann_cosine_top10",
            "brute-force cosine top-k: 1-row query side broadcast, JVM HOF dot "
            "products, one scan, no Python",
        ),
        (
            "ngram_jaccard_documents",
            "shingle self-join bounded by max_shingle_freq (boilerplate cap); "
            "aggregates map-side partial",
        ),
        (
            "token_count_documents",
            "pure Column expressions: zero shuffle, zero UDF",
        ),
        (
            "simhash_md5_documents",
            "JVM token hashing in transform(); the one documented Arrow stage "
            "is the per-doc bit-vote",
        ),
        (
            "ego_supplier_depth2",
            "two semi-join frontier expansions; frontier side stays small",
        ),
        (
            "media_image_stats",
            "real BMP decode fused with the stats reduce in ONE Arrow "
            "mapInPandas stage: partition-preserving, zero shuffles, "
            "per-row working set",
        ),
        (
            "repetition_stats_documents",
            "Gopher repetition fractions as higher-order functions: zero "
            "shuffle, zero Python — scan-bound at any scale",
        ),
        (
            "tfidf_top_terms_documents",
            "two algebraic aggregates + broadcast df join; per-doc top-k is "
            "a doc-bounded array_sort aggregate, no corpus window",
        ),
        (
            "decontaminate_documents",
            "eval gram set broadcasts; train side one scan + map-side join",
        ),
        (
            "pii_scrub_documents",
            "six counters + six chained regexp_replace as JVM column exprs "
            "over ONE scan: zero shuffle, zero Python",
        ),
        (
            "quantize_embeddings",
            "int8 quantization + checksums + L1 reconstruction as pure "
            "higher-order functions: scan-shaped, no shuffle",
        ),
        (
            "bm25_top10_documents",
            "tokenize scan → per-doc length agg + query-filtered tf agg; "
            "N/avgdl/df_t broadcast; top-k is TakeOrderedAndProject",
        ),
        (
            "structural_similarity_copurchase",
            "SCAN sigma via the degree-oriented triangle pass (support+2 "
            "identity) — no neighbor-set materialization, no windows",
        ),
        (
            "pattern_triangle_copurchase",
            "motif DSL compiles to an ordinary equi-join DAG the planner "
            "reorders/broadcasts like hand-written joins",
        ),
        (
            "rmat_edges",
            "generator: pure column exprs over range(m) — embarrassingly "
            "parallel, zero shuffle, no RNG state",
        ),
        (
            "dup_span_fraction_documents",
            "cross-doc duplicate spans: one distinct-docs-per-span algebraic "
            "aggregate on 8-byte xxhash64 keys — never a pairwise self-join",
        ),
        (
            "bigram_pmi_documents",
            "two count aggregates + vocabulary joins + TakeOrderedAndProject "
            "top-k; no windows, no Python",
        ),
        (
            "random_projection_embeddings",
            "JL projection as pure HOF column math: md5-Rademacher signs, "
            "zero shuffle before the output explode",
        ),
        (
            "fuzzy_join_part_words",
            "q-gram blocking join: gram explode via sequence+substring HOFs, "
            "short-key equi-join (never a cross join), levenshtein verify "
            "once per distinct candidate — no windows, no Python",
        ),
        (
            "hashed_features_documents",
            "hashing-trick vectorizer: split → explode → ONE algebraic "
            "aggregate on (id, md5-bucket); vocabulary-free, no windows, "
            "no Python",
        ),
        (
            "linkpred_ra_pa_events",
            "RA + PA ride the existing single wedge-join aggregate and "
            "degree joins — zero new shuffles over the 3-score plan",
        ),
        (
            "approx_triangles_copurchase",
            "DOULION: deterministic md5-coin edge filter BEFORE the wedge "
            "join (p² shrink), then the standard oriented triangle count",
        ),
        (
            "condensation_region_cycles",
            "SCC quotient: two node-id hash joins + distinct on the short "
            "(src_scc, dst_scc) pair — no windows, no driver loop",
        ),
        (
            "tfidf_cosine_pairs_documents",
            "sparse TF-IDF cosine: tf/df aggregates (df broadcast) → "
            "inverted-index term join → ONE dot aggregate per pair — "
            "no windows, no Python",
        ),
        # (clique5_nation_coregion returns a driver-side scalar row, so its
        # audited plan would be a LocalTableScan — the real kClist listing
        # plan is asserted in tests/test_plans.py instead)
        (
            "kmeans_clusters_embeddings",
            "Lloyd assignment: one scan with literal-centroid HOF distance "
            "math — no join, no shuffle, no Python in the returned plan",
        ),
        (
            "dbh_partition_events",
            "DBH placement: one degree aggregate + node-keyed joins + JVM "
            "md5 projection; hubs cut deterministically",
        ),
        (
            "cms_event_type_counts",
            "count-min: explode scan → ONE aggregate over a depth×width-"
            "bounded key space; lookup broadcasts the sketch",
        ),
        (
            "hll_distinct_users_events",
            "HyperLogLog: one scan + two algebraic aggregates, state "
            "≤ 2^p register rows per group — no join, no window",
        ),
        (
            "kmv_vocab_overlap_langs",
            "KMV: per-set top-k as WindowGroupLimit, pairwise Jaccard as "
            "array math over sketch rows (never the raw key sets)",
        ),
        (
            "bloom_prefilter_parts",
            "Bloom: build = explode + distinct over ≤ m positions; probe "
            "broadcasts the filter and match-counts per candidate",
        ),
    ]

    out = io.StringIO()
    out.write(
        "# PLANS — physical-plan audit of representative queries\n\n"
        f"Generated by `python scripts/plan_audit.py {sf_dir}`. Each entry is\n"
        "the query's `explain(\"formatted\")` header with the scale-relevant\n"
        "facts extracted. The full per-operator plan reasoning lives in\n"
        "README.md §Scale design and the superstep docstrings.\n"
    )
    for name, why in picks:
        df = Q.QUERIES[name](spark, sf_dir)
        plan = fmt_plan(df)
        out.write(f"\n## {name}\n\n*{why}*\n\nFacts: ")
        out.write("; ".join(summarize(plan)))
        out.write("\n\n```\n" + clip(plan) + "\n```\n")
    with open("PLANS.md", "w") as f:
        f.write(out.getvalue())
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
