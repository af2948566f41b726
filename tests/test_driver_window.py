"""Pin the curated driver-verification window (VERDICT r4, task #1).

The correctness driver hard-verifies the FIRST 50 keys of QUERIES in
insertion order.  These tests pin the round-5 invariants: every windowed
query has a value-hash oracle (first 50 is a subset of ORACLE_SQL), the
window matches the curated DRIVER_WINDOW list exactly, the round-3 debt
query ``dedup_pipeline_md5_documents`` is inside it, and no query was
dropped from the registry by the reorder.
"""

from linkgraph.queries import DRIVER_WINDOW, ORACLE_SQL, QUERIES


def test_first_50_are_all_hashed():
    first50 = list(QUERIES)[:50]
    missing = [k for k in first50 if k not in ORACLE_SQL]
    assert missing == [], f"rows-only queries in driver window: {missing}"


def test_window_matches_curated_list():
    assert len(DRIVER_WINDOW) == 50
    assert list(QUERIES)[:50] == DRIVER_WINDOW


def test_round3_debt_and_flagships_in_window():
    for k in (
        "dedup_pipeline_md5_documents",
        "bowtie_nation",
        "metapath_walks_lineitem",
        "host_pagerank_orders",
        "pathsim_suppliers",
        "streaming_incremental_cc",
        "bridges_nation_fixture",
        "max_flow_nation_fixture",
        "ppr_batch_nation_region_4",
    ):
        assert k in DRIVER_WINDOW, k


def test_reorder_is_a_permutation():
    # Nothing dropped, nothing duplicated; demoted queries are still present.
    keys = list(QUERIES)
    assert len(keys) == len(set(keys))
    for k in (
        "lpa_events",
        "minhash_dedup_documents",
        "simhash_documents",
        "lsh_cosine_top10",
        "louvain_nation_region",
        "spectral_nation_region",
        "node2vec_walks_nation_region",
        "graphembedding_nation_region",
        "dedup_pipeline_documents",
        "pca_embeddings_k4",
    ):
        assert k in QUERIES, k
        assert k not in DRIVER_WINDOW, k
