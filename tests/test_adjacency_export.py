"""Dense-integer adjacency export + DGL hook — parity with the reference's
``Graph.dgl`` surface (mercury/graph/core/graph.py:272-284,602-619), rebuilt
as a guarded Spark-side collect feeding an import-gated dgl.graph call."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph import LinkGraph


@pytest.fixture(scope="module")
def directed_graph(spark):
    e = spark.createDataFrame(
        [("c", "a", 2.0), ("a", "b", 1.0), ("b", "c", 3.0), ("a", "c", 5.0)],
        ["src", "dst", "weight"],
    )
    n = spark.createDataFrame(
        [("a", 10.0), ("b", 20.0), ("c", 30.0)], ["id", "score"]
    )
    return LinkGraph(e, nodes=n)


def test_arrays_deterministic_sorted_index(directed_graph):
    arrays = directed_graph.to_adjacency_arrays()
    assert arrays["ids"] == ["a", "b", "c"]
    assert arrays["num_nodes"] == 3
    pairs = sorted(zip(arrays["src"].tolist(), arrays["dst"].tolist()))
    # (a,b) (a,c) (b,c) (c,a) under index a=0 b=1 c=2
    assert pairs == [(0, 1), (0, 2), (1, 2), (2, 0)]
    assert arrays["src"].dtype == np.int64 and arrays["dst"].dtype == np.int64


def test_arrays_carry_numeric_attrs(directed_graph):
    arrays = directed_graph.to_adjacency_arrays()
    # node attr aligned to sorted-id index order
    assert arrays["node_attrs"]["score"].tolist() == [10.0, 20.0, 30.0]
    # edge weight aligned to the src/dst arrays
    w = arrays["edge_attrs"]["weight"]
    by_pair = {
        (s, d): wt
        for s, d, wt in zip(arrays["src"], arrays["dst"], w.tolist())
    }
    assert by_pair[(0, 1)] == 1.0 and by_pair[(0, 2)] == 5.0
    assert by_pair[(2, 0)] == 2.0


def test_undirected_emits_both_directions(spark):
    e = spark.createDataFrame([("x", "y", 1.0)], ["src", "dst", "weight"])
    arrays = LinkGraph(e, keys={"directed": False}).to_adjacency_arrays()
    pairs = sorted(zip(arrays["src"].tolist(), arrays["dst"].tolist()))
    assert pairs == [(0, 1), (1, 0)]


def test_string_attrs_omitted(spark):
    e = spark.createDataFrame([("x", "y", "label")], ["src", "dst", "kind"])
    arrays = LinkGraph(e).to_adjacency_arrays()
    assert arrays["edge_attrs"] == {}


def test_guards_fire_before_collect(directed_graph):
    with pytest.raises(ValueError, match="max_nodes=2"):
        directed_graph.to_adjacency_arrays(max_nodes=2)
    with pytest.raises(ValueError, match="max_edges=3"):
        directed_graph.to_adjacency_arrays(max_edges=3)


def test_to_dgl_import_gated_or_real(directed_graph):
    """In this sandbox dgl/torch are absent → the gate must raise the
    documented ImportError; where they exist, the graph must round-trip."""
    try:
        import dgl  # noqa: F401
        import torch  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="to_adjacency_arrays"):
            directed_graph.to_dgl()
        with pytest.raises(ImportError):
            directed_graph.dgl  # property path hits the same gate
    else:
        g = directed_graph.dgl
        assert g.num_nodes() == 3 and g.num_edges() == 4
        assert g.edata["weight"].shape[0] == 4


def test_explicit_nodes_missing_endpoint_raises(spark):
    e = spark.createDataFrame([("a", "b"), ("a", "zz")], ["src", "dst"])
    n = spark.createDataFrame([("a",), ("b",)], ["id"])
    g = LinkGraph(e, nodes=n)
    with pytest.raises(ValueError, match="missing from the nodes table"):
        g.to_adjacency_arrays()
