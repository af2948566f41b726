"""linkgraph — a from-scratch PySpark-native link-graph analytics engine.

Reproduces the capabilities of stellarXlabs/mercury-graph (reference at
/root/reference, see SURVEY.md) with a single Spark DataFrame backend:
no GraphFrames, no networkx at runtime, no per-row Python UDFs.

Public surface:
    LinkGraph            — property graph over (nodes, edges) DataFrames
    get_session          — SparkSession factory with engine defaults
    pagerank             — power iteration w/ damping + dangling redistribution
    connected_components — large-star/small-star or min-label propagation
    label_propagation    — synchronous LPA community detection
    triangle_count       — degree-ordered orientation + join intersection
"""

from linkgraph.session import get_session
from linkgraph.graph import LinkGraph
from linkgraph.checkpoint import CheckpointManager
from linkgraph.algorithms.pagerank import pagerank
from linkgraph.algorithms.components import connected_components
from linkgraph.algorithms.label_propagation import label_propagation
from linkgraph.algorithms.triangles import triangle_count, triangle_counts_per_vertex

__all__ = [
    "LinkGraph",
    "get_session",
    "CheckpointManager",
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "triangle_counts_per_vertex",
]

__version__ = "0.1.0"
