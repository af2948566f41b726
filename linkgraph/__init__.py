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
from linkgraph.algorithms.scc import condensation, strongly_connected_components
from linkgraph.algorithms.bipartite import bipartite_coloring, is_bipartite
from linkgraph.algorithms.salsa import salsa
from linkgraph.algorithms.profile import degree_distribution, graph_profile
from linkgraph.algorithms.cuts import articulation_points, bridges
from linkgraph.algorithms.bridges import (
    bridges as distributed_bridges,
    two_edge_connected_components,
)
from linkgraph.algorithms.biconnectivity import (
    articulation_points_distributed,
    biconnected_components,
)
from linkgraph.algorithms.flow import (
    MaxFlowResult,
    STCutResult,
    max_flow,
    min_st_cut,
    st_edge_connectivity,
    st_vertex_connectivity,
)
from linkgraph.algorithms.ktruss import truss_decomposition
from linkgraph.algorithms.simrank import simrank
from linkgraph.algorithms.scan import scan_clustering, structural_similarity
from linkgraph.algorithms.pattern import find_pattern
from linkgraph.generators import (
    gnm_graph,
    rmat_graph,
    sbm_graph,
    watts_strogatz_graph,
    zipf_graph,
)
from linkgraph.algorithms.label_propagation import (
    label_propagation,
    seeded_label_propagation,
)
from linkgraph.algorithms.hitting import (
    absorption_probabilities,
    hitting_times,
)
from linkgraph.algorithms.assortativity import (
    attribute_assortativity,
    numeric_assortativity,
    average_degree_connectivity,
    average_neighbor_degree,
    degree_assortativity,
    normalized_rich_club,
    powerlaw_alpha,
    rich_club_coefficient,
    s_metric,
)
from linkgraph.algorithms.edge_partition import (
    dbh_edge_partition,
    hybrid_edge_partition,
    partition_stats,
)
from linkgraph.algorithms.triangles import (
    average_clustering,
    effective_size,
    local_clustering_coefficient,
    clique4_count,
    k_clique_count,
    k_cliques,
    square_count,
    transitivity,
    triangle_count,
    triangle_counts_per_vertex,
    weighted_clustering_coefficient,
)
from linkgraph.algorithms.graphlets import graphlet_census4, graphlet_orbits4
from linkgraph.algorithms.negative import sample_negative_edges
from linkgraph.algorithms.rewire import rewire_edges
from linkgraph.algorithms.triads import dyad_census, motif_significance, triad_census
from linkgraph.algorithms.percolation import clique_percolation
from linkgraph.algorithms.local_cluster import local_cluster, sweep_cut
from linkgraph.algorithms.heat_kernel import heat_kernel, heat_kernel_cluster
from linkgraph.algorithms.cascade import (
    ic_greedy_seeds,
    ic_influence,
    ic_live_edges,
    ic_spread,
)
from linkgraph.algorithms.partition_metrics import partition_agreement
from linkgraph.algorithms.louvain import louvain_communities, split_disconnected_communities
from linkgraph.algorithms.spread_activation import spread_activation
from linkgraph.algorithms.transition import sinkhorn_normalize, transition_matrix, transition_power
from linkgraph.algorithms.random_walker import random_walks
from linkgraph.algorithms.node2vec import Node2Vec, node2vec_walks
from linkgraph.algorithms.spectral import spectral_clustering
from linkgraph.algorithms.sssp import (
    reconstruct_path,
    shortest_path_lengths_weighted,
    shortest_path_tree,
    shortest_paths_weighted,
    weighted_closeness_centrality,
)
from linkgraph.algorithms.kpaths import k_lightest_walks
from linkgraph.algorithms.trustrank import spam_mass, trustrank
from linkgraph.algorithms.ppr_batch import personalized_pagerank_batch, related_nodes
from linkgraph.algorithms.redirects import resolve_redirects, rewrite_edges
from linkgraph.algorithms.metapath import metapath_walks, pathsim
from linkgraph.algorithms.bowtie import bowtie_decomposition
from linkgraph.algorithms.closeness import (
    closeness_centrality,
    diameter_lower_bound,
    eccentricity,
    global_efficiency,
    harmonic_centrality,
    shortest_path_lengths,
)
from linkgraph.algorithms.reciprocity import reciprocity
from linkgraph.algorithms.betweenness import (
    betweenness_centrality,
    betweenness_sampled,
    edge_betweenness_sampled,
)
from linkgraph.algorithms.anf import effective_diameter, hyperball_harmonic, neighborhood_function
from linkgraph.algorithms.projection import bipartite_projection
from linkgraph.algorithms.sampling import sample_neighborhood, sample_neighbors
from linkgraph.algorithms.katz import eigenvector_centrality, hits, katz_centrality
from linkgraph.algorithms.voterank import voterank
from linkgraph.algorithms.matching import maximal_matching
from linkgraph.algorithms.mis import greedy_coloring, maximal_independent_set
from linkgraph.algorithms.mst import (
    minimum_spanning_forest,
    minimum_spanning_weight,
)
from linkgraph.algorithms.toposort import critical_path, topological_layers
from linkgraph.algorithms.kcore import core_number, k_core, onion_layers, s_core
from linkgraph.algorithms.ktruss import k_truss
from linkgraph.algorithms.linkpred import (
    link_prediction_scores,
    link_prediction_top_k,
)
from linkgraph.algorithms.aggregate_messages import aggregate_messages
from linkgraph.algorithms.densest import densest_subgraph
from linkgraph.algorithms.feature_prop import feature_propagation
from linkgraph.algorithms.wl import wl_colors, wl_fingerprint
from linkgraph.algorithms.partition_metrics import (
    cut_metrics,
    modularity,
    quotient_graph,
)
from linkgraph.algorithms.temporal_reach import temporal_reachability
from linkgraph.io import read_edges_bucketed, write_edges_bucketed
from linkgraph.embeddings import Embeddings, GraphEmbedding
from linkgraph.estimators import (
    LouvainCommunities,
    SparkRandomWalker,
    SparkSpreadingActivation,
    SpectralClustering,
    Transition,
)
from linkgraph.viz import moebius_html, moebius_json

__all__ = [
    "LinkGraph",
    "get_session",
    "CheckpointManager",
    "pagerank",
    "connected_components",
    "strongly_connected_components",
    "condensation",
    "is_bipartite",
    "bipartite_coloring",
    "salsa",
    "graph_profile",
    "degree_distribution",
    "bridges",
    "distributed_bridges",
    "two_edge_connected_components",
    "biconnected_components",
    "articulation_points_distributed",
    "min_st_cut",
    "st_edge_connectivity",
    "st_vertex_connectivity",
    "max_flow",
    "MaxFlowResult",
    "STCutResult",
    "articulation_points",
    "truss_decomposition",
    "label_propagation",
    "seeded_label_propagation",
    "k_core",
    "core_number",
    "onion_layers",
    "s_core",
    "link_prediction_scores",
    "link_prediction_top_k",
    "write_edges_bucketed",
    "read_edges_bucketed",
    "triangle_count",
    "triangle_counts_per_vertex",
    "weighted_clustering_coefficient",
    "local_clustering_coefficient",
    "effective_size",
    "clique_percolation",
    "average_clustering",
    "transitivity",
    "graphlet_census4",
    "graphlet_orbits4",
    "dyad_census",
    "triad_census",
    "motif_significance",
    "sample_negative_edges",
    "rewire_edges",
    "square_count",
    "clique4_count",
    "k_clique_count",
    "k_cliques",
    "dbh_edge_partition",
    "hybrid_edge_partition",
    "partition_stats",
    "densest_subgraph",
    "absorption_probabilities",
    "attribute_assortativity",
    "average_degree_connectivity",
    "average_neighbor_degree",
    "degree_assortativity",
    "powerlaw_alpha",
    "rich_club_coefficient",
    "normalized_rich_club",
    "s_metric",
    "k_truss",
    "eccentricity",
    "diameter_lower_bound",
    "reciprocity",
    "louvain_communities",
    "split_disconnected_communities",
    "modularity",
    "cut_metrics",
    "quotient_graph",
    "simrank",
    "scan_clustering",
    "structural_similarity",
    "rmat_graph",
    "watts_strogatz_graph",
    "gnm_graph",
    "zipf_graph",
    "sbm_graph",
    "find_pattern",
    "temporal_reachability",
    "aggregate_messages",
    "feature_propagation",
    "wl_colors",
    "wl_fingerprint",
    "spread_activation",
    "transition_matrix",
    "transition_power",
    "sinkhorn_normalize",
    "random_walks",
    "Node2Vec",
    "node2vec_walks",
    "spectral_clustering",
    "closeness_centrality",
    "harmonic_centrality",
    "global_efficiency",
    "hitting_times",
    "katz_centrality",
    "voterank",
    "hits",
    "eigenvector_centrality",
    "critical_path",
    "topological_layers",
    "minimum_spanning_forest",
    "minimum_spanning_weight",
    "neighborhood_function",
    "hyperball_harmonic",
    "effective_diameter",
    "bipartite_projection",
    "sample_neighbors",
    "sample_neighborhood",
    "maximal_independent_set",
    "maximal_matching",
    "greedy_coloring",
    "shortest_path_lengths",
    "shortest_paths_weighted",
    "shortest_path_tree",
    "reconstruct_path",
    "k_lightest_walks",
    "trustrank",
    "spam_mass",
    "personalized_pagerank_batch",
    "related_nodes",
    "resolve_redirects",
    "rewrite_edges",
    "metapath_walks",
    "pathsim",
    "bowtie_decomposition",
    "shortest_path_lengths_weighted",
    "weighted_closeness_centrality",
    "betweenness_centrality",
    "betweenness_sampled",
    "edge_betweenness_sampled",
    "Embeddings",
    "GraphEmbedding",
    "LouvainCommunities",
    "SpectralClustering",
    "Transition",
    "SparkRandomWalker",
    "SparkSpreadingActivation",
    "moebius_html",
    "moebius_json",
]

__version__ = "0.1.0"
