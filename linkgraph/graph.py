"""LinkGraph — an immutable property graph over two Spark DataFrames.

Reproduces the data model of the reference's ``mercury.graph.core.Graph``
(``mercury/graph/core/graph.py:108-550``) with a single distributed backend:

- edges canonicalized to ``src, dst[, weight, ...attrs]`` (graph.py:527-530)
- nodes canonicalized to ``id[, ...attrs]``, deduplicated (graph.py:533)
- nodes inferred as distinct(src) ∪ distinct(dst) when absent (graph.py:535-537)
- undirectedness emulated by materializing reversed edges + distinct
  (graph.py:542-548)
- keys remapping dict {src, dst, id, weight, directed} with the same defaults
  (graph.py:143-157)

Unlike the reference there is no networkx/GraphFrames/DGL conversion layer and
no driver-side dict metrics: every metric is a DataFrame (``graph.py:627,671,
690,716-720`` collect to dicts — a driver bottleneck this engine drops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SRC, DST, WEIGHT, ID = "src", "dst", "weight", "id"

DEFAULT_KEYS = {"src": SRC, "dst": DST, "id": ID, "weight": WEIGHT, "directed": True}


class LinkGraph:
    """Immutable directed/undirected, optionally weighted property graph.

    Parameters
    ----------
    edges : DataFrame with source/destination columns (names remappable via
        ``keys``), optional weight column, arbitrary extra attribute columns.
    nodes : optional DataFrame with an id column (remappable) + attributes.
        Inferred from edges when absent.
    keys : column remapping {"src": ..., "dst": ..., "id": ..., "weight": ...,
        "directed": bool} — same contract as the reference (graph.py:143-157).
    """

    def __init__(
        self,
        edges: DataFrame,
        nodes: DataFrame | None = None,
        keys: dict | None = None,
    ):
        k = dict(DEFAULT_KEYS)
        if keys:
            k.update(keys)
        self._directed = bool(k.get("directed", True))

        e = edges
        if k["src"] != SRC:
            e = e.withColumnRenamed(k["src"], SRC)
        if k["dst"] != DST:
            e = e.withColumnRenamed(k["dst"], DST)
        if k["weight"] != WEIGHT and k["weight"] in e.columns:
            e = e.withColumnRenamed(k["weight"], WEIGHT)
        if SRC not in e.columns or DST not in e.columns:
            raise ValueError(
                f"edges must carry '{k['src']}' and '{k['dst']}' columns; "
                f"got {edges.columns}"
            )
        self._weighted = WEIGHT in e.columns

        if not self._directed:
            # Undirected = edges ∪ reversed, deduplicated (graph.py:542-548).
            rev = e.select(
                F.col(DST).alias(SRC),
                F.col(SRC).alias(DST),
                *[c for c in e.columns if c not in (SRC, DST)],
            )
            # Full-row distinct (not dropDuplicates([src, dst])): parallel
            # edges with different weights/attrs are both kept, matching the
            # reference's edges ∪ reversed → distinct() exactly — a key-only
            # dedup would keep an arbitrary row and make weights
            # nondeterministic for pagerank/louvain.
            e = e.unionByName(rev).distinct()

        if nodes is not None:
            n = nodes
            if k["id"] != ID:
                n = n.withColumnRenamed(k["id"], ID)
            if ID not in n.columns:
                raise ValueError(
                    f"nodes must carry an '{k['id']}' column; got {nodes.columns}"
                )
            n = n.dropDuplicates([ID])
        else:
            # Node inference, exactly graph.py:535-537 — derived from the
            # FINAL edge plan (post undirected doubling; same endpoint set),
            # so the node lineage flows through self._edges: persisting the
            # edges makes node inference a cached scan instead of a re-run
            # of a possibly-expensive upstream derivation.
            n = (
                e.select(F.col(SRC).alias(ID))
                .union(e.select(F.col(DST).alias(ID)))
                .distinct()
            )

        self._edges = e
        self._nodes = n

    # ------------------------------------------------------- constructors

    @classmethod
    def from_pandas(cls, edges, nodes=None, keys: dict | None = None, spark=None):
        """Build from pandas DataFrames — the reference's most-used entry
        point (``mercury/graph/core/graph.py:184-189,472-507``): pandas
        edges/nodes → ``createDataFrame`` → the same canonicalization as the
        Spark-DataFrame constructor."""
        from pyspark.sql import SparkSession

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("from_pandas needs an active SparkSession (or spark=)")
        e = spark.createDataFrame(edges)
        n = spark.createDataFrame(nodes) if nodes is not None else None
        return cls(e, n, keys)

    @classmethod
    def from_networkx(cls, g, spark=None):
        """Build from a networkx graph (reference ``graph.py:180-182``):
        edge attributes (including ``weight``) and node attributes carry
        over; directedness follows ``g.is_directed()``. Attributes present
        on only some elements become NULLs (not NaN-typed object columns),
        and an edge-less graph constructs with empty string-typed edges."""
        import pandas as pd

        def _clean(rows, required):
            pdf = pd.DataFrame(rows)
            for c in required:
                if c not in pdf.columns:
                    pdf[c] = pd.Series(dtype=object)
            # NaN from partially-present attrs breaks createDataFrame type
            # merging; None infers a nullable column of the present type
            return pdf.astype(object).where(pd.notnull(pdf), None)

        edge_rows = [
            {"src": str(u), "dst": str(v), **(attrs or {})}
            for u, v, attrs in g.edges(data=True)
        ]
        node_rows = [{"id": str(n), **(attrs or {})} for n, attrs in g.nodes(data=True)]
        keys = {"directed": bool(g.is_directed())}
        from pyspark.sql import SparkSession

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("from_networkx needs an active SparkSession (or spark=)")
        if edge_rows:
            edges_df = spark.createDataFrame(_clean(edge_rows, ["src", "dst"]))
        else:
            edges_df = spark.createDataFrame([], "src string, dst string")
        nodes_df = (
            spark.createDataFrame(_clean(node_rows, ["id"])) if node_rows else None
        )
        return cls(edges_df, nodes_df, keys)

    # ------------------------------------------------------------------ core

    @property
    def edges(self) -> DataFrame:
        return self._edges

    @property
    def nodes(self) -> DataFrame:
        return self._nodes

    @property
    def is_directed(self) -> bool:
        return self._directed

    @property
    def is_weighted(self) -> bool:
        return self._weighted

    def number_of_nodes(self) -> int:
        return self._nodes.count()

    def number_of_edges(self) -> int:
        return self._edges.count()

    def weight_col(self) -> F.Column:
        """Edge weight as a Column; literal 1.0 when unweighted."""
        return F.col(WEIGHT).cast("double") if self._weighted else F.lit(1.0)

    # ----------------------------------------- reference-API conveniences
    # The reference exposes metrics as driver-side dict properties computed
    # by networkx (graph.py:627,656-690) — a driver bottleneck. These mirror
    # those entry points 1:1 by NAME but return distributed DataFrames.

    @property
    def nodes_colnames(self) -> list:
        """graph.py:349-356 parity."""
        return self._nodes.columns

    @property
    def edges_colnames(self) -> list:
        """graph.py:358-365 parity."""
        return self._edges.columns

    def nodes_as_pandas(self):
        """graph.py:410-426 parity (driver-side materialization — caller's
        explicit choice, unlike the reference's implicit conversions)."""
        return self._nodes.toPandas()

    def edges_as_pandas(self):
        return self._edges.toPandas()

    def nodes_as_dataframe(self) -> DataFrame:
        return self._nodes

    def edges_as_dataframe(self) -> DataFrame:
        return self._edges

    def iter_nodes(self):
        """Stream node Rows to the driver as dicts — the reference's
        NodeIterator semantics (graph.py:27-56) without its per-node
        ``filter(...).first()`` round-trip (one Spark job PER NODE there);
        ``toLocalIterator`` fetches one partition at a time instead."""
        for row in self._nodes.toLocalIterator(prefetchPartitions=True):
            yield row.asDict()

    def iter_edges(self):
        """Stream edge Rows as dicts (EdgeIterator parity, graph.py:58-103),
        partition-at-a-time."""
        for row in self._edges.toLocalIterator(prefetchPartitions=True):
            yield row.asDict()

    def to_networkx(self, max_nodes: int = 100_000, max_edges: int = 1_000_000):
        """Driver-local networkx conversion (the reference's ``networkx``
        property, graph.py:241-254 / 527-533). Guarded: collecting a
        distributed graph is a small-graph operation, so BOTH the node and
        edge counts are probed (``limit(k+1).count()``, O(threshold)) BEFORE
        any materialization — a 50k-node multigraph can still carry billions
        of edges."""
        import networkx as nx

        self._guard_driver_local("to_networkx", max_nodes, max_edges)
        g = nx.DiGraph() if self._directed else nx.Graph()
        for nd in self._nodes.toPandas().to_dict("records"):
            g.add_node(nd.pop(ID), **{k: v for k, v in nd.items() if v is not None})
        for ed in self._edges.toPandas().to_dict("records"):
            u, v = ed.pop(SRC), ed.pop(DST)
            g.add_edge(u, v, **{k: v2 for k, v2 in ed.items() if v2 is not None})
        return g

    def _guard_driver_local(self, op: str, max_nodes: int, max_edges: int):
        """Probe node/edge counts (limit(k+1).count(), O(threshold)) before a
        driver-local materialization; shared by to_networkx-style exports."""
        n_nodes = self._nodes.limit(max_nodes + 1).count()
        if n_nodes > max_nodes:
            raise ValueError(
                f"graph exceeds max_nodes={max_nodes}; {op} is a driver-local "
                "conversion — raise max_nodes explicitly only if the collected "
                "graph fits in driver memory"
            )
        n_edges = self._edges.limit(max_edges + 1).count()
        if n_edges > max_edges:
            raise ValueError(
                f"graph exceeds max_edges={max_edges}; {op} is a driver-local "
                "conversion — raise max_edges explicitly only if the collected "
                "graph fits in driver memory"
            )

    def to_adjacency_arrays(
        self, max_nodes: int = 100_000, max_edges: int = 1_000_000
    ) -> dict:
        """Dense-integer edge arrays for tensor-library handoff — the Spark
        side of the reference's DGL hook (``graph.py:272-284,602-619``, whose
        ``dgl.from_networkx`` path is equally driver-local). Nodes are
        indexed ``0..n-1`` in sorted-id order (deterministic across runs and
        partitionings); undirected graphs already carry both edge directions
        in the canonical edge table, matching ``dgl.from_networkx`` on an
        ``nx.Graph``. Numeric node/edge attribute columns ride along as
        aligned float64 arrays (the reference forwards attrs the same way);
        non-numeric attrs are omitted — tensors can't hold them.

        Returns ``{"ids": list, "num_nodes": int, "src": int64[m],
        "dst": int64[m], "node_attrs": {col: float64[n]},
        "edge_attrs": {col: float64[m]}}`` (WEIGHT appears in edge_attrs
        for weighted graphs). Same size guards as ``to_networkx``."""
        import numpy as np

        self._guard_driver_local("to_adjacency_arrays", max_nodes, max_edges)
        npd = self._nodes.orderBy(ID).toPandas()
        ids = npd[ID].tolist()
        index = {v: i for i, v in enumerate(ids)}
        epd = self._edges.toPandas()
        src_m = epd[SRC].map(index)
        dst_m = epd[DST].map(index)
        n_orphan = int(src_m.isna().sum() + dst_m.isna().sum())
        if n_orphan:
            # only possible with an EXPLICIT nodes table that misses edge
            # endpoints (inferred nodes always cover them); a dense tensor
            # has no slot for an unindexed endpoint — refuse loudly instead
            # of NaN-casting
            raise ValueError(
                f"{n_orphan} edge endpoint(s) missing from the nodes table; "
                "to_adjacency_arrays needs every edge endpoint indexed — "
                "add the missing ids to nodes or drop the dangling edges"
            )
        src = src_m.to_numpy(dtype=np.int64)
        dst = dst_m.to_numpy(dtype=np.int64)
        num = ("int8", "int16", "int32", "int64", "float32", "float64")

        def _numeric(pdf, drop):
            return {
                c: pdf[c].to_numpy(dtype=np.float64)
                for c in pdf.columns
                if c not in drop and str(pdf[c].dtype) in num
            }

        return {
            "ids": ids,
            "num_nodes": len(ids),
            "src": src,
            "dst": dst,
            "node_attrs": _numeric(npd, (ID,)),
            "edge_attrs": _numeric(epd, (SRC, DST)),
        }

    def to_dgl(self, max_nodes: int = 100_000, max_edges: int = 1_000_000):
        """The reference's ``Graph.dgl`` conversion (``graph.py:272-284,
        602-619``) rebuilt on :meth:`to_adjacency_arrays`: the Spark-side
        work (guarded collect, dense indexing, attr alignment) runs here;
        the final ``dgl.graph`` construction is import-gated because dgl and
        torch are optional dependencies. Node/edge numeric attrs land in
        ``g.ndata``/``g.edata`` exactly as the reference's
        ``from_networkx(node_attrs=…, edge_attrs=…)`` would place them."""
        arrays = self.to_adjacency_arrays(max_nodes, max_edges)
        try:
            import dgl
            import torch
        except ImportError as exc:
            raise ImportError(
                "to_dgl needs the optional 'dgl' and 'torch' packages; the "
                "collected tensors are available without them via "
                "to_adjacency_arrays()"
            ) from exc
        g = dgl.graph(
            (torch.from_numpy(arrays["src"]), torch.from_numpy(arrays["dst"])),
            num_nodes=arrays["num_nodes"],
        )
        for name, arr in arrays["node_attrs"].items():
            g.ndata[name] = torch.from_numpy(arr)
        for name, arr in arrays["edge_attrs"].items():
            g.edata[name] = torch.from_numpy(arr)
        return g

    @property
    def dgl(self):
        """Cached DGL conversion — reference ``graph.py:272-284`` parity."""
        if getattr(self, "_as_dgl", None) is None:
            self._as_dgl = self.to_dgl()
        return self._as_dgl

    def __str__(self) -> str:
        # Counts run two small Spark jobs — matches the reference's
        # summary content (graph.py:207-216) minus its format-cache flags.
        return (
            f"linkgraph.LinkGraph with {self.number_of_nodes()} nodes and "
            f"{self.number_of_edges()} edges.\n"
            f"  is_directed: {self._directed}\n"
            f"  is_weighted: {self._weighted}"
        )

    def __repr__(self) -> str:
        # Job-free (a repr that triggers Spark jobs is hostile in a REPL).
        return (
            f"LinkGraph(directed={self._directed}, weighted={self._weighted}, "
            f"edge_cols={self._edges.columns})"
        )

    def closeness_centrality(self, landmarks=None, max_hops: int = 50) -> DataFrame:
        """graph.py:313-320 parity; DataFrame[id, closeness]."""
        from linkgraph.algorithms.closeness import closeness_centrality

        return closeness_centrality(self, landmarks=landmarks, max_hops=max_hops)

    def betweenness_centrality(self, **kwargs) -> DataFrame:
        """graph.py:322-329 parity; DataFrame[id, betweenness]."""
        from linkgraph.algorithms.betweenness import betweenness_centrality

        return betweenness_centrality(self, **kwargs)

    def betweenness_sampled(self, sources=None, **kwargs) -> DataFrame:
        """Distributed source-sampled Brandes estimator (beyond reference);
        DataFrame[id, betweenness]."""
        from linkgraph.algorithms.betweenness import betweenness_sampled

        return betweenness_sampled(self, sources=sources, **kwargs)

    def shortest_paths_weighted(self, sources, **kwargs) -> DataFrame:
        """Weighted multi-source shortest paths (beyond reference);
        DataFrame[id, dist]."""
        from linkgraph.algorithms.sssp import shortest_paths_weighted

        return shortest_paths_weighted(self, sources, **kwargs)

    def local_clustering_coefficient(self) -> DataFrame:
        """Per-node clustering coefficient (beyond reference);
        DataFrame[id, lcc]."""
        from linkgraph.algorithms.triangles import local_clustering_coefficient

        return local_clustering_coefficient(self)

    def degree_assortativity(self) -> float:
        """Degree-degree Pearson correlation over edges (beyond reference)."""
        from linkgraph.algorithms.assortativity import degree_assortativity

        return degree_assortativity(self)

    def weighted_closeness_centrality(self, landmarks=None, **kwargs):
        """Weighted-distance closeness (beyond reference; hop version is
        closeness_centrality); DataFrame[id, closeness]."""
        from linkgraph.algorithms.sssp import weighted_closeness_centrality

        return weighted_closeness_centrality(self, landmarks=landmarks, **kwargs)

    def k_truss(self, k: int, **kwargs):
        """Triangle-support edge peeling (beyond reference);
        DataFrame[src, dst] canonical surviving edges."""
        from linkgraph.algorithms.ktruss import k_truss

        return k_truss(self, k, **kwargs)

    def katz_centrality(self, **kwargs) -> DataFrame:
        """Attenuated-path-count centrality (beyond reference);
        DataFrame[id, katz]."""
        from linkgraph.algorithms.katz import katz_centrality

        return katz_centrality(self, **kwargs)

    def hits(self, **kwargs) -> DataFrame:
        """Kleinberg hubs/authorities (beyond reference);
        DataFrame[id, hub, authority]."""
        from linkgraph.algorithms.katz import hits

        return hits(self, **kwargs)

    def topological_layers(self, **kwargs) -> DataFrame:
        """Longest-path DAG levels (beyond reference); DataFrame[id, layer]."""
        from linkgraph.algorithms.toposort import topological_layers

        return topological_layers(self, **kwargs)

    def minimum_spanning_forest(self, **kwargs) -> DataFrame:
        """Distributed Boruvka MST (beyond reference);
        DataFrame[src, dst, weight]."""
        from linkgraph.algorithms.mst import minimum_spanning_forest

        return minimum_spanning_forest(self, **kwargs)

    def neighborhood_function(self, **kwargs) -> DataFrame:
        """HyperANF hop plot (beyond reference); DataFrame[hop, pairs]."""
        from linkgraph.algorithms.anf import neighborhood_function

        return neighborhood_function(self, **kwargs)

    def hyperball_harmonic(self, **kwargs) -> DataFrame:
        """HyperBall per-node harmonic centrality (beyond reference);
        DataFrame[id, harmonic]."""
        from linkgraph.algorithms.anf import hyperball_harmonic

        return hyperball_harmonic(self, **kwargs)

    def critical_path(self, durations: DataFrame, **kwargs) -> DataFrame:
        """CPM earliest finish + critical predecessor over a DAG (beyond
        reference); DataFrame[id, earliest_finish, critical_pred]."""
        from linkgraph.algorithms.toposort import critical_path

        return critical_path(self, durations, **kwargs)

    def effective_diameter(self, **kwargs) -> int:
        """Smallest hop reaching the given mass fraction (beyond
        reference)."""
        from linkgraph.algorithms.anf import effective_diameter

        return effective_diameter(self, **kwargs)

    def sample_neighbors(self, fanout: int, **kwargs) -> DataFrame:
        """Deterministic md5-priority fanout sample (beyond reference);
        DataFrame[src, dst]."""
        from linkgraph.algorithms.sampling import sample_neighbors

        return sample_neighbors(self, fanout, **kwargs)

    def bipartite_projection(self, **kwargs) -> DataFrame:
        """Co-neighbor projection onto one side (beyond reference);
        DataFrame[a, b, shared]."""
        from linkgraph.algorithms.projection import bipartite_projection

        return bipartite_projection(self, **kwargs)

    def pagerank(self, **kwargs) -> DataFrame:
        """graph.py:331-338 parity; DataFrame[id, pagerank]."""
        from linkgraph.algorithms.pagerank import pagerank

        return pagerank(self, **kwargs).ranks

    def connected_components(self, **kwargs) -> DataFrame:
        """graph.py:340-347 parity; DataFrame[id, component(, component_size)]."""
        from linkgraph.algorithms.components import connected_components

        return connected_components(self, **kwargs)

    def strongly_connected_components(self, **kwargs) -> DataFrame:
        """Beyond-reference surface (no SCC in mercury); DataFrame[id,
        scc(, scc_size)] with scc = min node id in the component."""
        from linkgraph.algorithms.scc import strongly_connected_components

        return strongly_connected_components(self, **kwargs)

    def link_prediction(self, **kwargs) -> DataFrame:
        """Beyond-reference surface; DataFrame[u, v, common, jaccard,
        adamic_adar] over 2-hop candidate pairs."""
        from linkgraph.algorithms.linkpred import link_prediction_scores

        return link_prediction_scores(self, **kwargs)

    def link_prediction_top_k(self, k: int = 10, **kwargs) -> DataFrame:
        """Per-node top-k candidates; DataFrame[node, candidate, rank,
        common, jaccard, adamic_adar]."""
        from linkgraph.algorithms.linkpred import link_prediction_top_k

        return link_prediction_top_k(self, k=k, **kwargs)

    # ------------------------------------------------------ degrees (A1)

    def out_degree(self) -> DataFrame:
        """Per-node out-degree, zero-filled over all nodes (graph.py:645-654)."""
        d = self._edges.groupBy(F.col(SRC).alias(ID)).agg(
            F.count(F.lit(1)).alias("out_degree")
        )
        return self._zero_fill(d, "out_degree")

    def in_degree(self) -> DataFrame:
        d = self._edges.groupBy(F.col(DST).alias(ID)).agg(
            F.count(F.lit(1)).alias("in_degree")
        )
        return self._zero_fill(d, "in_degree")

    def degree(self) -> DataFrame:
        """Total degree via union-of-endpoints, one shuffle instead of two
        joins (pattern from louvain.py:316-323)."""
        ends = self._edges.select(F.col(SRC).alias(ID)).union(
            self._edges.select(F.col(DST).alias(ID))
        )
        d = ends.groupBy(ID).agg(F.count(F.lit(1)).alias("degree"))
        return self._zero_fill(d, "degree")

    def weighted_degree(self) -> DataFrame:
        """Sum of incident edge weights (louvain.py:316-323 union trick)."""
        w = self.weight_col()
        ends = self._edges.select(F.col(SRC).alias(ID), w.alias("w")).union(
            self._edges.select(F.col(DST).alias(ID), w.alias("w"))
        )
        d = ends.groupBy(ID).agg(F.sum("w").alias("weighted_degree"))
        return self._zero_fill(d, "weighted_degree")

    def _zero_fill(self, counts: DataFrame, col: str) -> DataFrame:
        return (
            self._nodes.select(ID)
            .join(counts, ID, "left")
            .select(ID, F.coalesce(F.col(col), F.lit(0)).alias(col))
        )

    # ------------------------------------------- CSR-style grouped adjacency

    def grouped_adjacency(
        self,
        num_partitions: int | None = None,
        reverse: bool = False,
        hub_threshold: int | None = None,
        hub_buckets: int = 32,
    ) -> DataFrame:
        """CSR-style grouped edge lists: one row per source with a sorted
        array of (dst, weight) structs — the distributed analogue of the
        reference's flat-array CSR (graphembeddings.py:157-182). Consumed by
        applyInPandas kernels (walk sampling, set intersection).

        ``collect_list`` is NON-algebraic: without splitting, a hub source's
        entire edge list concentrates in one reduce task. With
        ``hub_threshold`` set, sources above that out-degree are salted into
        ``hub_buckets`` groups (linkgraph.skew.split_hubs) and the result has
        one row per (src, _salt) for hubs — consumers iterate the bounded
        arrays per bucket. Measured on a 8M-degree hub (scripts/
        bench_skew.py, local[8]): salted build 1.56x faster cold (probe
        included), 2.42x with the degree probe amortized; at cluster scale
        the plain path's single hub task is hours, so the threshold matters
        long before this host shows it.

        Returns DataFrame[src(, _salt), adj: array<struct<dst,weight>>,
        deg: long].
        """
        s, d = (DST, SRC) if reverse else (SRC, DST)
        e = self._edges.select(
            F.col(s).alias(SRC), F.col(d).alias(DST), self.weight_col().alias("w")
        )
        if num_partitions:
            e = e.repartition(num_partitions, SRC)
        if hub_threshold is not None:
            from linkgraph.skew import SALT, split_hubs

            flagged = split_hubs(
                e, SRC, degree_threshold=hub_threshold, buckets=hub_buckets
            )
            return flagged.groupBy(SRC, SALT).agg(
                F.sort_array(F.collect_list(F.struct(DST, "w"))).alias("adj"),
                F.count(F.lit(1)).alias("deg"),
            )
        return e.groupBy(SRC).agg(
            F.sort_array(F.collect_list(F.struct(DST, "w"))).alias("adj"),
            F.count(F.lit(1)).alias("deg"),
        )

    # ------------------------------------------------------ id encoding

    def encode_ids(self, check_collisions: bool = False):
        """Dictionary-encode arbitrary node ids to dense 64-bit longs via
        xxhash64 — a map-side-only encoding (no global window, unlike the
        reference's single-partition ``row_number().over(Window.orderBy)``
        at louvain.py:129). Collision odds at n nodes ≈ n²/2^65 (negligible
        below ~10^8 nodes; for 10^12-scale use a sorted-bucket dictionary
        instead — ``check_collisions=True`` verifies injectivity).

        Returns (encoded LinkGraph, mapping DataFrame[id, code]).
        """
        mapping = self._nodes.select(ID, F.xxhash64(ID).alias("code"))
        if check_collisions:
            n_ids = mapping.count()
            n_codes = mapping.select("code").distinct().count()
            if n_codes != n_ids:
                raise ValueError(
                    f"xxhash64 id collision: {n_ids} ids -> {n_codes} codes; "
                    "use an explicit dictionary"
                )
        extra = [c for c in self._edges.columns if c not in (SRC, DST)]
        edges_enc = self._edges.select(
            F.xxhash64(SRC).alias(SRC), F.xxhash64(DST).alias(DST), *extra
        )
        nodes_enc = self._nodes.select(F.xxhash64(ID).alias(ID))
        g = LinkGraph(edges_enc, nodes=nodes_enc, keys={"directed": True})
        g._directed = self._directed  # doubling already materialized
        return g, mapping

    # --------------------------------------------------------- ego subgraph

    def ego_subgraph(self, node_id, depth: int = 1, limit: int | None = None):
        """BFS-expanded ego subgraph (Moebius viz logic, moebius.py:266-331,
        minus the UI): returns (nodes_df, edges_df) restricted to nodes within
        ``depth`` hops of ``node_id``, optionally capped at ``limit`` nodes.
        Iterative union+distinct frontier expansion as moebius.py:266-294,
        but with joins instead of driver-side sets.
        """
        spark = self._edges.sparkSession
        frontier = spark.createDataFrame([(node_id,)], [ID])
        reached = frontier
        # An ego ball is usually tiny, so the semi-joins want BroadcastHash
        # (the big edge table scanned, never shuffled) — but a hub-centered
        # ball on a skewed graph can reach tens of millions of nodes, where a
        # forced broadcast would blow the 8 GB limit. The sets are
        # localCheckpointed each level, so counting them is a cheap cached
        # scan; past the threshold the hint is dropped and Catalyst falls
        # back to a shuffle join. localCheckpoint also stops the 2^depth
        # lineage/recompute blowup of the naive iterative-union plan.
        bc_max = 5_000_000

        def hinted(df, n_rows):
            return F.broadcast(df) if n_rows <= bc_max else df

        n_reached = 1
        for _ in range(depth):
            f_hint = hinted(frontier, n_reached)
            nbrs = (
                self._edges.join(f_hint, F.col(SRC) == F.col(ID), "leftsemi")
                .select(F.col(DST).alias(ID))
                .union(
                    self._edges.join(
                        f_hint, F.col(DST) == F.col(ID), "leftsemi"
                    ).select(F.col(SRC).alias(ID))
                )
                .distinct()
            )
            frontier = nbrs.join(
                hinted(reached, n_reached), ID, "left_anti"
            ).localCheckpoint(eager=True)
            reached = reached.union(frontier).distinct().localCheckpoint(eager=True)
            n_reached = reached.count()
        if limit:
            reached = reached.limit(limit)
            n_reached = min(n_reached, limit)
        r_hint = hinted(reached, n_reached)
        sub_edges = self._edges.join(
            r_hint, F.col(SRC) == F.col(ID), "leftsemi"
        ).join(
            hinted(reached.withColumnRenamed(ID, "_rid"), n_reached),
            F.col(DST) == F.col("_rid"),
            "leftsemi",
        )
        sub_nodes = self._nodes.join(hinted(reached.select(ID), n_reached), ID, "leftsemi")
        return sub_nodes, sub_edges
