"""Estimator-class surface mirroring the reference's trainer API names
(``LouvainCommunities``, ``SpectralClustering``, ``Transition``,
``SparkRandomWalker``, ``SparkSpreadingActivation`` — each a ``BaseClass``
subclass in mercury/graph/ml/*.py): thin, stateful wrappers over this
engine's functional algorithms, with ``fit()`` storing results in
scikit-style ``*_`` attributes and ``get_params``/``repr`` from
:class:`linkgraph.base.BaseEstimator`.

The functional API (``louvain_communities`` etc.) stays the primary surface;
these classes exist so a user of the reference can keep their call sites."""

from __future__ import annotations

from pyspark.sql import DataFrame

from linkgraph.base import BaseEstimator
from linkgraph.graph import LinkGraph


class LouvainCommunities(BaseEstimator):
    """Parity with mercury/graph/ml/louvain.py:19-110 (LouvainCommunities):
    same constructor parameters; ``fit`` sets ``labels_``, ``modularity_``,
    ``passes_``."""

    def __init__(
        self,
        min_modularity_gain: float = 1e-3,
        max_pass: int = 2,
        max_iter: int = 10,
        resolution: float = 1.0,
        all_partitions: bool = True,
    ):
        self.min_modularity_gain = min_modularity_gain
        self.max_pass = max_pass
        self.max_iter = max_iter
        self.resolution = resolution
        self.all_partitions = all_partitions

    def fit(self, graph: LinkGraph) -> "LouvainCommunities":
        from linkgraph.algorithms.louvain import louvain_communities

        res = louvain_communities(
            graph,
            min_modularity_gain=self.min_modularity_gain,
            max_pass=self.max_pass,
            max_iter=self.max_iter,
            resolution=self.resolution,
            all_partitions=self.all_partitions,
        )
        self.labels_ = res.labels
        self.modularity_ = res.modularity
        self.passes_ = res.passes
        return self


class SpectralClustering(BaseEstimator):
    """Parity with mercury/graph/ml/spectral.py:18-60 (constructor names
    n_clusters / max_iterations); ``fit`` sets ``labels_``, ``modularity_``."""

    def __init__(self, n_clusters: int = 2, max_iterations: int = 10):
        self.n_clusters = n_clusters
        self.max_iterations = max_iterations

    def fit(self, graph: LinkGraph) -> "SpectralClustering":
        from linkgraph.algorithms.spectral import spectral_clustering

        res = spectral_clustering(
            graph, k=self.n_clusters, max_iter=self.max_iterations
        )
        self.labels_ = res.labels
        self.modularity_ = res.modularity
        return self


class Transition(BaseEstimator):
    """Parity with mercury/graph/ml/transition.py:12-95: ``fit`` builds the
    row-stochastic matrix (``matrix_``); ``to_power(k)`` is the distributed
    T^k (binary exponentiation) replacing the reference's driver-side
    ``numpy.linalg.matrix_power``."""

    def __init__(self):
        pass

    def fit(self, graph: LinkGraph) -> "Transition":
        from linkgraph.algorithms.transition import transition_matrix

        self.matrix_ = transition_matrix(graph)
        return self

    def to_power(self, k: int = 1) -> DataFrame:
        from linkgraph.algorithms.transition import transition_power

        if not hasattr(self, "matrix_"):
            raise ValueError("call fit() before to_power()")
        return transition_power(self.matrix_, k)

    def to_pandas(self, num_iterations: int = 1, max_nodes: int = 10_000):
        """Dense T^num_iterations as a pandas DataFrame with node-labeled
        rows and columns — the reference's driver-side convenience
        (mercury/graph/ml/transition.py:69-95, `$s_{t+k} = T^k s_t$`).
        ``num_iterations=0`` is the identity, matching
        ``numpy.linalg.matrix_power(adj, 0)``.

        Driver-local by definition (an n×n dense frame), so it is guarded:
        raises on graphs above ``max_nodes`` — use ``to_power(k)`` (the
        distributed sparse path) at scale. Rows/columns are sorted by node
        id (the reference uses networkx insertion order; entry values are
        identical)."""
        import numpy as np
        import pandas as pd

        if not hasattr(self, "matrix_"):
            raise ValueError("Error: fit() must be called first.")
        if num_iterations < 0:
            raise ValueError("num_iterations must be >= 0")
        # every state appears as src (dangling states get self-loops in fit)
        n = self.matrix_.select("src").distinct().limit(max_nodes + 1).count()
        if n > max_nodes:
            raise ValueError(
                f"to_pandas is driver-local and guarded at {max_nodes} nodes; "
                "use to_power(k) for the distributed sparse result"
            )
        names = sorted(
            r[0] for r in self.matrix_.select("src").distinct().collect()
        )
        idx = {v: i for i, v in enumerate(names)}
        dense = np.zeros((len(names), len(names)))
        if num_iterations == 0:
            np.fill_diagonal(dense, 1.0)
        else:
            sparse = (
                self.matrix_ if num_iterations == 1 else self.to_power(num_iterations)
            )
            for r in sparse.collect():
                dense[idx[r["src"]], idx[r["dst"]]] = r["prob"]
        return pd.DataFrame(dense, index=names, columns=names)


class SparkRandomWalker(BaseEstimator):
    """Parity with mercury/graph/ml/spark_randomwalker.py:16-60: constructor
    (num_epochs, batch_size, n_sampling_edges); ``fit_predict(graph,
    source_id)`` sets and returns ``paths_``.

    ``batch_size`` in the reference forces a cache/plan break every N
    epochs. This engine's walk loop localCheckpoints EVERY epoch
    (random_walker.py:118) — i.e. the strictest batch_size=1 behavior,
    always on — so the knob is accepted for signature parity and recorded,
    but cannot loosen anything."""

    def __init__(
        self,
        num_epochs: int = 10,
        batch_size: int = 1,
        n_sampling_edges: int | None = None,
        seed: int = 42,
    ):
        self.num_epochs = num_epochs
        self.batch_size = batch_size
        self.n_sampling_edges = n_sampling_edges
        self.seed = seed

    def fit_predict(self, graph: LinkGraph, source_id) -> DataFrame:
        from linkgraph.algorithms.random_walker import random_walks

        self.paths_ = random_walks(
            graph,
            source_id,
            num_epochs=self.num_epochs,
            n_sampling_edges=self.n_sampling_edges,
            seed=self.seed,
        )
        return self.paths_


class SparkSpreadingActivation(BaseEstimator):
    """Parity with mercury/graph/ml/spark_spreadactivation.py:34-90:
    constructor (attribute, spreading_factor, transfer_function, steps,
    influenced_by); ``fit(graph, seed_nodes)`` sets ``influences_``."""

    def __init__(
        self,
        attribute: str = "influence",
        spreading_factor: float = 0.2,
        transfer_function: str = "weighted",
        steps: int = 1,
        influenced_by: bool = False,
    ):
        self.attribute = attribute
        self.spreading_factor = spreading_factor
        self.transfer_function = transfer_function
        self.steps = steps
        self.influenced_by = influenced_by

    def fit(self, graph: LinkGraph, seed_nodes) -> "SparkSpreadingActivation":
        from linkgraph.algorithms.spread_activation import spread_activation

        out = spread_activation(
            graph,
            seed_nodes,
            spreading_factor=self.spreading_factor,
            transfer_function=self.transfer_function,
            steps=self.steps,
            influenced_by=self.influenced_by,
        )
        if self.attribute != "influence":
            out = out.withColumnRenamed("influence", self.attribute)
        self.influences_ = out
        return self
