"""CSR random-walk graph embeddings with elliptic-rotation updates.

Same MODEL as the reference's ``GraphEmbedding`` + ``Embeddings``
(``mercury/graph/embeddings/graphembeddings.py:13-203``,
``mercury/graph/embeddings/embeddings.py:9-164``): weighted random walks
over a flat-array CSR adjacency emit (convergent, divergent) index pairs;
each pair rotates one embedding row toward/away from the other along an
ellipse (embeddings.py:10-23). The kernels here are independent
implementations of that model — the rotation uses the fused closed form
(cos_w − sin_w·s)·u + sin_w·t, and walk sampling is binary-search
(``searchsorted``) over cumulative-weight arrays rather than the
reference's linear subtraction scans. This is a driver-local ML kernel,
not dataflow — it stays numpy (no numba/scipy here: the njit decorator is
a no-op fallback in the reference too, ``mercury/graph/core/_njit.py``).

The CSR arrays (r_ini/r_len/r_sum/r_col/r_wgt,
graphembeddings.py:157-182) are built FROM the engine's distributed
CSR-style grouped adjacency (LinkGraph.grouped_adjacency) and collected —
the distributed layout is the blueprint (BASELINE.json:6); the trainer is
bounded by ``max_nodes`` because embeddings of this kind are a small-graph
tool (the scale path for embeddings is Node2Vec → Word2Vec).

Deviation: RNG is seeded (``numpy.random.default_rng``) for reproducible
tests; the reference uses the global unseeded ``np.random``.
"""

from __future__ import annotations

import numpy as np

from linkgraph.base import BaseEstimator
from linkgraph.graph import ID, LinkGraph


def _rotate_rows(mat, rows, targets, cos_w, sin_w):
    """Lean each row ``r`` toward (sin_w>0) / away from (sin_w<0) row ``t``
    by a fixed angle, in place.

    Uses the closed form: with s = ⟨u,t⟩/⟨u,u⟩ the rotated row
        cos_w·u + sin_w·(t − s·u)  =  (cos_w − sin_w·s)·u + sin_w·t
    is a single fused axpy — no projection vector materialized. Pairs apply
    sequentially so a later pair touching the same row sees the earlier
    update (walk pairs revisit nodes).

    Semantics per the reference's elliptic update
    (mercury/graph/embeddings/embeddings.py:10-23); independent derivation
    and implementation.
    """
    for r, t in zip(rows, targets):
        u = mat[r]
        tv = mat[t]
        s = (u @ tv) / (u @ u)
        mat[r] = (cos_w - sin_w * s) * u + sin_w * tv
    return mat


class Embeddings(BaseEstimator):
    """Dense embedding matrix with converge/diverge rotation learning
    (embeddings.py:26-164)."""

    def __init__(
        self,
        dimension: int,
        num_elements: int = 0,
        mean: float = 0.0,
        sd: float = 1.0,
        learn_step: float = 3.0,
        bidirectional: bool = False,
        seed: int = 42,
    ):
        self.dimension = dimension
        self.num_elements = num_elements
        self.mean = mean
        self.sd = sd
        self.learn_step = learn_step
        self.bidirectional = bidirectional
        self.seed = seed
        self._rng = np.random.default_rng(seed)
        if num_elements > 0:
            self.embeddings_matrix_ = self._rng.normal(
                mean, sd, (num_elements, dimension)
            )

    def fit(self, converge=None, diverge=None):
        w = self.learn_step * np.pi / 180.0
        cos_w, sin_w = np.cos(w), np.sin(w)
        if converge is not None:
            self.embeddings_matrix_ = _rotate_rows(
                self.embeddings_matrix_, converge[:, 0], converge[:, 1], cos_w, sin_w
            )
            if self.bidirectional:
                self.embeddings_matrix_ = _rotate_rows(
                    self.embeddings_matrix_, converge[:, 1], converge[:, 0], cos_w, sin_w
                )
        if diverge is not None:
            self.embeddings_matrix_ = _rotate_rows(
                self.embeddings_matrix_, diverge[:, 0], diverge[:, 1], cos_w, -sin_w
            )
            if self.bidirectional:
                self.embeddings_matrix_ = _rotate_rows(
                    self.embeddings_matrix_, diverge[:, 1], diverge[:, 0], cos_w, -sin_w
                )
        return self

    def as_numpy(self):
        return getattr(self, "embeddings_matrix_", None)

    def get_most_similar_embeddings(self, index: int, k: int = 5, metric="cosine"):
        m = self.as_numpy()
        q = m[index]
        if metric == "cosine":
            sims = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
        elif metric == "euclidean":
            sims = 1.0 / (1.0 + np.linalg.norm(m - q, axis=1))
        else:
            raise ValueError(f"Unknown Distance Metric: {metric}")
        order = np.argsort(sims)[::-1][1 : k + 1]
        return order, sims[order]


class GraphEmbedding(BaseEstimator):
    """CSR-walk trainer (graphembeddings.py:68-244), numpy + seeded RNG."""

    def __init__(
        self,
        dimension: int,
        n_jumps: int,
        max_per_epoch: int | None = None,
        learn_step: float = 3.0,
        bidirectional: bool = False,
        seed: int = 42,
        max_nodes: int = 200_000,
    ):
        self.dimension = dimension
        self.n_jumps = n_jumps
        self.max_per_epoch = max_per_epoch
        self.learn_step = learn_step
        self.bidirectional = bidirectional
        self.seed = seed
        self.max_nodes = max_nodes

    def fit(self, g: LinkGraph):
        # Size guard BEFORE any driver-side materialization: a cheap count
        # (no wide collect) so an oversized graph raises instead of OOMing
        # the driver mid-collect.
        n_check = g.number_of_nodes()
        if n_check > self.max_nodes:
            raise ValueError(
                f"GraphEmbedding is a driver-local trainer (max_nodes="
                f"{self.max_nodes}), graph has {n_check} nodes; "
                "use Node2Vec for large graphs"
            )
        adj = g.grouped_adjacency().collect()  # distributed CSR-style build
        node_set = {r[ID] for r in g.nodes.select(ID).collect()}
        self.node_ids = sorted(node_set)
        idx = {v: i for i, v in enumerate(self.node_ids)}

        n = len(self.node_ids)
        m = sum(r["deg"] for r in adj)
        self.r_ini = np.zeros(n, dtype=np.int64)
        self.r_len = np.zeros(n, dtype=np.int64)
        self.r_sum = np.zeros(n, dtype=np.float64)
        self.r_col = np.zeros(m, dtype=np.int64)
        self.r_wgt = np.zeros(m, dtype=np.float64)
        i = 0
        for row in sorted(adj, key=lambda r: idx[r["src"]]):
            r = idx[row["src"]]
            self.r_ini[r] = i
            self.r_len[r] = row["deg"]
            for entry in row["adj"]:
                self.r_sum[r] += entry["w"]
                self.r_col[i] = idx[entry["dst"]]
                self.r_wgt[i] = entry["w"]
                i += 1
        self.TotW = float(self.r_sum.sum())

        converge, diverge = self._random_walks()
        self.embeddings_ = Embeddings(
            dimension=self.dimension,
            num_elements=n,
            learn_step=self.learn_step,
            bidirectional=self.bidirectional,
            seed=self.seed,
        )
        self.embeddings_.fit(converge, diverge)
        return self

    def _random_walks(self):
        """Weighted walk over the CSR arrays emitting (convergent, divergent)
        index pairs — same sampling distribution as the reference trainer
        (graphembeddings.py:24-65), implemented independently: both the
        restart draw and the next-step draw are O(log deg) ``searchsorted``
        probes into precomputed cumulative-weight arrays instead of scalar
        subtraction scans.
        """
        rng = np.random.default_rng(self.seed)
        n = len(self.r_ini)
        total = self.n_jumps
        budget = self.max_per_epoch if self.max_per_epoch is not None else total
        pos_pairs = np.empty((total, 2), dtype=np.int64)
        neg_pairs = np.empty((total, 2), dtype=np.int64)

        node_cdf = np.cumsum(self.r_sum)  # weighted restart distribution
        edge_cdf = np.cumsum(self.r_wgt)  # per-row slices of one global cumsum

        def draw_start():
            u = node_cdf[-1] * rng.random()
            return min(int(np.searchsorted(node_cdf, u, side="right")), n - 1)

        here = draw_start()
        steps_here = 0
        for t in range(total):
            while self.r_len[here] == 0 or steps_here >= budget:
                here = draw_start()
                steps_here = 0
            steps_here += 1

            lo = self.r_ini[here]
            hi = lo + self.r_len[here]
            floor = edge_cdf[lo - 1] if lo > 0 else 0.0
            u = floor + self.r_sum[here] * rng.random()  # global-cumsum space
            j = min(int(np.searchsorted(edge_cdf[lo:hi], u, side="left")),
                    self.r_len[here] - 1)
            nxt = int(self.r_col[lo + j])

            pos_pairs[t] = (here, nxt)
            foil = int(rng.integers(n))
            while foil == here or foil == nxt:
                foil = int(rng.integers(n))
            neg_pairs[t] = (here, foil)
            here = nxt
        return pos_pairs, neg_pairs

    def __getitem__(self, node_id):
        return self.embeddings_.embeddings_matrix_[self.node_ids.index(node_id)]

    def embedding(self):
        return getattr(self, "embeddings_", None)

    def get_most_similar_nodes(self, node_id, k=5, metric="cosine"):
        import pandas as pd

        node_index = self.node_ids.index(node_id)
        order, sims = self.embeddings_.get_most_similar_embeddings(node_index, k, metric)
        nodes = [self.node_ids[i] for i in order]
        return pd.DataFrame({"word": nodes, "similarity": sims})

    def save(self, file_name: str):
        np.savez_compressed(
            file_name,
            node_ids=np.array(self.node_ids, dtype=object),
            r_ini=self.r_ini, r_len=self.r_len, r_sum=self.r_sum,
            r_col=self.r_col, r_wgt=self.r_wgt,
            emb=self.embeddings_.embeddings_matrix_,
            meta=np.array([self.dimension, self.n_jumps], dtype=np.int64),
        )

    @classmethod
    def load(cls, file_name: str) -> "GraphEmbedding":
        z = np.load(file_name if file_name.endswith(".npz") else file_name + ".npz",
                    allow_pickle=True)
        obj = cls(dimension=int(z["meta"][0]), n_jumps=int(z["meta"][1]))
        obj.node_ids = list(z["node_ids"])
        obj.r_ini, obj.r_len = z["r_ini"], z["r_len"]
        obj.r_sum, obj.r_col, obj.r_wgt = z["r_sum"], z["r_col"], z["r_wgt"]
        obj.TotW = float(obj.r_sum.sum())
        obj.embeddings_ = Embeddings(obj.dimension, 0)
        obj.embeddings_.embeddings_matrix_ = z["emb"]
        return obj
