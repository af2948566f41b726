"""CSR random-walk graph embeddings with elliptic-rotation updates.

Same math as the reference's ``GraphEmbedding`` + ``Embeddings``
(``mercury/graph/embeddings/graphembeddings.py:13-203``,
``mercury/graph/embeddings/embeddings.py:9-164``): weighted random walks
over a flat-array CSR adjacency emit (convergent, divergent) index pairs;
each pair rotates one embedding row toward/away from the other along an
ellipse (embeddings.py:10-23). This is a driver-local ML kernel, not
dataflow — it stays numpy (no numba/scipy here: the njit decorator is a
no-op fallback in the reference too, ``mercury/graph/core/_njit.py``).

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

from linkgraph.graph import ID, LinkGraph


def _elliptic_rotate(em, iu, iv, cos_w, sin_w):
    """Rotate row u toward (sin_w>0) / away from (sin_w<0) row v
    (embeddings.py:10-23)."""
    for i in range(len(iu)):
        j = iu[i]
        u = em[j]
        v = em[iv[i]]
        sc = np.dot(u, v) / np.dot(u, u)
        pv = sc * u
        tv = v - pv
        em[j] = cos_w * pv / sc + sin_w * tv
    return em


class Embeddings:
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
        self.learn_step = learn_step
        self.bidirectional = bidirectional
        self._rng = np.random.default_rng(seed)
        if num_elements > 0:
            self.embeddings_matrix_ = self._rng.normal(
                mean, sd, (num_elements, dimension)
            )

    def fit(self, converge=None, diverge=None):
        w = self.learn_step * np.pi / 180.0
        cos_w, sin_w = np.cos(w), np.sin(w)
        if converge is not None:
            self.embeddings_matrix_ = _elliptic_rotate(
                self.embeddings_matrix_, converge[:, 0], converge[:, 1], cos_w, sin_w
            )
            if self.bidirectional:
                self.embeddings_matrix_ = _elliptic_rotate(
                    self.embeddings_matrix_, converge[:, 1], converge[:, 0], cos_w, sin_w
                )
        if diverge is not None:
            self.embeddings_matrix_ = _elliptic_rotate(
                self.embeddings_matrix_, diverge[:, 0], diverge[:, 1], cos_w, -sin_w
            )
            if self.bidirectional:
                self.embeddings_matrix_ = _elliptic_rotate(
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


class GraphEmbedding:
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
        adj = g.grouped_adjacency().collect()  # distributed CSR-style build
        node_set = {r[ID] for r in g.nodes.select(ID).collect()}
        self.node_ids = sorted(node_set)
        if len(self.node_ids) > self.max_nodes:
            raise ValueError(
                f"GraphEmbedding is a driver-local trainer (max_nodes="
                f"{self.max_nodes}); use Node2Vec for large graphs"
            )
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

    # weighted CSR walk emitting (convergent, divergent) pairs
    # (graphembeddings.py:24-65)
    def _random_node_weighted(self, rng):
        r = self.TotW * rng.random() - 1e-8
        i = 0
        while r > self.r_sum[i]:
            r -= self.r_sum[i]
            i += 1
        return i

    def _random_walks(self):
        rng = np.random.default_rng(self.seed)
        n = len(self.r_ini)
        n_jmp = self.n_jumps
        max_jpe = self.max_per_epoch if self.max_per_epoch is not None else n_jmp
        convrge = np.zeros((n_jmp, 2), dtype=np.int64)
        diverge = np.zeros((n_jmp, 2), dtype=np.int64)

        ori = self._random_node_weighted(rng)
        njm = 0
        for t in range(n_jmp):
            while self.r_len[ori] == 0 or njm >= max_jpe:
                ori = self._random_node_weighted(rng)
                njm = 0
            njm += 1
            rnd = self.r_sum[ori] * rng.random()
            rst = self.r_ini[ori]
            nxt = self.r_col[rst]
            for ic in range(self.r_len[ori]):
                nxt = self.r_col[rst + ic]
                wei = self.r_wgt[rst + ic]
                if wei >= rnd:
                    break
                rnd -= wei
            convrge[t, 0] = ori
            convrge[t, 1] = nxt
            oth = int(n * rng.random())
            while oth == ori or oth == nxt:
                oth = int(n * rng.random())
            diverge[t, 0] = ori
            diverge[t, 1] = oth
            ori = nxt
        return convrge, diverge

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
