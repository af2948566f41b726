"""TrustRank and spam mass — seed-propagated trust on a link graph.

NOT present in the reference (its PageRank is the uniform-teleport variant
only, ``mercury/graph/core/graph.py``'s pagerank surface); added because
trust propagation from a vetted seed set is THE canonical link-graph
anti-spam workload (Gyöngyi, Garcia-Molina, Pedersen, "Combating Web Spam
with TrustRank", VLDB 2004; Gyöngyi et al., "Link Spam Detection Based on
Mass Estimation", VLDB 2006 — both public).

Both operators are thin, exactly-specified compositions over the engine's
personalized PageRank superstep (``pagerank.py``: broadcast-seed teleport,
seed-redistributed dangling mass, one shuffle per superstep), so they
inherit its strategy gate, checkpoint/resume wiring, and plan shape for
free — no new distributed machinery, no new scale risks:

- ``trustrank``: personalized PageRank whose teleport distribution is the
  (weighted) good-seed set. Trust flows FORWARD along hyperlinks from the
  seeds, attenuated by the damping factor per hop — the paper's iterative
  formulation (its §4.3 matrix form) is exactly PPR with p = seed
  distribution, which is what we run.
- ``spam_mass``: the mass-estimation detector. With PR the uniform-teleport
  ranks and PR_good the paper's good-core ranks (teleport 1/N on each of
  the n_g good nodes — an UNNORMALIZED jump vector of total mass n_g/N),
  absolute spam mass M(v) = PR(v) − PR_good(v) and relative spam mass
  m(v) = M(v)/PR(v). PageRank is linear in the teleport vector, so
  PR_good = (n_g/N) · PPR_normalized — one scalar rescale of the same
  converged PPR, not a third power iteration. High m(v) ⇒ most of v's rank
  arrives from beyond the trusted core ⇒ spam candidate.

Scale shape: two PPR/PageRank runs (spam_mass) or one (trustrank), a
broadcast seed join, and one final rank-side join — all existing audited
plans. Seed sets are driver-small by contract (a vetted whitelist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.algorithms.pagerank import pagerank
from linkgraph.graph import ID, LinkGraph


def _seed_dict(seeds) -> dict:
    if isinstance(seeds, dict):
        d = {k: float(v) for k, v in seeds.items()}
    else:
        d = {s: 1.0 for s in seeds}
    if not d:
        raise ValueError("seeds must be non-empty")
    return d


def trustrank(
    graph: LinkGraph,
    seeds,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    **pagerank_kwargs,
) -> DataFrame:
    """DataFrame[id, trustrank] — trust propagated from ``seeds`` (a list of
    node ids, uniformly weighted, or an {id: weight} dict — e.g. oracle-
    graded seed scores). Sums to 1 over the graph; nodes unreachable from
    every seed get exactly the rank the seed-redistributed dangling mass
    grants them (0 on dangling-free graphs). ``pagerank_kwargs`` pass
    through (strategy, checkpoint, num_partitions, ...)."""
    res = pagerank(
        graph,
        damping=damping,
        tol=tol,
        max_iter=max_iter,
        personalization=_seed_dict(seeds),
        **pagerank_kwargs,
    )
    return res.ranks.select(ID, F.col("pagerank").alias("trustrank"))


def spam_mass(
    graph: LinkGraph,
    good_seeds,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    **pagerank_kwargs,
) -> DataFrame:
    """DataFrame[id, pagerank, trustrank, spam_mass, relative_spam_mass] —
    the VLDB'06 mass-estimation detector. ``trustrank`` here is the paper's
    UNNORMALIZED good-core rank (total mass n_good/N, so it is directly
    comparable to ``pagerank``); ``spam_mass`` = pagerank − trustrank;
    ``relative_spam_mass`` = spam_mass/pagerank (in (−∞, 1]; ~1 ⇒ rank
    arrives almost entirely from outside the trusted core, ≤0 ⇒ the core
    over-supplies it). Uniform-teleport PageRank gives every node positive
    rank, so the ratio is always defined.

    ``good_seeds`` must be UNIFORMLY weighted (a list/set, or a dict whose
    values are all equal): the paper's n_good/N rescale converts the
    core-uniform teleport into the per-node (1−d)/N budget of the full
    PageRank, and that conversion is only exact under uniform core
    teleport. A weighted dict would silently produce a ``trustrank``
    column that is not PR_good (ADVICE r4) — rejected. Use
    :func:`trustrank` directly for weighted trust propagation."""
    seed_d = _seed_dict(good_seeds)
    if len(set(seed_d.values())) > 1:
        raise ValueError(
            "spam_mass requires uniformly-weighted good seeds (the "
            "n_good/N mass rescale is only correct for the paper's "
            "uniform good-core teleport); pass a list/set, or use "
            "trustrank() for weighted seeds"
        )
    # seeds absent from the node table carry no teleport mass (pagerank
    # reindexes over graph nodes) — they must not inflate the n_g/N rescale
    node_ids = graph.nodes.select(ID)
    counts = node_ids.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col(ID).isin(list(seed_d)), 1)).alias("ng"),
    ).collect()[0]
    n, n_good = counts["n"], counts["ng"]
    if n_good == 0:
        raise ValueError("no good seed is present in the graph")
    pr = pagerank(
        graph, damping=damping, tol=tol, max_iter=max_iter, **pagerank_kwargs
    ).ranks
    tr = trustrank(
        graph,
        seed_d,
        damping=damping,
        tol=tol,
        max_iter=max_iter,
        **pagerank_kwargs,
    )
    scale = float(n_good) / float(n)
    return (
        pr.join(tr, ID, "left")
        .select(
            ID,
            "pagerank",
            (F.coalesce(F.col("trustrank"), F.lit(0.0)) * scale).alias("trustrank"),
        )
        .withColumn("spam_mass", F.col("pagerank") - F.col("trustrank"))
        .withColumn(
            "relative_spam_mass", F.col("spam_mass") / F.col("pagerank")
        )
    )
