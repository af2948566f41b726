"""Bipartiteness — detection and 2-coloring via the bipartite double cover.

A graph is bipartite iff it has no odd cycle iff its double cover (twin
nodes (v,0)/(v,1); each undirected edge {a,b} becomes (a,0)-(b,1) and
(a,1)-(b,0)) keeps every twin pair in DIFFERENT connected components.
Running the engine's existing distributed CC on the cover therefore answers
bipartiteness with no new superstep machinery — the cover has exactly 2V
nodes and 2E edges, so the scale story is the CC scale story verbatim.

NOT in the reference (no bipartite code under ``mercury/``); parity target
is networkx ``is_bipartite`` / ``bipartite.color``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.algorithms.components import connected_components
from linkgraph.graph import DST, ID, SRC, LinkGraph

# separator that cannot collide with itself: applied once to every cover id
_T0 = "\x01" + "0"
_T1 = "\x01" + "1"


def _cover_components(graph: LinkGraph, **cc_kwargs) -> DataFrame:
    """CC labels of the double cover: DataFrame[id, side, component] with
    side in {0, 1} mapping cover node (id, side)."""
    e = (
        graph.edges.select(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    cover = e.select(
        F.concat(F.col("a"), F.lit(_T0)).alias("src"),
        F.concat(F.col("b"), F.lit(_T1)).alias("dst"),
    ).unionByName(
        e.select(
            F.concat(F.col("a"), F.lit(_T1)).alias("src"),
            F.concat(F.col("b"), F.lit(_T0)).alias("dst"),
        )
    )
    # isolated nodes (and self-loop-only nodes, dropped above as non-
    # bipartite-relevant? no: self-loops are odd cycles — handled by caller)
    # still need twins so the coloring covers every node
    twins = graph.nodes.select(
        F.concat(F.col(ID), F.lit(_T0)).alias("src"),
        F.concat(F.col(ID), F.lit(_T0)).alias("dst"),
    )
    labels = connected_components(
        LinkGraph(cover.unionByName(twins)), with_sizes=False, **cc_kwargs
    )
    split = F.split(F.col(ID), "\x01")
    return labels.select(
        split.getItem(0).alias(ID),
        split.getItem(1).cast("int").alias("side"),
        "component",
    )


def is_bipartite(graph: LinkGraph, **cc_kwargs) -> bool:
    """True iff the undirected simple view of the graph is bipartite
    (networkx ``is_bipartite`` parity; a self-loop is an odd 1-cycle →
    False). One CC run on the double cover + one merged-twin count."""
    has_loop = (
        graph.edges.filter(F.col(SRC) == F.col(DST)).limit(1).count() > 0
    )
    if has_loop:
        return False
    lab = _cover_components(graph, **cc_kwargs)
    merged = (
        lab.filter(F.col("side") == 0)
        .alias("l0")
        .join(
            lab.filter(F.col("side") == 1).alias("l1"),
            (F.col(f"l0.{ID}") == F.col(f"l1.{ID}"))
            & (F.col("l0.component") == F.col("l1.component")),
        )
        .limit(1)
        .count()
    )
    return merged == 0


def bipartite_coloring(graph: LinkGraph, **cc_kwargs) -> DataFrame:
    """DataFrame[id, color] with color ∈ {0, 1}, adjacent nodes differing —
    networkx ``bipartite.color`` semantics (every original component's
    min-id node gets color 0). Raises ``ValueError`` on a non-bipartite
    graph, like networkx.

    Derivation from the cover labels alone: within one original component
    with representative r = min id, cover side-0 of r lands in one cover
    component; v has color 0 iff (v, 0) is in THAT cover component. The
    min-id cover component over side-0 rows IS r's, so one groupBy + one
    join assigns every color — no BFS re-run."""
    has_loop = (
        graph.edges.filter(F.col(SRC) == F.col(DST)).limit(1).count() > 0
    )
    if has_loop:
        raise ValueError("graph is not bipartite (self-loop = odd 1-cycle)")
    lab = _cover_components(graph, **cc_kwargs).persist()
    try:
        l0 = lab.filter(F.col("side") == 0).select(ID, "component")
        l1 = lab.filter(F.col("side") == 1).select(ID, "component")
        if (
            l0.alias("a")
            .join(
                l1.alias("b"),
                (F.col(f"a.{ID}") == F.col(f"b.{ID}"))
                & (F.col("a.component") == F.col("b.component")),
            )
            .limit(1)
            .count()
            > 0
        ):
            raise ValueError("graph is not bipartite (odd cycle found)")
        # original component of v = min(cover components of (v,0),(v,1))
        # restricted to... simpler: group cover components into original
        # components by the min id they contain on side 0.
        # rep component: for each cover component, the min original id in it
        # (side 0 rows only); v is color 0 iff its side-0 cover component
        # contains the GLOBAL min id of v's original component.
        # original component key = min(component over both sides per id)
        both = lab.groupBy(ID).agg(F.min("component").alias("ocomp"))
        # min original id per original component, then its side-0 cover comp
        rep = (
            l0.join(both, ID)
            .groupBy("ocomp")
            .agg(F.min_by("component", F.col(ID)).alias("rep_c0"))
        )
        out = (
            l0.join(both, ID)
            .join(rep, "ocomp")
            .select(
                ID,
                F.when(F.col("component") == F.col("rep_c0"), 0)
                .otherwise(1)
                .cast("int")
                .alias("color"),
            )
        )
        out = out.localCheckpoint(eager=True)
    finally:
        lab.unpersist()
    return out
