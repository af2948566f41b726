"""Bipartite projection — co-neighbor graphs (co-purchase, co-change).

NOT present in the reference as an operator (its user guides build
co-occurrence edges by hand before constructing a Graph); added because
"project the bipartite interaction table onto one side" is how most real
link graphs are BORN (customers×parts → co-purchase, commits×files →
co-change), and the naive projection is the classic quadratic blow-up: an
item connected to k nodes emits k·(k−1)/2 pairs, so one 10M-degree hub
item emits 5·10¹³ rows.

Scale shape: ``max_item_degree`` drops hub items BEFORE the self-join
(one algebraic degree agg + semi-join — same boilerplate-cap pattern as
dedup's shingle cap and linkpred's wedge cap), then one equi-self-join on
the item key and one groupBy(a, b) count. ``min_shared`` prunes the weak
tail before the shuffle writes it. No windows, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, SRC, LinkGraph


def bipartite_projection(
    graph: LinkGraph,
    onto: str = "src",
    min_shared: int = 1,
    max_item_degree: int | None = None,
) -> DataFrame:
    """DataFrame[a, b, shared] — nodes of the ``onto`` side (``"src"`` or
    ``"dst"``), one row per unordered pair (a < b) sharing ≥ ``min_shared``
    neighbors on the other side; ``shared`` counts the co-neighbors.

    ``max_item_degree`` excludes other-side items whose degree exceeds the
    cap — the documented hub guard: a projection THROUGH a universal item
    is all-pairs and carries no signal (every co-purchase analysis drops
    the best-seller). ``None`` = no cap (exact projection).
    """
    if onto not in ("src", "dst"):
        raise ValueError(f"onto must be 'src' or 'dst', got {onto!r}")
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    node_col, item_col = (SRC, DST) if onto == "src" else (DST, SRC)
    e = graph.edges.select(
        F.col(node_col).alias("n"), F.col(item_col).alias("i")
    ).distinct()
    if max_item_degree is not None:
        keep = (
            e.groupBy("i")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") <= max_item_degree)
            .select("i")
        )
        e = e.join(keep, "i", "left_semi")
    e2 = e.select(F.col("n").alias("n2"), F.col("i"))
    return (
        e.join(e2, "i")
        .filter(F.col("n") < F.col("n2"))
        .groupBy(F.col("n").alias("a"), F.col("n2").alias("b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
