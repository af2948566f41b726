"""Motif / pattern matching — a GraphFrames-`find` style structural query
over the edge table.

Beyond the reference (``mercury/`` has no motif DSL; GraphFrames' `find` is
the public precedent this mirrors): patterns are ``;``-separated edge terms

    (a)-[e]->(b)        named vertices a, b and named edge e
    (a)-[]->(b)         anonymous edge
    ()-[]->(b)          anonymous vertex (unnamed, but each binding still
                        counts — GraphFrames multiplicity parity)
    !(a)-[]->(b)        NEGATED term: no a→b edge exists

Result: one row per binding of the NAMED variables — vertex vars as id
columns, edge vars as (src, dst) structs. Repeated vertex names unify (the
triangle ``(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)`` joins on both ends).
As in GraphFrames, distinct terms may bind the same vertex to one id unless
the pattern constrains otherwise, and negated terms may not introduce new
variables or name their edge.

Execution is pure Catalyst: each positive term is one equi-join of the
accumulated binding table against the edge-table projection —
shared variables become join keys, fresh variables extend the schema;
negated terms compile to ``left_anti`` joins. No windows, no UDFs, no
driver-side enumeration — the planner sees an ordinary join DAG (AQE picks
broadcast/shuffle per step), so a pattern over a 100 TB edge table scales
exactly like the equivalent hand-written joins. Terms sharing no variable
with the accumulated bindings produce an explicit crossJoin (as
GraphFrames), which is the caller's modeling choice.

Duplicate-edge caution: the match multiplicity follows the edge table
(multi-edges multiply rows), as with raw joins.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import DST, SRC, LinkGraph

_TERM_RE = re.compile(
    r"^(?P<neg>!)?\((?P<src>[A-Za-z_][A-Za-z0-9_]*)?\)"
    r"-\[(?P<edge>[A-Za-z_][A-Za-z0-9_]*)?\]->"
    r"\((?P<dst>[A-Za-z_][A-Za-z0-9_]*)?\)$"
)


def _parse(pattern: str) -> list[dict]:
    terms = []
    for raw in pattern.split(";"):
        t = raw.strip().replace(" ", "")
        if not t:
            continue
        m = _TERM_RE.match(t)
        if not m:
            raise ValueError(
                f"bad pattern term {raw.strip()!r} — expected "
                "'(a)-[e]->(b)', with optional names and a leading '!' "
                "for negation"
            )
        d = m.groupdict()
        if d["neg"]:
            if d["edge"]:
                raise ValueError(f"negated term {raw.strip()!r} cannot name its edge")
            if not d["src"] or not d["dst"]:
                raise ValueError(
                    f"negated term {raw.strip()!r} cannot use anonymous vertices"
                )
        terms.append(d)
    if not terms:
        raise ValueError("empty pattern")
    if all(t["neg"] for t in terms):
        raise ValueError("pattern needs at least one positive term")
    return terms


def find_pattern(graph: LinkGraph, pattern: str) -> DataFrame:
    """Match ``pattern`` against the graph's directed edge table; returns
    one row per binding with a column per named vertex var and a
    (src, dst) struct per named edge var."""
    terms = _parse(pattern)
    # no implicit persist: the projection is one scan of the (typically
    # parquet or caller-cached) edge table per term, and a hidden persist
    # here would leak cache across calls — callers matching many patterns
    # against one graph should cache graph.edges themselves (the engine's
    # caller-owned-cache convention)
    edges = graph.edges.select(SRC, DST)

    bound: DataFrame | None = None
    cols: set[str] = set()
    edge_vars: set[str] = set()
    negated: list[dict] = []
    anon = 0

    for t in terms:
        if t["neg"]:
            negated.append(t)
            continue
        s, d, e = t["src"], t["dst"], t["edge"]
        if s is None:
            s, anon = f"__anon{anon}", anon + 1
        if d is None:
            d, anon = f"__anon{anon}", anon + 1
        if s == d:
            raise ValueError(
                "positive self-loop terms '(a)-[]->(a)' are not supported"
            )
        clash = [v for v in (s, d) if v in edge_vars]
        if clash:
            raise ValueError(
                f"vertex variable(s) {clash} already bound as edge variables"
            )
        step = edges.select(F.col(SRC).alias(s), F.col(DST).alias(d))
        if e:
            if e in cols or e in (s, d):
                raise ValueError(
                    f"edge variable {e!r} collides with an existing binding"
                )
            step = step.withColumn(
                e, F.struct(F.col(s).alias("src"), F.col(d).alias("dst"))
            )
        if bound is None:
            bound = step
        else:
            keys = [c for c in (s, d) if c in cols]
            bound = bound.join(step, keys) if keys else bound.crossJoin(step)
        cols |= {s, d}
        if e:
            cols.add(e)
            edge_vars.add(e)

    for t in negated:
        s, d = t["src"], t["dst"]
        missing = [v for v in (s, d) if v not in cols]
        if missing:
            raise ValueError(
                f"negated term uses unbound variable(s) {missing} — negation "
                "cannot introduce new variables"
            )
        non_vertex = [v for v in (s, d) if v in edge_vars]
        if non_vertex:
            raise ValueError(
                f"negated term endpoint(s) {non_vertex} are edge variables, "
                "not vertices"
            )
        if s == d:
            # '!(a)-[]->(a)': a has no self-loop
            step = edges.filter(F.col(SRC) == F.col(DST)).select(
                F.col(SRC).alias(s)
            )
            bound = bound.join(step, [s], "left_anti")
        else:
            step = edges.select(F.col(SRC).alias(s), F.col(DST).alias(d))
            bound = bound.join(step, [s, d], "left_anti")

    named = [c for c in bound.columns if not c.startswith("__anon")]
    return bound.select(*sorted(named))
