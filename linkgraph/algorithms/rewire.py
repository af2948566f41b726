"""Degree-preserving edge rewiring — parallel double-edge swap rounds for
configuration-model null graphs (Maslov & Sneppen'02; the null model behind
normalized rich-club coefficients and motif significance profiles).

NOT in the reference (no null-model surface under ``mercury/``). Sequential
Markov-chain rewiring cannot scale; this is the parallel-round analogue:

1. each round, every arc draws r = h60(seed, round, src, dst) and lands in
   bucket r mod ⌈m/2⌉; each bucket collects its arcs into ONE hash-sorted
   array (bounded: mean 2, max O(log m) w.h.p. — no window);
2. consecutive array slots are swap partners: ((a,b),(c,d)) → ((a,d),(c,b))
   when the round's coin h60(seed, round, "coin", bucket, slot) is even AND
   the swap creates no self-loop; odd slots at array end pass through;
3. swapped or not, every arc is re-emitted exactly once — so in/out degree
   multisets are preserved EXACTLY, every round, by construction.

Documented trade (stated, not hidden): a swap may produce an arc that
already exists elsewhere, so the output is a multiset (multigraph) with a
small duplicate rate (~density); the standard large-scale relaxation —
duplicate-rejecting swaps need a global membership check per proposal,
which serializes the chain. Degree preservation is unconditional; callers
needing a simple graph run ``.distinct()`` and accept the (measured,
disclosed) edge loss, or rewire sparse graphs where collisions are rare.

Every draw is md5-u60 of deterministic parts — runs replay across
partitionings, retries, and engines (the negative-sampler discipline).

Scale notes per round: one projection, one bounded collect_list groupBy,
one explode — no joins at all. Self-loops in the INPUT pass through
untouched (they never enter a valid swap)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.generators import _h60
from linkgraph.graph import DST, SRC, LinkGraph


def rewire_edges(
    graph: LinkGraph, rounds: int = 1, seed: int = 42
) -> DataFrame:
    """DataFrame[src, dst] — the arc multiset after ``rounds`` parallel
    double-edge-swap rounds (module docstring). In/out degree multisets
    equal the input's exactly."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = graph.edges.select(SRC, DST)
    m = e.count()
    if m < 2:
        return e
    n_buckets = (m + 1) // 2
    for rnd in range(rounds):
        seed_s = F.lit(f"{seed}:{rnd}")
        arr = (
            e.select(
                (_h60(seed_s, SRC, DST) % n_buckets).alias("_b"),
                F.struct(
                    _h60(F.lit("slot"), seed_s, SRC, DST).alias("_h"),
                    F.col(SRC).alias("s"),
                    F.col(DST).alias("d"),
                ).alias("_m"),
            )
            .groupBy("_b")
            .agg(F.sort_array(F.collect_list("_m")).alias("_arr"))
        )
        # pair consecutive slots; emit both arcs of each pair (swapped when
        # the coin is even and no self-loop would result), plus the odd
        # tail slot verbatim
        pairs = arr.select(
            "_b",
            "_arr",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size("_arr") - 1) / 2).cast("int"),
                )
            ).alias("_i"),
        )
        first = F.element_at("_arr", 2 * F.col("_i") + 1)
        # try_: the odd tail's partner slot is out of bounds → null
        # (plain element_at THROWS under ANSI)
        second = F.try_element_at("_arr", 2 * F.col("_i") + 2)
        coin = _h60(seed_s, F.lit("coin"), F.col("_b"), F.col("_i")) % 2
        do_swap = (
            second.isNotNull()
            & (coin == 0)
            & (first["s"] != second["d"])
            & (second["s"] != first["d"])
        )
        out1 = F.when(
            do_swap, F.struct(first["s"].alias("s"), second["d"].alias("d"))
        ).otherwise(F.struct(first["s"].alias("s"), first["d"].alias("d")))
        out2 = F.when(
            do_swap, F.struct(second["s"].alias("s"), first["d"].alias("d"))
        ).otherwise(
            F.struct(second["s"].alias("s"), second["d"].alias("d"))
        )
        e = (
            pairs.select(F.explode(F.array(out1, out2)).alias("_e"))
            .filter(F.col("_e").isNotNull() & F.col("_e.s").isNotNull())
            .select(F.col("_e.s").alias(SRC), F.col("_e.d").alias(DST))
        )
        if rounds > 1:
            e = e.localCheckpoint(eager=True)
    return e
