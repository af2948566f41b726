"""Capture the per-superstep physical plans of the iterative algorithms.

The bench-level ``.explain`` dumps (plans/r06/<q>_before|after.txt) show the
*final* state table — a checkpointed scan — because every loop materializes
its state per superstep.  The optimization claims of round 6 are about the
plan INSIDE the loop, so this script wraps ``DataFrame.localCheckpoint`` /
``collect`` / ``count`` and appends the formatted plan of every join-bearing
DataFrame the algorithms materialize, on a small deterministic fixture.

``spark.sql.autoBroadcastJoinThreshold=-1`` is set so the fixture plans the
same join strategies the sf0.1/100 TB shapes do (state tables there exceed
any broadcast threshold; letting the 3k-node fixture broadcast would hide
the SMJ-vs-SHJ difference the round is about).

Usage:  python scripts/dump_superstep_plans.py <out_dir> <tag>
        (tag = "before" on the r5 checkout, "after" on the r6 tree)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "plans/r06"
TAG = sys.argv[2] if len(sys.argv) > 2 else "after"
CAP = 8  # join-bearing captures per algorithm — superstep 2+ repeats


def main():
    try:  # Spark 4: instances are the classic subclass, patch that
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from linkgraph import LinkGraph
    from linkgraph.session import get_session

    spark = get_session("superstep-plans", cores=8, shuffle_partitions=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    os.makedirs(OUT, exist_ok=True)

    state = {"name": None, "n": 0, "f": None}

    def _dump(df, site):
        if state["name"] is None or state["n"] >= CAP:
            return
        try:
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:
            state["f"].write(f"\n-- capture failed at {site}: {e}\n")
            return
        if "Join" not in plan:
            return  # checkpointed-scan reads, scalar aggs: not evidence
        state["n"] += 1
        state["f"].write(
            f"\n---- capture {state['n']} at {site} "
            f"({state['name']}, tag={TAG}) ----\n{plan}\n"
        )
        state["f"].flush()

    orig_ck = DataFrame.localCheckpoint
    orig_collect = DataFrame.collect
    orig_count = DataFrame.count

    def ck(self, eager=True):
        _dump(self, "localCheckpoint")
        return orig_ck(self, eager)

    def collect(self):
        _dump(self, "collect")
        return orig_collect(self)

    def count(self):
        _dump(self, "count")
        return orig_count(self)

    DataFrame.localCheckpoint = ck
    DataFrame.collect = collect
    DataFrame.count = count

    # deterministic fixture: 3k nodes, out-degree 3, weights, mild skew
    n = 3000
    base = spark.range(n).select(F.col("id").alias("i"))
    edges = None
    for a, b in ((7, 1), (13, 5), (29, 11)):
        leg = base.select(
            F.concat(F.lit("n"), F.col("i")).alias("src"),
            F.concat(F.lit("n"), (F.col("i") * a + b) % n).alias("dst"),
            (F.pmod(F.xxhash64("i") , F.lit(97)).cast("double") + 1.0).alias(
                "weight"
            ),
        )
        edges = leg if edges is None else edges.unionByName(leg)
    edges = edges.where("src != dst")
    edges.write.mode("overwrite").parquet(f"/tmp/superstep_fixture_{TAG}")
    edges = spark.read.parquet(f"/tmp/superstep_fixture_{TAG}")
    g = LinkGraph(edges.select("src", "dst", "weight")).encode_ids()[0]
    gd = LinkGraph(edges.select("src", "dst"))
    gu = LinkGraph(edges.select("src", "dst"), keys={"directed": False}).encode_ids()[0]

    def run(name, fn):
        path = f"{OUT}/{name}_superstep_{TAG}.txt"
        state.update(name=name, n=0, f=open(path, "w"))
        state["f"].write(
            f"== per-superstep join plans: {name} ({TAG}) ==\n"
            "session: autoBroadcastJoinThreshold=-1 (see module docstring)\n"
        )
        try:
            fn()
        except Exception as e:  # keep going; missing capture is visible
            state["f"].write(f"\nERROR during {name}: {e}\n")
        state["f"].close()
        print(f"{name}: {state['n']} captures")
        state.update(name=None, f=None)

    def _pagerank():
        from linkgraph import pagerank

        pagerank(g, tol=0.0, max_iter=2, strategy="distributed")

    def _cc():
        from linkgraph import connected_components

        connected_components(g, method="two_star", strategy="distributed")

    def _lpa():
        from linkgraph import label_propagation

        label_propagation(g, max_iter=2)

    def _scc():
        from linkgraph import strongly_connected_components

        strongly_connected_components(gd, strategy="distributed", max_iter=60)

    def _mst():
        from linkgraph import minimum_spanning_forest

        gw = LinkGraph(
            edges.select("src", "dst", "weight"), keys={"directed": False}
        ).encode_ids()[0]
        minimum_spanning_forest(gw)

    def _kcore():
        from linkgraph import k_core

        k_core(g, 2)

    def _ktruss():
        from linkgraph import k_truss

        k_truss(g, 3)

    def _structsim():
        from linkgraph.algorithms.scan import structural_similarity

        structural_similarity(gd).count()

    def _triads():
        from linkgraph.algorithms.triads import triad_census

        triad_census(gd).collect()

    def _bridges():
        from linkgraph.algorithms.bridges import bridges

        bridges(gu).count()

    def _hitting():
        from linkgraph import hitting_times

        targets = [r["id"] for r in g.nodes.orderBy("id").limit(10).collect()]
        hitting_times(g, targets, max_iter=2, tol=0.0).values.count()

    def _metapath():
        from linkgraph.algorithms.metapath import metapath_walks

        types = gd.nodes.select(
            "id",
            F.when(F.pmod(F.xxhash64("id"), F.lit(3)) == 0, "S")
            .when(F.pmod(F.xxhash64("id"), F.lit(3)) == 1, "P")
            .otherwise("O")
            .alias("type"),
        )
        metapath_walks(gd, types, ["S", "P", "O"], 2, seed=7).count()

    run("pagerank", _pagerank)
    run("cc_two_star", _cc)
    run("lpa", _lpa)
    run("scc", _scc)
    run("mst", _mst)
    run("kcore", _kcore)
    run("ktruss", _ktruss)
    run("structsim", _structsim)
    run("triad_census", _triads)
    run("bridges", _bridges)
    run("hitting", _hitting)
    run("metapath", _metapath)
    spark.stop()


if __name__ == "__main__":
    main()
