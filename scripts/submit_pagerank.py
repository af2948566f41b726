"""spark-submit entrypoint: converged PageRank over an edge table.

    spark-submit --py-files dist/linkgraph.zip scripts/submit_pagerank.py \
        --edges <parquet path> --out <parquet path> [--tol 1e-6]
        [--max-iter 200] [--undirected] [--checkpoint-dir <path>] [--resume]

Runs on any cluster manager; the session factory only fills in conf that
spark-submit left unset, so cluster --conf wins.
"""

import argparse
import json

from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--undirected", action="store_true")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-interval", type=int, default=5)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--encode-ids", action="store_true")
    args = ap.parse_args()

    from linkgraph import CheckpointManager, LinkGraph, pagerank
    from linkgraph.session import get_session

    # engine defaults for anything spark-submit left unset (cluster conf wins)
    spark = get_session("linkgraph-pagerank")
    edges = spark.read.parquet(args.edges)
    g = LinkGraph(edges, keys={"directed": not args.undirected})
    mapping = None
    if args.encode_ids:
        g, mapping = g.encode_ids()

    mgr = CheckpointManager(args.checkpoint_dir, spark) if args.checkpoint_dir else None
    res = pagerank(
        g,
        tol=args.tol,
        max_iter=args.max_iter,
        checkpoint=mgr,
        checkpoint_interval=args.checkpoint_interval,
        resume=args.resume,
    )
    ranks = res.ranks
    if mapping is not None:
        ranks = ranks.join(mapping, ranks["id"] == mapping["code"]).select(
            mapping["id"], "pagerank"
        )
    ranks.write.mode("overwrite").parquet(args.out)
    print(
        json.dumps(
            {
                "iterations": res.iterations,
                "converged": res.converged,
                "nodes": res.num_nodes,
                "edges": res.num_edges,
                "final_l1": res.history[-1]["l1_delta"] if res.history else None,
            }
        )
    )


if __name__ == "__main__":
    main()
