"""IVF recall-vs-probe curve: recall@k of the IVF index against brute-force
cosine ground truth on the embeddings table, swept over n_probe.

Writes BENCH/ivf_recall.md. The curve is THE honest ANN quality/cost
statement: n_probe/n_centroids is the fraction of data touched per query,
recall@k is what that buys. Ground truth is cosine_topk (exact, scan-bound).

Usage: python scripts/bench_ivf_recall.py [sf_dir] [n_queries] [k]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from linkgraph.pipeline.similarity import IVFIndex, cosine_topk
    from linkgraph.session import get_session

    spark = get_session("ivf-recall", cores=8, shuffle_partitions=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    id_col, vec_col = emb.columns[0], emb.columns[1]
    n_rows = emb.count()
    n_centroids = 16
    idx = IVFIndex(n_centroids=n_centroids, seed=7).fit(emb)

    qids = [r[0] for r in emb.select(id_col).orderBy(id_col).limit(n_queries).collect()]
    qvecs = {
        r[0]: list(r[1])
        for r in emb.filter(emb[id_col].isin(qids)).select(id_col, vec_col).collect()
    }

    truth = {}
    t0 = time.time()
    for q in qids:
        truth[q] = {r[0] for r in cosine_topk(emb, query_id=q, k=k).collect()}
    brute_sec = time.time() - t0

    rows = []
    for n_probe in (1, 2, 4, 8, 16):
        hits = tot = 0
        t0 = time.time()
        for q in qids:
            got = {r[0] for r in idx.search(qvecs[q], k=k, n_probe=n_probe).collect()}
            hits += len(got & truth[q])
            tot += len(truth[q])
        wall = time.time() - t0
        rows.append((n_probe, hits / tot, wall / n_queries))
        print(f"n_probe={n_probe:2d} recall@{k}={hits/tot:.3f} "
              f"{wall/n_queries*1000:.0f} ms/query")

    with open("BENCH/ivf_recall.md", "w") as f:
        f.write(f"""# IVF recall@{k} vs n_probe ({n_rows} embeddings, {n_centroids} centroids, sf_dir={sf_dir})

Ground truth: brute-force cosine top-{k} ({brute_sec/len(qids)*1000:.0f} ms/query
over {n_queries} queries). Probing n_probe of {n_centroids} lists touches
n_probe/{n_centroids} of the corpus per query.

| n_probe | fraction of data touched | recall@{k} | ms/query |
|---|---|---|---|
""")
        for n_probe, rec, sec in rows:
            f.write(f"| {n_probe} | {n_probe}/{n_centroids} | {rec:.3f} | {sec*1000:.0f} |\n")
        f.write("""
Reading: recall rises monotonically to 1.000 at n_probe=16 (exhaustive probe
≡ brute force — the property the `ivf_cosine_top10` oracle hash-pins), and
the per-query wall tracks the touched fraction plus a fixed driver-side
centroid-ranking cost. At 100 TB the lists live as parquet partitioned by
`_list` (see IVFIndex.fit index_path), so the touched fraction is a FILE
pruning ratio, not a cache-filter ratio.
""")
    print("BENCH/ivf_recall.md written")


if __name__ == "__main__":
    main()
