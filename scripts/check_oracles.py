"""Self-check replicating the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count + schema + order-insensitive value hash.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, columns):
    """Order-insensitive: sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        canon.append("\x01".join(vals))
    canon.sort()
    return hashlib.sha256("\x02".join(canon).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from linkgraph.session import get_session

    spark = get_session(app_name="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        spark_sec = time.time() - t0
        if name not in oracles:
            print(f"{name:32s} rows={len(s_rows):7d}  (rows-only, {spark_sec:.1f}s)")
            continue
        rel = con.sql(oracles[name])
        d_cols = rel.columns
        d_rows = rel.fetchall()
        ok_rows = len(s_rows) == len(d_rows)
        ok_schema = sorted(s_cols) == sorted(d_cols)
        sh = value_hash(s_rows, s_cols)
        dh = value_hash(d_rows, d_cols)
        ok_hash = sh == dh
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{name:32s} rows={len(s_rows):7d}/{len(d_rows):7d} "
            f"schema={'=' if ok_schema else '!'} hash={'=' if ok_hash else '!'} "
            f"{status} ({spark_sec:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_schema:
                print(f"    spark cols: {s_cols}  duck cols: {d_cols}")
            if not ok_hash and ok_rows and ok_schema:
                s_set = set(map(str, s_rows))
                d_set = set(map(str, d_rows))
                print(f"    only-spark: {list(s_set - d_set)[:3]}")
                print(f"    only-duck : {list(d_set - s_set)[:3]}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
