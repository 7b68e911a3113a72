#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same sf dir; compare row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return str(int(val))
    if isinstance(val, float):
        return f"{val:.9g}"
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from src_to_kb_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"~ {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_hash = ok_cols and table_hash(scols, srows) == table_hash(ocols, orows)
        status = "✓" if (ok_rows and ok_cols and ok_hash) else "✗"
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)} "
            f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"hash={'ok' if ok_hash else 'MISMATCH'} ({time.time()-t0:.1f}s)"
        )
        if not (ok_rows and ok_cols and ok_hash):
            failures.append(name)
            if ok_cols:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {tuple(canon(r[i]) for i in order) for r in srows}
                oord = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = {tuple(canon(r[i]) for i in oord) for r in orows}
                print("   spark-only:", list(sset - oset)[:3])
                print("   duck-only :", list(oset - sset)[:3])
    print("\nFAILURES:" if failures else "\nALL OK", failures or "")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
