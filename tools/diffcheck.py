"""Local differential checker — mimics the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, floats
rounded to 9 significant-ish digits, timestamps normalized to ISO).

Usage: python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime

sys.path.insert(0, "/root/repo")


def normalize(v: object) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat().replace("+00:00", "")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(normalize(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from dbtransfer_spark.session import get_spark

    spark = get_spark(app_name="diffcheck", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"okro {name}: rows={len(srows)} (rows-only, no oracle) [{elapsed:.1f}s]")
            if len(srows) == 0 and name not in ("dedup_minhash_lsh",):
                print(f"  note: empty result")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            sh, dh = table_hash(scols, srows), table_hash(dcols, drows)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)} [{elapsed:.1f}s]")
            # show a few differing rows for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i]) if sorted(scols) == sorted(dcols) else None
            sset = {"|".join(normalize(r[i]) for i in order_s) for r in srows}
            if order_d is not None:
                dset = {"|".join(normalize(r[i]) for i in order_d) for r in drows}
                for x in list(sset - dset)[:3]:
                    print(f"    spark-only: {x}")
                for x in list(dset - sset)[:3]:
                    print(f"    duck-only:  {x}")
        else:
            print(f"ok   {name}: rows={len(srows)} hash={table_hash(scols, srows)} [{elapsed:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
