"""Local differential checker — mirrors the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive value hash computed over PANDAS frames — the same
canonicalization class the driver uses:

- Spark results go through ``toPandas()``; DuckDB results through ``.df()``.
  Whatever dtype mapping those produce IS what gets hashed: a DuckDB
  HUGEINT column lands as float64 (``3.0``) and will NOT match a Spark
  int64 (``3``) — by design.  (r4 shipped 7 such mismatches because the
  old diffcheck normalized floats to 9 significant digits; VERDICT r4
  item #3.)
- No float rounding: full ``repr`` precision.
- No list stringification: array columns crash row sorting exactly like
  the driver's pandas canonicalization does (``unhashable type: 'list'``).

Usage: python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cell_repr(v: object) -> str:
    """Dtype-sensitive cell rendering: int 3 and float 3.0 differ."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "∅"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return "t" if v else "f"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonicalize(df):
    """Sort columns by name, then rows by all columns (pandas sort —
    raises on unhashable cells like lists, same as the driver)."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def frame_hash(df) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        h.update("|".join(cell_repr(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def frame_lines(df) -> set[str]:
    return {"|".join(cell_repr(v) for v in row)
            for row in df.itertuples(index=False, name=None)}


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
            spd = canonicalize(sdf.toPandas())
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(
                f"okro {name}: rows={len(spd)} (rows-only, no oracle) [{elapsed:.1f}s]"
            )
            if len(spd) == 0 and name not in ("dedup_minhash_lsh",):
                print("  note: empty result")
            continue
        try:
            dpd = canonicalize(con.execute(oracles[name]).df())
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb/canon error: {exc}")
            continue
        problems = []
        if len(spd) != len(dpd):
            problems.append(f"rowcount {len(spd)} vs {len(dpd)}")
        if list(spd.columns) != list(dpd.columns):
            problems.append(
                f"cols {list(spd.columns)} vs {list(dpd.columns)}"
            )
        else:
            sh, dh = frame_hash(spd), frame_hash(dpd)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)} [{elapsed:.1f}s]")
            if list(spd.columns) == list(dpd.columns):
                sset, dset = frame_lines(spd), frame_lines(dpd)
                for x in list(sset - dset)[:3]:
                    print(f"    spark-only: {x}")
                for x in list(dset - sset)[:3]:
                    print(f"    duck-only:  {x}")
                if sset == dset:
                    # same value SETS but different reprs/dupes — dtype issue
                    print(f"    dtypes spark: {dict(spd.dtypes.astype(str))}")
                    print(f"    dtypes duck:  {dict(dpd.dtypes.astype(str))}")
        else:
            print(
                f"ok   {name}: rows={len(spd)} hash={frame_hash(spd)} [{elapsed:.1f}s]"
            )
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
