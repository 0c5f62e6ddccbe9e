"""Synthesize a larger fixture by replicating an existing SF directory
with consistent key offsets — the sf1 rehearsal generator (r5 VERDICT
#6: the strongest local evidence for the 100× claim short of a cluster).

Each replica r shifts every key column by ``r × stride(domain)`` where
stride = max(key)+1 of the source, so foreign keys stay consistent
(orders.o_custkey replica r points at customer replica r) and all keys
remain unique. Dimension tables bounded by the schema itself (region,
nation) are copied once. Timestamps are left unchanged — the time
domain densifies rather than lengthens, matching how event volume
actually grows. Text/embedding payloads repeat across replicas; content
dedup finds them as true duplicates, which only densifies (never
quadratically inflates) the banded candidate buckets.

Usage: python tools/make_scaled_fixture.py [src_sf_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 → /tmp/testdata/sf1 ×10.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

# every BIGINT/INTEGER key domain per table; all other columns ride along
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]
# key domain → which (table, column) pairs share it (FK consistency)
DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import glob
    import shutil

    from pyspark.sql import functions as F

    from dbtransfer_spark.session import get_spark

    spark = get_spark(app_name="make-scaled-fixture")
    os.makedirs(dst, exist_ok=True)

    def write_single_file(df, table: str) -> None:
        """Match the driver-fixture layout: one parquet FILE per table
        (tools like optimize_layout shutil.copy small tables). A single
        file stays scan-parallel — parquet splits at row-group
        boundaries under spark.sql.files.maxPartitionBytes."""
        staging = os.path.join(dst, f"__{table}.staging")
        df.repartition(1).write.mode("overwrite").parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        final = os.path.join(dst, f"{table}.parquet")
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.replace(part, final)
        shutil.rmtree(staging)

    # one metadata-cheap max() probe per key domain
    stride: dict[tuple[str, str], int] = {}
    for dom, sites in DOMAINS.items():
        hi = 0
        for table, col in sites:
            df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
            hi = max(hi, int(df.agg(F.max(col)).first()[0]))
        for site in sites:
            stride[site] = hi + 1

    for table in COPY_ONCE:
        write_single_file(
            spark.read.parquet(os.path.join(src, f"{table}.parquet")), table
        )
        print(f"{table}: copied once")

    for table, keys in KEYED.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        # replica index via a generator column, then one shifted select —
        # a single narrow pass writing factor× the input, no shuffle
        rep = df.select(F.explode(F.expr(f"sequence(0, {factor - 1})")).alias("__r"), "*")
        shifted = rep.select(
            *[
                (
                    (F.col(c) + F.col("__r") * F.lit(stride[(table, c)])).cast(
                        dict(df.dtypes)[c]
                    ).alias(c)
                    if c in keys
                    else F.col(c)
                )
                for c in df.columns
            ]
        )
        write_single_file(shifted, table)
        n = spark.read.parquet(os.path.join(dst, f"{table}.parquet")).count()
        print(f"{table}: ×{factor} → {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
