"""Table catalog: load fixture/source tables and register views.

The reference enumerates tables from a YAML config and introspects the
source catalog per engine (column list: /root/reference/internal/migration/
mysql/mysql.go:382-404; key detection: mysql.go:681-737). Here the catalog
is Spark's own: ``spark.read`` gives us the StructType for free, and temp
views expose every table to the SQL surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Primary keys per fixture table (FIXTURES.md); used by upsert/dedup/resume.
PRIMARY_KEYS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects (PARQUET_TYPE_ILLEGAL). Footer-only probe via pyarrow."""
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as pat

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if pat.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def optimize_layout(
    spark: SparkSession,
    sf_dir: str,
    cache_dir: str,
    names: tuple[str, ...] = TABLES,
    target_partitions: int | None = None,
    min_bytes: int = 1 << 20,
) -> str:
    """Rewrite tables into a scan-parallel, key-clustered layout
    (N row groups ≈ N cores, each covering a disjoint PK range).

    The driver-generated fixtures are single-row-group files: one row group
    = one scan task, so a 32-core session reads 600k rows serially. This is
    the local-scale version of the table-maintenance/compaction every
    100 TB lake needs — file and row-group sizing IS a query-performance
    knob (a 10 GB single file would serialize a 1000-executor cluster the
    same way). Range-partitioning + sorting on the primary key makes every
    file's parquet min/max stats tight, so keyset predicates (resume
    watermarks, PK range chunks) skip whole files/row groups instead of
    scanning everything. Small tables (< ``min_bytes``) are copied as-is.
    Idempotent: skips tables already cached. ns-timestamps are normalized
    to µs by the load path, so cached tables read back identically.
    """
    import shutil

    n_parts = target_partitions or _default_parallelism()
    os.makedirs(cache_dir, exist_ok=True)
    for name in names:
        src = os.path.join(sf_dir, f"{name}.parquet")
        dst = os.path.join(cache_dir, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        if os.path.getsize(src) < min_bytes:
            os.makedirs(dst, exist_ok=True)
            shutil.copy(src, os.path.join(dst, "part-0.parquet"))
            continue
        df = load_table(spark, sf_dir, name)
        keys = [F.col(k) for k in PRIMARY_KEYS.get(name, ())]
        if keys:
            df = df.repartitionByRange(n_parts, *keys).sortWithinPartitions(*keys)
        else:
            df = df.repartition(n_parts)
        df.write.mode("overwrite").parquet(dst)
    ensure_bucketed_basket(spark, cache_dir, n_buckets=n_parts)
    return cache_dir


def basket_table_name(sf_dir: str) -> str:
    """Session-catalog name of the bucketed basket projection for
    ``sf_dir`` (content-keyed on the realpath so a multi-dataset session
    never crosses layouts)."""
    import hashlib

    h = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:10]
    return f"bkt_basket_{h}"


def ensure_bucketed_basket(
    spark: SparkSession,
    cache_dir: str,
    n_buckets: int,
) -> str:
    """Write lineitem's (l_orderkey, l_partkey) projection as an external
    parquet table BUCKETED on l_orderkey, part of the ingest re-layout
    (r14 VERDICT #2, guide §2.4/§6 — bucketed tables persist a
    partitioning across jobs): the co-purchase family's basket aggregate
    (``shared_frames.copurchase_edges``) groups this projection by
    l_orderkey every session, and the bucketed scan's HashPartitioning
    satisfies that clustering, so the build loses its first full-fact
    Exchange entirely. The one bucketing shuffle is paid HERE, inside
    the ingest/maintenance step the bench already reports separately as
    ingest_sec — the same pay-once-at-ingest trade every 100 TB lake
    makes for its repeated join/aggregate keys.

    The files live under ``cache_dir`` (cleared and rebuilt with the
    rest of the ingest cache); the catalog entry is per-session, and
    consumers FALL BACK to the plain path build when the table is not
    registered — identical values either way, only the plan differs.
    Buckets default to the same core-derived count as the re-layout
    partitions (scale-adaptive: at 100 TB pick buckets sizing each at a
    few hundred MB). Keyed (name AND data location) on ``cache_dir`` —
    the directory consumers pass at query time."""
    tbl = basket_table_name(cache_dir)
    loc = os.path.join(cache_dir, "bkt_lineitem_basket")
    if spark.catalog.tableExists(tbl) and os.path.isdir(loc):
        return tbl
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    import shutil

    shutil.rmtree(loc, ignore_errors=True)
    (
        load_table(spark, cache_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        # Pre-shuffle into the bucket layout so each write task holds
        # exactly ONE bucket: without this, every input partition opens
        # a file per bucket (n_parts × n_buckets tiny files — 1024 at
        # local[32], the guide §6 small-files failure, paid again by
        # every bucketed scan). repartition on the bucket column uses
        # the same HashPartitioning as the bucket spec, so the write
        # emits n_buckets right-sized files and IS the one bucketing
        # shuffle this layout pays at ingest.
        .repartition(n_buckets, "l_orderkey")
        .write.mode("overwrite")
        .option("path", loc)
        .bucketBy(n_buckets, "l_orderkey")
        .format("parquet")
        .saveAsTable(tbl)
    )
    return tbl


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return max(1, int(cpus)) if cpus else (os.cpu_count() or 4)


def create_bucketed_tables(
    spark: SparkSession,
    sf_dir: str,
    specs: dict[str, tuple[list[str], int]],
    prefix: str = "bkt",
) -> dict[str, str]:
    """Write tables bucketed (+ sorted) on their join keys as managed
    tables, so every future equi-join between co-bucketed tables runs
    shuffle-free (Spark matches bucket specs and drops both Exchanges —
    and with sortBy, both Sorts).

    This is the 100 TB co-location strategy for *repeated* joins: pay one
    shuffle at ingest, then every orders⋈lineitem-style join reads
    co-located buckets. Bucket count is a layout decision — at 100 TB pick
    buckets so each is a few hundred MB; locally the default 8 keeps file
    counts sane. Idempotent per (name, keys, buckets) via overwrite.

    Returns {source_table: bucketed_table_name}.
    """
    out: dict[str, str] = {}
    for name, (keys, n_buckets) in specs.items():
        tbl = f"{prefix}_{name}"
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(n_buckets, *keys)
            .sortBy(*keys)
            .format("parquet")
            .saveAsTable(tbl)
        )
        out[name] = tbl
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_timestamp_columns(path)
    if ns_cols:
        # Read nanos as long, then truncate to microsecond timestamps —
        # the same ns→µs truncation DuckDB applies, so oracles agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in ns_cols:
            # Integer division — double division loses µs precision at
            # ~1e18 ns (beyond double's 2^53 exact-integer range).
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` sees the same
    names the DuckDB oracle does."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def zorder_value(ranges: dict[str, tuple[int, int]], bits: int | None = None):
    """Z-order (Morton) key: min/max-normalize each integer column to a
    common ``bits``-wide domain, then interleave the bits — pure builtin
    arithmetic (HOF sum over bit positions), no UDF. Rows close in
    z-value are close in EVERY interleaved dimension, so
    range-partitioning + sorting by z gives parquet files whose min/max
    stats are tight in all dimensions at once — multi-column row-group
    pruning, where a single-key sort only prunes its leading column.

    The normalization step is load-bearing: interleaving RAW values
    weights each column by its magnitude, so a 13-bit key swamps an
    11-bit key (4× the top-bit weight) and range splits never constrain
    the narrower column — measured exactly that way on the fixture
    before normalizing. ``ranges`` maps column → (min, max), a 2-scalar
    metadata probe per column.

    ``bits`` defaults to ``63 // len(ranges)`` so the highest interleaved
    bit index (bits*k - 1) stays below the BIGINT sign bit; an explicit
    ``bits`` that would shift into bit 63 raises instead of silently
    corrupting the Morton order (r4 ADVICE low, catalog.py:206)."""
    k = len(ranges)
    if bits is None:
        bits = 63 // k
    if bits * k > 63:
        raise ValueError(
            f"zorder_value: bits={bits} over {k} columns shifts into the "
            f"BIGINT sign bit (max index {bits * k - 1} > 62); use bits <= {63 // k}"
        )
    terms = []
    top = (1 << bits) - 1
    for j, (c, (lo, hi)) in enumerate(ranges.items()):
        span = max(hi - lo, 1)
        norm = f"CAST((CAST(`{c}` AS DOUBLE) - {lo}) * {top} / {span} AS BIGINT)"
        terms.append(
            f"aggregate(sequence(0, {bits - 1}), 0L,"
            f" (acc, i) -> acc + shiftleft(({norm} >> i) & 1, i * {k} + {j}))"
        )
    return F.expr(" + ".join(terms))


def zorder_layout(
    spark: SparkSession,
    sf_dir: str,
    dst: str,
    name: str,
    cols: list[str],
    n_parts: int | None = None,
) -> str:
    """Rewrite one table into a z-ordered layout on ``cols`` (see
    zorder_value). Same maintenance-job shape as optimize_layout, keyed
    on the Morton value instead of the primary key."""
    n = n_parts or _default_parallelism()
    src = load_table(spark, sf_dir, name)
    bounds = src.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    ranges = {c: (bounds[f"lo_{c}"], bounds[f"hi_{c}"]) for c in cols}
    df = src.withColumn("__z", zorder_value(ranges))
    (
        df.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dst)
    )
    return dst


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
) -> tuple[int, int]:
    """Small-files compaction — the other half of table maintenance
    (optimize_layout fixes too-FEW row groups; this fixes too-MANY
    files). Streaming sinks and per-batch upserts accrete thousands of
    tiny parquet files; each costs a scan task, a footer read, and a
    namenode entry, so a 100 TB table fragmented at 1 MB would schedule
    100M tasks. Rewrites the directory to ceil(total_bytes /
    target_file_bytes) files via coalesce — a NARROW dependency (no
    shuffle: output files are unsorted concatenations), which is exactly
    right for compaction; use optimize_layout afterwards if key
    clustering is also wanted.

    Staged write + atomic directory swap, same crash contract as the
    parquet sink. Returns (files_before, files_after)."""
    import math
    import shutil
    import uuid

    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") or f.startswith("part-")
    ]
    n_before = len(files)
    total = sum(os.path.getsize(f) for f in files)
    n_target = max(1, math.ceil(total / target_file_bytes))
    if n_target >= n_before:
        return n_before, n_before
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + f".compact-{uuid.uuid4().hex[:8]}"
    df.coalesce(n_target).write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    n_after = len(
        [f for f in os.listdir(path) if f.startswith("part-")]
    )
    return n_before, n_after
