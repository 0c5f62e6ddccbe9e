"""MongoDB source/sink via the Spark Mongo connector (v10+).

Reference behavior re-expressed (SURVEY.md §2):
- S3 cursor scan → ``spark.read.format("mongodb")``; the connector's
  partitioner splits by ``_id`` ranges — the parallel version of the
  reference's single ``Find`` cursor (mongodb.go:313-320).
- P5 resume predicate ``{_id: {$gt: last}}`` (mongodb.go:264-269) →
  ``df.filter(col("_id") > lit(hex))``; connector pushes it down as an
  aggregation ``$match`` stage.
- W3 bulk upsert (unordered BulkWrite of upserting UpdateOne models,
  mongodb.go:390-431) → writer options ``operationType=update,
  upsertDocument=true, ordered=false``.
- Dynamic schema (bson.M, mongodb.go:326-335) → connector schema
  inference by sampling, or an explicit user schema pinned via
  ``schema_json`` to avoid inference drift between runs (SURVEY.md §7
  hard-part #6).

The connector jar is not bundled in this environment; option-dict builders
are pure and unit-tested, reads/writes require the jar at runtime.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, Protocol

from pyspark.sql import DataFrame

from dbtransfer_spark.checkpoint import Checkpoint, CheckpointStore
from dbtransfer_spark.config import DBConfig, TableMapping
from dbtransfer_spark.governance import MigrationStats, RateLimiter
from dbtransfer_spark.sources.base import Sink, Source

FORMAT = "mongodb"


def connection_uri(cfg: DBConfig) -> str:
    host = cfg.hosts[0] if cfg.hosts else "localhost:27017"
    auth = f"{cfg.username}:{cfg.password}@" if cfg.username else ""
    auth_db = cfg.auth_db or "admin"
    return f"mongodb://{auth}{host}/?authSource={auth_db}"


def read_options(cfg: DBConfig, table: TableMapping) -> dict[str, str]:
    return {
        "connection.uri": connection_uri(cfg),
        "database": cfg.database,
        "collection": table.name,
        # Sample-based inference mirrors bson.M schemalessness; override by
        # passing an explicit schema to the reader for drift-free runs.
        "sampleSize": "1000",
        # Server-side batch + no cursor timeout (mongodb.go:314-316).
        "batchSize": "1000",
    }


def write_options(cfg: DBConfig, table: TableMapping, ordered: bool = False) -> dict[str, str]:
    return {
        "connection.uri": connection_uri(cfg),
        "database": cfg.database,
        "collection": table.effective_target,
        # W3: idempotent upsert keyed on _id (mongodb.go:398-412).
        "operationType": "update",
        "upsertDocument": "true",
        "idFieldList": "_id",
        "ordered": "true" if ordered else "false",  # unordered = parallel server-side
        "maxBatchSize": "512",
    }


# ---------------------------------------------------------------------------
# S3/P5/W3/R9 runtime path: driver-side cursor migration (mongodb.go:221-431)
# ---------------------------------------------------------------------------
#
# The Spark-connector path above is the scale route (partitioned reads,
# parallel writes). This loop is the reference's own single-cursor batch
# migration, re-expressed against a minimal injectable collection surface so
# the full lifecycle — checkpoint skip, count, resume filter, cursor
# batching, unordered bulk upsert with retries, per-batch checkpoint, final
# complete marker — is executable and tested without a server (the pattern
# of tests/test_jdbc_writer.py). Useful in production for small collections
# where a Spark job is overkill, and as the behavioral spec the connector
# path must match.


class MongoCollectionAPI(Protocol):
    """Minimal pymongo-Collection-shaped surface (duck-typed)."""

    def count_documents(self, filter: dict) -> int: ...

    def find(
        self,
        filter: dict,
        batch_size: int = 1000,
        no_cursor_timeout: bool = True,
        sort: list[tuple[str, int]] | None = None,
    ) -> Iterable[dict]: ...

    def bulk_write(self, models: list, ordered: bool = False) -> Any: ...


try:
    from pymongo import UpdateOne as _UpdateOne  # type: ignore[import-not-found]
except ImportError:  # failed imports aren't cached — probe once, not per batch
    _UpdateOne = None


def normalize_document(
    doc: dict, stable_fields: Iterable[str], extra_field: str = "_extra_json"
) -> dict:
    """Schema-drift normalization (SURVEY.md §7 hard-part 6): project a
    dynamic bson document onto a PINNED field set; any field outside it
    is folded into one deterministic JSON string column (sorted keys) so
    every batch of a migration — and every run — produces the SAME
    destination schema no matter which optional fields the sampled
    documents happened to carry. Declared-but-absent fields materialize
    as None (never missing), completing the fixed shape. Lossless: the
    extras round-trip via json.loads. The reference's bson.M pass-through
    (mongodb.go:326-335) simply inherits drift; this is the option that
    closes it."""
    import json

    stable = list(stable_fields)
    out = {f: doc.get(f) for f in stable}
    extras = {k: v for k, v in doc.items() if k not in out}
    out[extra_field] = (
        json.dumps(extras, sort_keys=True, default=str) if extras else None
    )
    return out


def upsert_models(batch: list[dict]) -> list:
    """W3 (mongodb.go:398-412): one upserting UpdateOne model per doc,
    filtered on ``_id``, ``$set``-ing the whole document. Real pymongo
    requires ``UpdateOne`` instances; the dict form (same fields) is the
    fallback for injected fakes when pymongo isn't importable."""
    if _UpdateOne is not None:
        return [
            _UpdateOne({"_id": doc["_id"]}, {"$set": doc}, upsert=True)
            for doc in batch
        ]
    return [
        {"filter": {"_id": doc["_id"]}, "update": {"$set": doc}, "upsert": True}
        for doc in batch
    ]


def bulk_upsert_with_retry(
    coll: MongoCollectionAPI,
    batch: list[dict],
    max_retries: int = 3,
    retry_delay: float = 5.0,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """insertBatch (mongodb.go:390-431): unordered BulkWrite, fixed-delay
    retry, raise after ``max_retries`` failures."""
    if not batch:
        return
    attempt = 0
    while True:
        try:
            coll.bulk_write(upsert_models(batch), ordered=False)
            return
        except Exception:
            attempt += 1
            if attempt > max_retries:
                raise
            sleep(retry_delay)


def migrate_collection(
    source: MongoCollectionAPI,
    dest: MongoCollectionAPI,
    name: str,
    store: CheckpointStore,
    stats: MigrationStats | None = None,
    batch_size: int = 1000,
    max_retries: int = 3,
    retry_delay: float = 5.0,
    rate_limiter: RateLimiter | None = None,
    parse_id: Callable[[str], Any] = str,
    sleep: Callable[[float], None] = time.sleep,
    stable_fields: Iterable[str] | None = None,
) -> dict[str, Any]:
    """migrateCollection (mongodb.go:221-431), driver-side.

    ``stable_fields``: when given, every document is normalized via
    ``normalize_document`` before the bulk upsert — unknown fields fold
    into ``_extra_json`` so batches with divergent shapes land under one
    stable destination schema (SURVEY.md §7 hard-part 6).

    Lifecycle parity: checkpoint skip-complete (236-242) → total count
    (245-248) → resume filter ``{_id: {$gt: last}}`` with remaining-count
    progress rebase (264-293, the Mongo R9) → batched cursor scan
    (313-335) → unordered bulk upsert with retry (390-431) → per-batch
    stats/rate-limit/checkpoint (340-360) → final batch + ``complete=true``
    marker (363-382). ``parse_id`` converts the checkpointed string back to
    the native ``_id`` type (ObjectIDFromHex in the reference, 308-311).
    """
    if store.is_complete(name):
        return {"skipped": True, "reason": "checkpoint complete"}

    total = source.count_documents({})
    last = store.watermark(name, "_id")
    if last is not None:
        filt: dict = {"_id": {"$gt": parse_id(last)}}
        remaining = source.count_documents(filt)
    else:
        filt = {}
        remaining = total
    if stats is not None:
        # mongodb.go:286-291: progress denominator is remaining docs.
        stats.init_table(name, remaining)

    migrated = 0
    batch: list[dict] = []
    last_id: str | None = last

    def flush() -> None:
        nonlocal migrated, last_id
        if not batch:
            return
        bulk_upsert_with_retry(
            dest, batch, max_retries=max_retries, retry_delay=retry_delay, sleep=sleep
        )
        migrated += len(batch)
        if stats is not None:
            stats.add_processed(name, len(batch))
        if rate_limiter is not None:
            rate_limiter.acquire(len(batch))
        if last_id is not None:
            store.save(name, Checkpoint(last_key={"_id": last_id}, complete=False))
        batch.clear()

    # Sort by _id: the checkpoint watermark is only a correct resume point
    # if iteration is monotone in _id. (The reference iterates in natural
    # order, mongodb.go:313-320 — a crash between checkpoints there can
    # skip docs whose _id sorts below the watermark; the explicit sort
    # closes that hole and costs nothing on the _id index.)
    stable = list(stable_fields) if stable_fields is not None else None
    if stable is not None and "_id" not in stable:
        # _id must stay top-level: the resume watermark and the upsert
        # key both read it, folding it into extras would break resume
        stable = ["_id", *stable]
    for doc in source.find(
        filt, batch_size=batch_size, no_cursor_timeout=True, sort=[("_id", 1)]
    ):
        if stable is not None:
            doc = normalize_document(doc, stable)
        batch.append(doc)
        last_id = str(doc["_id"])
        if len(batch) >= batch_size:
            flush()
    flush()

    store.mark_complete(name, {"_id": last_id} if last_id is not None else None)
    return {"rows": migrated, "resumed_from": last}


def run_migration(
    collections: dict[str, tuple[MongoCollectionAPI, MongoCollectionAPI]],
    store: CheckpointStore,
    stats: MigrationStats | None = None,
    workers: int = 4,
    batch_size: int = 1000,
    rate_limit: int | None = None,
    max_retries: int = 3,
    retry_delay: float = 5.0,
    parse_id: Callable[[str], Any] = str,
    sleep: Callable[[float], None] = time.sleep,
) -> dict[str, Any]:
    """Run() parity (mongodb.go:156-202): a ``workers``-bounded pool
    migrates collections concurrently, every collection's error is
    collected (one failure doesn't abort the others), and the shared
    rate limiter caps aggregate rows/sec across all workers (the global
    limiter of migration.go:211-268). ``collections`` maps name →
    (source_collection, dest_collection)."""
    from concurrent.futures import ThreadPoolExecutor

    stats = stats if stats is not None else MigrationStats()
    limiter = RateLimiter(rate_limit) if rate_limit else None
    results: dict[str, Any] = {}
    errors: dict[str, str] = {}

    def one(name: str, pair: tuple) -> None:
        source, dest = pair
        try:
            results[name] = migrate_collection(
                source, dest, name, store, stats,
                batch_size=batch_size, max_retries=max_retries,
                retry_delay=retry_delay, rate_limiter=limiter,
                parse_id=parse_id, sleep=sleep,
            )
        except Exception as exc:  # error collection, not propagation
            errors[name] = str(exc)

    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        futures = [pool.submit(one, n, p) for n, p in collections.items()]
        for f in futures:
            f.result()
    return {"tables": results, "errors": errors, "stats": stats.snapshot()}


class MongoSource(Source):
    def read(self, table: TableMapping) -> DataFrame:
        return self.spark.read.format(FORMAT).options(**read_options(self.cfg, table)).load()

    def detect_primary_key(self, table: TableMapping) -> list[str]:
        # Mongo PK is always _id (mongodb.go:254-257).
        return [table.primary_key] if table.primary_key else ["_id"]


class MongoSink(Sink):
    def upsert(self, df: DataFrame, table: TableMapping, key_columns: list[str]) -> int:
        opts = write_options(self.cfg, table)
        if key_columns and key_columns != ["_id"]:
            opts["idFieldList"] = ",".join(key_columns)
        df.write.format(FORMAT).mode("append").options(**opts).save()
        return -1
