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

from pyspark.sql import DataFrame

from dbtransfer_spark.config import DBConfig, TableMapping
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
