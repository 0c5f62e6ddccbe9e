"""Cassandra/ScyllaDB source/sink via the Spark Cassandra connector.

Reference behavior re-expressed (SURVEY.md §2/§2.7):
- S4 paged scan with manual token-resume (cassandra.go:576-592, 726-844) →
  the connector splits the ring into token ranges and reads them in
  parallel with replica locality — the parallelism the reference's single
  session lacks. Resume: re-run idempotently (INSERT is an upsert in CQL)
  or filter on a clustering watermark; token-WHERE resume
  (cassandra.go:1066-1142) is subsumed by per-range task retries.
- S5 TTL projection (``TTL(col)`` per non-key column, cassandra.go:531-575)
  → ``ttl(col)`` columns via the connector's SQL support; write-side TTL
  via ``spark.cassandra.output.ttl`` — single-TTL-per-row approximation,
  same as the reference applies one TTL value per INSERT
  (cassandra.go:677-691).
- W4 UnloggedBatch writes (cassandra.go:648-700) → connector default
  batching grouped by partition key, QUORUM consistency (cassandra.go:1170).
- C6/C7 UDT/UDF metadata migration (cassandra.go:293-443) → driver-side CQL
  passthrough statements generated here; execution requires a cassandra
  driver at runtime.

Connector jar not bundled here; option builders are pure and unit-tested.
"""

from __future__ import annotations

import re
from typing import Any, Protocol

from pyspark.sql import DataFrame

from dbtransfer_spark.config import DBConfig, TableMapping
from dbtransfer_spark.sources.base import Sink, Source

FORMAT = "org.apache.spark.sql.cassandra"

# cassandra.go:384-443: UDFs are copied as metadata, never executed.
UDT_QUERY = (
    "SELECT type_name, field_names, field_types FROM system_schema.types "
    "WHERE keyspace_name = ?"
)
UDF_QUERY = (
    "SELECT function_name, argument_names, argument_types, return_type, "
    "language, body FROM system_schema.functions WHERE keyspace_name = ?"
)
KEY_QUERY = (  # cassandra.go:493-528
    "SELECT column_name, kind, position FROM system_schema.columns "
    "WHERE keyspace_name = ? AND table_name = ?"
)


def read_options(cfg: DBConfig, table: TableMapping) -> dict[str, str]:
    host = (cfg.hosts[0] if cfg.hosts else "localhost:9042").split(":")[0]
    return {
        "keyspace": cfg.keyspace,
        "table": table.name,
        "spark.cassandra.connection.host": host,
        "spark.cassandra.auth.username": cfg.username,
        "spark.cassandra.auth.password": cfg.password,
        # §2.7 knobs
        "spark.cassandra.input.consistency.level": "QUORUM",
        "spark.cassandra.input.fetch.sizeInRows": "1000",  # PageSize(batch) cassandra.go:645
    }


def write_options(
    cfg: DBConfig, table: TableMapping, ttl_seconds: int | None = None
) -> dict[str, str]:
    host = (cfg.hosts[0] if cfg.hosts else "localhost:9042").split(":")[0]
    opts = {
        "keyspace": cfg.keyspace,
        "table": table.effective_target,
        "spark.cassandra.connection.host": host,
        "spark.cassandra.auth.username": cfg.username,
        "spark.cassandra.auth.password": cfg.password,
        "spark.cassandra.output.consistency.level": "QUORUM",  # cassandra.go:1170
        # UnloggedBatch grouped by partition key (cassandra.go:700):
        "spark.cassandra.output.batch.grouping.key": "partition",
        "spark.cassandra.output.batch.size.rows": "1000",
    }
    if ttl_seconds:
        # Single-TTL-per-row approximation (cassandra.go:678-691).
        opts["spark.cassandra.output.ttl"] = str(ttl_seconds)
    return opts


# ---------------------------------------------------------------------------
# C6/C7: UDT + UDF dependency migration (cassandra.go:293-443)
# ---------------------------------------------------------------------------

# cassandra.go:1234-1266 whitelist, kept verbatim.
_BASIC_TYPES = frozenset(
    "ascii bigint blob boolean counter date decimal double float inet int "
    "smallint text time timestamp timeuuid tinyint uuid varchar varint".split()
)

# cassandra.go:1222-1229
_BUILTIN_FUNCTIONS = frozenset(("token", "now", "uuid", "ttl"))

_FUNC_CALL_RE = re.compile(r"(\w+)\s*\(")  # cassandra.go:1207


def is_basic_type(type_name: str) -> bool:
    """cassandra.go:1234-1266: scalar whitelist; collections count as basic
    (their element UDTs are not chased — reference parity)."""
    if type_name.startswith(("list<", "set<", "map<")):
        return True
    return type_name in _BASIC_TYPES


def extract_function_names(expr: str, out: set[str]) -> None:
    """cassandra.go:1205-1219: every identifier followed by '(' that is not
    a builtin is treated as a UDF reference."""
    for m in _FUNC_CALL_RE.finditer(expr):
        name = m.group(1).lower()
        if name not in _BUILTIN_FUNCTIONS:
            out.add(name)


class CQLSession(Protocol):
    """Minimal query surface of a cassandra-driver Session — injectable so
    dependency migration is testable without a server (the pattern of
    tests/test_jdbc_writer.py's SQLite-backed writer)."""

    def execute(self, statement: str, parameters: tuple = ()) -> Any: ...


def migrate_dependencies(
    source: CQLSession,
    dest: CQLSession,
    source_keyspace: str,
    dest_keyspace: str,
) -> list[str]:
    """C6/C7 (cassandra.go:293-443): discover UDTs actually used by columns
    (non-basic types, frozen<> unwrapped) and UDFs referenced by index
    expressions, then emit ``CREATE TYPE IF NOT EXISTS`` /
    ``CREATE OR REPLACE FUNCTION`` on the destination — types strictly
    before functions, each at most once, unused definitions skipped.
    Returns the executed CQL statements in order (for logging/tests)."""
    used_types: set[str] = set()
    used_functions: set[str] = set()

    for row in source.execute(
        "SELECT table_name, column_name, type FROM system_schema.columns "
        "WHERE keyspace_name = %s",
        (source_keyspace,),
    ):
        col_type = row["type"] if isinstance(row, dict) else row.type
        if not is_basic_type(col_type):
            # frozen<type> → type (cassandra.go:311)
            used_types.add(col_type.removeprefix("frozen<").removesuffix(">"))

    for row in source.execute(
        "SELECT options FROM system_schema.indexes WHERE keyspace_name = %s",
        (source_keyspace,),
    ):
        options = row["options"] if isinstance(row, dict) else row.options
        expr = (options or {}).get("expression")
        if expr:
            extract_function_names(expr, used_functions)

    executed: list[str] = []

    created: set[str] = set()
    for row in source.execute(
        "SELECT type_name, field_names, field_types FROM system_schema.types "
        "WHERE keyspace_name = %s",
        (source_keyspace,),
    ):
        d = row if isinstance(row, dict) else row._asdict()
        name = d["type_name"]
        if name not in used_types or name in created:
            continue
        fields = ", ".join(
            f"{n} {t}" for n, t in zip(d["field_names"], d["field_types"])
        )
        stmt = f"CREATE TYPE IF NOT EXISTS {dest_keyspace}.{name} ({fields})"
        dest.execute(stmt)
        executed.append(stmt)
        created.add(name)

    created_funcs: set[str] = set()
    for row in source.execute(
        "SELECT function_name, argument_types, return_type, language, body, "
        "called_on_null_input FROM system_schema.functions "
        "WHERE keyspace_name = %s",
        (source_keyspace,),
    ):
        d = row if isinstance(row, dict) else row._asdict()
        name = d["function_name"]
        if name not in used_functions or name in created_funcs:
            continue
        null_input = (
            "RETURNS NULL ON NULL INPUT"
            if d["called_on_null_input"]
            else "CALLED ON NULL INPUT"
        )
        stmt = (
            f"CREATE OR REPLACE FUNCTION {dest_keyspace}.{name} "
            f"({', '.join(d['argument_types'])}) "
            f"RETURNS {d['return_type']} "
            f"LANGUAGE {d['language']} "
            f"{null_input} "
            f"AS $${d['body']}$$"
        )
        dest.execute(stmt)
        executed.append(stmt)
        created_funcs.add(name)

    return executed


def ttl_projection(columns: list[str], key_columns: list[str]) -> list[str]:
    """S5: select list preserving per-cell TTLs beside values
    (cassandra.go:531-575) — TTL readable only for non-key scalar cells."""
    proj = list(columns)
    proj.extend(f"ttl({c}) AS ttl_{c}" for c in columns if c not in key_columns)
    return proj


class CassandraSource(Source):
    def read(self, table: TableMapping) -> DataFrame:
        return self.spark.read.format(FORMAT).options(**read_options(self.cfg, table)).load()

    def detect_primary_key(self, table: TableMapping) -> list[str]:
        if table.primary_key:
            return [c.strip() for c in table.primary_key.split(",")]
        # Runtime path: KEY_QUERY via a cassandra-driver session (C3).
        raise RuntimeError(
            "Cassandra PK detection requires a driver session; set "
            "TableMapping.primary_key or run with cassandra-driver installed"
        )


class CassandraSink(Sink):
    def __init__(self, spark, cfg, ttl_seconds: int | None = None):
        super().__init__(spark, cfg)
        self.ttl_seconds = ttl_seconds

    def upsert(self, df: DataFrame, table: TableMapping, key_columns: list[str]) -> int:
        # CQL INSERT is natively an upsert (SURVEY.md §2.5 W4).
        (
            df.write.format(FORMAT)
            .mode("append")
            .options(**write_options(self.cfg, table, self.ttl_seconds))
            .save()
        )
        return -1
