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

# §2.7 write-session contract (cassandra.go:1170-1174 sets QUORUM on the
# native session; 648-698 flushes UNLOGGED batches). The Spark-path
# write_options and the driver-side batch path both pin these; a native
# session adapter must apply them as session.default_consistency_level /
# BatchStatement(batch_type=UNLOGGED). The write-wire transcript
# (tests/fixtures/cassandra_orders_write_wire.json) asserts them.
CONSISTENCY = "QUORUM"
BATCH_TYPE = "UNLOGGED"


def read_options(cfg: DBConfig, table: TableMapping) -> dict[str, str]:
    host = (cfg.hosts[0] if cfg.hosts else "localhost:9042").split(":")[0]
    return {
        "keyspace": cfg.keyspace,
        "table": table.name,
        "spark.cassandra.connection.host": host,
        "spark.cassandra.auth.username": cfg.username,
        "spark.cassandra.auth.password": cfg.password,
        # §2.7 knobs
        "spark.cassandra.input.consistency.level": CONSISTENCY,
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
        "spark.cassandra.output.consistency.level": CONSISTENCY,  # cassandra.go:1170
        # UnloggedBatch grouped by partition key (cassandra.go:700):
        "spark.cassandra.output.batch.grouping.key": "partition",
        "spark.cassandra.output.batch.size.rows": "1000",
    }
    if ttl_seconds:
        # Single-TTL-per-row approximation (cassandra.go:678-691).
        opts["spark.cassandra.output.ttl"] = str(ttl_seconds)
    return opts


# ---------------------------------------------------------------------------
# C3: key detection over an injectable session (cassandra.go:493-528)
# ---------------------------------------------------------------------------


def detect_keys(
    session: "CQLSession", keyspace: str, table: str
) -> tuple[list[str], list[str]]:
    """C3 (cassandra.go:493-528 + 1093-1111): read system_schema.columns
    kinds and return ``(partition_keys, clustering_keys)``, each sorted by
    position. Raises if the table declares no keys, like the reference."""
    partition: list[tuple[int, str]] = []
    clustering: list[tuple[int, str]] = []
    for row in session.execute(
        "SELECT column_name, kind, position FROM system_schema.columns "
        "WHERE keyspace_name = %s AND table_name = %s",
        (keyspace, table),
    ):
        d = row if isinstance(row, dict) else row._asdict()
        if d["kind"] == "partition_key":
            partition.append((d["position"], d["column_name"]))
        elif d["kind"] == "clustering":
            clustering.append((d["position"], d["column_name"]))
    if not partition and not clustering:
        raise RuntimeError(f"table {table} has no primary key")
    return [c for _, c in sorted(partition)], [c for _, c in sorted(clustering)]


# ---------------------------------------------------------------------------
# C5: CQL DDL reconstruction from the source catalog (cassandra.go:900-980)
# ---------------------------------------------------------------------------


def get_table_schema(session: "CQLSession", keyspace: str, table: str) -> str:
    """Reconstruct ``CREATE TABLE IF NOT EXISTS`` from system_schema —
    columns with source CQL types, ``PRIMARY KEY ((partition...),
    clustering...)``, and ``default_time_to_live`` when set
    (cassandra.go:900-980). Key columns are position-sorted (the reference
    relies on catalog row order, which is alphabetical — position is the
    actual declared key order)."""
    columns: list[str] = []
    partition: list[tuple[int, str]] = []
    clustering: list[tuple[int, str]] = []
    for row in session.execute(
        "SELECT column_name, type, kind, position FROM system_schema.columns "
        "WHERE keyspace_name = %s AND table_name = %s",
        (keyspace, table),
    ):
        d = row if isinstance(row, dict) else row._asdict()
        columns.append(f"{d['column_name']} {d['type']}")
        if d["kind"] == "partition_key":
            partition.append((d["position"], d["column_name"]))
        elif d["kind"] == "clustering":
            clustering.append((d["position"], d["column_name"]))
    if not columns:
        raise RuntimeError(f"no table schema found for table {table}")

    default_ttl = 0
    for row in session.execute(
        "SELECT default_time_to_live FROM system_schema.tables "
        "WHERE keyspace_name = %s AND table_name = %s",
        (keyspace, table),
    ):
        d = row if isinstance(row, dict) else row._asdict()
        default_ttl = d.get("default_time_to_live") or 0

    body = ",\n    ".join(columns)
    if partition:
        pk = ", ".join(c for _, c in sorted(partition))
        cl = ", ".join(c for _, c in sorted(clustering))
        body += f",\n    PRIMARY KEY (({pk}){', ' + cl if cl else ''})"
    ttl = f" WITH default_time_to_live = {default_ttl}" if default_ttl > 0 else ""
    return f"CREATE TABLE IF NOT EXISTS {table} (\n    {body}\n){ttl}"


# ---------------------------------------------------------------------------
# C6/C7: UDT + UDF dependency migration (cassandra.go:293-443)
# ---------------------------------------------------------------------------

# cassandra.go:1222-1229
_BUILTIN_FUNCTIONS = frozenset(("token", "now", "uuid", "ttl"))

_FUNC_CALL_RE = re.compile(r"(\w+)\s*\(")  # cassandra.go:1207


def _split_type_args(inner: str) -> list[str]:
    """Split ``map<k, v>``-style parameter lists at top-level commas."""
    parts, cur, depth = [], "", 0
    for ch in inner:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    parts.append(cur)
    return parts


def referenced_udts(cql_type: str, known_types: set[str]) -> set[str]:
    """All UDT names a CQL type expression references, through any nesting
    of ``frozen<>`` / ``list<>`` / ``set<>`` / ``map<>`` / ``tuple<>``.
    (The reference unwraps only one frozen<> level and skips collections
    entirely, cassandra.go:311 + 1234-1266 — which misses
    ``list<frozen<udt>>`` columns; chasing the full structure is a strict
    improvement.)"""
    t = cql_type.strip()
    if t.startswith("frozen<") and t.endswith(">"):
        return referenced_udts(t[7:-1], known_types)
    for prefix in ("list<", "set<", "map<", "tuple<"):
        if t.startswith(prefix) and t.endswith(">"):
            out: set[str] = set()
            for arg in _split_type_args(t[len(prefix) : -1]):
                out |= referenced_udts(arg, known_types)
            return out
    return {t} if t in known_types else set()


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
    """C6/C7 (cassandra.go:293-443): discover UDTs used by columns —
    chasing nesting (``list<frozen<udt>>``) and UDT-within-UDT fields
    transitively — and UDFs referenced by index expressions, then emit
    ``CREATE TYPE IF NOT EXISTS`` / ``CREATE OR REPLACE FUNCTION`` on the
    destination. Types are created in dependency order (a UDT's field
    types strictly before it), types strictly before functions, each at
    most once, unused definitions skipped. Returns the executed CQL
    statements in order (for logging/tests)."""
    used_functions: set[str] = set()

    # All type definitions first: needed both to recognize UDT names
    # inside nested type expressions and to chase UDT→UDT field edges.
    type_defs: dict[str, tuple[list[str], list[str]]] = {}
    for row in source.execute(
        "SELECT type_name, field_names, field_types FROM system_schema.types "
        "WHERE keyspace_name = %s",
        (source_keyspace,),
    ):
        d = row if isinstance(row, dict) else row._asdict()
        type_defs[d["type_name"]] = (list(d["field_names"]), list(d["field_types"]))
    known = set(type_defs)

    used_types: set[str] = set()
    for row in source.execute(
        "SELECT table_name, column_name, type FROM system_schema.columns "
        "WHERE keyspace_name = %s",
        (source_keyspace,),
    ):
        col_type = row["type"] if isinstance(row, dict) else row.type
        used_types |= referenced_udts(col_type, known)

    # Transitive closure over UDT fields (a used UDT whose field is
    # another UDT pulls that one in too — the reference misses these and
    # its CREATE TYPE fails with 'Unknown type').
    frontier = list(used_types)
    while frontier:
        name = frontier.pop()
        for ftype in type_defs[name][1]:
            for dep in referenced_udts(ftype, known):
                if dep not in used_types:
                    used_types.add(dep)
                    frontier.append(dep)

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

    def create_type(name: str) -> None:
        """DFS postorder: field-type dependencies created first."""
        if name in created:
            return
        created.add(name)
        field_names, field_types = type_defs[name]
        for ftype in field_types:
            for dep in referenced_udts(ftype, known):
                create_type(dep)
        fields = ", ".join(f"{n} {t}" for n, t in zip(field_names, field_types))
        stmt = f"CREATE TYPE IF NOT EXISTS {dest_keyspace}.{name} ({fields})"
        dest.execute(stmt)
        executed.append(stmt)

    # Deterministic outer order (sorted), dependency order within.
    for name in sorted(used_types):
        create_type(name)

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


def _is_collection(cql_type: str) -> bool:
    # cassandra.go:629-633 collection detection.
    return any(t in cql_type for t in ("list<", "map<", "set<"))


def ttl_projection(
    columns: list[str],
    key_columns: list[str],
    column_types: dict[str, str] | None = None,
) -> list[str]:
    """S5: select list preserving per-cell TTLs beside values
    (cassandra.go:531-575) — TTL readable only for non-key, non-collection
    cells (collections have per-element TTLs CQL won't surface)."""
    types = column_types or {}
    proj = list(columns)
    proj.extend(
        f"ttl({c}) AS ttl_{c}"
        for c in columns
        if c not in key_columns and not _is_collection(types.get(c, ""))
    )
    return proj


def build_token_where(
    column_types: dict[str, str],
    partition_keys: list[str],
    last_key: dict[str, str],
) -> str:
    """P6 resume predicate (cassandra.go:1066-1142): ``token(pk...) >=
    token(last...)`` with type-aware literal quoting — text/varchar/ascii
    quoted, blob as ``0x…``, everything else raw. ``partition_keys`` must
    already be position-sorted (cassandra.go:1103-1111); any missing
    partition-key value disables resume (returns "", cassandra.go:1129-1131),
    falling back to an idempotent full re-run."""
    if not partition_keys or not last_key:
        return ""
    literals: list[str] = []
    for key in partition_keys:
        if key not in last_key:
            return ""
        val = last_key[key]
        ctype = column_types.get(key, "")
        if ctype in ("text", "varchar", "ascii"):
            # CQL escapes a single quote by doubling it — without this, a
            # value like O'Brien breaks the statement (and is an injection
            # vector for crafted data). The reference interpolates raw
            # (cassandra.go:1121); escaping is a strict improvement.
            escaped = val.replace("'", "''")
            literals.append(f"'{escaped}'")
        elif ctype == "blob":
            literals.append(f"0x{val}")
        elif ctype in ("timestamp", "date", "time"):
            # Temporal partition keys need quoted ISO literals in CQL, and
            # CQL's parser accepts at most millisecond fractions — Python
            # str(datetime) emits 6-digit microseconds, so truncate.
            val = re.sub(r"(\.\d{3})\d+", r"\1", val)
            literals.append(f"'{val}'")
        else:
            literals.append(val)
    return f"token({', '.join(partition_keys)}) >= token({', '.join(literals)})"


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


# ---------------------------------------------------------------------------
# S4/S5/W4/P6 runtime path: driver-side paged copy (cassandra.go:453-898)
# ---------------------------------------------------------------------------


class CQLBatchSession(Protocol):
    """Session surface for the copy loop's destination: single statements
    plus unlogged batches of bound (statement, params) pairs."""

    def execute(self, statement: str, parameters: tuple = ()) -> Any: ...

    def execute_batch(self, statements: list[tuple[str, tuple]]) -> Any: ...


def execute_batch_with_retry(
    dest: CQLBatchSession,
    batch: list[tuple[str, tuple]],
    max_retries: int = 3,
    retry_delay: float = 5.0,
    sleep=None,
) -> None:
    """executeBatchWithRetry (cassandra.go:887-898): fixed-delay retries,
    raise after ``max_retries`` failures. Safe because CQL INSERT is an
    upsert — replays are idempotent."""
    import time as _time

    sleep = sleep or _time.sleep
    last_err: Exception | None = None
    for _ in range(max_retries):
        try:
            dest.execute_batch(batch)
            return
        except Exception as exc:  # noqa: BLE001 — retry any driver error
            last_err = exc
            sleep(retry_delay)
    raise RuntimeError(f"batch write failed after {max_retries} retries") from last_err


def copy_data(
    source: CQLSession,
    dest: CQLBatchSession,
    *,
    source_keyspace: str,
    source_name: str,
    target_name: str,
    columns: list[tuple[str, str]],
    partition_keys: list[str],
    key_columns: list[str],
    store,
    stats=None,
    batch_size: int = 1000,
    max_retries: int = 3,
    retry_delay: float = 5.0,
    rate_limiter=None,
    sleep=None,
) -> dict[str, Any]:
    """copyData (cassandra.go:453-898), driver-side, against injectable
    sessions. Lifecycle parity:

    - checkpoint skip-complete first (cassandra.go:237-244);
    - TTL-aware projection over non-key scalar columns (531-575);
    - resume via ``token(pk) >= token(last)`` WHERE (585-592 + 1066-1142);
    - paged scan batched into unlogged batches of ``INSERT ... [USING
      TTL ?]`` — CQL INSERT is an upsert (645-843); the row TTL is the
      first non-key scalar column's remaining TTL, the reference's own
      single-TTL-per-row approximation (678-691, SURVEY §7 hard-part #3);
    - partition-key values (blob hexed) tracked as the checkpoint key
      (800-830), saved per flushed batch — the driver-loop equivalent of
      the reference's 1 s background ticker (705-723), strictly more
      consistent because every saved watermark is post-commit;
    - retrying batch flush (887-898), final ``complete=true`` (871-884).

    ``columns`` is an ordered ``(name, cql_type)`` list (from
    system_schema.columns); ``partition_keys`` position-sorted; rows from
    ``source.execute`` are dicts keyed by the projection aliases
    (column names + ``ttl_<col>``).
    """
    from dbtransfer_spark.checkpoint import Checkpoint

    if store.is_complete(source_name):
        return {"skipped": True, "reason": "checkpoint complete"}

    names = [c for c, _ in columns]
    types = dict(columns)
    proj = ttl_projection(names, key_columns, types)
    query = f"SELECT {', '.join(proj)} FROM {source_keyspace}.{source_name}"

    ckpt = store.load(source_name)
    resumed_from = None
    if ckpt is not None and ckpt.last_key and not ckpt.complete:
        where = build_token_where(types, partition_keys, ckpt.last_key)
        if where:
            query += f" WHERE {where}"
            resumed_from = dict(ckpt.last_key)

    ttl_cols = [
        c for c in names if c not in key_columns and not _is_collection(types[c])
    ]
    insert = (
        f"INSERT INTO {target_name} ({', '.join(names)}) "
        f"VALUES ({', '.join('?' for _ in names)})"
    )
    if ttl_cols:
        insert += " USING TTL ?"

    batch: list[tuple[str, tuple]] = []
    last_key: dict[str, str] = dict(ckpt.last_key) if ckpt else {}
    migrated = 0

    def flush() -> None:
        nonlocal migrated
        if not batch:
            return
        execute_batch_with_retry(
            dest, list(batch), max_retries=max_retries,
            retry_delay=retry_delay, sleep=sleep,
        )
        migrated += len(batch)
        if stats is not None:
            stats.add_processed(source_name, len(batch))
        if rate_limiter is not None:
            rate_limiter.acquire(len(batch))
        if last_key:
            store.save(source_name, Checkpoint(last_key=dict(last_key), complete=False))
        batch.clear()

    for row in source.execute(query):
        params = [row[c] for c in names]
        if ttl_cols:
            # cassandra.go:691: one TTL per row — the first eligible
            # column's remaining TTL (0/None → no expiry).
            params.append(row.get(f"ttl_{ttl_cols[0]}") or 0)
        for pk in partition_keys:
            v = row[pk]
            last_key[pk] = v.hex() if isinstance(v, (bytes, bytearray)) else str(v)
        batch.append((insert, tuple(params)))
        if len(batch) >= batch_size:
            flush()
    flush()

    store.mark_complete(source_name, last_key or None)
    return {"rows": migrated, "resumed_from": resumed_from}


def table_exists(session: "CQLSession", keyspace: str, table: str) -> bool:
    """S7 existence probe (cassandra.go:246-262)."""
    rows = session.execute(
        "SELECT table_name FROM system_schema.tables "
        "WHERE keyspace_name = %s AND table_name = %s",
        (keyspace, table),
    )
    return bool(list(rows))


def migrate_table(
    source: CQLSession,
    dest: CQLBatchSession,
    *,
    source_keyspace: str,
    dest_keyspace: str,
    source_name: str,
    target_name: str | None = None,
    store,
    stats=None,
    batch_size: int = 1000,
    max_retries: int = 3,
    retry_delay: float = 5.0,
    rate_limiter=None,
    sleep=None,
) -> dict[str, Any]:
    """Full migrateTable orchestration (cassandra.go:236-291): checkpoint
    skip → existence probe → UDT/UDF dependency migration → DDL clone on
    the destination (source name swapped for target, cassandra.go:276) →
    catalog-driven column/key discovery → ``copy_data``."""
    target = target_name or source_name

    if store.is_complete(source_name):  # checkpoint first (237-244)
        return {"skipped": True, "reason": "checkpoint complete"}
    if not table_exists(source, source_keyspace, source_name):
        raise RuntimeError(f"source table {source_name} does not exist")

    migrate_dependencies(source, dest, source_keyspace, dest_keyspace)

    # Qualify with the destination keyspace: dependencies above are created
    # as <dest_keyspace>.<type>, so the table (and copy_data's INSERTs) must
    # target the same keyspace — an unqualified name would resolve against
    # the session's default keyspace, if any, and could land elsewhere.
    qualified_target = f"{dest_keyspace}.{target}"
    ddl = get_table_schema(source, source_keyspace, source_name)
    dest.execute(ddl.replace(source_name, qualified_target, 1))  # cassandra.go:274-288

    columns: list[tuple[str, str]] = []
    for row in source.execute(
        "SELECT column_name, type FROM system_schema.columns "
        "WHERE keyspace_name = %s AND table_name = %s",
        (source_keyspace, source_name),
    ):
        d = row if isinstance(row, dict) else row._asdict()
        columns.append((d["column_name"], d["type"]))
    partition_keys, clustering_keys = detect_keys(source, source_keyspace, source_name)

    return copy_data(
        source,
        dest,
        source_keyspace=source_keyspace,
        source_name=source_name,
        target_name=qualified_target,
        columns=columns,
        partition_keys=partition_keys,
        key_columns=partition_keys + clustering_keys,
        store=store,
        stats=stats,
        batch_size=batch_size,
        max_retries=max_retries,
        retry_delay=retry_delay,
        rate_limiter=rate_limiter,
        sleep=sleep,
    )
