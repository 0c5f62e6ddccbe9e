"""End-to-end tests for the driver-side Mongo/Cassandra runtime paths
(S3/P5/W3 mongodb.go:221-431; S4/S5/W4/P6 cassandra.go:453-898) against
injectable in-memory fakes — the pattern of tests/test_jdbc_writer.py's
SQLite-backed writer: the full lifecycle (checkpoint skip, resume
predicate, batched scan, retrying bulk upsert, per-batch checkpoint,
complete marker) executes for real; only the wire protocol is faked.
"""

from __future__ import annotations

import pytest

from dbtransfer_spark.checkpoint import Checkpoint, CheckpointStore
from dbtransfer_spark.governance import MigrationStats
from dbtransfer_spark.sources.cassandra import (
    build_token_where,
    copy_data,
    execute_batch_with_retry,
    ttl_projection,
)
from dbtransfer_spark.sources.mongodb import migrate_collection, upsert_models


# ---------------------------------------------------------------------------
# Mongo fakes
# ---------------------------------------------------------------------------


class FakeMongoCollection:
    """pymongo-Collection-shaped in-memory store with injectable failures."""

    def __init__(self, docs: list[dict] | None = None, fail_times: int = 0):
        self.docs = {d["_id"]: dict(d) for d in (docs or [])}
        self.fail_times = fail_times
        self.bulk_calls = 0
        self.find_filters: list[dict] = []

    def _match(self, filter: dict) -> list[dict]:
        if not filter:
            return list(self.docs.values())
        gt = filter["_id"]["$gt"]
        return [d for d in self.docs.values() if d["_id"] > gt]

    def count_documents(self, filter: dict) -> int:
        return len(self._match(filter))

    def find(
        self,
        filter: dict,
        batch_size: int = 1000,
        no_cursor_timeout: bool = True,
        sort: list[tuple[str, int]] | None = None,
    ):
        self.find_filters.append(filter)
        matched = self._match(filter)
        if sort:
            key, direction = sort[0]
            matched = sorted(matched, key=lambda d: d[key], reverse=direction < 0)
        else:
            # Natural (insertion) order, like a real collection scan —
            # deliberately NOT _id order, so the migration loop's
            # correctness genuinely depends on requesting the sort.
            matched = list(reversed(matched))
        return iter(matched)

    def bulk_write(self, models: list, ordered: bool = False):
        self.bulk_calls += 1
        if self.fail_times > 0:
            self.fail_times -= 1
            raise RuntimeError("transient network error")
        assert ordered is False  # mongodb.go:411 unordered bulk
        for m in models:
            # pymongo UpdateOne when available, dict fallback otherwise.
            if isinstance(m, dict):
                assert m["upsert"] is True
                self.docs[m["filter"]["_id"]] = dict(m["update"]["$set"])
            else:
                doc = m._doc["u"]["$set"]
                self.docs[m._filter["_id"]] = dict(doc)


def _mongo_docs(n: int) -> list[dict]:
    return [{"_id": i, "name": f"doc{i}", "v": i * 10} for i in range(1, n + 1)]


def test_mongo_migrate_full_then_skip(tmp_path):
    source = FakeMongoCollection(_mongo_docs(2500))
    dest = FakeMongoCollection()
    store = CheckpointStore(str(tmp_path), engine="mongodb")
    stats = MigrationStats()

    res = migrate_collection(
        source, dest, "users", store, stats, batch_size=1000, parse_id=int
    )
    assert res == {"rows": 2500, "resumed_from": None}
    assert dest.docs == source.docs
    # 2500 docs / batch 1000 → 3 bulk writes (mongodb.go:338-343 + 363-368).
    assert dest.bulk_calls == 3
    assert store.is_complete("users")
    snap = stats.snapshot()["users"]
    assert (snap["processed"], snap["total"]) == (2500, 2500)

    # Idempotent rerun: skip-complete (mongodb.go:239-242).
    assert migrate_collection(source, dest, "users", store, parse_id=int) == {
        "skipped": True,
        "reason": "checkpoint complete",
    }


def test_mongo_migrate_resume_rebases_progress(tmp_path):
    source = FakeMongoCollection(_mongo_docs(2000))
    dest = FakeMongoCollection()
    store = CheckpointStore(str(tmp_path), engine="mongodb")
    stats = MigrationStats()
    # Interrupted previous run checkpointed at _id=1500, not complete.
    store.save("users", Checkpoint(last_key={"_id": "1500"}, complete=False))

    res = migrate_collection(
        source, dest, "users", store, stats, batch_size=200, parse_id=int
    )
    assert res == {"rows": 500, "resumed_from": "1500"}
    # P5: resume filter {_id: {$gt: parsed}} (mongodb.go:264-269).
    assert source.find_filters == [{"_id": {"$gt": 1500}}]
    assert sorted(dest.docs) == list(range(1501, 2001))
    # R9 (mongodb.go:286-291): denominator rebased to remaining docs.
    assert stats.snapshot()["users"]["total"] == 500
    assert store.is_complete("users")


def test_mongo_bulk_retry_and_upsert_overwrite(tmp_path):
    source = FakeMongoCollection(_mongo_docs(10))
    # Dest already holds a stale version of doc 3 and fails twice.
    dest = FakeMongoCollection([{"_id": 3, "name": "stale", "v": -1}], fail_times=2)
    store = CheckpointStore(str(tmp_path), engine="mongodb")

    res = migrate_collection(
        source, dest, "users", store, batch_size=1000,
        retry_delay=0.0, sleep=lambda _s: None, parse_id=int,
    )
    assert res["rows"] == 10
    assert dest.bulk_calls == 3  # 2 failures + 1 success
    assert dest.docs[3] == {"_id": 3, "name": "doc3", "v": 30}


def test_mongo_bulk_retry_exhaustion_raises(tmp_path):
    source = FakeMongoCollection(_mongo_docs(5))
    dest = FakeMongoCollection(fail_times=10)
    store = CheckpointStore(str(tmp_path), engine="mongodb")
    with pytest.raises(RuntimeError):
        migrate_collection(
            source, dest, "users", store, max_retries=3,
            retry_delay=0.0, sleep=lambda _s: None, parse_id=int,
        )
    # Not marked complete → next run resumes, doesn't skip.
    assert not store.is_complete("users")


def test_mongo_upsert_models_shape():
    models = upsert_models([{"_id": 7, "a": 1}])
    assert models == [
        {"filter": {"_id": 7}, "update": {"$set": {"_id": 7, "a": 1}}, "upsert": True}
    ]


# ---------------------------------------------------------------------------
# Cassandra fakes
# ---------------------------------------------------------------------------


class FakeCQLSource:
    """Returns canned rows for the data SELECT; records queries so tests
    can assert the resume WHERE clause."""

    def __init__(self, rows: list[dict]):
        self.rows = rows
        self.queries: list[str] = []

    def execute(self, statement: str, parameters: tuple = ()):
        self.queries.append(statement)
        if "WHERE token(" in statement:
            # Emulate server-side token filtering for the int-pk fixtures:
            # token order == value order in these tests.
            import re

            m = re.search(r">= token\((\d+)\)", statement)
            if m:
                lo = int(m.group(1))
                return [r for r in self.rows if r["id"] >= lo]
        return list(self.rows)


class FakeCQLDest:
    def __init__(self, fail_times: int = 0):
        self.fail_times = fail_times
        self.batches: list[list[tuple[str, tuple]]] = []
        self.rows: dict = {}

    def execute(self, statement: str, parameters: tuple = ()):
        return []

    def execute_batch(self, statements: list[tuple[str, tuple]]):
        if self.fail_times > 0:
            self.fail_times -= 1
            raise RuntimeError("write timeout")
        self.batches.append(statements)
        for _stmt, params in statements:
            self.rows[params[0]] = params


def _cass_rows(n: int) -> list[dict]:
    return [
        {"id": i, "name": f"n{i}", "ttl_name": 100 + i, "tags": [f"t{i}"]}
        for i in range(1, n + 1)
    ]


_CASS_COLUMNS = [("id", "bigint"), ("name", "text"), ("tags", "list<text>")]


def test_cassandra_copy_full_with_ttl(tmp_path):
    source = FakeCQLSource(_cass_rows(250))
    dest = FakeCQLDest()
    store = CheckpointStore(str(tmp_path), engine="cassandra")
    stats = MigrationStats()

    res = copy_data(
        source, dest,
        source_keyspace="src", source_name="t", target_name="t2",
        columns=_CASS_COLUMNS, partition_keys=["id"], key_columns=["id"],
        store=store, stats=stats, batch_size=100,
    )
    assert res == {"rows": 250, "resumed_from": None}
    # S5: TTL projected for non-key scalars only (collections excluded).
    assert source.queries[0].startswith(
        "SELECT id, name, tags, ttl(name) AS ttl_name FROM src.t"
    )
    assert len(dest.batches) == 3  # 100+100+50
    stmt, params = dest.batches[0][0]
    # W4: INSERT-as-upsert with the reference's single-row TTL
    # approximation (cassandra.go:678-691) from the first eligible column.
    assert stmt == "INSERT INTO t2 (id, name, tags) VALUES (?, ?, ?) USING TTL ?"
    assert params == (1, "n1", ["t1"], 101)
    assert store.is_complete("t")
    assert stats.snapshot()["t"]["processed"] == 250


def test_cassandra_copy_resume_token_where(tmp_path):
    source = FakeCQLSource(_cass_rows(200))
    dest = FakeCQLDest()
    store = CheckpointStore(str(tmp_path), engine="cassandra")
    store.save("t", Checkpoint(last_key={"id": "151"}, complete=False))

    res = copy_data(
        source, dest,
        source_keyspace="src", source_name="t", target_name="t2",
        columns=_CASS_COLUMNS, partition_keys=["id"], key_columns=["id"],
        store=store, batch_size=100,
    )
    # P6 (cassandra.go:585-592): token-WHERE resume from the checkpoint.
    assert source.queries[0].endswith("WHERE token(id) >= token(151)")
    assert res["resumed_from"] == {"id": "151"}
    assert res["rows"] == 50
    assert sorted(dest.rows) == list(range(151, 201))


def test_cassandra_copy_skip_complete_and_retry(tmp_path):
    store = CheckpointStore(str(tmp_path), engine="cassandra")
    store.mark_complete("t")
    res = copy_data(
        FakeCQLSource([]), FakeCQLDest(),
        source_keyspace="src", source_name="t", target_name="t2",
        columns=_CASS_COLUMNS, partition_keys=["id"], key_columns=["id"],
        store=store,
    )
    assert res == {"skipped": True, "reason": "checkpoint complete"}

    # Retry path (cassandra.go:887-898): transient failures absorbed.
    dest = FakeCQLDest(fail_times=2)
    res = copy_data(
        FakeCQLSource(_cass_rows(5)), dest,
        source_keyspace="src", source_name="u", target_name="u2",
        columns=_CASS_COLUMNS, partition_keys=["id"], key_columns=["id"],
        store=store, retry_delay=0.0, sleep=lambda _s: None,
    )
    assert res["rows"] == 5 and len(dest.batches) == 1

    # Exhaustion raises and leaves the table resumable.
    dest = FakeCQLDest(fail_times=99)
    with pytest.raises(RuntimeError):
        copy_data(
            FakeCQLSource(_cass_rows(5)), dest,
            source_keyspace="src", source_name="v", target_name="v2",
            columns=_CASS_COLUMNS, partition_keys=["id"], key_columns=["id"],
            store=store, max_retries=2, retry_delay=0.0, sleep=lambda _s: None,
        )
    assert not store.is_complete("v")


def test_cassandra_blob_partition_key_hexed(tmp_path):
    source = FakeCQLSource(
        [{"id": b"\xde\xad", "name": "x", "ttl_name": 0, "tags": []}]
    )
    dest = FakeCQLDest()
    store = CheckpointStore(str(tmp_path), engine="cassandra")
    copy_data(
        source, dest,
        source_keyspace="src", source_name="b", target_name="b2",
        columns=[("id", "blob"), ("name", "text"), ("tags", "list<text>")],
        partition_keys=["id"], key_columns=["id"], store=store,
    )
    # cassandra.go:810-812: blob partition keys checkpoint as hex.
    assert store.load("b").last_key == {"id": "dead"}


# ---------------------------------------------------------------------------
# Unit coverage: token-WHERE builder + TTL projection + batch retry
# ---------------------------------------------------------------------------


def test_build_token_where_quoting():
    types = {"a": "text", "b": "blob", "c": "bigint"}
    # cassandra.go:1119-1127: text quoted, blob 0x-prefixed, numeric raw.
    assert (
        build_token_where(types, ["a", "b", "c"], {"a": "x", "b": "ff", "c": "9"})
        == "token(a, b, c) >= token('x', 0xff, 9)"
    )
    # Missing any partition-key value → no resume (cassandra.go:1129-1131).
    assert build_token_where(types, ["a", "b"], {"a": "x"}) == ""
    assert build_token_where(types, [], {}) == ""


def test_ttl_projection_excludes_collections():
    proj = ttl_projection(
        ["id", "name", "tags"],
        ["id"],
        {"id": "bigint", "name": "text", "tags": "list<text>"},
    )
    assert proj == ["id", "name", "tags", "ttl(name) AS ttl_name"]


def test_execute_batch_with_retry_succeeds_after_failures():
    dest = FakeCQLDest(fail_times=2)
    execute_batch_with_retry(
        dest, [("INSERT", (1,))], max_retries=3, retry_delay=0.0, sleep=lambda _s: None
    )
    assert len(dest.batches) == 1


def test_cassandra_detect_keys_sorted_by_position():
    """C3 (cassandra.go:493-528): partition/clustering keys from
    system_schema kinds, each position-sorted; keyless tables error."""
    from dbtransfer_spark.sources.cassandra import detect_keys

    session = FakeCQLSourceRows(
        [
            {"column_name": "c2", "kind": "clustering", "position": 1},
            {"column_name": "p2", "kind": "partition_key", "position": 1},
            {"column_name": "p1", "kind": "partition_key", "position": 0},
            {"column_name": "c1", "kind": "clustering", "position": 0},
            {"column_name": "v", "kind": "regular", "position": -1},
        ]
    )
    assert detect_keys(session, "ks", "t") == (["p1", "p2"], ["c1", "c2"])

    with pytest.raises(RuntimeError):
        detect_keys(
            FakeCQLSourceRows([{"column_name": "v", "kind": "regular", "position": -1}]),
            "ks", "t",
        )


class FakeCQLSourceRows:
    def __init__(self, rows):
        self.rows = rows

    def execute(self, statement: str, parameters: tuple = ()):
        return list(self.rows)


class FakeCatalogSession:
    """Source session answering the catalog queries migrate_table issues
    (prefix-matched) and the data SELECT (fallback)."""

    def __init__(self, catalog: dict[str, list[dict]], data_rows: list[dict]):
        self.catalog = catalog
        self.data_rows = data_rows
        self.queries: list[str] = []

    def execute(self, statement: str, parameters: tuple = ()):
        self.queries.append(statement)
        for prefix, rows in self.catalog.items():
            if statement.startswith(prefix):
                return list(rows)
        return list(self.data_rows)


class RecordingCQLDest(FakeCQLDest):
    def __init__(self):
        super().__init__()
        self.ddl: list[str] = []

    def execute(self, statement: str, parameters: tuple = ()):
        self.ddl.append(statement)
        return []


def test_cassandra_migrate_table_end_to_end(tmp_path):
    """migrateTable orchestration (cassandra.go:236-291): existence probe →
    dependency migration (UDT referenced by a column) → DDL clone with the
    target name, reconstructed PRIMARY KEY and default TTL → full copy."""
    from dbtransfer_spark.sources.cassandra import migrate_table

    catalog = {
        "SELECT table_name FROM system_schema.tables": [{"table_name": "src_t"}],
        "SELECT default_time_to_live FROM system_schema.tables": [
            {"default_time_to_live": 86400}
        ],
        # keyspace-wide scan used by migrate_dependencies
        "SELECT table_name, column_name, type FROM system_schema.columns": [
            {"table_name": "src_t", "column_name": "id", "type": "bigint"},
            {"table_name": "src_t", "column_name": "addr", "type": "frozen<address>"},
        ],
        # per-table scans: schema reconstruction / column list / key kinds
        "SELECT column_name, type, kind, position FROM system_schema.columns": [
            {"column_name": "id", "type": "bigint", "kind": "partition_key", "position": 0},
            {"column_name": "seq", "type": "int", "kind": "clustering", "position": 0},
            {"column_name": "addr", "type": "frozen<address>", "kind": "regular", "position": -1},
        ],
        "SELECT column_name, type FROM system_schema.columns": [
            {"column_name": "id", "type": "bigint"},
            {"column_name": "seq", "type": "int"},
            {"column_name": "addr", "type": "frozen<address>"},
        ],
        "SELECT column_name, kind, position FROM system_schema.columns": [
            {"column_name": "id", "kind": "partition_key", "position": 0},
            {"column_name": "seq", "kind": "clustering", "position": 0},
            {"column_name": "addr", "kind": "regular", "position": -1},
        ],
        "SELECT options FROM system_schema.indexes": [],
        "SELECT type_name, field_names, field_types FROM system_schema.types": [
            {"type_name": "address", "field_names": ["street"], "field_types": ["text"]},
        ],
        "SELECT function_name": [],
    }
    data = [
        {"id": i, "seq": 1, "addr": {"street": f"s{i}"}, "ttl_addr": 50 + i}
        for i in range(1, 6)
    ]
    source = FakeCatalogSession(catalog, data)
    dest = RecordingCQLDest()
    store = CheckpointStore(str(tmp_path), engine="cassandra")

    res = migrate_table(
        source, dest,
        source_keyspace="src_ks", dest_keyspace="dst_ks",
        source_name="src_t", target_name="dst_t",
        store=store, batch_size=2,
    )
    assert res == {"rows": 5, "resumed_from": None}
    # Dependencies strictly before DDL; DDL carries target name, key
    # structure, and the default TTL (cassandra.go:270-288 + 900-980).
    assert dest.ddl[0] == "CREATE TYPE IF NOT EXISTS dst_ks.address (street text)"
    # DDL and data writes target the destination keyspace explicitly —
    # same keyspace the UDTs were created in.
    assert dest.ddl[1] == (
        "CREATE TABLE IF NOT EXISTS dst_ks.dst_t (\n"
        "    id bigint,\n    seq int,\n    addr frozen<address>,\n"
        "    PRIMARY KEY ((id), seq)\n"
        ") WITH default_time_to_live = 86400"
    )
    # Copy: TTL projected for the regular scalar-ish column only (addr is
    # frozen<>, not a collection → TTL-eligible like the reference).
    stmt, params = dest.batches[0][0]
    assert stmt == "INSERT INTO dst_ks.dst_t (id, seq, addr) VALUES (?, ?, ?) USING TTL ?"
    assert params == (1, 1, {"street": "s1"}, 51)
    assert len(dest.batches) == 3  # 2+2+1
    assert store.is_complete("src_t")


def test_mongo_run_migration_pool_and_error_isolation(tmp_path):
    """Run() parity (mongodb.go:156-202): concurrent collections, one
    failing collection doesn't abort the rest, errors are collected, and
    the failed collection stays resumable."""
    from dbtransfer_spark.sources.mongodb import run_migration

    good_src = FakeMongoCollection(_mongo_docs(300))
    good_dst = FakeMongoCollection()
    bad_src = FakeMongoCollection(_mongo_docs(50))
    bad_dst = FakeMongoCollection(fail_times=99)
    store = CheckpointStore(str(tmp_path), engine="mongodb")

    out = run_migration(
        {"good": (good_src, good_dst), "bad": (bad_src, bad_dst)},
        store,
        workers=2,
        batch_size=100,
        rate_limit=1_000_000,
        max_retries=1,
        retry_delay=0.0,
        parse_id=int,
        sleep=lambda _s: None,
    )
    assert out["tables"]["good"]["rows"] == 300
    assert good_dst.docs == good_src.docs
    assert "bad" in out["errors"]
    assert store.is_complete("good") and not store.is_complete("bad")
    assert out["stats"]["good"]["processed"] == 300


def test_cassandra_nested_udt_dependency_order():
    """A column of list<frozen<address>> whose UDT has a UDT field (geo)
    must pull in geo transitively and create it BEFORE address — the
    reference misses both (unknown-type failures on real schemas)."""
    from dbtransfer_spark.sources.cassandra import migrate_dependencies
    from tests.test_units import FakeCQLSession

    source = FakeCQLSession(
        {
            "system_schema.columns": [
                {"table_name": "t", "column_name": "id", "type": "bigint"},
                {"table_name": "t", "column_name": "addrs",
                 "type": "list<frozen<address>>"},
            ],
            "system_schema.indexes": [],
            "system_schema.types": [
                {"type_name": "address", "field_names": ["street", "loc"],
                 "field_types": ["text", "frozen<geo>"]},
                {"type_name": "geo", "field_names": ["lat", "lon"],
                 "field_types": ["double", "double"]},
                {"type_name": "unused", "field_names": ["x"], "field_types": ["int"]},
            ],
            "system_schema.functions": [],
        }
    )
    dest = FakeCQLSession()
    executed = migrate_dependencies(source, dest, "src", "dst")
    assert executed == [
        "CREATE TYPE IF NOT EXISTS dst.geo (lat double, lon double)",
        "CREATE TYPE IF NOT EXISTS dst.address (street text, loc frozen<geo>)",
    ]


def test_build_token_where_escapes_quotes_and_temporals():
    from dbtransfer_spark.sources.cassandra import build_token_where

    out = build_token_where(
        {"name": "text", "day": "date"},
        ["name", "day"],
        {"name": "O'Brien", "day": "2024-01-02"},
    )
    assert out == "token(name, day) >= token('O''Brien', '2024-01-02')"


def test_build_token_where_truncates_temporal_to_millis():
    # CQL timestamp/time literals accept at most .SSS fractions; the
    # checkpoint stores str(datetime) with 6-digit microseconds.
    from dbtransfer_spark.sources.cassandra import build_token_where

    out = build_token_where(
        {"ts": "timestamp"},
        ["ts"],
        {"ts": "2024-01-02 03:04:05.123000"},
    )
    assert out == "token(ts) >= token('2024-01-02 03:04:05.123')"


def test_referenced_udts_chases_tuple_nesting():
    from dbtransfer_spark.sources.cassandra import referenced_udts

    known = {"geo", "address"}
    assert referenced_udts("tuple<int, frozen<geo>>", known) == {"geo"}
    assert referenced_udts(
        "map<text, frozen<tuple<address, list<geo>>>>", known
    ) == {"geo", "address"}


class ExistingAwareCQLDest(RecordingCQLDest):
    """Fake dest that enforces real Cassandra create semantics: a CREATE
    for an existing name raises AlreadyExists unless the statement says
    IF NOT EXISTS (which no-ops) — the server behavior behind the
    reference's "already exists" tolerance (mysql.go:266-274 analogue;
    cassandra.go:286-288, 370-377)."""

    def __init__(self):
        super().__init__()
        self.created: set[str] = set()
        self.create_attempts = 0

    def execute(self, statement: str, parameters: tuple = ()):
        if statement.startswith("CREATE"):
            self.create_attempts += 1
            name = statement.split("EXISTS")[-1].split("(")[0].strip() \
                if "IF NOT EXISTS" in statement \
                else statement.split()[2].split("(")[0]
            if name in self.created:
                if "IF NOT EXISTS" not in statement:
                    raise RuntimeError(f"AlreadyExists: {name}")
                return []  # tolerated no-op
            self.created.add(name)
        return super().execute(statement, parameters)


def test_cassandra_migrate_recreate_tolerated(tmp_path):
    """r5 VERDICT #8: DDL apply on an already-populated destination must
    be a no-op, not an error — re-running the whole migration against
    the same dest (fresh checkpoint) succeeds and re-upserts."""
    from dbtransfer_spark.sources.cassandra import migrate_table

    catalog = {
        "SELECT table_name FROM system_schema.tables": [{"table_name": "src_t"}],
        "SELECT default_time_to_live FROM system_schema.tables": [
            {"default_time_to_live": 0}
        ],
        "SELECT table_name, column_name, type FROM system_schema.columns": [
            {"table_name": "src_t", "column_name": "id", "type": "bigint"},
            {"table_name": "src_t", "column_name": "addr", "type": "frozen<address>"},
        ],
        "SELECT column_name, type, kind, position FROM system_schema.columns": [
            {"column_name": "id", "type": "bigint", "kind": "partition_key", "position": 0},
            {"column_name": "addr", "type": "frozen<address>", "kind": "regular", "position": -1},
        ],
        "SELECT column_name, type FROM system_schema.columns": [
            {"column_name": "id", "type": "bigint"},
            {"column_name": "addr", "type": "frozen<address>"},
        ],
        "SELECT column_name, kind, position FROM system_schema.columns": [
            {"column_name": "id", "kind": "partition_key", "position": 0},
            {"column_name": "addr", "kind": "regular", "position": -1},
        ],
        "SELECT options FROM system_schema.indexes": [],
        "SELECT type_name, field_names, field_types FROM system_schema.types": [
            {"type_name": "address", "field_names": ["street"], "field_types": ["text"]},
        ],
        "SELECT function_name": [],
    }
    data = [{"id": i, "addr": {"street": f"s{i}"}, "ttl_addr": None} for i in range(3)]
    source = FakeCatalogSession(catalog, data)
    dest = ExistingAwareCQLDest()

    for attempt in range(2):
        # fresh checkpoint dir per attempt: the second run is a true
        # re-migration onto a dest where type+table already exist
        store = CheckpointStore(str(tmp_path / f"ckpt{attempt}"), engine="cassandra")
        res = migrate_table(
            source, dest,
            source_keyspace="src_ks", dest_keyspace="dst_ks",
            source_name="src_t", target_name="dst_t",
            store=store, batch_size=2,
        )
        assert res == {"rows": 3, "resumed_from": None}
    # both runs attempted the DDL; the dest created each object exactly
    # once and the replayed creates were tolerated no-ops, not errors
    assert dest.create_attempts == 4 and len(dest.created) == 2
    creates = [s for s in dest.ddl if s.startswith("CREATE")]
    assert all("IF NOT EXISTS" in s for s in creates)


def test_mongo_schema_drift_normalization(tmp_path):
    """SURVEY §7 hard-part 6 (r6 VERDICT #7): two batches with divergent
    field sets migrate under ONE stable destination shape — declared
    fields always present (None when absent), unknown fields folded into
    a deterministic _extra_json string that round-trips via json.loads."""
    import json

    # batch 1: has 'email' (unknown); batch 2: has 'age'+'tags' (unknown)
    # and is MISSING 'v' (declared) — worst-case inference drift.
    docs = [
        {"_id": 1, "name": "a", "v": 10, "email": "a@x"},
        {"_id": 2, "name": "b", "v": 20},
        {"_id": 3, "name": "c", "age": 9, "tags": ["x", "y"]},
    ]
    source = FakeMongoCollection(docs)
    dest = FakeMongoCollection()
    store = CheckpointStore(str(tmp_path), engine="mongodb")
    res = migrate_collection(
        source, dest, "users", store, parse_id=int, batch_size=2,
        stable_fields=["name", "v"],
    )
    assert res == {"rows": 3, "resumed_from": None}
    # one fixed shape across both batches
    assert all(
        set(d) == {"_id", "name", "v", "_extra_json"} for d in dest.docs.values()
    )
    assert dest.docs[2]["_extra_json"] is None
    assert dest.docs[3]["v"] is None
    assert json.loads(dest.docs[1]["_extra_json"]) == {"email": "a@x"}
    assert json.loads(dest.docs[3]["_extra_json"]) == {"age": 9, "tags": ["x", "y"]}


def test_normalize_document_is_deterministic_and_keeps_id():
    from dbtransfer_spark.sources.mongodb import normalize_document

    d1 = {"_id": 5, "b": 1, "a": 2, "k": "v"}
    d2 = {"_id": 5, "a": 2, "k": "v", "b": 1}  # same doc, different order
    n1 = normalize_document(d1, ["_id", "k"])
    n2 = normalize_document(d2, ["_id", "k"])
    assert n1 == n2 and n1["_id"] == 5
    assert n1["_extra_json"] == '{"a": 2, "b": 1}'
