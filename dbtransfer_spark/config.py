"""Configuration model: YAML schema compatible with the reference tool.

Mirrors the reference's config tree (/root/reference/internal/config/
config.go:3-46) field-for-field so an existing dbtransfer ``config.yaml``
drives this engine unchanged, and reproduces the ``SetDefaults`` semantics
(config.go:49-89). Extra engine-level knobs (parquet paths, sink mode) are
additive and optional.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any

try:  # pyyaml is optional; JSON configs always work.
    import yaml  # type: ignore

    _HAVE_YAML = True
except ImportError:  # pragma: no cover
    _HAVE_YAML = False


@dataclass
class ColumnTransformation:
    """Per-column scalar expression (config.go:28-31).

    ``expression`` is Spark SQL dialect; reference-dialect functions
    (e.g. MySQL ``DATE_FORMAT``) are translated by
    :mod:`dbtransfer_spark.transforms`.
    """

    source_column: str
    expression: str


@dataclass
class TableMapping:
    """config.go:21-26."""

    name: str
    target_name: str = ""
    primary_key: str = ""
    column_transformations: list[ColumnTransformation] = field(default_factory=list)

    @property
    def effective_target(self) -> str:
        return self.target_name or self.name

    def transform_map(self) -> dict[str, str]:
        return {t.source_column: t.expression for t in self.column_transformations}


@dataclass
class DBConfig:
    """config.go:9-19. ``type`` ∈ {parquet, mysql, postgresql, mongodb,
    cassandra}; parquet is our engine's native fixture/test format and uses
    ``database`` as the directory path."""

    type: str = ""
    hosts: list[str] = field(default_factory=list)
    keyspace: str = ""
    database: str = ""
    schema: str = ""
    username: str = ""
    password: str = ""
    tables: list[TableMapping] = field(default_factory=list)
    auth_db: str = ""

    def set_defaults(self) -> None:
        # config.go:82-89
        if not self.hosts:
            self.hosts = ["localhost:27017"]
        if not self.auth_db:
            self.auth_db = "admin"


@dataclass
class MigrationConfig:
    """config.go:34-46 with default values from config.go:49-80."""

    batch_size: int = 0
    workers: int = 0
    rate_limit: int = 0
    timeout: int = 0
    checkpoint_dir: str = ""
    log_file: str = ""
    log_level: str = ""
    progress_interval: int = 0
    language: str = ""
    checkpoint_row_threshold: int = 0
    checkpoint_interval: int = 0
    checkpoint_delay: int = 0
    max_retries: int = 3  # mysql.go:114-115
    retry_delay: float = 5.0

    def set_defaults(self) -> None:
        # config.go:49-80
        if self.batch_size <= 0:
            self.batch_size = 1000
        if self.workers <= 0:
            self.workers = 4
        if self.rate_limit <= 0:
            self.rate_limit = 10000
        if self.timeout <= 0:
            self.timeout = 30
        if not self.checkpoint_dir:
            self.checkpoint_dir = "./data/checkpoints"
        if self.progress_interval <= 0:
            self.progress_interval = 10
        if not self.log_level:
            self.log_level = "info"
        if self.checkpoint_row_threshold <= 0:
            self.checkpoint_row_threshold = 1000
        if self.checkpoint_interval <= 0:
            self.checkpoint_interval = 1
        if self.checkpoint_delay <= 0:
            self.checkpoint_delay = 5


@dataclass
class Config:
    source: DBConfig = field(default_factory=DBConfig)
    destination: DBConfig = field(default_factory=DBConfig)
    migration: MigrationConfig = field(default_factory=MigrationConfig)

    def set_defaults(self) -> None:
        self.source.set_defaults()
        self.destination.set_defaults()
        self.migration.set_defaults()


def _build(cls: type, data: dict[str, Any]) -> Any:
    """Recursively build a dataclass from a plain dict, ignoring unknown
    keys (the reference's YAML decoder likewise ignores extras)."""
    if data is None:
        data = {}
    kwargs: dict[str, Any] = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        value = data[f.name]
        if f.name == "tables":
            value = [_build(TableMapping, t) for t in value or []]
        elif f.name == "column_transformations":
            value = [_build(ColumnTransformation, t) for t in value or []]
        elif f.name in ("source", "destination"):
            value = _build(DBConfig, value)
        elif f.name == "migration":
            value = _build(MigrationConfig, value)
        kwargs[f.name] = value
    return cls(**kwargs)


def load_config(path: str) -> Config:
    """Parse YAML/JSON config and apply defaults (main.go:32-57)."""
    with open(path) as fh:
        text = fh.read()
    if _HAVE_YAML:
        data = yaml.safe_load(text)
    else:
        data = json.loads(text)
    cfg: Config = _build(Config, data or {})
    cfg.set_defaults()
    return cfg


TEMPLATE = """\
source:
  type: parquet           # parquet | mysql | postgresql | mongodb | cassandra
  database: /root/testdata/sf0.001   # parquet: source directory
  tables:
    - name: lineitem
      primary_key: l_orderkey
      column_transformations:
        - source_column: l_returnflag
          expression: "UPPER(l_returnflag)"
        - source_column: l_extendedprice
          expression: "l_extendedprice * 100"
destination:
  type: parquet
  database: ./data/out    # parquet: destination directory
migration:
  batch_size: 1000
  workers: 4
  rate_limit: 10000
  checkpoint_dir: ./data/checkpoints
  progress_interval: 5
"""


# Per-engine template throughput defaults, exactly the reference's
# generated templates: (batch_size, workers, rate_limit).
_TEMPLATE_DEFAULTS = {
    "parquet": (1000, 4, 10000),
    "mysql": (1000, 4, 10000),       # main.go:86-89
    "postgresql": (1000, 4, 10000),  # main.go:120-123
    "mongodb": (500, 4, 2000),       # main.go:152-155
    "cassandra": (1000, 8, 5000),    # main.go:184-188
}

_TEMPLATE_ENDPOINT = {
    "parquet": "  database: /root/testdata/sf0.001   # source directory\n",
    "mysql": "  hosts: [\"localhost:3306\"]\n  username: root\n  password: password\n  database: mydb\n",
    "postgresql": "  hosts: [\"localhost:5432\"]\n  username: postgres\n  password: password\n  database: mydb\n  schema: public\n",
    "mongodb": "  hosts: [\"localhost:27017\"]\n  username: admin\n  password: password\n  database: mydb\n  auth_db: admin\n",
    "cassandra": "  hosts: [\"localhost:9042\"]\n  username: cassandra\n  password: cassandra\n  keyspace: mykeyspace\n",
}

_TEMPLATE_DEST = {
    "parquet": "  database: ./data/out    # destination directory\n",
}


def generate_template(path: str, db_type: str = "parquet") -> None:
    """-generate-template parity (main.go:60-213): engine-specific source/
    destination stanzas and the reference's per-engine throughput defaults
    (mysql/pg 10k rows/s ÷ 4 workers, mongo 2k ÷ 4, cassandra 5k ÷ 8)."""
    t = (db_type or "parquet").lower()
    if t not in _TEMPLATE_DEFAULTS:
        raise ValueError(f"unknown template type: {db_type}")
    if t == "parquet":
        with open(path, "w") as fh:
            fh.write(TEMPLATE)
        return
    batch, workers, rate = _TEMPLATE_DEFAULTS[t]
    endpoint = _TEMPLATE_ENDPOINT[t]
    dest_endpoint = _TEMPLATE_DEST.get(t, endpoint)
    tables = (
        "  tables:\n"
        "    - name: mytable\n"
        "      target_name: mytable\n"
        "      primary_key: id\n"
        "      column_transformations:\n"
        "        - source_column: name\n"
        "          expression: \"UPPER(name)\"\n"
    )
    body = (
        f"source:\n  type: {t}\n{endpoint}{tables}"
        f"destination:\n  type: {t}\n{dest_endpoint}"
        f"migration:\n  batch_size: {batch}\n  workers: {workers}\n"
        f"  rate_limit: {rate}\n  checkpoint_dir: ./data/checkpoints\n"
        f"  progress_interval: 5\n"
    )
    with open(path, "w") as fh:
        fh.write(body)
