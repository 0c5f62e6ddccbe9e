"""Connector layer: sources (reads) and sinks (idempotent upsert writes).

One module per engine family, mirroring the reference's four engines
(/root/reference/internal/migration/{mysql,postgresql,mongodb,cassandra})
plus ``parquet`` — our native format for fixtures/tests and the on-disk
interchange format at scale.
"""

from dbtransfer_spark.sources.base import Sink, Source, get_sink, get_source

__all__ = ["Source", "Sink", "get_source", "get_sink"]
