"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 + §2.10,
  assembled from the package's per-module registries.
``oracle_sql()`` — a matching DuckDB oracle for every declared query
  (seed-specific operators replay via cross-engine hashes / literal
  constants: md5 word hashes for MinHash/SimHash, literal hyperplanes for
  LSH, SQL stopword-argmax for language ID, byte-exact fake kernels for
  the multimodal stubs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbtransfer_spark import queries as relational
from dbtransfer_spark import sqlapi, tpch
from dbtransfer_spark.functions import library as funclib
from dbtransfer_spark.operators import (
    asof,
    corpus_qa,
    dedup,
    multimodal,
    similarity,
    skew,
    text,
    windows,
)

_MODULES = (
    relational,
    tpch,
    windows,
    asof,
    text,
    dedup,
    similarity,
    multimodal,
    corpus_qa,
    sqlapi,
    funclib,
    skew,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
