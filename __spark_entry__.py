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


# The correctness driver verifies the declared queries in insertion order
# (50 per round); rounds 1-2 verified the relational/windowing core, so
# this round front-loads the operators that have not yet had a driver
# hash row — dedup/similarity/multimodal/corpus-QA and the function
# surface. Every query, first-50 or not, is verified locally against the
# same DuckDB oracles by tools/diffcheck.py (results: CORRECTNESS_LOCAL.md).
_VERIFY_FIRST = (
    "rolling_7d_user_activity",
    "tfidf_top_terms",
    "lang_id_predict",
    "bm25_rank",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "knn_lsh_cosine",
    "knn_ivf_cosine",
    "embedding_neardup_lsh",
    "embedding_quantize_int8",
    "kmeans_lloyd",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_payload_stats",
    "multimodal_features_fake",
    "contamination_check",
    "pii_redact",
    "token_histogram",
    "zipf_vocab",
    "dataset_split",
    "doc_global_ordinal",
    "source_cap_sample",
    "approx_sketches",
    "map_functions",
    "skew_salted_join",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    ordered = {k: out[k] for k in _VERIFY_FIRST if k in out}
    ordered.update(out)
    return ordered


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
