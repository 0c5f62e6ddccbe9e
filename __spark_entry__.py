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
    graph,
    multimodal,
    rangejoin,
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
    rangejoin,
    graph,
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
# (50 per round). Round-4 window policy (per round-3 VERDICT #2/#7):
#   1. queries that have NEVER had a driver hash row (q21 — fixed this
#      round, q9, q12) plus any query whose implementation changed this
#      round (bm25_rank, acctbal_deciles — re-planned off global windows);
#   2. the r1-only block (newest driver row is 3 rounds old);
#   3. the r2-only block (2 rounds old).
# Newly added round-4 queries are inserted at the HEAD as they land so
# they get driver-verified in the round they ship. Every query, first-50
# or not, is verified locally against the same DuckDB oracles by
# tools/diffcheck.py (results: CORRECTNESS_LOCAL.md).
_VERIFY_FIRST = (
    # new round-4 queries
    "gopher_quality_filter",
    "domain_mix_rebalance",
    "range_join_binned",
    "incremental_daily_rollup",
    "fuzzy_name_pairs",
    "full_outer_reconciliation",
    "bitwise_functions",
    "regex_functions",
    "scd2_merge",
    "value_histogram",
    "winsorize_prices",
    "fk_integrity_audit",
    "asof_next_purchase_1h",
    "argminmax_functions",
    "training_data_build",
    "list_agg_functions",
    "chunk_documents",
    "pagerank_bipartite",
    "events_retention_cohorts",
    "rfm_segmentation",
    "market_basket_pairs",
    "events_anomaly_daily",
    "cdc_apply_compacted",
    "supplier_pareto",
    "lang_id_confusion",
    "orders_seasonality",
    "knn_recall_eval",
    "embedding_norm_profile",
    "weighted_systematic_sample",
    "events_dwell_time",
    "orders_backlog_daily",
    "revenue_forecast_backtest",
    "events_hourly_heatmap",
    "q2_min_cost_supplier",
    "q11_important_part_value",
    "q16_supplier_part_counts",
    "q20_heavy_share_suppliers",
    # never driver-verified / changed this round
    "q21_suppliers_kept_waiting",
    "q9_product_profit",
    "q12_priority_by_returnflag",
    "bm25_rank",
    "acctbal_deciles",
    # r1-only block (last driver row: round 1)
    "events_tumbling_1h",
    "events_sliding_30m_15m",
    "events_session_30m",
    "events_json_extract",
    "events_sessionize_stats",
    "asof_last_purchase",
    "text_stats",
    "text_quality",
    "doc_fingerprint",
    "lang_stats",
    "dedup_exact_fingerprint",
    "dedup_exact_events",
    "dedup_ngram_jaccard",
    "knn_bruteforce_cosine",
    "embedding_neardup_pairs",
    "embedding_centroids",
    "sql_exists_subquery",
    "sql_scalar_subquery",
    "sql_in_subquery",
    "sql_grouping_sets",
    "sql_cte_pipeline",
    "string_functions",
    "datetime_functions",
    "array_functions",
    "conditional_functions",
    "percentile_stats",
    # r2-only block (last driver row: round 2)
    "q4_order_priority",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "events_funnel",
    "gap_fill_forward",
    "corpus_curation",
    "stratified_sample",
    "pack_sequences",
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
