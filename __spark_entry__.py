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
# (50 per round). Round-5 window policy (per round-4 VERDICT #1/#4/#5):
#   1. the 8 r4-red rows FIRST (oracle-type fixes: BIGINT casts /
#      array_join — the only never-driver-green queries, 124/132
#      ever-green before r5; VERDICT r5 done-criterion is all 8 green);
#   2. new round-5 queries, in ship order, so they get driver-verified
#      the round they land (68 shipped this round — 42 fit the 50-slot
#      window after the 8 fixes; the remaining 26, from
#      join_key_skew_profile on, rotate to the r6 head. ALL 200 are
#      locally verified at HEAD: CORRECTNESS_LOCAL.md, 200/200);
#   3. queries whose newest driver row is oldest (the rotation keeps
#      every query's newest driver row ≤2 rounds old).
# Every query, first-50 or not, is verified locally against the same
# DuckDB oracles by tools/diffcheck.py (results: CORRECTNESS_LOCAL.md).
_VERIFY_FIRST = (
    # r4-red fixes (never driver-green; all 8 root-caused to DuckDB
    # HUGEINT→float64 / LIST canonicalization, VERDICT r4 item #1)
    "winsorize_prices",
    "supplier_pareto",
    "q12_priority_by_returnflag",
    "pagerank_bipartite",
    "domain_mix_rebalance",
    "training_data_build",
    "weighted_systematic_sample",
    "list_agg_functions",
    # new round-5 queries (session 1)
    "source_temperature_allocation",
    "user_type_diversity",
    "part_price_twap",
    "doclen_log2_histogram",
    "event_type_user_overlap",
    "embedding_centroid_drift",
    "neardup_degree_histogram",
    "dedup_incremental_new_vs_corpus",
    "session_path_topk",
    "events_error_burst",
    "tokenizer_fertility",
    "gram_novelty_rate",
    "source_length_gini",
    "order_priority_sla",
    "wau_mau_stickiness",
    "correlation_matrix",
    "benford_first_digit",
    "signup_purchase_lag",
    "event_transition_matrix",
    "readability_ari",
    "text_normalize_fingerprint",
    "oov_rate",
    "embedding_dim_stats",
    "bpe_merge_candidates",
    "table_profile_orders",
    "interevent_gap_stats",
    "attribution_last_touch",
    "events_time_rollup",
    "bigram_pmi_top",
    "neardup_jaccard_audit",
    "embedding_pair_distance_histogram",
    # new round-5 queries (session 2; entries from join_key_skew_profile
    # on are past slot 50 — first out of this round's window, first into
    # the r6 head)
    "unigram_freq_score",
    "duplicate_block_ratio",
    "shard_assignment",
    "knn_label_accuracy",
    "mad_outlier_brand_prices",
    "negative_sampling_ring",
    "vocab_coverage_curve",
    "source_length_percentiles",
    "segment_conversion_rates",
    "block_containment_pairs",
    "ab_test_lift",
    "join_key_skew_profile",
    "null_semantics_functions",
    "orders_multi_distinct",
    "window_value_functions",
    "json_schema_profile",
    "nation_segment_share",
    "source_dup_matrix",
    "nation_supplier_hhi",
    "purchase_gap_percentiles",
    "order_total_consistency_audit",
    "session_abandonment",
    "source_quality_scorecard",
    "supplier_lead_time_p95",
    "sql_lateral_topk",
    "format_functions",
    "encoding_functions",
    "rank_functions",
    "filtered_aggregates",
    "try_functions",
    "multimodal_payload_dedup",
    "source_distinctive_terms",
    "embedding_index_build",
    "embedding_exact_dup_summary",
    "struct_functions",
    "user_recent_values",
    "customer_order_drawdown",
    # stale: newest driver row is round 1
    "array_functions",
    "conditional_functions",
    "datetime_functions",
    "dedup_exact_events",
    "dedup_exact_fingerprint",
    "dedup_ngram_jaccard",
    "embedding_centroids",
    "embedding_neardup_pairs",
    "knn_bruteforce_cosine",
    "lang_stats",
    "percentile_stats",
    "sql_cte_pipeline",
    "sql_exists_subquery",
    "sql_grouping_sets",
    "sql_in_subquery",
    "sql_scalar_subquery",
    "string_functions",
    # stale: newest driver row is round 2
    "corpus_curation",
    "doc_fingerprint",
    "events_funnel",
    "gap_fill_forward",
    "pack_sequences",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "q4_order_priority",
    "q7_nation_volume",
    "q8_market_share",
    "stratified_sample",
    # newest driver row is round 3 (next-oldest; fills the window if
    # fewer than 8 new round-5 queries land above)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "transfer_transform",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "contamination_check",
    "kmeans_lloyd",
    "knn_ivf_cosine",
    "knn_lsh_cosine",
    "embedding_neardup_lsh",
    "embedding_quantize_int8",
    "dataset_split",
    "pii_redact",
    "approx_sketches",
    "moment_stats",
    "map_functions",
    "multimodal_features_fake",
    "multimodal_frame_sample",
    "multimodal_payload_stats",
    "multimodal_resize",
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
