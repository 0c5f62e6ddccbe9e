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
    cdc,
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
    cdc,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The correctness driver verifies the declared queries in insertion order
# (50 per round). Standing window policy (r6 VERDICT #1/#8):
#   1. queries with NO driver row ever lead the window (new ships from the
#      previous round);
#   2. the remaining slots fill oldest-driver-row-first (staleness
#      rotation), so no query's newest driver row ages past ~3 rounds.
# Round-7 window: 50 never-driver-verified queries — the 17 r6 ships
# (judge diffcheck 17/17 green at r6 HEAD) + the 33 earliest r7 ships.
# Policy #1 outranks staleness rotation: this round added 83 queries
# past the 217 the driver has seen, so every slot goes to a query with
# no driver row ever (217 → 250 ever-driver-green if the window holds).
# The r2/r3 stale rows queue below the boundary behind the remaining
# r7 ships for the r8 rotation.
# Every query, first-50 or not, is verified locally against the same
# DuckDB oracles by tools/diffcheck.py (results: CORRECTNESS_LOCAL.md).
_VERIFY_FIRST = (
    # never driver-verified (shipped round 6; judge diffcheck 17/17 green)
    "scd2_history",
    "cdc_apply_merge",
    "fuzzy_part_linkage",
    "events_type_pivot",
    "events_type_unpivot",
    "brand_pareto_front",
    "purchase_pit_state",
    "dq_expectations_orders",
    "copurchase_triangles",
    "session_peak_concurrency",
    "daily_volume_anomaly",
    "multimodal_audio_chunks",
    "daily_cusum_shift",
    "ols_price_on_quantity",
    "setjoin_prefix_jaccard",
    "distribution_functions",
    "attribution_position_based",
    # never driver-verified (33 earliest round-7 ships, ship order; all
    # diffcheck-green at HEAD — fills the window to exactly 50)
    "ewma_daily_revenue",
    "gap_fill_interpolate",
    "part_hierarchy_rollup",
    "sorted_neighborhood_pairs",
    "golden_record_survivorship",
    "countmin_heavy_hitters",
    "join_cardinality_preflight",
    "multimodal_patch_grid",
    "timeseries_cv_folds",
    "daily_user_composition",
    "hard_negative_mining",
    "k_anonymity_audit",
    "sql_recursive_month_series",
    "url_functions",
    "docsim_term_overlap_topk",
    "bootstrap_mean_ci",
    "leakage_safe_split",
    "token_budget_pack",
    "table_bucket_checksum",
    "zonemap_pruning_stats",
    "image_ahash_neardup",
    "winnow_fingerprints",
    "calibration_ece_bins",
    "feature_drift_bins",
    "compaction_bin_packing",
    "categorical_chi2_association",
    "curriculum_interleave",
    "zorder_clustering_stats",
    "bloom_join_prefilter",
    "scd2_as_of_snapshot",
    "embedding_pq_codebook",
    "clamped_running_balance",
    "rendezvous_sharding_drift",
    # ---- slot 50 boundary: everything below is out of the r7 driver
    # window. Order for the r8 rotation: remaining never-driver-verified
    # r7 ships first (they continue past the stale block further down),
    # then stale rows oldest-driver-row-first. ----
    # stale rotation queue: newest driver row is round 2 (10)
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
    # stale rotation queue: newest driver row is round 3 (23)
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
    # newest driver row is round 4
    "corpus_curation",
    "doc_fingerprint",
    "events_funnel",
    "gap_fill_forward",
    "pack_sequences",
    # newest driver row is round 5/6 (r6 window, freshest last)
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
    "q10_returned_items",
    "q13_customer_distribution",
    # remaining round-7 ships past the window (ship order; never
    # driver-verified — NOTE for r8: these rotate to the window head
    # BEFORE the stale queue above, per policy #1)
    "dictionary_encoding_stats",
    "pq_adc_topk",
    "rle_encoding_stats",
    "delta_encoding_advisor",
    "shuffle_plan_advisor",
    "predicate_selectivity_audit",
    "kn_continuation_counts",
    "item_cf_cosine2_topk",
    "retention_hazard_curve",
    "acf_lag_ingredients",
    "l_diversity_audit",
    "join_order_cardinality_audit",
    "weighted_median_by_flag",
    "event_order_inversions",
    "span_corruption_masks",
    "token_id_encode_checksum",
    "column_domain_overlap",
    "column_format_profile",
    "join_size_histogram_estimate",
    "fd_violation_audit",
    "cohort_ltv_curve",
    "snapshot_table_diff",
    "watermark_cost_curve",
    "price_volume_mix_decomposition",
    "brand_return_rate_shrunk",
    "abc_inventory_classes",
    "theil_sen_trend_banded",
    "partition_scheme_advisor",
    "neardup_transitivity_audit",
    "ks_drift_exact",
    "mannwhitney_auc_drift",
    "bot_user_heuristic",
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
