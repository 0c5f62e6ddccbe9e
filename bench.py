"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Queries are fully materialized via the noop datasource (whole plan
executes JVM-side, nothing is collected to Python), so timings measure the
engine, not driver serialization. One SparkSession is reused across all
queries (BASELINE.md: startup cost must not be charged per query).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "transfer_transform",      # reference-parity scan+transform (the core op)
    "q1_pricing_summary",      # scan-heavy aggregation
    "q3_shipping_priority",    # selective join + top-k
    "q5_region_revenue",       # 6-way star join
    "running_total",           # window function
    "events_session_30m",      # session windows
    "asof_last_purchase",      # as-of join
    "dedup_exact_fingerprint", # exact dedup
    "dedup_minhash_lsh_fast",  # near-dup candidates (LSH; xxhash64 prod path)
    "text_stats",              # text analysis pass
    "knn_bruteforce_cosine",   # similarity search (exact baseline)
    "knn_ivf_cosine",          # similarity search (IVF scale path)
    "q13_customer_distribution",  # outer join + count distribution
    "q18_large_volume_customers", # aggregate-then-semi-join
    "contamination_check",     # n-gram decontamination sweep
    "embedding_quantize_int8", # vector compression pass
    "kmeans_lloyd",            # iterative clustering (2 Lloyd rounds)
    "bm25_rank",               # keyword relevance ranking
    "gap_fill_forward",        # time-series spine + LOCF
    "gopher_quality_filter",   # n-gram repetition/quality rules (round 4)
    "range_join_binned",       # binned no-equi-key interval join (round 4)
    "supplier_pareto",         # distributed prefix-sum shape (round 5)
    "training_data_build",     # multi-stage filter+dedup+split pipeline (round 5)
    "gram_novelty_rate",       # first-occurrence inverted index (round 5)
    "session_path_topk",       # sessionize + deterministic path + top-k (round 5)
    "correlation_matrix",      # one-pass decimal moment sums (round 5)
    "duplicate_block_ratio",   # paragraph-level dup inverted index (round 5 s2)
    "unigram_freq_score",      # corpus-frequency quality proxy (round 5 s2)
    "source_dup_matrix",       # cross-source duplication rollup (round 6)
    "join_key_skew_profile",   # salting pre-flight skew scan (round 6)
    "incremental_release",     # seed + incremental corpus release e2e (round 6)
    "fuzzy_part_linkage",      # distinct-name blocked linkage (round 7 rewrite)
    "countmin_heavy_hitters",  # constant-state CMS sketch + probe (round 7)
    "join_cardinality_preflight",  # count-table join sizing (round 7)
    "ewma_daily_revenue",      # exact binary-weight EWMA (round 7)
    "winnow_fingerprints",     # MOSS winnowing fingerprint layer (round 7)
    "bloom_join_prefilter",    # declarative bloom semi-join reduction (round 7)
    "zorder_clustering_stats", # 2-D zone-map pruning comparison (round 7)
    "image_ahash_neardup",     # perceptual-hash banded near-dup (round 7)
    "span_corruption_masks",   # T5 denoising mask plan, positional hashes (r7 s2)
    "column_domain_overlap",   # distinct-first FK discovery self-join (r7 s2)
    "rle_encoding_stats",      # per-row-group run counting windows (r7 s2)
    "fifo_cost_allocation",    # cumulative-axis binned interval join (r7 s3)
    "copurchase_edges_build",  # session-shared family edge build, charged once (r13)
    "item_cf_cosine2_topk",    # family consumer: CF ranking off the shared edges (r14)
    "link_prediction_common_neighbors",  # reciprocal-kNN wedge scoring (r7 s3)
    "embedding_pca_power_top1",  # one-scan co-moment sketch + power iter (r7 s3)
    "ivm_delta_rollup",        # incremental view maintenance merge (r7 s3)
]


def _bench_incremental_release(spark, sf_dir):
    """End-to-end release pipeline on a throwaway store: seed release
    from 4/5 of documents, then an overlapping incremental batch (exact
    dedup → asymmetric LSH probe → append commit). Returns the counts as
    a 1-row frame; the temp store is deleted before returning so each
    timed run pays the full cold pipeline."""
    import shutil
    import tempfile

    from dbtransfer_spark.catalog import load_table
    from dbtransfer_spark.pipelines import incremental_release
    from dbtransfer_spark.sources.versioned import VersionedDatasetStore

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="bench_relstore_")
    try:
        store = VersionedDatasetStore(spark, root, "corpus")
        r1 = incremental_release(
            spark, store, docs.filter("doc_id % 5 != 0"), note="seed"
        )
        r2 = incremental_release(
            spark, store, docs.filter("doc_id % 5 = 0 OR doc_id % 7 = 0"), note="incr"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(r1["n_kept"], r2["n_batch"], r2["n_kept"], r2["n_dropped"])],
        "seed_kept long, batch long, kept long, dropped long",
    )


def _bench_copurchase_edges_build(spark, sf_dir):
    """The session-shared co-purchase edge build, charged as its OWN
    bench line (r12 VERDICT #2 — family per-query rows were
    order-dependent because whichever family query ran first absorbed
    the build). Every timed run drops the persisted copy and rebuilds
    through the shared_frames accessor (the noop write materializes the
    re-persisted frame), so this row measures the full build and the
    family consumers that follow measure their post-build residual,
    independent of bench ordering. Unpersisting a shared frame is
    forbidden for CONSUMERS; the bench harness owns the session and does
    it deliberately to time the build."""
    from dbtransfer_spark.operators import shared_frames

    df = shared_frames.copurchase_edges(spark, sf_dir)
    df.unpersist(True)
    return shared_frames.copurchase_edges(spark, sf_dir)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dbtransfer_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="dbtransfer-bench")
    qs = dict(entrymod.queries())
    # The declared dedup_minhash_lsh uses the md5-portable word hash so the
    # DuckDB oracle can replay it; bench times the xxhash64 production
    # variant (identical plan shape, cheaper scalar hash).
    from dbtransfer_spark.operators.dedup import dedup_minhash_lsh_fast

    qs["dedup_minhash_lsh_fast"] = dedup_minhash_lsh_fast
    qs["incremental_release"] = _bench_incremental_release
    qs["copurchase_edges_build"] = _bench_copurchase_edges_build

    # Untimed warmup on the smoke fixture (60× smaller than the bench SF):
    # JVM codegen compilation + classloading for each query shape is session
    # startup cost, which BASELINE.md excludes from per-query time. Warming
    # every headline shape keeps the timed runs measuring the engine, not
    # the JIT (measured: 6.0s cold vs 0.28s steady-state for the same plan).
    for name in HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    # Ingest: re-layout single-row-group fixture files into a scan-parallel
    # cache (one-time table maintenance; reported separately as ingest_sec).
    # The cache is cleared first unless SPARK_GRAFT_KEEP_CACHE=1, so the
    # reported ingest_sec is the true cold re-layout cost, not 0.0 from a
    # previous run's leftovers.
    import shutil

    from dbtransfer_spark.catalog import optimize_layout

    cache_dir = os.path.join(
        os.environ.get("SPARK_GRAFT_CACHE_DIR", "/tmp/dbtransfer_cache"),
        os.path.basename(sf_dir.rstrip("/")),
    )
    if not os.environ.get("SPARK_GRAFT_KEEP_CACHE"):
        shutil.rmtree(cache_dir, ignore_errors=True)
    t_ing = time.monotonic()
    optimize_layout(spark, sf_dir, cache_dir)
    ingest_sec = time.monotonic() - t_ing
    sf_dir_run = cache_dir

    # Each query is timed N=3 times (fixed; not env-tunable, so the
    # headline number can't be improved just by raising the run count)
    # and the MEDIAN run is reported, all raw samples disclosed under
    # "runs". Rationale: this VM shows bursty multi-second CPU-steal
    # spikes (the same plan measured 1.5s and 63s back-to-back with
    # identical code/data/cache); the median is robust to a single
    # steal-inflated sample without the biased-low behavior of min-of-N.
    import statistics

    # Environment canary (r6 VERDICT #2): a FROZEN trivial workload —
    # constant CPU-bound aggregate, independent of SF, data layout, and
    # any repo change. Cross-round bench comparisons divide by the
    # canary ratio to separate sandbox drift from real plan deltas
    # (BENCH_r06 was uniformly ~1.4× BENCH_r05 including this class of
    # trivial work — environmental, not plans). NEVER change this query.
    def _canary(s):
        return s.range(0, 2_000_000, 1, 8).selectExpr(
            "sum(id * 3 + 1) AS s", "count(*) AS n"
        )

    canary_runs = []
    for _ in range(5):
        t0 = time.monotonic()
        _canary(spark).write.format("noop").mode("overwrite").save()
        canary_runs.append(round(time.monotonic() - t0, 3))
    canary_sec = round(statistics.median(canary_runs), 3)

    # Canary mini-set (r10 VERDICT #3): the single CPU-bound canary can't
    # normalize shuffle- or string-heavy drift (r10 saw ~10 code-unchanged
    # queries move 1.6-2× while the CPU canary said the env got FASTER).
    # Three FROZEN SF-independent workloads — cpu (the original), shuffle
    # (hash exchange + agg), strhash (string materialization + md5) — each
    # a median of 3, reported per-component plus a summed canary_mix_sec.
    # NEVER change these queries; bench_compare keeps using canary_sec.
    def _canary_shuffle(s):
        return (
            s.range(0, 1_000_000, 1, 8)
            .selectExpr("id % 10007 AS k", "id AS v")
            .groupBy("k")
            .agg({"v": "sum"})
            .selectExpr("sum(`sum(v)`) AS s", "count(*) AS n")
        )

    def _canary_strhash(s):
        return s.range(0, 300_000, 1, 8).selectExpr(
            "sum(CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT)) AS s"
        )

    canary_mix_runs: dict[str, list[float]] = {}
    canary_mix: dict[str, float] = {}
    for cname, cfn in (
        ("cpu", _canary),
        ("shuffle", _canary_shuffle),
        ("strhash", _canary_strhash),
    ):
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            cfn(spark).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        canary_mix_runs[cname] = runs
        canary_mix[cname] = round(statistics.median(runs), 3)
    canary_mix_sec = round(sum(canary_mix.values()), 3)

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    total = 0.0
    n_runs = 3
    for name in HEADLINE:
        fn = qs[name]
        runs = []
        for _ in range(n_runs):
            t0 = time.monotonic()
            df = fn(spark, sf_dir_run)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        med = round(statistics.median(runs), 3)
        timings[name] = med
        all_runs[name] = runs
        total += med

    # Trailing canary bracket (r15, measurement tooling only): the
    # start-of-run canary cannot vouch for the run's tail — r15opt-mid2
    # started at a calm 0.065 s stamp and still had its back half hit by
    # a steal burst (item_cf 9.5 s vs its 1.0-1.6 s calm band on
    # unchanged code). Re-probing the same FROZEN mix after the timed
    # loop brackets the whole run: a run is calm iff BOTH stamps are.
    # Timed region and per-query methodology unchanged.
    canary_end_mix: dict[str, float] = {}
    for cname, cfn in (
        ("cpu", _canary),
        ("shuffle", _canary_shuffle),
        ("strhash", _canary_strhash),
    ):
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            cfn(spark).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        canary_end_mix[cname] = round(statistics.median(runs), 3)
    canary_end_sec = canary_end_mix["cpu"]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Full per-query history goes to a repo-committed side file: the
    # driver captures ONE stdout line with a length limit (BENCH_r06's
    # "parsed": null was a truncated line, which left only 19/47 r6→r7
    # queries comparable — r7 VERDICT #5), so the printed payload stays
    # compact (medians only) while BENCH_RUNS_LOCAL.json accumulates
    # append-only entries keyed by tag AND canary, letting any future
    # round reconstruct canary-normalized deltas via
    # tools/bench_compare.py --history.
    try:
        hist_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_RUNS_LOCAL.json"
        )
        try:
            with open(hist_path) as f:
                existing = json.load(f)
        except (OSError, ValueError):
            existing = {}
        history = existing.get("history", [])
        if "runs" in existing and not history:  # legacy single-run format
            history = [
                {
                    "tag": "r7",
                    "runs": existing["runs"],
                    "canary_runs": existing.get("canary_runs", []),
                }
            ]
        history.append(
            {
                "tag": os.environ.get("SPARK_GRAFT_BENCH_TAG", "untagged"),
                "sf": sf,
                "canary_sec": canary_sec,
                "canary_runs": canary_runs,
                "canary_mix": canary_mix,
                "canary_mix_runs": canary_mix_runs,
                "ingest_sec": round(ingest_sec, 3),
                "canary_end_sec": canary_end_sec,
                "canary_end_mix": canary_end_mix,
                "queries": timings,
                "runs": all_runs,
            }
        )
        with open(hist_path, "w") as f:
            json.dump({"history": history[-24:]}, f)
    except OSError:
        pass
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "canary_sec": canary_sec,
                "canary_mix_sec": canary_mix_sec,
                "canary_mix": canary_mix,
                "canary_end_sec": canary_end_sec,
                "canary_end_mix": canary_end_mix,
                "ingest_sec": round(ingest_sec, 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
