"""Session-scoped shared-frame cache for expensive derived frames that
several queries rebuild identically (r11 VERDICT #1).

Why this exists: the graph/basket family (copurchase_triangles,
link_prediction_common_neighbors, market_basket_pairs,
degree_assortativity, kcore_peel_rounds) each derived the SAME
co-purchase edge frame — a Σ|basket|² per-order pair explode over
lineitem collapsed to ~|distinct edges| rows — independently per query,
re-running the basket shuffle and the pair-aggregate shuffle every
time. At 100 TB the edge build is the dominant shuffle of the whole
family; a session that runs two family queries pays it twice for
byte-identical output. pagerank_bipartite had the same shape one level
down: its distinct (part, supplier) frame fed three downstream joins
with NO persist, so the fact-table scan+distinct re-ran per consumer.

Design: a content-keyed cache — key = (Spark application id, realpath
of the sf_dir, frame name) — holding ONE persisted DataFrame per
(session, dataset, frame). Consumers call the builder accessors below;
the first call in a session builds + persists, later calls return the
same frame object so Spark's CacheManager serves the materialized
blocks. The cache is defensive against external ``clearCache()`` (the
sf1 sweep clears between queries to keep timings standalone-
comparable): if the cached entry's storage level has been dropped, the
frame is re-persisted in place (same plan → same values; the build
counter does NOT increment, it counts plan constructions only).

Hashes are unchanged by construction: every accessor returns exactly
the frame the consumer previously built inline (verified query-by-query
against the committed diffcheck ledger when the consumers were
rewired).

Lifecycle: entries live for the Spark application, bounded to
``MAX_ENTRIES`` frames per process with LRU eviction (r12 VERDICT #7 —
a session that touches several sf_dirs, as sweep rehearsals do, must
not accumulate one persisted ~400 MB frame per (dataset, frame) with no
eviction). Eviction unpersists the frame; a later consumer rebuilds it
(BUILD_COUNTS increments — rebuild after eviction is a real plan
build). Each frame is itself bounded — the co-purchase edge frame is
~|distinct part pairs| rows of four BIGINTs (~12M rows / ~400 MB at
the sf1 rehearsal; dimension-bound growth, NOT fact-table-bound,
because pairs collapse per-order multiplicity), and the bipartite frame
is |part×supplier| distinct pairs. Consumers must never
``unpersist()`` a shared frame — derive children (``.select(...)``)
and manage those instead.

Cross-thread eviction caveat (r13 ADVICE): LRU eviction may unpersist a
frame that a CONCURRENT thread's in-flight multi-action query (kcore,
triangles) on another dataset still references. Correctness survives —
Spark recomputes from the (still-valid) plan — but the "consumers never
lose the cache mid-query" property is perf-only under >MAX_ENTRIES
concurrent datasets. Size MAX_ENTRIES to the working set (frames ×
datasets touched concurrently) when running parallel multi-dataset
sessions.
"""

from __future__ import annotations

import os
import threading
from collections import Counter, OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbtransfer_spark.catalog import load_table

# Max concurrently-persisted shared frames per process (LRU beyond this).
# 4 = two frame kinds × two datasets — covers a bench/sweep rehearsal that
# alternates between a fixture and its re-layout cache without eviction
# churn, while bounding a many-dataset session to ~4 × the largest frame.


def _resolve_max_entries(raw: str | None) -> int:
    """Parse the SPARK_GRAFT_SHARED_FRAMES_MAX override, floored at 1
    (r13 ADVICE): a 0/negative override would evict the just-inserted
    frame and silently disable caching entirely — the env var bounds the
    cache, it must not be able to turn it off."""
    return max(1, int(raw) if raw is not None else 4)


MAX_ENTRIES = _resolve_max_entries(os.environ.get("SPARK_GRAFT_SHARED_FRAMES_MAX"))

_LOCK = threading.Lock()
_CACHE: OrderedDict[tuple[str, str, str], DataFrame] = OrderedDict()
# (app_id, sf_dir, name) -> number of times the frame's PLAN was built
# (observability + the cross-query reuse test; re-persists after an
# external clearCache don't count — the plan is reused, not rebuilt).
BUILD_COUNTS: Counter = Counter()


def shared_frame(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the session's persisted copy of ``name`` for ``sf_dir``,
    building it via ``build()`` on first use. Holds at most
    ``MAX_ENTRIES`` frames process-wide; least-recently-used entries are
    unpersisted and dropped."""
    key = (spark.sparkContext.applicationId, os.path.realpath(sf_dir), name)
    with _LOCK:
        df = _CACHE.get(key)
        if df is not None:
            _CACHE.move_to_end(key)
            if not (
                df.storageLevel.useMemory or df.storageLevel.useDisk
            ):  # externally clearCache()d — re-persist the same plan
                df.persist()
            return df
        df = build().persist()
        _CACHE[key] = df
        BUILD_COUNTS[key] += 1
        while len(_CACHE) > MAX_ENTRIES:
            _, evicted = _CACHE.popitem(last=False)
            try:
                evicted.unpersist()
            except Exception:
                pass  # a stopped session's frame has nothing to release
        return df


# ---------------------------------------------------------------------------
# Co-purchase edge frame (u, v, w, together)
# ---------------------------------------------------------------------------


def _build_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weighted co-purchase edge frame every basket-graph query
    derives from: one row per unordered part pair (u < v) that ever
    shares an order, with BOTH aggregate weights the family needs —

    - ``w``        = Σ_orders cx·cy (line-level co-occurrence count, the
                     multiplicity the lineitem self-join form produces;
                     link_prediction's edge weight), and
    - ``together`` = number of DISTINCT orders containing both parts
                     (market_basket support).

    Plan: ONE partial-aggregated basket shuffle (groupBy l_orderkey →
    sorted part list), an in-array pair explode over the DISTINCT values
    with per-value multiplicities read off the raw list (O(|basket|·
    |distinct|) per order, basket sizes are order-bounded), then ONE
    pair-keyed aggregate — zero join exchanges, the r8 zero-join explode
    extended to emit both weights at once. explode_OUTER + post-filter,
    not plain explode: InferFiltersFromGenerate would push size(prs)>0 —
    with the whole pair-construction expression inlined — into the scan
    filter (the winnow_fingerprints lesson, dedup.py).

    Equivalences (exact, not approximate): per order, distinct pair
    (u, v) is emitted once with m = cx·cy, so sum(m) reproduces the
    position-pair explode's multiplicity (i<j with strict value
    inequality ⇒ cx·cy copies per order) and count(1) reproduces the
    DISTINCT-basket self-join's one-per-order contribution.

    Input layout (r15, guide §6): when the ingest step has registered
    the bucketed basket projection (catalog.ensure_bucketed_basket —
    lineitem's two join columns bucketed on l_orderkey), the basket
    aggregate reads it and needs NO exchange (the bucketed scan's
    HashPartitioning satisfies the groupBy clustering); otherwise the
    plain-path build below is value-identical with one more shuffle."""
    from dbtransfer_spark.catalog import basket_table_name

    tbl = basket_table_name(sf_dir)
    if spark.catalog.tableExists(tbl):
        li = spark.table(tbl)
    else:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
    baskets = li.groupBy("l_orderkey").agg(
        F.expr("sort_array(collect_list(l_partkey))").alias("ps")
    )
    exploded = (
        baskets.selectExpr(
            "array_distinct(ps) AS vs",
            "transform(array_distinct(ps), x ->"
            " size(filter(ps, y -> y = x))) AS cs",
        )
        .selectExpr(
            "flatten(transform(sequence(1, size(vs)), i ->"
            " transform(slice(sequence(1, size(vs)), i+1, size(vs)-i), j ->"
            " struct(element_at(vs, i) AS u, element_at(vs, j) AS v,"
            " element_at(cs, i) * element_at(cs, j) AS m)))) AS prs"
        )
        .select(F.explode_outer("prs").alias("p"))
        .filter("p IS NOT NULL")
        .select("p.u", "p.v", "p.m")
    )
    return exploded.groupBy("u", "v").agg(
        F.sum("m").cast("bigint").alias("w"),
        F.count(F.lit(1)).cast("bigint").alias("together"),
    )


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared weighted co-purchase edge frame — see
    ``_build_copurchase_edges`` for columns and exactness contract."""
    return shared_frame(
        spark,
        sf_dir,
        "copurchase_edges",
        lambda: _build_copurchase_edges(spark, sf_dir),
    )


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted distinct co-purchase pairs (u < v) — the groupBy keys
    of the shared frame; identical to the per-order position-pair
    explode + DISTINCT the graph family used through r11."""
    return copurchase_edges(spark, sf_dir).select("u", "v")


# ---------------------------------------------------------------------------
# Bipartite part↔supplier edge frame
# ---------------------------------------------------------------------------


def part_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (part, supplier) pairs from lineitem — pagerank_bipartite
    consumes this three times (two degree passes + two rank hops); the
    shared persist makes the fact-table scan+distinct run once per
    session instead of once per consumer."""
    return shared_frame(
        spark,
        sf_dir,
        "part_supplier_edges",
        lambda: load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct(),
    )
