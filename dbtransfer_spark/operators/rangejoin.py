"""Binned range join — the no-equi-key interval join, made shuffle-joinable.

A point-in-interval join (``point BETWEEN lo AND hi``) has no equality
key, so Catalyst can only plan it as BroadcastNestedLoopJoin (fine when
one side is tiny, quadratic when both sides scale — the classic 100 TB
trap; the reference has no joins at all, SURVEY.md §2.9). The standard
scale technique — what Databricks' range-join hints and DuckDB's IEJoin
buy natively — is binning: quantize time into fixed-width bins at least
as wide as the longest interval, explode each interval onto the (≤2)
bins it overlaps, tag each point with its single containing bin, and
equi-join on the bin before applying the exact BETWEEN. Candidate pairs
are then bounded by "pairs within one bin width of each other" —
output-proportional instead of |points|×|intervals|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbtransfer_spark.catalog import load_table

QUERIES = {}
ORACLE = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Interval span is 60 days inclusive; bin width 61 guarantees every
# interval overlaps at most two bins.
_SPAN_DAYS = 60
_BIN_DAYS = 61


def _epoch_day(colname: str):
    """Whole days since epoch for a TIMESTAMP_NTZ column — timezone-free
    (same rationale as windows.epoch_micros)."""
    return F.expr(
        f"timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{colname}`)"
    )


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_day: str,
    lo_day: str,
    hi_day: str,
    bin_days: int = _BIN_DAYS,
) -> DataFrame:
    """Generic binned point-in-interval join on day-granularity columns.

    ``intervals`` must satisfy ``hi_day - lo_day < bin_days`` (the caller
    picks ``bin_days`` ≥ its longest interval). Each point belongs to
    exactly one bin, so no post-join dedup is needed: a (point, interval)
    pair can only meet in the point's own bin."""
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.expr(f"sequence(`{lo_day}` div {bin_days}, `{hi_day}` div {bin_days})")
        ),
    )
    pt = points.withColumn("__bin", F.expr(f"`{point_day}` div {bin_days}"))
    return pt.join(
        iv,
        (pt["__bin"] == iv["__bin"])
        & (pt[point_day] >= iv[lo_day])
        & (pt[point_day] <= iv[hi_day]),
    ).drop("__bin")


@register(
    "range_join_binned",
    """
    WITH win AS (
      SELECT o_custkey AS cust,
             min(o_orderdate) AS win_start,
             min(o_orderdate) + INTERVAL 60 DAY AS win_end
      FROM orders GROUP BY o_custkey
    )
    SELECT cust AS o_custkey, count(*) AS n_orders_in_window
    FROM win JOIN orders
      ON o_orderdate >= win_start AND o_orderdate <= win_end
    GROUP BY cust
    ORDER BY o_custkey
    """,
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each customer's first-purchase window ([first order, +60d]),
    count how many orders from the WHOLE market landed inside it — a
    cohort-overlap measure whose join has no equality key (any order can
    fall in any customer's window).

    Scale: |intervals| = |customers| and |points| = |orders| both grow
    with SF, so neither side broadcasts and the naive plan is a
    nested-loop cartesian. Two techniques compose here:
    (1) **reduce the point side to the predicate's granularity before
    pairing** — the BETWEEN tests whole days, so orders collapse to a
    (day, count) table first: bounded by the DATE DOMAIN, not SF. The
    matched pair count drops from 57M (sf0.1 — first orders cluster, so
    windows overlap heavily and raw pairs grow ~quadratically with SF)
    to |customers|×61 ≈ 0.9M, and stays linear in SF;
    (2) the **binned equi-join** (one shuffle each side on the bin key)
    replaces the nested loop. The global plan sweep asserts no
    CartesianProduct/NestedLoop appears."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    days = orders.withColumn("pday", _epoch_day("o_orderdate"))
    daily = days.groupBy("pday").agg(F.count(F.lit(1)).alias("n_day"))
    win = (
        days.groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.min("pday").alias("lo_day"))
        .withColumn("hi_day", F.col("lo_day") + _SPAN_DAYS)
    )
    joined = binned_range_join(daily, win, "pday", "lo_day", "hi_day")
    return (
        joined.groupBy("cust")
        .agg(F.sum("n_day").alias("n_orders_in_window"))
        .select(F.col("cust").alias("o_custkey"), "n_orders_in_window")
        .orderBy("o_custkey")
    )


@register(
    "pagerank_bipartite",
    """
    WITH edges AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    sdeg AS (SELECT s, count(*) AS deg_s FROM edges GROUP BY s),
    pdeg AS (SELECT p, count(*) AS deg_p FROM edges GROUP BY p),
    ns AS (SELECT count(*) AS n_s FROM sdeg),
    r0 AS (
      SELECT s, CAST(1000000000000 AS BIGINT) // n_s AS r FROM sdeg, ns
    ),
    part_rank AS (
      SELECT e.p, sum(r0.r // sdeg.deg_s) AS pr
      FROM edges e JOIN r0 ON e.s = r0.s JOIN sdeg ON e.s = sdeg.s
      GROUP BY e.p
    ),
    r1 AS (
      SELECT e.s,
             (CAST(150000000000 AS BIGINT) // n_s)
             + (85 * sum(part_rank.pr // pdeg.deg_p)) // 100 AS rank_e12
      FROM edges e
      JOIN part_rank ON e.p = part_rank.p
      JOIN pdeg ON e.p = pdeg.p
      CROSS JOIN ns
      GROUP BY e.s, n_s
    )
    SELECT s AS s_suppkey, rank_e12 FROM r1
    ORDER BY rank_e12 DESC, s_suppkey
    """,
)
def pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One damped PageRank round over the part↔supplier bipartite graph
    (supplier rank → parts → back to suppliers, d=0.85) — the
    graph-centrality family beside connected components (dedup_clusters)
    and Lloyd iterations (kmeans): iterate by EXTENDING the plan, one
    edge-keyed shuffle per hop, never a driver round-trip.

    Numeric determinism the kmeans way: ranks are FIXED-POINT integers
    (1e12 scale) and every division is integer division, so shuffle
    order and engine rounding rules cannot move a digit — the oracle
    replays the exact integer trace.

    Scale: |edges| = distinct (part, supplier) pairs from one
    dedup-aggregate over the fact table; each hop is a partial-
    aggregated shuffle keyed on the receiving vertex; degrees join in
    via stats-gated broadcasts. More rounds = more of the same plan
    (O(diameter) like label propagation); state never touches the
    driver."""
    from dbtransfer_spark.queries import broadcast_if_small

    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = lineitem.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    sdeg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg_s"))
    pdeg = edges.groupBy("p").agg(F.count(F.lit(1)).alias("deg_p"))
    ns = sdeg.agg(F.count(F.lit(1)).alias("n_s"))
    r0 = sdeg.crossJoin(F.broadcast(ns)).select(
        "s", "deg_s", F.expr("CAST(1000000000000 AS BIGINT) div n_s").alias("r")
    )
    part_rank = (
        edges.join(broadcast_if_small(r0), "s")
        .groupBy("p")
        .agg(F.sum(F.expr("r div deg_s")).alias("pr"))
    )
    r1 = (
        edges.join(broadcast_if_small(part_rank), "p")
        .join(broadcast_if_small(pdeg), "p")
        .crossJoin(F.broadcast(ns))
        .groupBy("s", "n_s")
        .agg(F.sum(F.expr("pr div deg_p")).alias("acc"))
        .select(
            F.col("s").alias("s_suppkey"),
            (
                F.expr("CAST(150000000000 AS BIGINT) div n_s")
                + F.expr("(85 * acc) div 100")
            ).alias("rank_e12"),
        )
    )
    return r1.orderBy(F.desc("rank_e12"), "s_suppkey")
