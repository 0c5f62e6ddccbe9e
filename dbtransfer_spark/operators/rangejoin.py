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
