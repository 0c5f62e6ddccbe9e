"""Graph operators over relational edge sets (SURVEY.md §2.10 extensions).

Edges come from one dedup-aggregate over the fact table; every iteration
is an edge-keyed shuffle that EXTENDS the logical plan (the same
discipline as dedup.connected_components' label propagation and
kmeans_lloyd's rounds — state never round-trips through the driver).
Ranks are fixed-point integers so the DuckDB oracles replay exact
integer traces.
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
      SELECT e.p, CAST(sum(r0.r // sdeg.deg_s) AS BIGINT) AS pr
      FROM edges e JOIN r0 ON e.s = r0.s JOIN sdeg ON e.s = sdeg.s
      GROUP BY e.p
    ),
    r1 AS (
      SELECT e.s,
             CAST((CAST(150000000000 AS BIGINT) // n_s)
             + (85 * sum(part_rank.pr // pdeg.deg_p)) // 100
               AS BIGINT) AS rank_e12
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
