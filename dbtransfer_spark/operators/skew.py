"""Skew-aware join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when one hot key dominates a
*build side that must shuffle* (e.g. joining clickstream events where 1%
of users produce 50% of rows against a per-user dimension).

Mechanism: replicate the small side ``salt_factor`` ways (key, salt∈0..k),
scatter the big side uniformly with a random-free deterministic salt
(pmod of a stable hash — reproducible across retries, unlike rand()), and
join on (key, salt). Hot-key partitions shrink by ~k×; result set is
identical to the unsalted join, which the oracle asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on column ``on`` with ``salt_factor``-way key
    salting. ``small`` is replicated salt_factor×; ``big`` rows scatter by
    a deterministic hash salt. Equivalent to ``big.join(small, on, how)``."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    # Deterministic scatter: stable across task retries (rand() is not),
    # derived from the row's own content via xxhash64 of all columns.
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_factor))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = big_salted.join(small_rep, [on, "__salt"], how)
    return out.drop("__salt")


@register(
    "skew_salted_join",
    """
    SELECT c_mktsegment, count(*) AS n_events,
           CAST(round(sum(CAST("value" AS DECIMAL(30,10))), 2) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events (big, skewed by user) ⋈ customer (small) via 8-way salting,
    aggregated per segment. The oracle is the plain unsalted join — salting
    must be invisible in the result."""
    events = load_table(spark, sf_dir, "events").withColumnRenamed("user_id", "c_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(events, customer, on="c_custkey", salt_factor=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(30,10)")), 2)
        .cast("double")
        .alias("total_value"),
    )


@register(
    "join_key_skew_profile",
    """
    WITH k AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_orderkey
    ),
    total AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total,
                     CAST(count(*) AS BIGINT) AS n_keys FROM k),
    top AS (
      SELECT l_orderkey, n_rows,
             row_number() OVER (ORDER BY n_rows DESC, l_orderkey) AS rnk
      FROM k
    )
    SELECT t.rnk, t.l_orderkey, t.n_rows,
           CAST(t.n_rows * 1000000 // x.n_total AS BIGINT) AS share_ppm,
           CAST(t.n_rows * x.n_keys * 100 // x.n_total AS BIGINT) AS x_mean_pct
    FROM top t, total x
    WHERE t.rnk <= 20
    ORDER BY t.rnk
    """,
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 20 heaviest lineitem join keys with
    their corpus share (ppm) and multiple-of-mean — the pre-flight that
    decides whether a shuffle join needs salting / AQE skew-split before
    it runs (a key at >5% of rows will straggle one reducer at any
    parallelism). This is the measurement half of the salted-join
    operator in this module.

    Plan: one partial-aggregated key-count shuffle, a TakeOrdered top-20
    (never a full sort of the key histogram), one 1-row total broadcast.
    Linear in the fact, output fixed at 20 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    ).persist()  # the key histogram feeds both the total and the top-20
    total = k.agg(
        F.sum("n_rows").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    top = (
        k.orderBy(F.desc("n_rows"), "l_orderkey")
        .limit(20)
        .withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.desc("n_rows"), "l_orderkey"))
        )
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "rnk",
            "l_orderkey",
            "n_rows",
            F.expr("CAST(n_rows * 1000000 div n_total AS BIGINT)").alias("share_ppm"),
            F.expr("CAST(n_rows * n_keys * 100 div n_total AS BIGINT)").alias(
                "x_mean_pct"
            ),
        )
        .orderBy("rnk")
    )
