"""As-of (point-in-time) join — a custom operator Spark lacks natively.

Semantics: for each left row, attach the most recent right row with the
same key and right.ts <= left.ts (DuckDB ``ASOF JOIN`` semantics, used as
the oracle).

Implementation is the scalable union-merge formulation, NOT a cross/range
join: tag both sides, union, one window sort per key, carry the last seen
right-side values forward (``last_value(ignoreNulls)``), keep left rows.
Cost: one shuffle by key + per-key sort — linear in |L|+|R| per key, vs
the naive |L|×|R| range join. Skewed keys are handled by AQE; at extreme
skew, salt the key and asof-join per salt bucket with boundary carry-over.
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
) -> DataFrame:
    """Union-merge as-of join (left rows + latest right values at or before
    left's timestamp). Ties (right.ts == left.ts) match, like DuckDB ASOF.
    Right rows sort before left rows at equal timestamps so same-instant
    right values are visible to the left row."""
    lt = F.col(left_time)
    tagged_left = left.withColumn("__t", lt).withColumn("__side", F.lit(1))
    for c in right_values:
        tagged_left = tagged_left.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    tagged_right = right.select(
        F.col(on).alias("__k_r"),
        F.col(right_time).alias("__t"),
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
    ).withColumn("__side", F.lit(0))

    left_cols = [F.col(c) for c in left.columns]
    unioned = tagged_left.select(
        F.col(on).alias("__k"), "__t", "__side", *[f"__r_{c}" for c in right_values], *left_cols
    ).unionByName(
        tagged_right.select(
            F.col("__k_r").alias("__k"),
            "__t",
            "__side",
            *[f"__r_{c}" for c in right_values],
            *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
        )
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        *left.columns,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_values
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


@register(
    "asof_last_purchase",
    """
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           p.ts AS asof_ts, round(p."value", 2) AS asof_value
    FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every non-purchase event, the user's most recent purchase at or
    before it (classic point-in-time feature join for training data)."""
    events = load_table(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", "event_type"
    )
    right = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.round("value", 2).alias("value"))
        .withColumnRenamed("ts", "p_ts")
    )
    out = asof_join(
        left,
        right.select("user_id", F.col("p_ts"), F.col("p_ts").alias("pts_copy"), "value"),
        on="user_id",
        left_time="ts",
        right_time="p_ts",
        right_values=["pts_copy", "value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.col("asof_pts_copy").alias("asof_ts"),
        F.col("asof_value").alias("asof_value"),
    )


@register(
    "asof_next_purchase_1h",
    """
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           CASE WHEN p.ts <= e.ts + INTERVAL 1 HOUR THEN p.ts END AS next_ts,
           CASE WHEN p.ts <= e.ts + INTERVAL 1 HOUR
                THEN round(p."value", 2) END AS next_value
    FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
)
def asof_next_purchase_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a tolerance: for every non-purchase event,
    the user's NEXT purchase, nulled unless it lands within 1 hour — the
    conversion-attribution join. Implemented by running the same
    union-merge as-of machinery on NEGATED event times (forward nearest ≡
    backward nearest under time reversal, ties preserved), then applying
    the tolerance as a post-filter that nulls both carried columns.

    Scale: identical profile to asof_last_purchase — one shuffle by
    user, one per-key sort, linear in |L|+|R|; the tolerance is a
    scan-stage CASE, not a join condition, so the join never becomes a
    range join."""
    from dbtransfer_spark.operators.windows import epoch_micros

    events = load_table(spark, sf_dir, "events")
    left = (
        events.filter(F.col("event_type") != "purchase")
        .select("event_id", "user_id", "ts", "event_type")
        .withColumn("__neg", -epoch_micros(events, "ts"))
    )
    right = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.round("value", 2).alias("value"))
        .withColumn("__negp", -epoch_micros(events, "ts"))
        .withColumnRenamed("ts", "p_ts")
    )
    out = asof_join(
        left,
        right.select("user_id", "__negp", "p_ts", "value"),
        on="user_id",
        left_time="__neg",
        right_time="__negp",
        right_values=["p_ts", "value"],
    )
    within = F.col("asof_p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(within, F.col("asof_p_ts")).alias("next_ts"),
        F.when(within, F.col("asof_value")).alias("next_value"),
    )
