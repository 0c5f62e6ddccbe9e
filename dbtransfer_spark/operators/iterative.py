"""Shared plumbing for iterative DataFrame algorithms (connected
components, k-core peeling, label propagation).

Why this exists: a fixpoint round that references its previous state
MORE THAN ONCE must ``localCheckpoint(eager=True)`` — persist alone
caches data but Catalyst re-analyzes the whole logical plan on every
action, and multi-reference rounds grow it ~3-6× per round (measured:
17 s of pure analysis on an EMPTY round-3 k-core frame). The flip side
(r10 ADVICE): localCheckpoint blocks are pinned in executor storage
until the backing RDD is garbage-collected on the driver — every
round's block set stays resident for the whole job unless freed, and
``DataFrame.unpersist()`` does NOT reach them (it only clears the SQL
CacheManager entry, which a checkpointed frame never had).

``free_local_checkpoint`` releases a superseded round's blocks
explicitly. Durability note that callers inherit: localCheckpoint
blocks are NON-RECOVERABLE on executor loss (a persisted frame could
recompute from lineage; a truncated one cannot) — acceptable on a
single-box run, but at 100 TB with real preemption the difference
between a retried stage and a failed job. ``cut_lineage`` is therefore
the config-wired switch (r11 VERDICT #5): every fixpoint call site
routes through it, and when the session carries a reliable checkpoint
directory (``spark.dbtransfer.checkpointDir`` conf, or an already-set
``SparkContext.setCheckpointDir``) the round state goes through
``DataFrame.checkpoint()`` — durable files that survive executor loss —
at the cost of one distributed-FS round-trip per round. With no
directory configured it stays executor-local, same behavior as before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_DIR_CONF = "spark.dbtransfer.checkpointDir"


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage for iterative fixpoints.

    Reliable path: if the session conf ``spark.dbtransfer.checkpointDir``
    is set (wired to ``SparkContext.setCheckpointDir`` on first use), use
    ``checkpoint()`` — round state lands on the configured (distributed)
    filesystem and survives executor loss. Otherwise ``localCheckpoint()``
    (executor-local, non-recoverable; the single-node default). Both cut
    the logical plan to a LogicalRDD, so callers' per-round plan-depth
    and ``free_local_checkpoint`` behavior are identical on either
    path."""
    spark = df.sparkSession
    conf_dir = spark.conf.get(RELIABLE_DIR_CONF, None)
    if conf_dir:
        sc = spark.sparkContext
        # idempotent re-set: keeps the conf the single source of truth
        # even if it changed mid-session
        jdir = sc._jsc.sc().getCheckpointDir()
        if jdir.isEmpty() or conf_dir not in str(jdir.get()):
            sc.setCheckpointDir(conf_dir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the executor-storage blocks behind a localCheckpoint-ed
    DataFrame. The frame is UNUSABLE afterwards — only call on a round's
    state once the next round (and anything else referencing it) is
    fully materialized.

    Reaches through the analyzed plan to the backing ``LogicalRDD`` —
    there is no public DataFrame API for this (SPARK-44091 territory);
    best-effort by design: on any API drift it degrades to the GC-based
    cleanup Spark's ContextCleaner already performs, just later."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
