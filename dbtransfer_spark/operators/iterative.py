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
recompute from lineage; a truncated one cannot) — acceptable for these
shallow fixpoints where a lost executor fails the job and the job is
retried from the source, the standard trade Spark docs attach to
localCheckpoint. A cluster deployment that configures a reliable
``spark.sparkContext.setCheckpointDir`` can swap ``checkpoint()`` in
at the same call sites for fault tolerance at the cost of an HDFS
round-trip per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
