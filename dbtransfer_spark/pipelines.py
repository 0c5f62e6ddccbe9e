"""Composed production pipelines — the glue layer that turns individual
operators into the release workflows a training-data platform actually
runs. Each function is a thin, deterministic composition of already-
verified operators; nothing here introduces new math.

``incremental_release`` is the canonical one: new crawl batch → exact
self-dedup → MinHash-LSH near-dup check against the *current corpus
release* (asymmetric: batch×corpus bucket probes, never corpus×corpus)
→ atomic versioned commit. Re-running the same batch is idempotent at
the content level: every kept doc would be caught as its own duplicate
on replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbtransfer_spark.operators.dedup import (
    exact_dedup,
    minhash_jaccard_estimate,
    minhash_signatures,
)
from dbtransfer_spark.sources.versioned import VersionedDatasetStore

_BANDS, _ROWS_PER_BAND = 8, 4


def _banded(sigs: DataFrame, prefix: str, id_col: str = "doc_id") -> DataFrame:
    """Explode a signature frame into (band, band-slice hash) bucket keys
    — the standard LSH candidate-generation side of a banded equi-join."""
    return sigs.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.hash(
                            F.slice(F.col("minhash"), i * _ROWS_PER_BAND + 1, _ROWS_PER_BAND)
                        ).alias("bucket"),
                    )
                    for i in range(_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(f"{prefix}_id", "bb.band", "bb.bucket")


def near_dup_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """New-batch docs judged near-duplicate of ANY corpus doc: banded
    LSH candidates (batch×corpus only) refined by the signature Jaccard
    estimate. Returns the distinct new-doc ids to DROP.

    Scale: |batch|·bands bucket probes against the corpus index — the
    asymmetric join of dedup_incremental_new_vs_corpus (dedup.py), reused
    verbatim; candidate refinement touches only bucket-colliding pairs."""
    # The corpus usually arrives from the versioned store, whose batch
    # commits are sized ~1M rows/file — a small corpus can therefore be
    # a single scan task, serializing the signature pass. Repartition
    # only when under cluster width (a cheap shuffle exactly when the
    # corpus is small; a no-op branch at real scale, where file count
    # already exceeds core count).
    sc_par = corpus.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < sc_par:
        corpus = corpus.repartition(sc_par)
    # signatures are consumed twice each (banding + estimate rejoin):
    # persist so the shingle/hash pass runs once per side
    sig_new = minhash_signatures(new_docs, id_col, text_col).persist()
    sig_corpus = minhash_signatures(corpus, id_col, text_col).persist()
    cand = (
        _banded(sig_new, "new", id_col)
        .join(_banded(sig_corpus, "corp", id_col), ["band", "bucket"])
        .select(F.col("new_id").alias("id_a"), F.col("corp_id").alias("id_b"))
        .distinct()
    )
    sigs = sig_new.unionByName(sig_corpus)
    est = minhash_jaccard_estimate(sigs, cand, id_col)
    return (
        est.filter(F.col("est_jaccard") >= threshold)
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )


def incremental_release(
    spark: SparkSession,
    store: VersionedDatasetStore,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    note: str = "",
) -> dict:
    """One incremental corpus release: exact-dedup the batch on content
    fingerprint, drop near-dups of the current release, commit
    corpus ∪ survivors as the next version. Returns counts + version."""
    batch = exact_dedup(
        new_docs.withColumn("__fp", F.md5(F.col(text_col))), ["__fp"], id_col
    ).drop("__fp").persist()  # counted, probed, anti-joined, committed
    n_batch = batch.count()
    latest = store.latest_version()
    if latest is None:
        v = store.commit(batch, note=note or "initial release", n_rows=n_batch)
        return {"version": v, "n_batch": n_batch, "n_kept": n_batch, "n_dropped": 0}
    corpus = store.read(latest)
    # persist the (small, ids-only) drop set: kept is consumed twice
    # (count + commit write) and would otherwise re-run the whole
    # corpus-signature probe per action
    drops = near_dup_against_corpus(
        batch, corpus, id_col, text_col, threshold
    ).persist()
    kept = batch.join(drops, id_col, "left_anti")
    n_kept = kept.count()
    # append-commit: writes ONLY the survivors and references the parent
    # release's data dirs — O(|batch|) per release, never O(corpus); the
    # known count sizes the data files and skips the read-back count
    v = store.commit_append(kept, note=note, n_rows=n_kept)
    return {
        "version": v,
        "n_batch": n_batch,
        "n_kept": n_kept,
        "n_dropped": n_batch - n_kept,
    }
