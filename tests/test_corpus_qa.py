"""Corpus-QA operators: PII redaction semantics, contamination shingle
guards for short documents, and the no-shuffle redaction plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbtransfer_spark.operators import corpus_qa
from dbtransfer_spark.plans import count_exchanges
from tests.conftest import SF_SMOKE


def test_redact_pii_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+x@mail.example.org or 415-555-0199 today"),
            (2, "no contact info here"),
            (3, "two mails a@b.co c@d.io and 555-123-4567"),
        ],
        "id int, text string",
    )
    out = {r["id"]: r for r in corpus_qa.redact_pii(df, "text").collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert out[1]["text_redacted"] == "reach me at <EMAIL> or <PHONE> today"
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0
    assert out[2]["text_redacted"] == "no contact info here"
    assert out[3]["n_emails"] == 2 and out[3]["n_phones"] == 1
    assert out[3]["text_redacted"] == "two mails <EMAIL> <EMAIL> and <PHONE>"


def test_redact_pii_is_narrow(spark):
    """Redaction must stay in the scan stage: zero shuffle exchanges."""
    df = corpus_qa.pii_redact(spark, SF_SMOKE)
    assert count_exchanges(df) == 0


def test_contamination_shingle_guard_short_docs(spark):
    """Documents shorter than the shingle length contribute zero shingles
    (unguarded sequence(0,-1) yields [0,-1] and would crash element
    access); full-length docs produce exactly n-4 shingle start indexes."""
    docs = spark.createDataFrame(
        [
            (1, "one"),
            (2, ""),
            (3, "a b c d e f g"),
        ],
        "doc_id long, text string",
    )
    n = F.size(F.split("text", " ", -1))
    idx = F.when(
        n >= corpus_qa._SHINGLE_LEN,
        F.sequence(F.lit(0), n - corpus_qa._SHINGLE_LEN),
    ).otherwise(F.array().cast("array<int>"))
    out = docs.select("doc_id", F.explode_outer(idx).alias("i")).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["i"])
    assert by_doc[1] == [None]
    assert by_doc[2] == [None]
    assert by_doc[3] == [0, 1, 2]  # 7 words -> 3 five-grams


def test_contamination_check_runs_on_fixture(spark):
    """End-to-end smoke on the declared query: deterministic output,
    train side never contains benchmark docs."""
    df = corpus_qa.contamination_check(spark, SF_SMOKE)
    rows = df.collect()
    bench_ids = {
        r["doc_id"]
        for r in corpus_qa.load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("source") == "src0")
        .select("doc_id")
        .collect()
    }
    for r in rows:
        assert r["train_doc"] not in bench_ids
        assert r["bench_doc"] in bench_ids
        assert r["shared_shingles"] >= corpus_qa._MIN_SHARED


def test_dataset_split_is_deterministic_and_complete(spark):
    """Same id → same split on every run; proportions near 80/10/10."""
    from dbtransfer_spark.operators.corpus_qa import dataset_split

    a = {r["doc_id"]: r["split"] for r in dataset_split(spark, SF_SMOKE).collect()}
    b = {r["doc_id"]: r["split"] for r in dataset_split(spark, SF_SMOKE).collect()}
    assert a == b
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    assert c["train"] / n > 0.6  # hash balance sanity, not exactness


def test_quantize_int8_bounds_and_roundtrip(spark):
    from dbtransfer_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "id int, v array<float>",
    )
    rows = {r["id"]: r for r in quantize_int8(df, "v").collect()}
    assert rows[1]["q_vec"] == [64, -127, 32, 0]  # scale = 1/127
    # error bounded by half a quantization step
    assert rows[1]["q_max_abs_err"] <= rows[1]["q_scale"] / 2 + 1e-12
    assert rows[2]["q_vec"] == [0, 0, 0, 0] and rows[2]["q_max_abs_err"] == 0.0


def test_global_ordinal_contiguous_and_distributed(spark):
    """Ordinals are exactly 1..N in key order, and the plan never funnels
    data through a single-partition exchange (the naive global
    row_number() OVER (ORDER BY key) would)."""
    from dbtransfer_spark.operators.corpus_qa import global_ordinal

    df = spark.range(0, 1000).select((F.col("id") * 7 % 1000).alias("k"))
    out = global_ordinal(df, "k", n_partitions=8)
    rows = sorted((r["k"], r["ordinal"]) for r in out.collect())
    assert [o for _, o in rows] == list(range(1, 1001))
    assert [k for k, _ in rows] == sorted(k for k, _ in rows)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
