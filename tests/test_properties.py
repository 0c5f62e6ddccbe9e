"""Property tests (SURVEY.md §5.5, hypothesis):

1. Resume-at-any-boundary ≡ full run: a migration interrupted after any
   number of committed batches, then resumed, produces exactly the source
   (at-least-once replay × idempotent upsert = exactly-once effect).
   Exercised on the pure-Python Mongo runtime loop — hundreds of
   interrupt points per second, no Spark session needed.
2. Transform expressions ≡ DuckDB: any expression from the documented
   transform grammar (README.md:126-142 — UPPER/LOWER/CONCAT/arithmetic/
   IFNULL) evaluates identically in the engine (Catalyst) and DuckDB.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbtransfer_spark.checkpoint import CheckpointStore
from dbtransfer_spark.sources.mongodb import migrate_collection
from tests.conftest import SF_SMOKE
from tests.test_runtime_paths import FakeMongoCollection, _mongo_docs


class InterruptibleDest(FakeMongoCollection):
    """Dest that hard-fails every bulk_write from the ``fail_from``-th call
    on — simulating a crash partway through (checkpoint has the last
    committed batch, later data never landed)."""

    def __init__(self, fail_from: int):
        super().__init__()
        self.fail_from = fail_from
        self.enabled = True

    def bulk_write(self, models, ordered: bool = False):
        if self.enabled and self.bulk_calls + 1 >= self.fail_from:
            self.bulk_calls += 1
            raise RuntimeError("crash")
        return super().bulk_write(models, ordered)


@given(
    n_docs=st.integers(min_value=0, max_value=507),
    batch_size=st.integers(min_value=1, max_value=120),
    fail_at_batch=st.integers(min_value=1, max_value=20),
)
@settings(max_examples=40, deadline=None)
def test_mongo_resume_any_boundary_equals_full_run(
    tmp_path_factory, n_docs, batch_size, fail_at_batch
):
    tmp = tmp_path_factory.mktemp("ckpt")
    source = FakeMongoCollection(_mongo_docs(n_docs))
    dest = InterruptibleDest(fail_from=fail_at_batch)
    store = CheckpointStore(str(tmp), engine="mongodb")

    kw = dict(
        batch_size=batch_size, parse_id=int,
        max_retries=0, retry_delay=0.0, sleep=lambda _s: None,
    )
    try:
        migrate_collection(source, dest, "c", store, **kw)
        interrupted = False
    except RuntimeError:
        interrupted = True

    if interrupted:
        assert not store.is_complete("c")
        dest.enabled = False  # crash cleared; resume
        migrate_collection(source, dest, "c", store, **kw)

    assert dest.docs == source.docs
    assert store.is_complete("c")
    # Idempotent rerun after completion is a no-op.
    res = migrate_collection(source, dest, "c", store, **kw)
    assert res["skipped"] is True


# ---------------------------------------------------------------------------
# Transform grammar differential property
# ---------------------------------------------------------------------------

_STR_COL, _NUM_COL = "l_returnflag", "l_quantity"

_EXPRS = st.one_of(
    st.sampled_from(
        [
            f"UPPER({_STR_COL})",
            f"LOWER({_STR_COL})",
            f"CONCAT('Status: ', {_STR_COL})",
            f"CONCAT({_STR_COL}, '-', {_STR_COL})",
            f"IFNULL({_STR_COL}, 'x')",
            f"trim({_STR_COL})",
            f"substr({_STR_COL}, 1, 1)",
        ]
    ),
    st.integers(min_value=-100, max_value=100).flatmap(
        lambda k: st.sampled_from(
            [
                f"{_NUM_COL} * {k}",
                f"{_NUM_COL} + {k}",
                f"{_NUM_COL} - ({k})",
                f"ROUND({_NUM_COL} * {k}, 2)",
            ]
        )
    ),
)


@pytest.fixture(scope="module")
def lineitem_sample(spark, tmp_path_factory):
    """500-row lineitem slice shared by every example (ordered by key so
    both engines see identical rows)."""
    path = str(tmp_path_factory.mktemp("li") / "li.parquet")
    (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
        .coalesce(1)
        .write.parquet(path)
    )
    return path


@given(expr=_EXPRS)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_transform_grammar_matches_duckdb(spark, lineitem_sample, expr):
    from dbtransfer_spark.transforms import apply_transforms

    df = spark.read.parquet(lineitem_sample)
    got = [
        r["out"]
        for r in apply_transforms(df, {"out": expr})
        .select("out")
        .orderBy("l_orderkey", "l_linenumber")
        .collect()
    ]
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {expr} FROM '{lineitem_sample}/*.parquet' "
            "ORDER BY l_orderkey, l_linenumber"
        ).fetchall()
    ]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if isinstance(w, float):
            assert g == pytest.approx(w, rel=1e-12)
        else:
            assert g == w
