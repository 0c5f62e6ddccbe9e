from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from dbtransfer_spark.session import get_spark

    spark = get_spark(app_name="dbtransfer-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def all_query_plans(spark):
    """Formatted physical plan of every declared query at SF_SMOKE,
    compiled once per session — shared by the global plan sweeps
    (cartesian/BNLJ and unpartitioned-window) so each doesn't pay its
    own 327-plan compile."""
    import __spark_entry__ as entry

    from dbtransfer_spark.plans import formatted_plan

    return {
        name: formatted_plan(fn(spark, SF_SMOKE))
        for name, fn in entry.queries().items()
    }


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()
