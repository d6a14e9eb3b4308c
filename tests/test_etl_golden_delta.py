"""Golden ETL battery against the ``delta`` datasource resolution.

The reference's storage layer is Delta (datasource/delta.py); in this
container ``init_datasource("delta", ...)`` resolves to the txlog
transactional connector (x_spark/sources/__init__.py), so the same
five golden configs (SURVEY §5: append 9/814, overwrite 6/578, update
4/349, upsert 6/578, truncate+append 5/465) here execute against a
real atomic-commit store: MERGE as a file-skipping rewrite commit,
overwrite as remove+add in one version, truncate via the pre_sql hook
dispatched to the transactional op. With delta-spark installed the
suite runs unchanged against live Delta tables.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from x_spark import init_etl_job
from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef

from tests.test_etl_golden import (
    MERGE_KEYS,
    SOURCE_DDL,
    SOURCE_QUERY,
    SOURCE_ROWS,
    TARGET_DDL,
    TARGET_ROWS,
)

D = dt.date(2020, 6, 26)
D_OLD = dt.date(2020, 6, 25)

SRC = TableRef(table="source_table")
TGT = TableRef(table="target_table", partition_by=["pk2"])


def job_config(operation, **target_extra):
    target = {"datasource": "delta", "operation": operation, "table": "target_table"}
    target.update(target_extra)
    return {
        "version": 0,
        "source": {"datasource": "delta", "query": SOURCE_QUERY},
        "target": target,
    }


@pytest.fixture()
def ds(spark):
    return init_datasource("delta", spark)


@pytest.fixture()
def tables(spark, ds):
    def drop_all():
        if hasattr(ds, "drop_table"):
            ds.drop_table(SRC)
            ds.drop_table(TableRef(table=TGT.table))
        else:  # pragma: no cover - live-delta environment
            spark.sql("DROP TABLE IF EXISTS source_table")
            spark.sql("DROP TABLE IF EXISTS target_table")

    drop_all()
    ds.append(spark.createDataFrame(SOURCE_ROWS, SOURCE_DDL), SRC)
    ds.append(spark.createDataFrame(TARGET_ROWS, TARGET_DDL), TGT)
    yield
    drop_all()


def scalar_assert(ds):
    row = ds.read(TableRef(table=TGT.table)).agg(
        F.count("*").alias("n_row"), F.sum("c1").alias("sum_c1")
    ).head()
    return row["n_row"], row["sum_c1"]


def target_rows(ds):
    df = ds.read(TableRef(table=TGT.table)).select(
        "pk1", "pk2", "pk3", "c1", "c2", "c3", "c4", "c5", "c6"
    )
    return sorted(tuple(r) for r in df.collect())


def _ops(ds):
    """Committed operation names, oldest first (txlog only)."""
    if not hasattr(ds, "history"):
        return None
    return [h["operation"] for h in ds.history(TableRef(table=TGT.table))]


def test_append(spark, ds, tables):
    init_etl_job(job_config("append"), spark=spark).run()
    assert scalar_assert(ds) == (9, 814)
    rows = target_rows(ds)
    assert len(rows) == 9
    assert len([r for r in rows if r[7] is None]) == 5  # new rows: NULL c5/c6
    ops = _ops(ds)
    if ops is not None:  # one atomic APPEND commit on top of the seed
        assert ops[-1] == "APPEND"


def test_overwrite_preserves_untouched_partition(spark, ds, tables):
    init_etl_job(job_config("overwrite"), spark=spark).run()
    assert scalar_assert(ds) == (6, 578)
    rows = target_rows(ds)
    assert [r for r in rows if r[1] == "b"] == [
        (3, "b", D, 113, "aa3", D_OLD, 1113, 11113, 111113)
    ]
    a_rows = [r for r in rows if r[1] == "a"]
    assert len(a_rows) == 5
    assert all(r[7] is None and r[8] is None for r in a_rows)


def test_update(spark, ds, tables):
    init_etl_job(job_config("update", **MERGE_KEYS), spark=spark).run()
    assert scalar_assert(ds) == (4, 349)
    rows = target_rows(ds)
    assert (1, "a", D, 11, "aa", D, 111, 11111, 111111) in rows
    assert (2, "a", D, 112, "aa", D, 1112, 11112, 111112) in rows
    assert (3, "a", D, 113, "aa", D, 1113, 11113, 111113) in rows
    assert (3, "b", D, 113, "aa3", D_OLD, 1113, 11113, 111113) in rows
    ops = _ops(ds)
    if ops is not None:
        assert ops[-1] == "MERGE"


def test_upsert(spark, ds, tables):
    init_etl_job(job_config("upsert", **MERGE_KEYS), spark=spark).run()
    assert scalar_assert(ds) == (6, 578)
    rows = target_rows(ds)
    assert (4, "a", D, 114, "aa", D, 1114, None, None) in rows
    assert (5, "a", D, 115, "aa", D, 1115, None, None) in rows
    assert (3, "b", D, 113, "aa3", D_OLD, 1113, 11113, 111113) in rows


def test_truncate_then_append(spark, ds, tables):
    cfg = job_config("append", pre_sql="truncate table target_table")
    init_etl_job(cfg, spark=spark).run()
    assert scalar_assert(ds) == (5, 465)
    ops = _ops(ds)
    if ops is not None:  # hook dispatched to the transactional truncate
        assert ops[-2:] == ["TRUNCATE", "APPEND"]


def test_time_travel_back_to_seed(spark, ds, tables):
    """Transactional bonus the parquet emulation couldn't offer: the
    pre-job table state stays addressable by version after the job."""
    if not hasattr(ds, "history"):  # pragma: no cover - live-delta env
        pytest.skip("version history API is connector-specific")
    seed_version = ds.history(TableRef(table=TGT.table))[-1]["version"]
    init_etl_job(job_config("overwrite"), spark=spark).run()
    before = ds.read(
        TableRef(table=TGT.table, options={"versionAsOf": str(seed_version)})
    )
    assert before.count() == 4
    assert scalar_assert(ds) == (6, 578)
