"""Golden end-to-end ETL tests — exact port of the reference's test
strategy (SURVEY §5, FIXTURES.md): source_table/target_table fixtures,
one job per write operation, scalar asserts n_row/sum_c1 plus row-level
expectations from tests/test_case.xlsx.
"""

import datetime as dt

import pytest
from pyspark.sql import Row

from x_spark import init_etl_job

D = dt.date(2020, 6, 26)
D_OLD = dt.date(2020, 6, 25)

SOURCE_ROWS = [
    Row(pk1=1, pk2="a", pk3=D, c1=11, c2="aa", c3=D, c4=111),
    Row(pk1=2, pk2="a", pk3=D, c1=112, c2="aa", c3=D, c4=1112),
    Row(pk1=3, pk2="a", pk3=D, c1=113, c2="aa", c3=D, c4=1113),
    Row(pk1=4, pk2="a", pk3=D, c1=114, c2="aa", c3=D, c4=1114),
    Row(pk1=5, pk2="a", pk3=D, c1=115, c2="aa", c3=D, c4=1115),
]

TARGET_ROWS = [
    Row(pk1=1, pk2="a", pk3=D, c1=11, c2="aa1", c3=D_OLD, c4=1111, c5=11111, c6=111111),
    Row(pk1=2, pk2="a", pk3=D, c1=112, c2="aa2", c3=D_OLD, c4=1112, c5=11112, c6=111112),
    Row(pk1=3, pk2="a", pk3=D, c1=113, c2="aa3", c3=D_OLD, c4=1113, c5=11113, c6=111113),
    Row(pk1=3, pk2="b", pk3=D, c1=113, c2="aa3", c3=D_OLD, c4=1113, c5=11113, c6=111113),
]

SOURCE_DDL = "pk1 int, pk2 string, pk3 date, c1 int, c2 string, c3 date, c4 int"
TARGET_DDL = SOURCE_DDL + ", c5 int, c6 int"

SOURCE_QUERY = "select *, null as c5, null as c6 from source_table"


def job_config(operation, **target_extra):
    target = {"datasource": "parquet", "operation": operation, "table": "target_table"}
    target.update(target_extra)
    return {
        "version": 0,
        "source": {"datasource": "parquet", "query": SOURCE_QUERY},
        "target": target,
    }


MERGE_KEYS = {
    "primary_key_column": ["pk1", "pk2", "pk3"],
    "update_column": ["c1", "c2", "c3", "c4"],
}


@pytest.fixture()
def tables(spark):
    spark.sql("DROP TABLE IF EXISTS source_table")
    spark.sql("DROP TABLE IF EXISTS target_table")
    spark.createDataFrame(SOURCE_ROWS, SOURCE_DDL).write.saveAsTable("source_table")
    (
        spark.createDataFrame(TARGET_ROWS, TARGET_DDL)
        .write.partitionBy("pk2")
        .saveAsTable("target_table")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS source_table")
    spark.sql("DROP TABLE IF EXISTS target_table")


def scalar_assert(spark):
    row = spark.sql("select count(*) as n_row, sum(c1) as sum_c1 from target_table").head()
    return row["n_row"], row["sum_c1"]


def target_rows(spark):
    df = spark.table("target_table").select(
        "pk1", "pk2", "pk3", "c1", "c2", "c3", "c4", "c5", "c6"
    )
    return sorted([tuple(r) for r in df.collect()])


def test_append(spark, tables):
    init_etl_job(job_config("append"), spark=spark).run()
    assert scalar_assert(spark) == (9, 814)
    rows = target_rows(spark)
    assert len(rows) == 9
    # new rows carry NULL c5/c6
    new = [r for r in rows if r[7] is None]
    assert len(new) == 5


def test_overwrite_preserves_untouched_partition(spark, tables):
    init_etl_job(job_config("overwrite"), spark=spark).run()
    assert scalar_assert(spark) == (6, 578)
    rows = target_rows(spark)
    # partition pk2='b' survives with original values
    b_rows = [r for r in rows if r[1] == "b"]
    assert b_rows == [(3, "b", D, 113, "aa3", D_OLD, 1113, 11113, 111113)]
    # partition pk2='a' fully replaced by the 5 source rows (c5/c6 NULL)
    a_rows = [r for r in rows if r[1] == "a"]
    assert len(a_rows) == 5
    assert all(r[7] is None and r[8] is None for r in a_rows)


def test_update(spark, tables):
    init_etl_job(job_config("update", **MERGE_KEYS), spark=spark).run()
    assert scalar_assert(spark) == (4, 349)
    rows = target_rows(spark)
    # matched rows get c1..c4 from source, keep c5/c6
    assert (1, "a", D, 11, "aa", D, 111, 11111, 111111) in rows
    assert (2, "a", D, 112, "aa", D, 1112, 11112, 111112) in rows
    assert (3, "a", D, 113, "aa", D, 1113, 11113, 111113) in rows
    # pk2='b' row untouched (no source row with pk2='b')
    assert (3, "b", D, 113, "aa3", D_OLD, 1113, 11113, 111113) in rows


def test_upsert(spark, tables):
    init_etl_job(job_config("upsert", **MERGE_KEYS), spark=spark).run()
    assert scalar_assert(spark) == (6, 578)
    rows = target_rows(spark)
    # updates as in test_update + source rows 4,5 inserted with NULL c5/c6
    assert (4, "a", D, 114, "aa", D, 1114, None, None) in rows
    assert (5, "a", D, 115, "aa", D, 1115, None, None) in rows
    assert (3, "b", D, 113, "aa3", D_OLD, 1113, 11113, 111113) in rows


def test_truncate_then_append(spark, tables):
    cfg = job_config("append", pre_sql="truncate table target_table")
    init_etl_job(cfg, spark=spark).run()
    assert scalar_assert(spark) == (5, 465)


def test_source_table_default_query(spark, tables):
    """table-only source defaults to SELECT * (etl/parent.py:108-111);
    append of the 7-col source into the 9-col target must fail cleanly."""
    cfg = {
        "version": 0,
        "source": {"datasource": "parquet", "table": "source_table"},
        "target": {"datasource": "parquet", "operation": "append", "table": "target_table"},
    }
    with pytest.raises(Exception):
        init_etl_job(cfg, spark=spark).run()
