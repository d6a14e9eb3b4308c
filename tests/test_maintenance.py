"""W7 extensions: DELETE operation, compaction, SCD2 unit checks."""

import pytest
from pyspark.sql import functions as F

from x_spark.plans.etl import init_etl_job
from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef


@pytest.fixture()
def deltbl(spark):
    spark.sql("DROP TABLE IF EXISTS del_tgt")
    spark.sql("CREATE TABLE del_tgt (pk INT, c INT) USING parquet")
    spark.sql("INSERT INTO del_tgt VALUES (1, 10), (2, 20), (3, NULL), (4, 40)")
    return "del_tgt"


def test_delete_operation_predicate_semantics(spark, deltbl):
    job = init_etl_job(
        {
            "version": 0,
            "target": {
                "datasource": "parquet",
                "table": deltbl,
                "operation": "delete",
                "where_statement_on_table": "c >= 20",
            },
        },
        spark=spark,
    )
    job.run()
    # c=NULL row survives (predicate NULL != TRUE), c=10 survives
    rows = sorted((r.pk, r.c) for r in spark.table(deltbl).collect())
    assert rows == [(1, 10), (3, None)]


def test_delete_dry_run_sql(spark, deltbl):
    job = init_etl_job(
        {
            "version": 0,
            "target": {
                "datasource": "parquet",
                "table": deltbl,
                "operation": "delete",
                "where_statement_on_table": "pk = 1",
            },
        },
        spark=spark,
    )
    assert job.generate_sql() == ["DELETE FROM del_tgt WHERE pk = 1"]


def test_compact_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(0, 10000).withColumn("v", F.col("id") * 2).repartition(16).write.parquet(path)
    ds = init_datasource("parquet", spark)
    ref = TableRef(path=path)
    assert len(ds.read(ref).inputFiles()) == 16
    ds.compact(ref, target_files=2)
    assert len(ds.read(ref).inputFiles()) <= 2
    df = ds.read(ref)
    assert df.count() == 10000
    assert df.agg(F.sum("v")).first()[0] == 2 * sum(range(10000))


def test_merge_extra_predicate_narrows_and_inserts(spark):
    """where_statement_on_table joins into the MERGE condition
    (etl/update_and_upsert.py:18-24): a target row matching the PK but
    failing the predicate is NOT matched — the update skips it, and an
    upsert (Delta semantics) treats the source row as not-matched and
    INSERTS it."""
    spark.sql("DROP TABLE IF EXISTS mp_tgt")
    spark.sql("CREATE TABLE mp_tgt (pk INT, c INT, guard INT) USING parquet")
    spark.sql("INSERT INTO mp_tgt VALUES (1, 10, 1), (2, 20, 0)")
    base = {
        "version": 0,
        "source": {
            "datasource": "parquet",
            "query": "SELECT 1 AS pk, 99 AS c UNION ALL SELECT 2, 88",
        },
        "target": {
            "datasource": "parquet",
            "table": "mp_tgt",
            "operation": "update",
            "primary_key_column": ["pk"],
            "update_column": ["c"],
            "where_statement_on_table": "guard = 1",
        },
    }
    init_etl_job(dict(base), spark=spark).run()
    rows = {r.pk: (r.c, r.guard) for r in spark.table("mp_tgt").collect()}
    assert rows[1] == (99, 1)  # matched: pk + guard=1
    assert rows[2] == (20, 0)  # pk matched but guard=0 -> untouched

    upsert_cfg = dict(base)
    upsert_cfg["target"] = dict(base["target"], operation="upsert")
    init_etl_job(upsert_cfg, spark=spark).run()
    rows = sorted((r.pk, r.c, r.guard) for r in spark.table("mp_tgt").collect())
    # pk=2 source row is NOT matched under the full condition -> inserted
    # with NULL guard (Delta parity); original pk=2 row untouched
    assert rows == [(1, 99, 1), (2, 20, 0), (2, 88, None)]


def test_partition_by_creates_pruned_layout(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS part_src")
    spark.sql("CREATE TABLE part_src (k INT, day STRING) USING parquet")
    spark.sql("INSERT INTO part_src VALUES (1,'a'),(2,'b'),(3,'a'),(4,'c')")
    target = str(tmp_path / "by_day")
    job = init_etl_job(
        {
            "version": 0,
            "source": {"datasource": "parquet", "table": "part_src"},
            "target": {
                "datasource": "parquet",
                "path": target,
                "operation": "append",
                "partition_by": ["day"],
            },
        },
        spark=spark,
    )
    job.run()
    files = spark.read.parquet(target).inputFiles()
    assert files and all("/day=" in f for f in files)
    plan = (
        spark.read.parquet(target)
        .filter(F.col("day") == "a")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(day" in plan
    # second append must respect the existing layout
    job2 = init_etl_job(
        {
            "version": 0,
            "source": {"datasource": "parquet", "query": "select 9 as k, 'a' as day"},
            "target": {
                "datasource": "parquet",
                "path": target,
                "operation": "append",
                "partition_by": ["day"],
            },
        },
        spark=spark,
    )
    job2.run()
    assert spark.read.parquet(target).filter("day = 'a'").count() == 3


def test_scd2_noop_change_keeps_row_open(spark):
    from x_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [(1, "a", "2020-01-01", None), (2, "b", "2020-01-01", None)],
        "k int, attr string, valid_from string, valid_to string",
    ).select(
        "k", "attr",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    changes = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "B", "2024-01-01"), (3, "c", "2024-01-01")],
        "k int, attr string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_apply(dim, changes, ["k"], ["attr"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    # no-op change: single open row
    assert len(by_key[1]) == 1 and by_key[1][0].valid_to is None
    # real change: closed old + open new
    k2 = sorted(by_key[2], key=lambda r: (r.valid_to is None, r.attr))
    assert len(k2) == 2
    assert k2[0].attr == "b" and k2[0].valid_to is not None
    assert k2[1].attr == "B" and k2[1].valid_to is None
    # new key: inserted open
    assert len(by_key[3]) == 1 and by_key[3][0].valid_to is None
