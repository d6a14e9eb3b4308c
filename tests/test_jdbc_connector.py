"""JDBC external-database connector (Derby embedded — the driver jar
ships with Spark, so this is a LIVE third connector, not a stub).

Covers the full datasource surface through init_datasource and the
YAML ETL lifecycle, the Delta-parity merge/replaceWhere semantics
shared with the parquet/duckdb connectors, and the two properties that
make JDBC the cluster-grade external-DB path: predicate pushdown into
the database scan and partitioned (parallel) range reads.
"""

import pytest
from pyspark.sql import functions as F

from x_spark.errors import DataSourceException, ETLJobException
from x_spark.plans.etl import init_etl_job
from x_spark.sources import init_datasource
from x_spark.sources.base import MergeSpec, TableRef


@pytest.fixture(scope="module")
def db_url(tmp_path_factory):
    d = tmp_path_factory.mktemp("derby")
    return f"jdbc:derby:{d}/db;create=true"


@pytest.fixture()
def ds(spark, db_url):
    return init_datasource(db_url, spark)


def _rows(ds, ref):
    return sorted(tuple(r) for r in ds.read(ref).collect())


def test_append_create_read_roundtrip(spark, ds):
    ref = TableRef(table="t_round")
    ds.append(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), ref)
    ds.append(spark.createDataFrame([(3, "c")], "k int, v string"), ref)
    assert _rows(ds, ref) == [(1, "a"), (2, "b"), (3, "c")]


def test_append_resolves_by_name(spark, ds):
    ref = TableRef(table="t_byname")
    ds.append(spark.createDataFrame([(1, "a")], "k int, v string"), ref)
    ds.append(spark.createDataFrame([("b", 2)], "v string, k int"), ref)
    assert _rows(ds, ref) == [(1, "a"), (2, "b")]


def test_merge_upsert_delta_parity(spark, ds):
    ref = TableRef(table="t_merge")
    ds.append(
        spark.createDataFrame(
            [(1, 10, "x"), (2, 20, "y")], "pk int, v int, keep string"
        ),
        ref,
    )
    src = spark.createDataFrame([(1, 99), (3, 30)], "pk int, v int")
    ds.merge(src, ref, MergeSpec(["pk"], ["v"], insert_when_not_matched=True))
    assert _rows(ds, ref) == [(1, 99, "x"), (2, 20, "y"), (3, 30, None)]
    dup = spark.createDataFrame([(1, 1), (1, 2)], "pk int, v int")
    with pytest.raises(ETLJobException, match="duplicate"):
        ds.merge(dup, ref, MergeSpec(["pk"], ["v"]))


def test_overwrite_replace_where_semantics(spark, ds):
    # NULL-predicate survival exercised on an int column: Spark's Derby
    # dialect maps StringType to CLOB (no '=' comparison) and binds
    # NULL strings as setNull(CLOB), which Derby refuses to convert
    # into a VARCHAR column — so string partition keys need either the
    # default CLOB mapping (no comparisons) or NOT NULL data with
    # createTableColumnTypes (see test_varchar_column_type_comparable)
    ref = TableRef(table="t_rw")
    ds.append(
        spark.createDataFrame([(1, 1), (2, None), (3, 2)], "k int, grp int"), ref
    )
    new = spark.createDataFrame([(9, 1)], "k int, grp int")
    ds.overwrite(new, ref, replace_where="grp = 1")
    assert _rows(ds, ref) == [(2, None), (3, 2), (9, 1)]
    bad = spark.createDataFrame([(8, 2)], "k int, grp int")
    with pytest.raises(DataSourceException, match="replaceWhere"):
        ds.overwrite(bad, ref, replace_where="grp = 1")
    assert _rows(ds, ref) == [(2, None), (3, 2), (9, 1)]


def test_varchar_column_type_comparable(spark, ds):
    """createTableColumnTypes pins VARCHAR (comparable, indexable) for
    string keys — required when predicates must run database-side."""
    ref = TableRef(
        table="t_vc", options={"createTableColumnTypes": "region VARCHAR(8)"}
    )
    ds.append(
        spark.createDataFrame([(1, "EU"), (3, "US")], "k int, region string"), ref
    )
    ds.overwrite(
        spark.createDataFrame([(9, "EU")], "k int, region string"),
        ref,
        replace_where="region = 'EU'",
    )
    assert _rows(ds, ref) == [(3, "US"), (9, "EU")]


def test_delete_and_truncate(spark, ds):
    ref = TableRef(table="t_del")
    ds.append(spark.createDataFrame([(1, 5), (2, None), (3, 50)], "k int, v int"), ref)
    ds.delete(ref, "v >= 10")
    assert _rows(ds, ref) == [(1, 5), (2, None)]
    ds.truncate(ref)
    assert ds.read(ref).count() == 0


def test_sql_select_runs_distributed_ddl_runs_on_db(spark, ds):
    ref = TableRef(table="t_sql")
    ds.append(spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"), ref)
    # sql() is DATABASE SQL: Spark-created columns are stored quoted
    # lowercase, so a database client (this surface included) quotes
    got = sorted(
        tuple(r)
        for r in ds.sql('SELECT "k", "v" + 1 AS v1 FROM t_sql').collect()
    )
    assert got == [(1, 11), (2, 21)]
    ds.sql("CREATE TABLE t_ddl (note VARCHAR(16))")
    assert ds.table_exists(TableRef(table="t_ddl"))


def test_predicate_pushdown_reaches_the_database(spark, ds):
    """The filter must appear as PushedFilters in the JDBC scan — the
    database does the filtering, Spark never sees non-matching rows."""
    ref = TableRef(table="t_push")
    ds.append(spark.createDataFrame([(i, i * 10) for i in range(50)], "k int, v int"), ref)
    plan = (
        ds.read(ref)
        .filter(F.col("k") == 7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "EqualTo(k,7)" in plan.replace('"', ""), plan


def test_partitioned_parallel_read(spark, ds):
    """partitionColumn/numPartitions split the scan into parallel range
    queries — the cluster-scale ingest shape for an indexed table."""
    ref = TableRef(table="t_part")
    ds.append(spark.createDataFrame([(i, i * 2) for i in range(100)], "k int, v int"), ref)
    par = TableRef(
        table="t_part",
        options={
            "partitionColumn": "k",
            "lowerBound": "0",
            "upperBound": "100",
            "numPartitions": "4",
        },
    )
    df = ds.read(par)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    assert sorted(tuple(r) for r in df.collect()) == sorted(
        (i, i * 2) for i in range(100)
    )


def test_yaml_lifecycle_parquet_to_jdbc(spark, tmp_path):
    """Full ETL lifecycle with a JDBC target: Spark-side source query,
    database-side pre_sql hook, append into the database — the
    extension story the reference hard-rejects (etl/parent.py:96-99)."""
    url = f"jdbc:derby:{tmp_path}/etl_db;create=true"
    cfg = {
        "version": 0,
        "source": {"datasource": "parquet", "query": "SELECT 1 AS k, 'a' AS v"},
        "target": {
            "datasource": url,
            "table": "published",
            "operation": "append",
            "pre_sql": "CREATE TABLE audit (note VARCHAR(32))",
        },
    }
    init_etl_job(cfg, spark=spark).run()
    ds = init_datasource(url, spark)
    assert ds.read(TableRef(table="published")).count() == 1
    assert ds.table_exists(TableRef(table="audit"))


def test_dsv2_catalog_pushes_aggregates_into_the_database(spark, ds):
    """register_catalog exposes the DB as a DSv2 catalog: a GROUP BY
    over it must show PushedAggregates/PushedGroupByExpressions in the
    scan (the database computes the aggregate; Spark reads one row per
    group) and match the V1-path result."""
    ref = TableRef(table="t_pushagg")
    ds.append(
        spark.createDataFrame([(i % 5, i) for i in range(100)], "g int, v int"), ref
    )
    cat = ds.register_catalog("derbytest")
    df = spark.table(f"{cat}.APP.T_PUSHAGG")
    agg = df.groupBy("g").agg(F.sum("v").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregates: [SUM(v)]" in plan, plan
    assert "PushedGroupByExpressions: [g]" in plan, plan
    via_v1 = sorted(
        tuple(r)
        for r in ds.read(ref).groupBy("g").agg(F.sum("v").alias("s")).collect()
    )
    assert sorted(tuple(r) for r in agg.collect()) == via_v1
