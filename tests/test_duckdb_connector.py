"""DuckDB external-database connector (second real connector).

Covers the full datasource surface through init_datasource and the
YAML ETL lifecycle, including the Delta-parity merge semantics shared
with the parquet connector.
"""

import pytest
from pyspark.sql import functions as F

from x_spark.errors import DataSourceException, ETLJobException
from x_spark.plans.etl import init_etl_job
from x_spark.sources import init_datasource
from x_spark.sources.base import MergeSpec, TableRef


@pytest.fixture()
def ds(spark):
    return init_datasource("duckdb", spark)


def test_append_create_read_roundtrip(spark, ds):
    ref = TableRef(table="t_round")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    ds.append(df, ref)
    ds.append(spark.createDataFrame([(3, "c")], "k int, v string"), ref)
    rows = sorted((r.k, r.v) for r in ds.read(ref).collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_append_resolves_by_name(spark, ds):
    ref = TableRef(table="t_byname")
    ds.append(spark.createDataFrame([(1, "a")], "k int, v string"), ref)
    ds.append(spark.createDataFrame([("b", 2)], "v string, k int"), ref)
    rows = sorted((r.k, r.v) for r in ds.read(ref).collect())
    assert rows == [(1, "a"), (2, "b")]


def test_merge_upsert_delta_parity(spark, ds):
    ref = TableRef(table="t_merge")
    ds.append(spark.createDataFrame([(1, 10, "x"), (2, 20, "y")], "pk int, v int, keep string"), ref)
    src = spark.createDataFrame([(1, 99), (3, 30)], "pk int, v int")
    ds.merge(src, ref, MergeSpec(["pk"], ["v"], insert_when_not_matched=True))
    rows = sorted((r.pk, r.v, r.keep) for r in ds.read(ref).collect())
    assert rows == [(1, 99, "x"), (2, 20, "y"), (3, 30, None)]
    # duplicate source keys abort (Delta contract)
    dup = spark.createDataFrame([(1, 1), (1, 2)], "pk int, v int")
    with pytest.raises(ETLJobException, match="duplicate"):
        ds.merge(dup, ref, MergeSpec(["pk"], ["v"]))


def test_overwrite_replace_where_semantics(spark, ds):
    ref = TableRef(table="t_rw")
    ds.append(
        spark.createDataFrame(
            [(1, "EU"), (2, None), (3, "US")], "k int, region string"
        ),
        ref,
    )
    new = spark.createDataFrame([(9, "EU")], "k int, region string")
    ds.overwrite(new, ref, replace_where="region = 'EU'")
    rows = sorted(
        (r.k, r.region) for r in ds.read(ref).collect()
    )
    assert rows == [(2, None), (3, "US"), (9, "EU")]
    bad = spark.createDataFrame([(8, "US")], "k int, region string")
    with pytest.raises(DataSourceException, match="replaceWhere"):
        ds.overwrite(bad, ref, replace_where="region = 'EU'")


def test_delete_and_truncate(spark, ds):
    ref = TableRef(table="t_del")
    ds.append(spark.createDataFrame([(1, 5), (2, None), (3, 50)], "k int, v int"), ref)
    ds.delete(ref, "v >= 10")
    assert sorted((r.k, r.v) for r in ds.read(ref).collect()) == [(1, 5), (2, None)]
    ds.truncate(ref)
    assert ds.read(ref).count() == 0


def test_yaml_lifecycle_parquet_to_duckdb(spark, tmp_path):
    """Full ETL lifecycle with a DuckDB target: source query on the
    Spark side, duckdb pre_sql hook, append into a persistent database
    file — the registry extension story the reference hard-rejects
    (etl/parent.py:96-99)."""
    db = str(tmp_path / "warehouse.duckdb")
    cfg = {
        "version": 0,
        "source": {"datasource": "parquet", "query": "SELECT 1 AS k, 'a' AS v"},
        "target": {
            "datasource": f"duckdb:{db}",
            "table": "published",
            "operation": "append",
            "pre_sql": "CREATE TABLE IF NOT EXISTS audit (note VARCHAR)",
        },
    }
    init_etl_job(cfg, spark=spark).run()
    init_etl_job(cfg, spark=spark).run()

    import duckdb

    con = duckdb.connect(db)
    assert con.sql("SELECT count(*) FROM published").fetchone()[0] == 2
    assert con.sql(
        "SELECT count(*) FROM information_schema.tables WHERE table_name='audit'"
    ).fetchone()[0] == 1
    con.close()


def test_registry_roundtrip_query(spark, sf_dir):
    from x_spark.plans.pipeline import q_duckdb_dim_roundtrip

    out = q_duckdb_dim_roundtrip(spark, sf_dir)
    assert out.count() > 0
    assert out.columns == ["n_name", "n_suppliers", "total_acctbal"]
