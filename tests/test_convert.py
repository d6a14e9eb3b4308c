"""CONVERT TO TXLOG (Delta's CONVERT TO DELTA parity): one atomic
commit adopts an existing plain parquet directory's files — footer
stats included — as a txlog table in place; reads are byte-identical,
every subsequent txlog surface (DML, time travel, OPTIMIZE, CDF) works
on the adopted files."""

import os

import pytest
from pyspark.sql import functions as F

from x_spark.errors import DataSourceException
from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef
from x_spark.sources.txlog import resolve_snapshot


@pytest.fixture()
def ds(spark):
    return init_datasource("txlog", spark)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _plain_write(spark, path, partition_by=None, n=8):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", i * 10) for i in range(n)],
        "pk int, g string, v int",
    )
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return df


def test_convert_flat_read_equivalence_and_stats(spark, ds, tmp_path):
    path = str(tmp_path / "t")
    df = _plain_write(spark, path)
    before = _rows(df)
    n = ds.convert(TableRef(path=path))
    snap = resolve_snapshot(path)
    assert snap.version == 0 and len(snap.files) == n
    assert _rows(ds.read(TableRef(path=path))) == before
    # footer stats rode the adds: exact metadata-only count, and the
    # stats-pruned DML paths work immediately
    assert ds.count_rows(TableRef(path=path)) == len(before)
    assert all((a.get("stats") or {}).get("minValues")
               for a in snap.files.values())
    # converting again is an error, not a second version
    with pytest.raises(DataSourceException, match="already a txlog"):
        ds.convert(TableRef(path=path))


def test_convert_partitioned_with_types_then_dml(spark, ds, tmp_path):
    path = str(tmp_path / "t")
    _plain_write(spark, path, partition_by=["g"])
    ds.convert(TableRef(path=path), partition_by="g string")
    ref = TableRef(path=path)
    snap = resolve_snapshot(path)
    assert snap.partition_cols == ["g"]
    assert {f.name for f in snap.schema.fields} == {"pk", "g", "v"}
    # partition pruning works on adopted files (partition-only DELETE
    # touches only matching partitions)
    files_b = [p for p, a in snap.files.items()
               if (a.get("partitionValues") or {}).get("g") == "b"]
    ds.delete(ref, "g = 'b'")
    snap2 = resolve_snapshot(path)
    assert all(p not in snap2.files for p in files_b)
    kept = [p for p in snap.files if p not in files_b]
    assert all(p in snap2.files for p in kept), \
        "partition-pruned delete must not touch other partitions' files"
    # time travel back to the conversion point
    assert len(_rows(ds.read(TableRef(path=path,
                                      options={"versionAsOf": "0"})))) == 8
    # subsequent append + update flow
    ds.append(spark.createDataFrame([(100, "c", 1)],
                                    "pk int, g string, v int"), ref)
    ds.update(ref, {"v": "v + 1"}, "pk = 100")
    # converted schema appends partition columns last (Delta's rule)
    assert _rows(ds.read(ref).filter("pk = 100")
                 .select("pk", "g", "v")) == [(100, "c", 2)]


def test_convert_layout_mismatch_rejects(spark, ds, tmp_path):
    path = str(tmp_path / "t")
    _plain_write(spark, path, partition_by=["g"])
    with pytest.raises(DataSourceException, match="partition layout"):
        ds.convert(TableRef(path=path))  # undeclared partitioning
    path2 = str(tmp_path / "t2")
    _plain_write(spark, path2)
    with pytest.raises(DataSourceException, match="partition layout"):
        ds.convert(TableRef(path=path2), partition_by="g string")
    path3 = str(tmp_path / "empty")
    os.makedirs(path3)
    with pytest.raises(DataSourceException, match="no parquet"):
        ds.convert(TableRef(path=path3))


def test_convert_sql_verb_and_catalog_name(spark, ds, tmp_path):
    # path form through SQL, with PARTITIONED BY
    path = str(tmp_path / "t")
    _plain_write(spark, path, partition_by=["g"])
    out = ds.sql(
        f"CONVERT TO TXLOG parquet.`{path}` PARTITIONED BY (g string)"
    ).collect()
    assert out[0]["files_converted"] >= 2
    assert resolve_snapshot(path).version == 0

    # catalog-table form: the name adopts the location and dispatches
    # txlog SQL afterwards
    import uuid

    name = f"cnv_{uuid.uuid4().hex[:8]}"
    loc = str(tmp_path / "cat")
    spark.sql(
        f"CREATE TABLE {name} (pk INT, v INT) USING parquet "
        f"LOCATION '{loc}'"
    )
    spark.sql(f"INSERT INTO {name} VALUES (1, 10), (2, 20)")
    try:
        ds.sql(f"CONVERT TO TXLOG {name}")
        assert name in ds._known_names()
        ds.sql(f"INSERT INTO {name} VALUES (3, 30)")  # txlog DML now
        assert _rows(ds.sql(f"SELECT pk, v FROM {name}")) == [
            (1, 10), (2, 20), (3, 30),
        ]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_convert_cli(spark, ds, tmp_path):
    from x_spark.cli import main

    path = str(tmp_path / "t")
    _plain_write(spark, path)
    assert main(["convert", path]) == 0
    assert resolve_snapshot(path).version == 0


def test_convert_duplicate_basenames_dv_and_row_ids(spark, ds, tmp_path):
    # an adopted Spark partitionBy layout legitimately repeats file
    # BASENAMES across partition dirs — per-file identity (deletion
    # vectors, row-tracking base ids) is keyed on the REL PATH, so
    # masks and ids must never leak between same-named files
    path = str(tmp_path / "dup")
    spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(8)],
        "pk int, g string",
    ).repartition(1).write.partitionBy("g").parquet(path)
    import glob

    a = {os.path.basename(f) for f in glob.glob(f"{path}/g=a/*.parquet")}
    b = {os.path.basename(f) for f in glob.glob(f"{path}/g=b/*.parquet")}
    assert a & b, "fixture must actually collide on basenames"
    ds.convert(TableRef(path=path), partition_by="g string")
    ref = TableRef(path=path)
    ds.set_properties(ref, {"enableDeletionVectors": "true",
                            "enableRowTracking": "true"})
    ids = {r.pk: r._row_id for r in ds.with_row_ids(ref).collect()}
    assert len(set(ids.values())) == 8, "ids unique despite basename clash"
    ds.delete(ref, "pk = 0")  # DV mask on the g=a file only
    rows = sorted(r.pk for r in ds.read(ref).collect())
    assert rows == [1, 2, 3, 4, 5, 6, 7], \
        "a mask for g=a/<name> must not leak into g=b/<name>"
    after = {r.pk: r._row_id for r in ds.with_row_ids(ref).collect()}
    assert after == {p: v for p, v in ids.items() if p != 0}


def test_convert_failed_validation_leaves_no_name_binding(spark, ds,
                                                          tmp_path):
    import uuid

    name = f"cnvfail_{uuid.uuid4().hex[:8]}"
    loc = str(tmp_path / "cat_empty")
    spark.sql(f"CREATE TABLE {name} (pk INT) USING parquet "
              f"LOCATION '{loc}'")
    try:
        with pytest.raises(DataSourceException, match="no parquet"):
            ds.convert(TableRef(table=name))
        assert name not in ds._known_names(), \
            "a failed convert must not leave a stale name binding"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
