"""Delta-semantics conformance suite.

delta-spark cannot be installed in this container, so the ``delta``
datasource name resolves to the txlog transactional connector
(x_spark/sources/__init__.py). This suite pins the OBSERVABLE Delta
behaviors the engine promises — documented in the public Delta Lake
docs and exercised by the reference through
``datasource/delta.py:104-148`` (MERGE), ``etl/overwrite.py:56-70``
(replaceWhere) — against whatever connector ``init_datasource("delta",
...)`` returns. Every seed/read/assert goes through the connector
surface (no Spark-catalog shortcuts), so the SAME suite runs unchanged
against live Delta tables in an environment with delta-spark, against
txlog here, and against the parquet fallback if forced.
"""

import uuid

import pytest

from x_spark.errors import ETLJobException
from x_spark.sources import init_datasource
from x_spark.sources.base import MergeSpec, TableRef


@pytest.fixture()
def ds(spark):
    return init_datasource("delta", spark)


def _drop(ds, ref):
    """Connector-portable drop: txlog has drop_table; catalog-backed
    connectors go through DROP TABLE."""
    if hasattr(ds, "drop_table"):
        ds.drop_table(ref, if_exists=True)
    elif not ref.is_path:
        ds.spark.sql(f"DROP TABLE IF EXISTS {ref.table}")


def _mk_table(spark, ds, name, schema, rows, partition_by=None):
    ref = TableRef(table=name, partition_by=list(partition_by or []))
    _drop(ds, ref)
    ds.append(spark.createDataFrame(rows, schema), ref)
    return ref


def _rows(ds, ref):
    return sorted(tuple(r) for r in ds.read(ref).collect())


# -- MERGE contract ----------------------------------------------------------
def test_merge_aborts_when_target_row_matches_multiple_source_rows(spark, ds):
    """Delta MERGE raises when >1 source row matches one target row
    (public contract: DeltaUnsupportedOperationException / merge
    cardinality violation). Reference hits this via delta.py:135-148."""
    ref = _mk_table(spark, ds, "conf_merge_dup", "pk int, v int", [(1, 10)])
    src = spark.createDataFrame([(1, 100), (1, 200)], "pk int, v int")
    with pytest.raises(ETLJobException, match="duplicate"):
        ds.merge(src, ref, MergeSpec(["pk"], ["v"]))


def test_merge_update_touches_only_matched_rows(spark, ds):
    ref = _mk_table(spark, ds, "conf_merge_upd", "pk int, v int, keep string",
                    [(1, 10, "a"), (2, 20, "b")])
    src = spark.createDataFrame([(1, 99), (7, 70)], "pk int, v int")
    ds.merge(src, ref, MergeSpec(["pk"], ["v"], insert_when_not_matched=False))
    # matched row updated in-place (non-set column kept); unmatched
    # source row NOT inserted on update; unmatched target untouched
    assert _rows(ds, ref) == [(1, 99, "a"), (2, 20, "b")]


def test_merge_upsert_inserts_with_null_unset_columns(spark, ds):
    """WHEN NOT MATCHED INSERT with explicit values covers pk+update
    columns only; other columns land NULL (the reference's
    golden-confirmed quirk, SURVEY §8.7 / update_and_upsert.py:49-57)."""
    ref = _mk_table(spark, ds, "conf_merge_ups", "pk int, v int, keep string",
                    [(1, 10, "a")])
    src = spark.createDataFrame([(1, 99), (2, 22)], "pk int, v int")
    ds.merge(src, ref, MergeSpec(["pk"], ["v"], insert_when_not_matched=True))
    assert _rows(ds, ref) == [(1, 99, "a"), (2, 22, None)]


def test_merge_extra_predicate_gates_the_match(spark, ds):
    """The ON condition includes where_statement_on_table: a pk match
    failing the predicate is NOT MATCHED (update skips; upsert
    inserts)."""
    ref = _mk_table(spark, ds, "conf_merge_gate", "pk int, v int, guard int",
                    [(1, 10, 0)])
    src = spark.createDataFrame([(1, 99)], "pk int, v int")
    spec = MergeSpec(["pk"], ["v"], extra_target_predicate="guard = 1",
                     insert_when_not_matched=True)
    ds.merge(src, ref, spec)
    assert _rows(ds, ref) == [(1, 10, 0), (1, 99, None)]


# -- replaceWhere contract ---------------------------------------------------
def test_replace_where_rejects_source_rows_outside_predicate(spark, ds, tmp_path):
    """Delta: 'written data must match the replaceWhere predicate' —
    violating rows fail the txn; nothing is replaced."""
    ref = TableRef(path=str(tmp_path / "conf_rw_reject"), partition_by=["region"])
    ds.append(spark.createDataFrame([(1, "EU")], "k int, region string"), ref)
    bad = spark.createDataFrame([(9, "US")], "k int, region string")
    with pytest.raises(Exception, match="replaceWhere|match"):
        ds.overwrite(bad, ref, replace_where="region = 'EU'")
    assert _rows(ds, ref) == [(1, "EU")]


def test_replace_where_deletes_only_true_rows(spark, ds, tmp_path):
    """Rows where the predicate is FALSE *or NULL* survive; matching
    rows are replaced even when the source has no rows for them."""
    ref = TableRef(path=str(tmp_path / "conf_rw_null"))
    ds.append(
        spark.createDataFrame(
            [(1, "EU"), (2, None), (3, "US"), (4, "EU")], "k int, region string"
        ),
        ref,
    )
    new = spark.createDataFrame([(9, "EU")], "k int, region string")
    ds.overwrite(new, ref, replace_where="region = 'EU'")
    assert _rows(ds, ref) == [(2, None), (3, "US"), (9, "EU")]


# -- overwrite / truncate / delete / append contracts ------------------------
def test_dynamic_overwrite_replaces_only_source_partitions(spark, ds, tmp_path):
    ref = TableRef(path=str(tmp_path / "conf_dynamic"), partition_by=["day"])
    ds.append(spark.createDataFrame([(1, "a"), (2, "b")], "k int, day string"), ref)
    ds.overwrite_dynamic(
        spark.createDataFrame([(9, "a")], "k int, day string"), ref
    )
    assert _rows(ds, ref) == [(2, "b"), (9, "a")]


def test_full_overwrite_replaces_everything(spark, ds):
    ref = _mk_table(spark, ds, "conf_full_ow", "k int, v int", [(1, 1), (2, 2)])
    ds.overwrite(spark.createDataFrame([(9, 9)], "k int, v int"), ref)
    assert _rows(ds, ref) == [(9, 9)]


def test_overwrite_creates_missing_relation(spark, ds, tmp_path):
    path = str(tmp_path / "conf_create")
    ds.overwrite(spark.createDataFrame([(1, "a")], "k int, day string"),
                 TableRef(path=path, partition_by=["day"]))
    df = ds.read(TableRef(path=path))
    assert sorted((r.k, r.day) for r in df.collect()) == [(1, "a")]
    assert all("/day=" in f for f in df.inputFiles())


def test_truncate_empties_but_preserves_schema(spark, ds):
    ref = _mk_table(spark, ds, "conf_trunc", "k int, v string", [(1, "a")])
    ds.truncate(ref)
    df = ds.read(ref)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]
    # still writable after truncate
    ds.append(spark.createDataFrame([(2, "b")], "k int, v string"), ref)
    assert _rows(ds, ref) == [(2, "b")]


def test_delete_removes_true_rows_only(spark, ds):
    """DELETE FROM t WHERE p: rows where p is FALSE or NULL survive
    (ANSI + Delta semantics; the reference stops at update/upsert)."""
    ref = _mk_table(spark, ds, "conf_del", "k int, v int",
                    [(1, 5), (2, None), (3, 50)])
    ds.delete(ref, "v >= 10")
    assert _rows(ds, ref) == [(1, 5), (2, None)]


def test_append_resolves_by_name_and_rejects_missing_columns(spark, ds):
    """Delta append matches columns by NAME (not position) and rejects a
    source missing target columns — positional insertInto would silently
    scramble reordered columns."""
    ref = _mk_table(spark, ds, "conf_append", "k int, v string", [(1, "a")])
    # reordered source columns must land correctly
    reordered = spark.createDataFrame([("b", 2)], "v string, k int")
    ds.append(reordered, ref)
    assert _rows(ds, ref) == [(1, "a"), (2, "b")]
    with pytest.raises(Exception):
        ds.append(spark.createDataFrame([(3,)], "k int"), ref)


# -- SQL surface over connector-named tables ---------------------------------
def test_sql_resolves_connector_table_names(spark, ds):
    """The reference's pass-through SQL surface (source `query`,
    pre/post_sql hooks) must see connector tables by name: SELECT
    resolves current state, TRUNCATE TABLE routes to the native op."""
    name = f"conf_sql_{uuid.uuid4().hex[:8]}"
    ref = _mk_table(spark, ds, name, "k int, v int", [(1, 10), (2, 20)])
    got = sorted(tuple(r) for r in
                 ds.sql(f"SELECT k, v + 1 AS v1 FROM {name}").collect())
    assert got == [(1, 11), (2, 21)]
    ds.sql(f"truncate table {name}")
    assert ds.read(ref).count() == 0
    _drop(ds, ref)


def test_sql_rewrites_qualified_column_references(spark, ds):
    """Unaliased table-qualified columns must resolve after the name
    rewrite (`t.col FROM t` — both occurrences rewrite together)."""
    if not hasattr(ds, "drop_table"):  # pragma: no cover - live-delta env
        pytest.skip("txlog name rewrite only")
    name = f"conf_qual_{uuid.uuid4().hex[:8]}"
    ref = _mk_table(spark, ds, name, "k int, v int", [(1, 10), (2, 20)])
    got = sorted(
        tuple(r)
        for r in ds.sql(f"SELECT {name}.k, {name}.v FROM {name} WHERE {name}.k = 2").collect()
    )
    assert got == [(2, 20)]
    _drop(ds, ref)


def test_temp_view_does_not_hijack_transactional_target(spark, ds):
    """A session temp view named like a write target must NOT reroute
    delta writes to the catalog connector — only persistent catalog
    tables defer."""
    if not hasattr(ds, "drop_table"):  # pragma: no cover - live-delta env
        pytest.skip("fallback-resolution behavior")
    name = f"conf_tv_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame([(99, "view")], "k int, v string").createOrReplaceTempView(name)
    ref = TableRef(table=name)
    ds.append(spark.createDataFrame([(1, "txn")], "k int, v string"), ref)
    # the write landed transactionally, not in the view
    assert _rows(ds, ref) == [(1, "txn")]
    assert [tuple(r) for r in spark.table(name).collect()] == [(99, "view")]
    spark.catalog.dropTempView(name)
    _drop(ds, ref)


def test_catalog_routed_write_rejects_transactional_options(spark, ds):
    """A transactional-only kwarg (merge_schema/txn) must raise, not be
    silently dropped, when the name routes to the catalog connector."""
    if not hasattr(ds, "_reject_kwargs"):  # pragma: no cover - live-delta env
        pytest.skip("fallback-resolution behavior")
    from x_spark.errors import DataSourceException

    name = "conf_kwargs_catalog"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.createDataFrame([(1, 1)], "k int, v int").write.saveAsTable(name)
    with pytest.raises(DataSourceException, match="transactional-store"):
        ds.append(
            spark.createDataFrame([(2, 2, 3)], "k int, v int, w int"),
            TableRef(table=name),
            merge_schema=True,
        )
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_sql_alter_table_constraint_ddl(spark, ds):
    """ALTER TABLE ... ADD/DROP CONSTRAINT ... CHECK routes to the
    native invariant store through the pass-through SQL surface (the
    reference's pre/post_sql hooks could then manage constraints in
    plain DDL)."""
    if not hasattr(ds, "add_constraint"):  # pragma: no cover - live-delta env
        pytest.skip("txlog constraint DDL only")
    name = f"conf_cst_{uuid.uuid4().hex[:8]}"
    ref = _mk_table(spark, ds, name, "k int, v int", [(1, 10)])
    ds.sql(f"ALTER TABLE {name} ADD CONSTRAINT v_pos CHECK (v > 0)")
    with pytest.raises(Exception, match="v_pos"):
        ds.append(spark.createDataFrame([(2, -1)], "k int, v int"), ref)
    ds.sql(f"alter table {name} drop constraint v_pos")
    ds.append(spark.createDataFrame([(2, -1)], "k int, v int"), ref)
    assert ds.read(ref).count() == 2
    _drop(ds, ref)


def test_sql_alter_column_generated_ddl(spark, ds):
    """ALTER TABLE ... ALTER COLUMN ... SET GENERATED ALWAYS AS (expr)
    routes to the generated-column store through the pass-through SQL
    surface; DROP GENERATED makes the column ordinary again."""
    if not hasattr(ds, "set_generated_column"):  # pragma: no cover - live delta
        pytest.skip("txlog generated-column DDL only")
    name = f"conf_gen_{uuid.uuid4().hex[:8]}"
    ref = _mk_table(spark, ds, name, "k int, dbl int", [(1, 2)])
    ds.sql(f"ALTER TABLE {name} ALTER COLUMN dbl SET GENERATED ALWAYS AS (k * 2)")
    # omitted column is computed; disagreeing value is rejected
    ds.append(spark.createDataFrame([(5,)], "k int"), ref)
    assert sorted(map(tuple, ds.read(ref).collect())) == [(1, 2), (5, 10)]
    with pytest.raises(Exception, match="generated"):
        ds.append(spark.createDataFrame([(6, 99)], "k int, dbl int"), ref)
    ds.sql(f"alter table {name} alter column dbl drop generated")
    ds.append(spark.createDataFrame([(6, 99)], "k int, dbl int"), ref)
    assert ds.read(ref).count() == 3
    _drop(ds, ref)
