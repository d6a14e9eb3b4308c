"""Connector-semantics hardening (round-2 ADVICE + VERDICT items):

- typed/escaped SQL literal rendering for replaceWhere predicates
- Delta-parity overwrite(replace_where=...): violating source rows
  abort; NULL-predicate target rows survive
- scoped partitionOverwriteMode (caller's session conf restored)
- comment-aware SQL script splitting + multi-statement lifecycle hooks
- partition-pruned merge: untouched partitions' files survive byte-
  and mtime-identical
"""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from x_spark.plans.etl import init_etl_job
from x_spark.sources import init_datasource
from x_spark.sources.base import (
    MergeSpec,
    TableRef,
    partition_tuple_clause,
    split_sql_statements,
    sql_literal,
)


# -- sql_literal / predicate rendering --------------------------------------
def test_sql_literal_typed_rendering():
    assert sql_literal("plain") == "'plain'"
    assert sql_literal("O'Brien; DROP") == "'O''Brien; DROP'"
    assert sql_literal(42) == "42"
    assert sql_literal(1.5) == "1.5"
    assert sql_literal(True) == "TRUE"
    assert sql_literal(None) == "NULL"
    assert sql_literal(datetime.date(2024, 3, 1)) == "DATE '2024-03-01'"
    assert (
        sql_literal(datetime.datetime(2024, 3, 1, 12, 30))
        == "TIMESTAMP '2024-03-01 12:30:00'"
    )


def test_partition_tuple_clause_null_and_quote():
    row = {"day": "O'x", "bucket": 3, "region": None}
    clause = partition_tuple_clause(row, ["day", "bucket", "region"])
    assert clause == "(day = 'O''x' AND bucket = 3 AND region IS NULL)"


def test_replace_where_predicate_typed(spark, tmp_path):
    target = str(tmp_path / "tgt")
    (
        spark.createDataFrame(
            [(1, "O'x", 7), (2, "b", 8)], "k int, day string, bucket int"
        )
        .write.partitionBy("day", "bucket")
        .parquet(target)
    )
    job = init_etl_job(
        {
            "version": 0,
            "source": {
                "datasource": "parquet",
                "query": "SELECT 9 AS k, 'O''x' AS day, 7 AS bucket",
            },
            "target": {"datasource": "parquet", "path": target, "operation": "overwrite"},
        },
        spark=spark,
    )
    job.step_03_create_source_view()
    pred = job.replace_where_predicate()
    assert pred == "(day = 'O''x' AND bucket = 7)"
    job.step_08_clean()


# -- overwrite(replace_where=...) Delta semantics ----------------------------
@pytest.fixture()
def ow_ds(spark):
    return init_datasource("parquet", spark)


def test_overwrite_replace_where_null_rows_survive(spark, ow_ds, tmp_path):
    """Target rows where the predicate evaluates NULL must survive
    (Delta deletes only TRUE rows); previously ~NULL dropped them."""
    path = str(tmp_path / "rw_null")
    spark.createDataFrame(
        [(1, "EU"), (2, None), (3, "US")], "k int, region string"
    ).write.parquet(path)
    ref = TableRef(path=path)
    new = spark.createDataFrame([(9, "EU")], "k int, region string")
    ow_ds.overwrite(new, ref, replace_where="region = 'EU'")
    rows = sorted((r.k, r.region) for r in spark.read.parquet(path).collect())
    assert rows == [(2, None), (3, "US"), (9, "EU")]


def test_overwrite_replace_where_rejects_violating_source(spark, ow_ds, tmp_path):
    """Source rows outside the predicate abort the write (Delta
    replaceWhere contract) instead of silently overwriting their
    partitions."""
    path = str(tmp_path / "rw_viol")
    spark.createDataFrame(
        [(1, "EU"), (2, "US")], "k int, region string"
    ).write.partitionBy("region").parquet(path)
    ref = TableRef(path=path)
    bad = spark.createDataFrame([(9, "EU"), (10, "US")], "k int, region string")
    with pytest.raises(Exception, match="replaceWhere|ASSERT"):
        ow_ds.overwrite(bad, ref, replace_where="region = 'EU'")
    # target unchanged
    rows = sorted((r.k, r.region) for r in spark.read.parquet(path).collect())
    assert rows == [(1, "EU"), (2, "US")]


def test_overwrite_replace_where_on_partitioned_target(spark, ow_ds, tmp_path):
    """Explicit predicate on a partitioned target follows replaceWhere
    semantics: partitions matching the predicate but absent from df are
    cleared, not left behind."""
    path = str(tmp_path / "rw_part")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, day string"
    ).write.partitionBy("day").parquet(path)
    ref = TableRef(path=path)
    new = spark.createDataFrame([(9, "a")], "k int, day string")
    # predicate covers day a AND b; df only has a -> b's rows must be
    # deleted (Delta semantics), c survives
    ow_ds.overwrite(new, ref, replace_where="day IN ('a', 'b')")
    rows = sorted((r.k, r.day) for r in spark.read.parquet(path).collect())
    assert rows == [(3, "c"), (9, "a")]


def test_overwrite_mode_conf_restored(spark, ow_ds, tmp_path):
    """The engine must not permanently flip the caller session's
    partitionOverwriteMode (it previously hard-restored 'dynamic')."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key)
    spark.conf.set(key, "static")
    try:
        path = str(tmp_path / "conf_restore")
        df = spark.createDataFrame([(1, "a")], "k int, day string")
        ref = TableRef(path=path)
        ow_ds.overwrite(df, ref)
        ow_ds.overwrite_dynamic(df, ref)
        assert spark.conf.get(key).lower() == "static"
    finally:
        spark.conf.set(key, prev)


# -- SQL script splitting + lifecycle hooks ----------------------------------
def test_split_statements_comments_and_quotes():
    script = (
        "-- header; not a split\n"
        "CREATE TABLE t (s STRING); /* block; comment */\n"
        "INSERT INTO t VALUES ('a;b'), ('it''s'); -- tail comment\n"
    )
    stmts = split_sql_statements(script)
    assert len(stmts) == 2
    assert stmts[0].startswith("-- header; not a split\nCREATE TABLE t")
    assert "'a;b'" in stmts[1] and "'it''s'" in stmts[1]


def test_split_statements_drops_comment_only_tail():
    assert split_sql_statements("SELECT 1; -- done") == ["SELECT 1"]
    assert split_sql_statements("/* all comment */") == []


def test_multi_statement_pre_sql_hook(spark):
    """sql_scripts: true lets lifecycle hooks run ';'-separated scripts;
    the default contract stays atomic (reference parity)."""
    spark.sql("DROP TABLE IF EXISTS hook_tgt")
    spark.sql("DROP TABLE IF EXISTS hook_aux")
    cfg = {
        "version": 0,
        "source": {"datasource": "parquet", "query": "SELECT 1 AS k, 10 AS v"},
        "target": {
            "datasource": "parquet",
            "table": "hook_tgt",
            "operation": "append",
            "sql_scripts": True,
            "pre_sql": (
                "CREATE TABLE IF NOT EXISTS hook_aux (n INT) USING parquet; "
                "INSERT INTO hook_aux VALUES (7); -- hook done"
            ),
        },
    }
    job = init_etl_job(cfg, spark=spark)
    # dry-run renders the script as separate statements
    stmts = job.generate_sql()
    assert sum("hook_aux" in s for s in stmts) == 2
    job.run()
    assert spark.table("hook_aux").count() == 1
    assert spark.table("hook_tgt").count() == 1

    # atomic default still rejects scripts
    cfg_atomic = dict(cfg)
    cfg_atomic["target"] = {
        k: v for k, v in cfg["target"].items() if k != "sql_scripts"
    }
    spark.sql("DROP TABLE IF EXISTS hook_tgt")
    with pytest.raises(ValueError, match="atomic"):
        init_etl_job(cfg_atomic, spark=spark).run()


# -- partition-pruned merge --------------------------------------------------
def _file_states(path):
    states = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                states[full] = os.stat(full).st_mtime_ns
    return states


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "merge_pruned")
    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 30, "b"), (4, 40, "c")],
        "pk int, v int, day string",
    ).write.partitionBy("day").parquet(path)
    before = _file_states(path)
    b_files = {p: t for p, t in before.items() if "/day=b/" in p}
    c_files = {p: t for p, t in before.items() if "/day=c/" in p}
    assert b_files and c_files

    ds = init_datasource("parquet", spark)
    src = spark.createDataFrame([(1, 99), (2, 88)], "pk int, v int")
    spec = MergeSpec(primary_key_columns=["pk"], update_columns=["v"])
    ds.merge(src, TableRef(path=path), spec)

    rows = sorted((r.pk, r.v, r.day) for r in spark.read.parquet(path).collect())
    assert rows == [(1, 99, "a"), (2, 88, "a"), (3, 30, "b"), (4, 40, "c")]
    after = _file_states(path)
    # untouched partitions: identical files, untouched mtimes
    assert {p: t for p, t in after.items() if "/day=b/" in p} == b_files
    assert {p: t for p, t in after.items() if "/day=c/" in p} == c_files
    # touched partition actually rewritten
    assert {p for p in after if "/day=a/" in p} != {
        p for p in before if "/day=a/" in p
    } or any(after[p] != before.get(p) for p in after if "/day=a/" in p)


def test_merge_upsert_pruned_with_partition_in_pk(spark, tmp_path):
    """Upsert where the partition column is part of the pk: inserted
    rows carry real partition values; only source partitions + matched
    partitions are rewritten."""
    path = str(tmp_path / "merge_upsert_pruned")
    spark.createDataFrame(
        [(1, "a", 10), (3, "b", 30)], "pk int, day string, v int"
    ).write.partitionBy("day").parquet(path)
    before = _file_states(path)
    b_before = {p: t for p, t in before.items() if "/day=b/" in p}

    ds = init_datasource("parquet", spark)
    src = spark.createDataFrame([(1, "a", 99), (5, "c", 50)], "pk int, day string, v int")
    spec = MergeSpec(
        primary_key_columns=["pk", "day"],
        update_columns=["v"],
        insert_when_not_matched=True,
    )
    ds.merge(src, TableRef(path=path), spec)
    rows = sorted((r.pk, r.day, r.v) for r in spark.read.parquet(path).collect())
    assert rows == [(1, "a", 99), (3, "b", 30), (5, "c", 50)]
    after = _file_states(path)
    assert {p: t for p, t in after.items() if "/day=b/" in p} == b_before


def test_merge_partition_col_updatable_falls_back(spark, tmp_path):
    """Partition column in the update set -> rows can move across
    partitions; pruning must be skipped and the merge still correct."""
    path = str(tmp_path / "merge_move")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "pk int, day string, v int"
    ).write.partitionBy("day").parquet(path)
    ds = init_datasource("parquet", spark)
    src = spark.createDataFrame([(1, "b", 99)], "pk int, day string, v int")
    spec = MergeSpec(primary_key_columns=["pk"], update_columns=["day", "v"])
    ds.merge(src, TableRef(path=path), spec)
    rows = sorted((r.pk, r.day, r.v) for r in spark.read.parquet(path).collect())
    assert rows == [(1, "b", 99), (2, "b", 20)]


def test_merge_noop_leaves_all_files_untouched(spark, tmp_path):
    path = str(tmp_path / "merge_noop")
    spark.createDataFrame(
        [(1, "a", 10)], "pk int, day string, v int"
    ).write.partitionBy("day").parquet(path)
    before = _file_states(path)
    ds = init_datasource("parquet", spark)
    src = spark.createDataFrame([(99, 1)], "pk int, v int")
    ds.merge(src, TableRef(path=path), MergeSpec(["pk"], ["v"]))
    assert _file_states(path) == before
