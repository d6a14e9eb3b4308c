"""SQL DML dispatch on txlog names: CREATE TABLE / INSERT / MERGE INTO.

The reference drives every write through SQL
(tests/dbr_notebook/test_case.sql cmds 1, 15-18 are ``INSERT INTO ...
VALUES``; its update/upsert semantics are Delta MERGE,
datasource/delta.py:135-148) — these tests re-run the golden
update/upsert/append flows purely through ``sql()`` statements and pin
the full Delta MERGE clause matrix, including WHEN NOT MATCHED BY
SOURCE DELETE.
"""

import uuid

import pytest
from pyspark.sql import functions as F

from x_spark.errors import DataSourceException
from x_spark.sources import init_datasource
from x_spark.sources.base import MergeSpec, TableRef
from x_spark.sources.sql_dml import (
    parse_create_table,
    parse_insert,
    parse_merge,
)
from x_spark.sources.txlog import resolve_snapshot


@pytest.fixture()
def ds(spark):
    return init_datasource("txlog", spark)


def _name(prefix="sqldml"):
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


def _rows(df):
    return sorted(map(tuple, df.collect()))


# -- parsers ---------------------------------------------------------------


def test_parse_merge_full_grammar():
    ms = parse_merge(
        "MERGE WITH SCHEMA EVOLUTION INTO tgt AS t USING (SELECT 1 AS a) s "
        "ON t.a = s.a AND t.b > 0 "
        "WHEN MATCHED AND s.a < 5 THEN UPDATE SET b = s.a + 1, c = 'x, y' "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED BY TARGET THEN INSERT (a, b) VALUES (s.a, 0) "
        "WHEN NOT MATCHED BY SOURCE AND t.b = 2 THEN DELETE"
    )
    assert ms.schema_evolution
    assert ms.target == "tgt" and ms.target_alias == "t"
    assert ms.source_sql == "(SELECT 1 AS a)" and ms.source_alias == "s"
    assert ms.on == "t.a = s.a AND t.b > 0"
    assert len(ms.matched) == 2
    assert ms.matched[0].condition == "s.a < 5"
    assert ms.matched[0].assignments == {"b": "s.a + 1", "c": "'x, y'"}
    assert ms.matched[1].action == "delete"
    assert ms.not_matched[0].columns == ["a", "b"]
    assert ms.not_matched[0].values == ["s.a", "0"]
    assert ms.by_source[0].action == "delete"
    assert ms.by_source[0].condition == "t.b = 2"


def test_parse_merge_update_star_and_insert_star():
    ms = parse_merge(
        "MERGE INTO t USING s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert ms.matched[0].assignments is None
    assert ms.not_matched[0].columns is None


def test_parse_merge_keywords_inside_literals():
    # 'WHEN', 'THEN', 'USING', 'ON' inside string literals must not
    # confuse the top-level scanner
    ms = parse_merge(
        "MERGE INTO t USING s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET note = 'when using then on (x'"
    )
    assert ms.matched[0].assignments == {"note": "'when using then on (x'"}


def test_parse_insert_shapes():
    p = parse_insert("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    assert not p.overwrite and p.columns is None
    assert p.source_sql.startswith("SELECT * FROM VALUES")
    p = parse_insert("INSERT OVERWRITE TABLE t (a, b) SELECT x, y FROM u")
    assert p.overwrite and p.columns == ["a", "b"]
    p = parse_insert("INSERT INTO t PARTITION (p='x') VALUES (1)")
    assert p.partition == {"p": "x"}
    p = parse_insert("INSERT OVERWRITE t PARTITION (p) SELECT * FROM u")
    assert p.partition == {"p": None}
    assert parse_insert("SELECT 1") is None


def test_parse_create_table():
    ct = parse_create_table(
        "CREATE TABLE IF NOT EXISTS db.t (a INT, b STRING) USING txlog "
        "PARTITIONED BY (b) TBLPROPERTIES ('k'='v')"
    )
    assert ct.name == "db.t" and ct.if_not_exists
    assert ct.columns_ddl == "a INT, b STRING"
    assert ct.partition_by == ["b"] and ct.properties == {"k": "v"}
    # non-txlog CREATE passes through
    assert parse_create_table("CREATE TABLE t (a INT) USING parquet") is None
    assert parse_create_table("CREATE TABLE t (a INT)") is None
    ct = parse_create_table(
        "CREATE TABLE t2 USING txlog AS SELECT a, b AS c FROM x"
    )
    assert ct.as_select == "SELECT a, b AS c FROM x"


# -- CREATE / INSERT --------------------------------------------------------


def test_create_insert_select_roundtrip(spark, ds):
    t = _name()
    ds.sql(f"CREATE TABLE {t} (id BIGINT, name STRING, v DOUBLE) USING txlog")
    assert ds.table_exists(TableRef(table=t))
    ds.sql(f"INSERT INTO {t} VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
    ds.sql(f"INSERT INTO {t} SELECT id + 10, upper(name), v * 2 FROM {t}")
    assert _rows(ds.sql(f"SELECT * FROM {t}")) == [
        (1, "a", 1.5), (2, "b", 2.5), (11, "A", 3.0), (12, "B", 5.0),
    ]
    # column list: unlisted column NULL-fills
    ds.sql(f"INSERT INTO {t} (id, name) VALUES (100, 'x')")
    assert _rows(ds.sql(f"SELECT * FROM {t} WHERE id = 100")) == [
        (100, "x", None)
    ]
    # arity mismatch is a hard error
    with pytest.raises(DataSourceException, match="arity"):
        ds.sql(f"INSERT INTO {t} VALUES (1, 'a')")


def test_create_if_not_exists_and_duplicate(spark, ds):
    t = _name()
    ds.sql(f"CREATE TABLE {t} (a INT) USING txlog")
    ds.sql(f"CREATE TABLE IF NOT EXISTS {t} (a INT) USING txlog")  # no-op
    with pytest.raises(DataSourceException, match="already exists"):
        ds.sql(f"CREATE TABLE {t} (a INT) USING txlog")


def test_ctas_partitioned(spark, ds):
    t = _name()
    ds.sql(
        f"CREATE TABLE {t} USING txlog PARTITIONED BY (part) AS "
        "SELECT * FROM VALUES (1, 'a'), (2, 'b') AS v(id, part)"
    )
    assert ds.partition_columns(TableRef(table=t)) == ["part"]
    assert _rows(ds.sql(f"SELECT id, part FROM {t}")) == [(1, "a"), (2, "b")]


def test_insert_overwrite_full_and_partition(spark, ds):
    t = _name()
    ds.sql(f"CREATE TABLE {t} (id INT, part STRING) USING txlog "
           "PARTITIONED BY (part)")
    ds.sql(f"INSERT INTO {t} VALUES (1, 'a'), (2, 'b')")
    # static-partition overwrite replaces only that partition
    ds.sql(f"INSERT OVERWRITE {t} PARTITION (part='a') VALUES (9)")
    assert _rows(ds.sql(f"SELECT id, part FROM {t}")) == [(2, "b"), (9, "a")]
    # full overwrite replaces everything
    ds.sql(f"INSERT OVERWRITE {t} VALUES (7, 'z')")
    assert _rows(ds.sql(f"SELECT id, part FROM {t}")) == [(7, "z")]


def test_insert_fills_defaults_and_identity(spark, ds):
    t = _name()
    ds.sql(f"CREATE TABLE {t} (id BIGINT, v INT, src STRING) USING txlog")
    ds.sql(f"ALTER TABLE {t} ALTER COLUMN id SET IDENTITY "
           "(START WITH 10 STEP 10)")
    ds.sql(f"ALTER TABLE {t} ALTER COLUMN src SET DEFAULT 'sql'")
    # positional insert omits the identity column (Delta's rule)
    ds.sql(f"INSERT INTO {t} VALUES (1, 'x'), (2, 'y')")
    rows = _rows(ds.sql(f"SELECT id, v, src FROM {t}"))
    assert [r[1:] for r in rows] == [(1, "x"), (2, "y")]
    assert sorted(r[0] for r in rows) == [10, 20]
    # column-list insert fills the DEFAULT
    ds.sql(f"INSERT INTO {t} (v) VALUES (3)")
    assert _rows(ds.sql(f"SELECT v, src FROM {t} WHERE v = 3")) == [
        (3, "sql")
    ]
    # identity column cannot be listed
    with pytest.raises(DataSourceException, match="IDENTITY"):
        ds.sql(f"INSERT INTO {t} (id, v) VALUES (1, 1)")


# -- MERGE INTO --------------------------------------------------------------


def _seed_merge(ds, spark, rows=((1, "a", 10.0), (2, "a", 20.0),
                                 (3, "b", 30.0))):
    t = _name("mrg")
    ds.sql(f"CREATE TABLE {t} (pk BIGINT, part STRING, v DOUBLE) USING txlog")
    vals = ", ".join(f"({pk}, '{p}', {v})" for pk, p, v in rows)
    ds.sql(f"INSERT INTO {t} VALUES {vals}")
    return t


def test_merge_update_insert_delete_by_source(spark, ds):
    t = _seed_merge(ds, spark)
    ds.sql(f"""
        MERGE INTO {t} t USING (
            SELECT 1 AS pk, 99.0 AS v UNION ALL SELECT 9, 9.0
        ) s ON t.pk = s.pk
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (pk, part, v) VALUES (s.pk, 'new', s.v)
        WHEN NOT MATCHED BY SOURCE AND t.part = 'b' THEN DELETE
    """)
    assert _rows(ds.sql(f"SELECT pk, part, v FROM {t}")) == [
        (1, "a", 99.0), (2, "a", 20.0), (9, "new", 9.0),
    ]


def test_merge_clause_order_first_wins(spark, ds):
    t = _seed_merge(ds, spark)
    ds.sql(f"""
        MERGE INTO {t} USING (SELECT 1 AS pk UNION ALL SELECT 2) s
        ON {t}.pk = s.pk
        WHEN MATCHED AND {t}.v < 15 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = {t}.v * 10
    """)
    assert _rows(ds.sql(f"SELECT pk, v FROM {t}")) == [
        (2, 200.0), (3, 30.0),
    ]


def test_merge_update_star_insert_star(spark, ds):
    t = _seed_merge(ds, spark)
    ds.sql(f"""
        MERGE INTO {t} USING (
            SELECT 1 AS pk, 'z' AS part, 111.0 AS v
            UNION ALL SELECT 7, 'n', 7.0
        ) s ON {t}.pk = s.pk
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)
    assert _rows(ds.sql(f"SELECT pk, part, v FROM {t}")) == [
        (1, "z", 111.0), (2, "a", 20.0), (3, "b", 30.0), (7, "n", 7.0),
    ]


def test_merge_multiple_match_error(spark, ds):
    t = _seed_merge(ds, spark)
    with pytest.raises(DataSourceException, match="multiple source rows"):
        ds.sql(f"""
            MERGE INTO {t} USING (
                SELECT 1 AS pk UNION ALL SELECT 1
            ) s ON {t}.pk = s.pk
            WHEN MATCHED THEN UPDATE SET v = 0.0
        """)


def test_merge_multiple_match_without_clause_keeps_one_copy(spark, ds):
    # a target row matched twice where NO matched clause exists must
    # survive exactly once (join residue dedup)
    t = _seed_merge(ds, spark)
    ds.sql(f"""
        MERGE INTO {t} USING (
            SELECT 1 AS pk UNION ALL SELECT 1 UNION ALL SELECT 8
        ) s ON {t}.pk = s.pk
        WHEN NOT MATCHED THEN INSERT (pk, part, v) VALUES (s.pk, 'n', 0.0)
    """)
    assert _rows(ds.sql(f"SELECT pk FROM {t}")) == [(1,), (2,), (3,), (8,)]


def test_merge_noop_commits_nothing(spark, ds):
    t = _seed_merge(ds, spark)
    path = ds._table_path(TableRef(table=t))
    v0 = ds._latest_version(path)
    ds.sql(f"MERGE INTO {t} USING (SELECT 12345 AS pk) s ON {t}.pk = s.pk "
           "WHEN MATCHED THEN DELETE")
    assert ds._latest_version(path) == v0


def test_merge_cdf_four_types(spark, ds):
    t = _seed_merge(ds, spark)
    ds.sql(f"ALTER TABLE {t} SET TBLPROPERTIES "
           "('enableChangeDataFeed'='true')")
    path = ds._table_path(TableRef(table=t))
    v = ds._latest_version(path)
    ds.sql(f"""
        MERGE INTO {t} t USING (
            SELECT 1 AS pk, 50.0 AS v UNION ALL SELECT 9, 9.0
        ) s ON t.pk = s.pk
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (pk, part, v) VALUES (s.pk, 'n', s.v)
        WHEN NOT MATCHED BY SOURCE AND t.pk = 3 THEN DELETE
    """)
    feed = ds.changes(TableRef(table=t), v)
    got = sorted((r["_change_type"], r["pk"], r["v"])
                 for r in feed.select("_change_type", "pk", "v").collect())
    assert got == [
        ("delete", 3, 30.0),
        ("insert", 9, 9.0),
        ("update_postimage", 1, 50.0),
        ("update_preimage", 1, 10.0),
    ]


def test_merge_schema_evolution_sql(spark, ds):
    t = _seed_merge(ds, spark)
    ds.sql(f"""
        MERGE WITH SCHEMA EVOLUTION INTO {t} t USING (
            SELECT 1 AS pk, 'M' AS flag UNION ALL SELECT 8, 'N'
        ) s ON t.pk = s.pk
        WHEN MATCHED THEN UPDATE SET flag = s.flag
        WHEN NOT MATCHED THEN INSERT (pk, flag) VALUES (s.pk, s.flag)
    """)
    assert _rows(ds.sql(f"SELECT pk, part, v, flag FROM {t}")) == [
        (1, "a", 10.0, "M"), (2, "a", 20.0, None),
        (3, "b", 30.0, None), (8, None, None, "N"),
    ]


def test_merge_identity_allocation_and_guard(spark, ds):
    t = _name("mrgid")
    ds.sql(f"CREATE TABLE {t} (id BIGINT, pk INT, v INT) USING txlog")
    ds.sql(f"ALTER TABLE {t} ALTER COLUMN id SET IDENTITY "
           "(START WITH 1 STEP 1)")
    ds.sql(f"INSERT INTO {t} VALUES (1, 10), (2, 20)")
    ds.sql(f"""
        MERGE INTO {t} USING (SELECT 2 AS pk, 99 AS v UNION ALL
                              SELECT 3, 30) s
        ON {t}.pk = s.pk
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (pk, v) VALUES (s.pk, s.v)
    """)
    rows = _rows(ds.sql(f"SELECT id, pk, v FROM {t}"))
    ids = [r[0] for r in rows]
    assert len(set(ids)) == 3 and all(i is not None for i in ids)
    assert sorted((r[1], r[2]) for r in rows) == [(1, 10), (2, 99), (3, 30)]
    with pytest.raises(DataSourceException, match="IDENTITY"):
        ds.sql(f"MERGE INTO {t} USING (SELECT 1 AS pk) s ON {t}.pk = s.pk "
               "WHEN MATCHED THEN UPDATE SET id = 0")
    with pytest.raises(DataSourceException, match="IDENTITY"):
        ds.sql(f"MERGE INTO {t} USING (SELECT 1 AS pk) s ON {t}.pk = s.pk "
               "WHEN NOT MATCHED THEN INSERT (id, pk) VALUES (0, 0)")


def test_merge_candidate_pruning_leaves_files_untouched(spark, ds):
    # files whose pk range cannot overlap the source are not rewritten
    t = _name("mrgprune")
    ds.sql(f"CREATE TABLE {t} (pk INT, v INT) USING txlog")
    ds.sql(f"INSERT INTO {t} VALUES (1, 1), (2, 2)")     # file A: pk 1-2
    ds.sql(f"INSERT INTO {t} VALUES (100, 100)")         # file B: pk 100
    path = ds._table_path(TableRef(table=t))
    before = set(resolve_snapshot(path).files)
    ds.sql(f"MERGE INTO {t} USING (SELECT 100 AS pk, 0 AS v) s "
           f"ON {t}.pk = s.pk WHEN MATCHED THEN UPDATE SET v = s.v")
    after = set(resolve_snapshot(path).files)
    kept = before & after
    assert len(kept) >= 1  # the pk-1..2 file survived byte-identical
    assert _rows(ds.sql(f"SELECT pk, v FROM {t}")) == [
        (1, 1), (2, 2), (100, 0),
    ]


def test_merge_source_txlog_table_and_generated_col(spark, ds):
    t = _name("mrggen")
    s = _name("mrgsrc")
    ds.sql(f"CREATE TABLE {t} (pk INT, v INT, v2 INT) USING txlog")
    ds.sql(f"ALTER TABLE {t} ALTER COLUMN v2 SET GENERATED ALWAYS AS (v * 2)")
    ds.sql(f"INSERT INTO {t} (pk, v) VALUES (1, 1), (2, 2)")
    ds.sql(f"CREATE TABLE {s} (pk INT, v INT) USING txlog")
    ds.sql(f"INSERT INTO {s} VALUES (2, 22), (3, 33)")
    ds.sql(f"""
        MERGE INTO {t} USING {s} ON {t}.pk = {s}.pk
        WHEN MATCHED THEN UPDATE SET v = {s}.v
        WHEN NOT MATCHED THEN INSERT (pk, v) VALUES ({s}.pk, {s}.v)
    """)
    # generated column recomputed for the update AND the insert
    assert _rows(ds.sql(f"SELECT pk, v, v2 FROM {t}")) == [
        (1, 1, 2), (2, 22, 44), (3, 33, 66),
    ]


def test_golden_update_upsert_flow_pure_sql(spark, ds):
    """The reference's golden update/upsert flow driven ONLY through
    sql() — no API write calls — and cross-checked against the API
    merge on an identical twin table."""
    t_sql = _name("gold_sql")
    t_api = _name("gold_api")
    base = [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)]
    src = [(2, "a", 222.0), (4, "c", 444.0)]
    for t in (t_sql, t_api):
        ds.sql(f"CREATE TABLE {t} (pk BIGINT, part STRING, v DOUBLE) "
               "USING txlog")
    vals = ", ".join(f"({a}, '{b}', {c})" for a, b, c in base)
    ds.sql(f"INSERT INTO {t_sql} VALUES {vals}")
    ds.append(spark.createDataFrame(base, "pk bigint, part string, v double"),
              TableRef(table=t_api))
    # upsert: API MergeSpec semantics == SQL MERGE with the quirk-free
    # full-column insert
    ds.sql(f"""
        MERGE INTO {t_sql} t USING (
            SELECT * FROM VALUES (2, 'a', 222.0), (4, 'c', 444.0)
            AS s(pk, part, v)
        ) s ON t.pk = s.pk
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (pk, part, v) VALUES (s.pk, s.part, s.v)
    """)
    ds.merge(
        spark.createDataFrame(src, "pk bigint, part string, v double"),
        TableRef(table=t_api),
        MergeSpec(["pk"], ["v", "part"], insert_when_not_matched=True),
    )
    assert _rows(ds.sql(f"SELECT pk, part, v FROM {t_sql}")) == \
        _rows(ds.sql(f"SELECT pk, part, v FROM {t_api}"))


def test_merge_non_equi_on_falls_back_to_full_candidates(spark, ds):
    t = _seed_merge(ds, spark)
    # range ON condition: no equi key to prune with — still correct
    ds.sql(f"""
        MERGE INTO {t} t USING (SELECT 25.0 AS lo) s ON t.v > s.lo
        WHEN MATCHED THEN UPDATE SET v = 0.0
    """)
    assert _rows(ds.sql(f"SELECT pk, v FROM {t}")) == [
        (1, 10.0), (2, 20.0), (3, 0.0),
    ]


def test_merge_by_source_disables_key_pruning(spark, ds):
    # a by-source clause acts on EXACTLY the rows key-range pruning
    # would skip — pruned files must stay candidates (review finding)
    t = _name("mrgbsp")
    ds.sql(f"CREATE TABLE {t} (pk INT, v INT) USING txlog")
    ds.sql(f"INSERT INTO {t} VALUES (1, 1), (2, 2)")      # file A: 1-2
    ds.sql(f"INSERT INTO {t} VALUES (100, 100)")          # file B: 100
    ds.sql(f"""
        MERGE INTO {t} USING (SELECT 1 AS pk, 0 AS v) s ON {t}.pk = s.pk
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED BY SOURCE THEN DELETE
    """)
    assert _rows(ds.sql(f"SELECT pk, v FROM {t}")) == [(1, 0)], \
        "by-source DELETE must reach rows in key-pruned files"
    # degenerate: empty source + by-source DELETE clears the table
    ds.sql(f"INSERT INTO {t} VALUES (5, 5)")
    ds.sql(f"""
        MERGE INTO {t} USING (SELECT CAST(NULL AS INT) AS pk
                              WHERE 1 = 0) s
        ON {t}.pk = s.pk
        WHEN NOT MATCHED BY SOURCE THEN DELETE
    """)
    assert _rows(ds.sql(f"SELECT pk FROM {t}")) == []


def test_merge_parser_literals_and_case_when(spark, ds):
    # ')' inside a string literal of the source subquery (review
    # finding: the close-paren scan must honor literals)
    t = _name("mrglit")
    ds.sql(f"CREATE TABLE {t} (pk INT, tag STRING) USING txlog")
    ds.sql(f"INSERT INTO {t} VALUES (1, 'x')")
    ds.sql(f"""
        MERGE INTO {t} USING (SELECT 1 AS pk, ')' AS tag) s
        ON {t}.pk = s.pk
        WHEN MATCHED THEN UPDATE SET tag = s.tag
    """)
    assert _rows(ds.sql(f"SELECT pk, tag FROM {t}")) == [(1, ")")]
    # unparenthesized CASE WHEN in a clause condition must not split
    # the clause (review finding)
    ds.sql(f"""
        MERGE INTO {t} USING (SELECT 1 AS pk, 7 AS x) s ON {t}.pk = s.pk
        WHEN MATCHED AND CASE WHEN s.x > 0 THEN true ELSE false END
            THEN UPDATE SET tag = 'case-hit'
    """)
    assert _rows(ds.sql(f"SELECT tag FROM {t}")) == [("case-hit",)]


def test_insert_replace_where(spark, ds):
    """INSERT INTO t REPLACE WHERE cond <source> (Delta's
    predicate-scoped atomic replacement): matching rows replaced by
    the source in one commit; new rows must satisfy the predicate;
    OVERWRITE / PARTITION composition refused."""
    t = _name()
    ds.sql(f"CREATE TABLE {t} (id INT, part STRING) USING txlog")
    ds.sql(f"INSERT INTO {t} VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    ds.sql(f"INSERT INTO {t} REPLACE WHERE part = 'a' "
           "VALUES (9, 'a'), (10, 'a')")
    assert _rows(ds.sql(f"SELECT id, part FROM {t}")) == [
        (2, "b"), (9, "a"), (10, "a"),
    ]
    # a replacement row violating the predicate refuses (Delta's rule)
    with pytest.raises(Exception, match="replace_where|replaceWhere|match"):
        ds.sql(f"INSERT INTO {t} REPLACE WHERE part = 'a' VALUES (5, 'z')")
    # SELECT source + string predicate with a quoted literal
    ds.sql(f"INSERT INTO {t} REPLACE WHERE part = 'b' "
           f"SELECT id + 100, part FROM {t} WHERE part = 'b'")
    assert _rows(ds.sql(f"SELECT id FROM {t} WHERE part = 'b'")) == [(102,)]
    with pytest.raises(DataSourceException, match="REPLACE WHERE"):
        ds.sql(f"INSERT OVERWRITE {t} REPLACE WHERE part = 'a' VALUES (1, 'a')")
    with pytest.raises(DataSourceException, match="REPLACE WHERE"):
        ds.sql(f"INSERT INTO {t} REPLACE WHERE part = 'a'")


# -- round-9 SQL surface: RENAME TO / SHOW PARTITIONS / views ---------------


def test_alter_table_rename_to(spark, ds):
    name, name2 = "rn_src_t", "rn_dst_t"
    ds._execute_statement(f"CREATE TABLE {name} (pk int, v int) USING txlog")
    try:
        ds._execute_statement(
            f"INSERT INTO {name} VALUES (1, 10), (2, 20)"
        )
        ds._execute_statement(f"ALTER TABLE {name} RENAME TO {name2}")
        out = ds._execute_statement(
            f"SELECT sum(v) AS s FROM {name2}"
        ).collect()
        assert [tuple(r) for r in out] == [(30,)]
        assert name not in ds._known_names()
        with pytest.raises(DataSourceException, match="already exists"):
            ds._execute_statement(
                f"CREATE TABLE {name2} (pk int) USING txlog"
            )
            ds.rename_table(TableRef(table=name2), name2)
        with pytest.raises(DataSourceException, match="unknown"):
            ds.rename_table(TableRef(table=name), name2)
    finally:
        ds.drop_table(TableRef(table=name2))
        ds.drop_table(TableRef(table=name))


def test_show_partitions_typed_columns(spark, ds):
    name = "shp_t"
    ds._execute_statement(
        f"CREATE TABLE {name} (pk int, part string, d int) USING txlog "
        "PARTITIONED BY (part, d)"
    )
    try:
        ds._execute_statement(
            f"INSERT INTO {name} VALUES (1,'a',1),(2,'a',2),(3,'b',1),"
            "(4,'b',1)"
        )
        out = ds._execute_statement(f"SHOW PARTITIONS {name}")
        # reference D1 contract: one column PER partition column
        assert out.columns == ["part", "d"]
        assert dict(out.dtypes)["d"] == "int"  # typed, not stringly
        assert sorted(map(tuple, out.collect())) == [
            ("a", 1), ("a", 2), ("b", 1)
        ]
    finally:
        ds.drop_table(TableRef(table=name))


def test_show_partitions_unpartitioned_sniffable_error(spark, ds):
    name = "shp_flat"
    ds._execute_statement(f"CREATE TABLE {name} (pk int) USING txlog")
    try:
        # the reference string-matches 'not partitioned' out of the
        # error message (etl/overwrite.py:14-18)
        with pytest.raises(DataSourceException, match="not partitioned"):
            ds._execute_statement(f"SHOW PARTITIONS {name}")
    finally:
        ds.drop_table(TableRef(table=name))


def test_create_view_reads_current_snapshot(spark, ds):
    name, view = "vw_t", "vw_totals"
    ds._execute_statement(f"CREATE TABLE {name} (pk int, v int) USING txlog")
    try:
        ds._execute_statement(f"INSERT INTO {name} VALUES (1, 10)")
        ds._execute_statement(
            f"CREATE VIEW {view} AS SELECT sum(v) AS s FROM {name}"
        )
        assert ds._execute_statement(
            f"SELECT s FROM {view}"
        ).collect()[0][0] == 10
        # the view follows the TABLE, not its creation-time snapshot
        ds._execute_statement(f"INSERT INTO {name} VALUES (2, 5)")
        assert ds._execute_statement(
            f"SELECT s FROM {view}"
        ).collect()[0][0] == 15
        # persistent: a fresh datasource instance sees it
        ds2 = init_datasource("txlog", spark)
        assert ds2._execute_statement(
            f"SELECT s FROM {view}"
        ).collect()[0][0] == 15
        # OR REPLACE + view-over-view + DROP
        ds._execute_statement(
            f"CREATE OR REPLACE VIEW {view} AS "
            f"SELECT sum(v) * 2 AS s FROM {name}"
        )
        ds._execute_statement(
            f"CREATE TEMPORARY VIEW {view}_2x AS "
            f"SELECT s + 1 AS s1 FROM {view}"
        )
        assert ds._execute_statement(
            f"SELECT s1 FROM {view}_2x"
        ).collect()[0][0] == 31
        with pytest.raises(DataSourceException, match="already exists"):
            ds._execute_statement(
                f"CREATE VIEW {view} AS SELECT 1 AS one FROM {name}"
            )
    finally:
        ds._execute_statement(f"DROP VIEW IF EXISTS {view}_2x")
        ds._execute_statement(f"DROP VIEW IF EXISTS {view}")
        ds.drop_table(TableRef(table=name))
    assert view not in ds._known_views()


def test_create_view_validates_and_guards_cycles(spark, ds):
    name = "vwv_t"
    ds._execute_statement(f"CREATE TABLE {name} (pk int) USING txlog")
    try:
        with pytest.raises(Exception):  # analysis error at CREATE time
            ds._execute_statement(
                f"CREATE VIEW vwv_bad AS SELECT nope FROM {name}"
            )
        assert "vwv_bad" not in ds._known_views()
        ds._execute_statement(
            f"CREATE TEMPORARY VIEW vwv_a AS SELECT pk FROM {name}"
        )
        # self-referential redefinition -> cycle guard at query time
        ds._temp_views()["vwv_a"] = "SELECT pk FROM vwv_a"
        with pytest.raises(DataSourceException, match="cycle"):
            ds._execute_statement("SELECT * FROM vwv_a").collect()
        ds.drop_view("vwv_a")
    finally:
        ds.drop_table(TableRef(table=name))


def test_show_views_and_describe_view(spark, ds):
    name, v = "svw_t", "svw_view"
    ds._execute_statement(f"CREATE TABLE {name} (pk int, v int) USING txlog")
    try:
        ds._execute_statement(f"INSERT INTO {name} VALUES (1, 10)")
        ds._execute_statement(
            f"CREATE VIEW {v} AS SELECT pk, v * 2 AS v2 FROM {name}"
        )
        ds._execute_statement(
            f"CREATE TEMPORARY VIEW {v}_tmp AS SELECT pk FROM {v}"
        )
        out = ds._execute_statement("SHOW VIEWS")
        # Spark's listing shape, with both registries present
        assert out.columns == ["namespace", "viewName", "isTemporary"]
        rows = {(r.viewName, r.isTemporary) for r in out.collect()}
        assert (v, False) in rows and (f"{v}_tmp", True) in rows
        desc = ds._execute_statement(f"DESCRIBE VIEW {v}").collect()
        got = {r.col_name: r.data_type for r in desc}
        assert got["pk"] == "int" and got["v2"] == "int"
        assert name in got["# definition"]
        with pytest.raises(DataSourceException, match="unknown view"):
            ds.describe_view("nope_view")
    finally:
        ds._execute_statement(f"DROP VIEW IF EXISTS {v}_tmp")
        ds._execute_statement(f"DROP VIEW IF EXISTS {v}")
        ds.drop_table(TableRef(table=name))


def test_view_expansion_never_clobbers_user_temp_view(spark, ds):
    """Round-10 ADVICE: view expansion materializes under a MANGLED
    temp-view name and substitutes it into the statement, so a user's
    same-named session temp view survives txlog queries."""
    name, v = "vwm_t", "vwm_view"
    ds._execute_statement(f"CREATE TABLE {name} (pk int, v int) USING txlog")
    try:
        ds._execute_statement(f"INSERT INTO {name} VALUES (1, 10), (2, 5)")
        ds._execute_statement(
            f"CREATE VIEW {v} AS SELECT sum(v) AS s FROM {name}"
        )
        # the user's OWN Spark temp view under the same identifier
        spark.range(1).selectExpr("id AS marker").createOrReplaceTempView(v)
        # txlog SQL referencing the name resolves to the txlog view...
        assert ds._execute_statement(
            f"SELECT s FROM {v}"
        ).collect()[0][0] == 15
        # ...while the user's temp view is untouched (pre-fix the
        # expansion ran createOrReplaceTempView under the RAW name)
        assert spark.table(v).columns == ["marker"]
    finally:
        spark.catalog.dropTempView(v)
        ds._execute_statement(f"DROP VIEW IF EXISTS {v}")
        ds.drop_table(TableRef(table=name))


def test_rename_to_rejects_view_name_collision(spark, ds):
    """Round-10 ADVICE: RENAME TO must not hand one identifier to both
    registries (view expansion would then shadow the renamed table)."""
    name, v = "rnv_t", "rnv_view"
    ds._execute_statement(f"CREATE TABLE {name} (pk int) USING txlog")
    try:
        ds._execute_statement(f"INSERT INTO {name} VALUES (1)")
        ds._execute_statement(
            f"CREATE VIEW {v} AS SELECT pk FROM {name}"
        )
        with pytest.raises(DataSourceException, match="VIEW"):
            ds._execute_statement(f"ALTER TABLE {name} RENAME TO {v}")
        ds._execute_statement(
            f"CREATE TEMPORARY VIEW {v}_tmp AS SELECT pk FROM {name}"
        )
        with pytest.raises(DataSourceException, match="VIEW"):
            ds.rename_table(TableRef(table=name), f"{v}_tmp")
        # table still addressable under its original name
        assert ds._execute_statement(
            f"SELECT pk FROM {name}"
        ).collect()[0][0] == 1
    finally:
        ds._execute_statement(f"DROP VIEW IF EXISTS {v}_tmp")
        ds._execute_statement(f"DROP VIEW IF EXISTS {v}")
        ds.drop_table(TableRef(table=name))
