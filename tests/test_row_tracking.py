"""Row tracking (Delta's ``rowTracking`` parity): stable row ids
assigned at commit (``baseRowId`` riding each add action + a
``rowIdHighWaterMark`` action, both through the one ``_commit`` choke
point), surfaced as ``_row_id`` / ``_row_commit_version`` metadata
columns, preserved across every rewrite path — OPTIMIZE / CLUSTER /
COMPACT / REORG PURGE (dataChange=false), CoW UPDATE / DELETE, MERGE
(CoW and merge-on-read), RESTORE and CLONE."""

import pytest
from pyspark.sql import functions as F

from x_spark.errors import DataSourceException
from x_spark.sources import init_datasource
from x_spark.sources.base import MergeSpec, TableRef
from x_spark.sources.txlog import (
    CDF_ENABLE_KEY,
    DV_ENABLE_KEY,
    ROW_TRACKING_KEY,
    resolve_snapshot,
)


@pytest.fixture()
def ds(spark):
    return init_datasource("txlog", spark)


def _ids(ds, ref):
    """{pk: (_row_id, _row_commit_version)} — pk is unique in these
    fixtures, so the map captures per-row identity."""
    return {
        r.pk: (r._row_id, r._row_commit_version)
        for r in ds.with_row_ids(ref).collect()
    }


def _mk(spark, ds, tmp_path, n=6, dv=False, enable_first=True, part=False):
    ref = TableRef(path=str(tmp_path / "t"),
                   partition_by=(["g"] if part else []))
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", i * 10) for i in range(n)],
        "pk int, g string, v int",
    )
    if enable_first:
        ds.create(ref, df.schema, partition_by=ref.partition_by)
        props = {ROW_TRACKING_KEY: "true"}
        if dv:
            props[DV_ENABLE_KEY] = "true"
        ds.set_properties(ref, props)
        ds.append(df.repartition(2), ref)
    else:
        ds.append(df.repartition(2), ref)
    return ref


def test_assignment_dense_unique_and_watermark(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path)
    got = _ids(ds, ref)
    ids = sorted(i for i, _ in got.values())
    assert ids == list(range(6)), "first assignment is dense from 0"
    snap = resolve_snapshot(ref.path)
    assert snap.row_id_high == 5
    # second append continues beyond the mark
    ds.append(spark.createDataFrame([(100, "c", 1), (101, "c", 2)],
                                    "pk int, g string, v int"), ref)
    got2 = _ids(ds, ref)
    assert sorted(i for i, _ in got2.values()) == list(range(8))
    assert {p: got2[p] for p in got} == got, "old rows untouched"
    assert resolve_snapshot(ref.path).row_id_high == 7


def test_enable_on_existing_table_backfills_invisibly(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path, enable_first=False)
    ds.set_properties(ref, {CDF_ENABLE_KEY: "true"})
    v = resolve_snapshot(ref.path).version
    ds.set_properties(ref, {ROW_TRACKING_KEY: "true"})
    got = _ids(ds, ref)
    assert sorted(i for i, _ in got.values()) == list(range(6))
    # the backfill re-emission is dataChange=false: invisible to CDF
    assert ds.changes(ref, v).count() == 0


def test_maintenance_rewrites_preserve_ids(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path)
    for i in range(3):  # small-file debt
        ds.append(spark.createDataFrame([(50 + i, "c", i)],
                                        "pk int, g string, v int")
                  .coalesce(1), ref)
    before = _ids(ds, ref)
    assert ds.optimize(ref, target_size_mb=128)["rewritten"] >= 2
    assert _ids(ds, ref) == before, "OPTIMIZE must preserve ids AND rcv"
    ds.cluster(ref, ["pk"], target_files=2)
    assert _ids(ds, ref) == before, "CLUSTER must preserve ids AND rcv"
    ds.compact(ref, target_files=1)
    assert _ids(ds, ref) == before, "COMPACT must preserve ids AND rcv"


def test_purge_preserves_ids(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path, dv=True)
    before = _ids(ds, ref)
    ds.delete(ref, "pk = 1")          # DV mask, no rewrite
    after_del = _ids(ds, ref)
    assert after_del == {p: v for p, v in before.items() if p != 1}
    assert ds.purge_dvs(ref) > 0
    assert _ids(ds, ref) == after_del, "PURGE must preserve ids AND rcv"


def test_update_keeps_id_and_stamps_new_version(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path)
    before = _ids(ds, ref)
    ds.update(ref, {"v": "v + 1"}, "pk = 2")
    v_upd = resolve_snapshot(ref.path).version
    after = _ids(ds, ref)
    assert after[2][0] == before[2][0], "updated row keeps its id"
    assert after[2][1] == v_upd, "updated row's rcv is the UPDATE commit"
    for p in before:
        if p != 2:
            assert after[p] == before[p], \
                "co-located untouched rows keep id AND old rcv"


def test_update_with_dv_keeps_id(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path, dv=True)
    before = _ids(ds, ref)
    ds.update(ref, {"v": "v + 1"}, "pk = 2")
    v_upd = resolve_snapshot(ref.path).version
    after = _ids(ds, ref)
    assert after[2] == (before[2][0], v_upd)
    assert {p: v for p, v in after.items() if p != 2} == \
        {p: v for p, v in before.items() if p != 2}


def test_delete_cow_preserves_survivors(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path)
    before = _ids(ds, ref)
    ds.delete(ref, "pk in (0, 5)")
    assert _ids(ds, ref) == {p: v for p, v in before.items()
                             if p not in (0, 5)}


@pytest.mark.parametrize("dv", [False, True])
def test_merge_keeps_matched_ids_and_mints_insert_ids(spark, ds,
                                                      tmp_path, dv):
    ref = _mk(spark, ds, tmp_path, dv=dv)
    before = _ids(ds, ref)
    src = spark.createDataFrame([(2, 222), (99, 990)], "pk int, v int")
    ds.merge(src, ref, MergeSpec(["pk"], ["v"],
                                 insert_when_not_matched=True))
    v_m = resolve_snapshot(ref.path).version
    after = _ids(ds, ref)
    assert after[2] == (before[2][0], v_m), \
        "matched row keeps id, rcv = merge commit"
    for p in before:
        if p != 2:
            assert after[p] == before[p], "kept rows keep id and rcv"
    new_id, new_rcv = after[99]
    assert new_rcv == v_m
    assert new_id not in {i for i, _ in before.values()}, \
        "inserted row minted a FRESH id"
    assert len({i for i, _ in after.values()}) == len(after), "unique"


def test_restore_and_watermark_never_regress(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path)
    v1 = resolve_snapshot(ref.path).version
    before = _ids(ds, ref)
    ds.delete(ref, "pk = 0")
    ds.append(spark.createDataFrame([(7, "x", 7)],
                                    "pk int, g string, v int"), ref)
    high = resolve_snapshot(ref.path).row_id_high
    ds.restore(ref, v1)
    assert _ids(ds, ref) == before, "RESTORE re-asserts the old ids"
    assert resolve_snapshot(ref.path).row_id_high == high, \
        "the watermark survives RESTORE (ids are never re-minted)"
    ds.append(spark.createDataFrame([(8, "y", 8)],
                                    "pk int, g string, v int"), ref)
    after = _ids(ds, ref)
    assert after[8][0] > high - 1
    assert len({i for i, _ in after.values()}) == len(after)


def test_clone_carries_ids(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path)
    dst = TableRef(path=str(tmp_path / "c"))
    ds.clone(ref, dst)
    assert _ids(ds, dst) == _ids(ds, ref)


def test_sql_merge_into_preserves_ids(spark, ds, tmp_path):
    import uuid

    t = f"rt_{uuid.uuid4().hex[:8]}"
    ds.sql(f"CREATE TABLE {t} (pk INT, v INT) USING txlog "
           f"TBLPROPERTIES ('{ROW_TRACKING_KEY}'='true')")
    ds.sql(f"INSERT INTO {t} VALUES (1, 10), (2, 20), (3, 30)")
    ref = TableRef(table=t)
    before = _ids(ds, ref)
    ds.sql(f"""
        MERGE INTO {t} USING (SELECT 2 AS pk, 99 AS v UNION ALL
                              SELECT 9, 90) s
        ON {t}.pk = s.pk
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (pk, v) VALUES (s.pk, s.v)
        WHEN NOT MATCHED BY SOURCE AND {t}.pk = 3 THEN DELETE
    """)
    after = _ids(ds, ref)
    assert after[1] == before[1], "kept row: id AND rcv preserved"
    assert after[2][0] == before[2][0], "updated row keeps its id"
    assert 3 not in after
    assert after[9][0] not in {i for i, _ in before.values()}
    assert len({i for i, _ in after.values()}) == len(after)


def test_reserved_names_and_disabled_read(spark, ds, tmp_path):
    ref = TableRef(path=str(tmp_path / "t"))
    ds.append(spark.createDataFrame([(1, 2)], "pk int, _x_row_id int"),
              ref)
    with pytest.raises(DataSourceException, match="reserved"):
        ds.set_properties(ref, {ROW_TRACKING_KEY: "true"})
    ref2 = TableRef(path=str(tmp_path / "t2"))
    ds.append(spark.createDataFrame([(1,)], "pk int"), ref2)
    with pytest.raises(DataSourceException, match="row tracking"):
        ds.with_row_ids(ref2)


def test_partitioned_table_ids(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path, part=True)
    got = _ids(ds, ref)
    assert sorted(i for i, _ in got.values()) == list(range(6))
    before = _ids(ds, ref)
    ds.update(ref, {"v": "v + 1"}, "g = 'a'")
    after = _ids(ds, ref)
    assert {p: after[p][0] for p in after} == \
        {p: before[p][0] for p in before}


# -- row-id-paired derived CDF ---------------------------------------------
# Row tracking upgrades the derived change feed (no enableChangeDataFeed)
# from file-granular delete+insert noise to a ROW-EXACT feed: rewrite
# commits pair removed and added rows on their stable id.


def _feed(ds, ref, from_v):
    return sorted(
        (r.pk, r._change_type, r._commit_version)
        for r in ds.changes(ref, from_version=from_v).collect()
    )


def test_derived_cdf_update_pairs_by_row_id(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path)  # pks 0-5 across 2 files
    v0 = resolve_snapshot(ref.path).version
    ds.update(ref, {"v": "v + 1"}, "pk = 2")  # rewrites a whole file
    feed = _feed(ds, ref, v0)
    # ONLY the matched row appears — co-located unchanged rows paired out
    assert feed == [
        (2, "update_postimage", v0 + 1),
        (2, "update_preimage", v0 + 1),
    ]
    pre = [r for r in ds.changes(ref, from_version=v0).collect()
           if r._change_type == "update_preimage"]
    post = [r for r in ds.changes(ref, from_version=v0).collect()
            if r._change_type == "update_postimage"]
    assert pre[0].v == 20 and post[0].v == 21


def test_derived_cdf_delete_pairs_out_survivors(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path)
    v0 = resolve_snapshot(ref.path).version
    ds.delete(ref, "pk = 4")  # CoW rewrite of the file holding pk 4
    assert _feed(ds, ref, v0) == [(4, "delete", v0 + 1)]


def test_derived_cdf_merge_pairs_updates_and_inserts(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path)
    v0 = resolve_snapshot(ref.path).version
    src = spark.createDataFrame(
        [(0, "a", 99), (100, "z", 1000)], "pk int, g string, v int"
    )
    ds.merge(src, ref, MergeSpec(["pk"], ["v"],
                                 insert_when_not_matched=True))
    feed = _feed(ds, ref, v0)
    assert feed == [
        (0, "update_postimage", v0 + 1),
        (0, "update_preimage", v0 + 1),
        (100, "insert", v0 + 1),
    ]


def test_derived_cdf_fold_still_matches_semantic_diff(spark, ds, tmp_path):
    ref = _mk(spark, ds, tmp_path)
    v0 = resolve_snapshot(ref.path).version
    ds.update(ref, {"v": "v * 2"}, "pk >= 3")
    ds.delete(ref, "pk = 0")
    diff = {(r.pk, r.v): r.net
            for r in ds.semantic_diff(ref, from_version=v0)
            .select("pk", "v", "net").collect()}
    assert diff == {(0, 0): -1, (3, 30): -1, (3, 60): 1,
                    (4, 40): -1, (4, 80): 1, (5, 50): -1, (5, 100): 1}


def test_derived_cdf_pre_tracking_interval_falls_back(spark, ds, tmp_path):
    """Files written before enablement lack ids: that interval keeps
    the documented file-granular derivation instead of mis-pairing."""
    ref = TableRef(path=str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, "a", i * 10) for i in range(4)], "pk int, g string, v int"
    )
    ds.append(df.coalesce(1), ref)
    v0 = resolve_snapshot(ref.path).version
    ds.update(ref, {"v": "v + 1"}, "pk = 1")  # rewrite WITHOUT ids
    feed = _feed(ds, ref, v0)
    # file-granular: every co-located row emits delete+insert
    kinds = {k for _, k, _ in feed}
    assert kinds == {"insert", "delete"}
    assert len(feed) == 8


def test_derived_cdf_map_column_falls_back(spark, ds, tmp_path):
    """eqNullSafe cannot order MapType: a map column anywhere in the
    schema keeps the plain file-granular derivation instead of
    crashing the paired path."""
    ref = TableRef(path=str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, {"k": i}) for i in range(4)], "pk int, m map<string,int>"
    )
    ds.create(ref, df.schema)
    ds.set_properties(ref, {ROW_TRACKING_KEY: "true"})
    ds.append(df.coalesce(1), ref)
    v0 = resolve_snapshot(ref.path).version
    ds.delete(ref, "pk = 1")
    feed = ds.changes(ref, from_version=v0)
    kinds = sorted({r._change_type for r in feed.collect()})
    assert kinds == ["delete", "insert"]  # file-granular, no crash
