"""Spark Python DataSource over txlog tables (format("txlog")):
batch + version travel + partition-filter file pruning + streaming
micro-batches along the version axis.
"""

import pytest

from x_spark.errors import DataSourceException
from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef
from x_spark.sources.txlog_datasource import TxLogBatchReader, TxLogSparkDataSource


@pytest.fixture()
def ds(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TxLogSparkDataSource)
    return init_datasource("txlog", spark)


def _seed(spark, ds, ref, rows):
    ds.append(spark.createDataFrame(rows, "pk int, part string, v int"), ref)


def test_batch_read_and_version_travel(spark, ds, tmp_path):
    ref = TableRef(path=str(tmp_path / "t"), partition_by=["part"])
    _seed(spark, ds, ref, [(1, "a", 10), (2, "b", 20)])
    _seed(spark, ds, ref, [(3, "a", 30)])
    df = spark.read.format("txlog").option("path", ref.path).load()
    assert sorted(map(tuple, df.collect())) == [
        (1, "a", 10), (2, "b", 20), (3, "a", 30),
    ]
    v1 = (
        spark.read.format("txlog")
        .option("path", ref.path)
        .option("versionAsOf", 1)
        .load()
    )
    assert v1.count() == 2
    # connector read and datasource read agree
    assert sorted(map(tuple, ds.read(ref).collect())) == sorted(
        map(tuple, df.collect())
    )


def test_partition_filter_prunes_files(spark, ds, tmp_path):
    ref = TableRef(path=str(tmp_path / "t"), partition_by=["part"])
    _seed(spark, ds, ref, [(1, "a", 10), (2, "b", 20), (3, None, 30)])
    df = (spark.read.format("txlog").option("path", ref.path)
          .option("filePruning", "true").load())
    assert sorted(map(tuple, df.filter("part = 'a'").collect())) == [(1, "a", 10)]
    assert sorted(map(tuple, df.filter("part IS NULL").collect())) == [(3, None, 30)]
    # prune really happens at the file level: reader sees 1 partition
    from x_spark.sources.txlog import resolve_snapshot

    snap = resolve_snapshot(ref.path)
    reader = TxLogBatchReader(ref.path, snap.schema, None, prune=True)

    class EqualTo:
        def __init__(self, attribute, value):
            self.attribute = attribute
            self.value = value

    reader.pushFilters([EqualTo(("part",), "a")])
    parts = reader.partitions()
    assert len(parts) == 1
    assert all(p.partition_values.get("part") == "a" for p in parts)
    # consume-and-clear: a later scan that pushes NO filters must see
    # every file again (the reader outlives one query — stale pruning
    # leaking into the next scan silently dropped rows)
    assert len(reader.partitions()) == 3
    # pruning is OPT-IN: the default reader never prunes
    default_reader = TxLogBatchReader(ref.path, snap.schema, None)
    default_reader.pushFilters([EqualTo(("part",), "a")])
    assert len(default_reader.partitions()) == 3


def test_prune_state_does_not_leak_across_scans(spark, ds, tmp_path):
    """Spark 4.1 caches the post-pushdown partition list on the SHARED
    PythonDataSourceV2 provider (setReadInfo / getOrCreateReadInfo) —
    with file pruning on by default, a filtered scan would poison every
    later filterless scan of the same loaded DataFrame into silently
    dropping rows. Pruning therefore defaults OFF; this pins the
    default's correctness on exactly that access pattern."""
    ref = TableRef(path=str(tmp_path / "t"), partition_by=["part"])
    _seed(spark, ds, ref, [(1, "a", 10), (2, "b", 20), (3, "b", 30)])
    df = spark.read.format("txlog").option("path", ref.path).load()
    assert df.filter("part = 'a'").count() == 1
    # the SAME loaded DataFrame, now filterless: full row set
    assert df.count() == 3
    assert df.selectExpr("sum(v)").first()[0] == 60


def test_streaming_reads_appends_as_microbatches(spark, ds, tmp_path):
    ref = TableRef(path=str(tmp_path / "t"))
    _seed(spark, ds, ref, [(1, "a", 10)])
    _seed(spark, ds, ref, [(2, "b", 20)])
    sdf = spark.readStream.format("txlog").option("path", ref.path).load()
    q = (
        sdf.writeStream.format("memory").queryName("txlog_stream_t")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert sorted(map(tuple, spark.table("txlog_stream_t").collect())) == [
        (1, "a", 10), (2, "b", 20),
    ]


def test_stream_rate_limit_offsets(spark, ds, tmp_path):
    """maxFilesPerTrigger / maxVersionsPerTrigger: latestOffset
    advances only to a commit boundary within the admission budget, and
    repeated calls walk the whole backlog — no version skipped, none
    split."""
    from x_spark.sources.txlog import resolve_snapshot
    from x_spark.sources.txlog_datasource import TxLogStreamReader

    ref = TableRef(path=str(tmp_path / "t"))

    def seed1(rows):  # exactly ONE add action per append
        ds.append(
            spark.createDataFrame(rows, "pk int, part string, v int")
            .coalesce(1),
            ref,
        )

    seed1([(1, "a", 10)])                                      # v1: 1 file
    seed1([(2, "b", 20)])                                      # v2: 1 file
    seed1([(3, "c", 30)])                                      # v3: 1 file
    ds.append(                                                 # v4: 2 files
        spark.createDataFrame([(4, "d", 40), (5, "e", 50)],
                              "pk int, part string, v int").repartition(2),
        ref,
    )
    snap = resolve_snapshot(ref.path)
    schema = snap.schema
    adds_by_version = {1: 1, 2: 1, 3: 1, 4: 2}
    assert len(snap.files) == sum(adds_by_version.values())

    r = TxLogStreamReader(ref.path, schema, {"maxFilesPerTrigger": "2"})
    assert r.initialOffset() == {"version": 0}
    assert r.latestOffset() == {"version": 2}   # v1+v2 = 2 files
    # v3 (1 file) under budget, v4 tips it — admitted to the boundary
    assert r.latestOffset() == {"version": 4}
    assert r.latestOffset() == {"version": 4}   # drained: stable

    r = TxLogStreamReader(ref.path, schema, {"maxVersionsPerTrigger": "1"})
    r.initialOffset()                           # fresh start anchors at 0
    assert [r.latestOffset()["version"] for _ in range(5)] == [1, 2, 3, 4, 4]
    # progress guarantee: a version larger than the file budget still
    # admits (at least one version per batch)
    r = TxLogStreamReader(ref.path, schema, {"maxFilesPerTrigger": "1"})
    r._pos, r._anchored = 3, True
    assert r.latestOffset() == {"version": 4}

    # a replayed batch advances the cursor past served offsets
    r = TxLogStreamReader(ref.path, schema, {"maxFilesPerTrigger": "1"})
    parts = r.partitions({"version": 0}, {"version": 3})
    assert len(parts) == 3
    assert r.latestOffset() == {"version": 4}   # not re-admitting v1


def test_stream_rate_limit_restart_never_regresses(spark, ds, tmp_path):
    """Query-restart contract: a fresh reader whose first call is
    latestOffset() (all prior batches committed — the engine replays
    nothing, so no partitions() anchors the cursor) must NOT return an
    offset below the checkpointed committed one. Capping from the
    unanchored startingVersion cursor used to re-walk from version 0
    and hand back a regressed end offset, silently re-emitting every
    processed version as duplicates."""
    from x_spark.sources.txlog import resolve_snapshot
    from x_spark.sources.txlog_datasource import TxLogStreamReader

    ref = TableRef(path=str(tmp_path / "t"))
    for i in range(4):                                         # v1..v4
        ds.append(spark.createDataFrame([(i, "a", i * 10)],
                                        "pk int, part string, v int")
                  .coalesce(1), ref)
    schema = resolve_snapshot(ref.path).schema

    # run 1: processed + committed through v3 (engine checkpoint)
    # run 2 (restart): fresh reader, first call is latestOffset()
    r = TxLogStreamReader(ref.path, schema,
                          {"maxVersionsPerTrigger": "1"})
    off = r.latestOffset()
    assert off == {"version": 4}, "unanchored latestOffset must be uncapped"
    # engine then plans (3, 4] from its checkpoint — anchors the cursor
    parts = r.partitions({"version": 3}, off)
    assert len(parts) == 1                      # only v4's file, no replay
    # commit anchors too, and subsequent triggers rate-limit again
    r.commit(off)
    for pk, pt in ((9, "z"), (8, "y")):                        # v5, v6
        ds.append(spark.createDataFrame([(pk, pt, pk * 10)],
                                        "pk int, part string, v int")
                  .coalesce(1), ref)
    assert r.latestOffset() == {"version": 5}   # capped from the anchor
    assert r.latestOffset() == {"version": 6}

    # restart where commit() is the first anchoring call
    r2 = TxLogStreamReader(ref.path, schema, {"maxFilesPerTrigger": "1"})
    r2.commit({"version": 5})
    assert r2.latestOffset() == {"version": 6}  # capped, from v5 not v0


def test_stream_id_persists_admission_cursor(spark, ds, tmp_path):
    """option("streamId", ...): the admission cursor survives restarts
    in a table sidecar, so a restarted stream whose batches were all
    committed keeps its rate limit on the FIRST latestOffset() instead
    of planning the whole remaining backlog as one micro-batch (the
    documented unanchored-reader fallback without the option)."""
    import pytest

    from x_spark.errors import DataSourceException
    from x_spark.sources.txlog import resolve_snapshot
    from x_spark.sources.txlog_datasource import TxLogStreamReader

    ref = TableRef(path=str(tmp_path / "t"))
    for i in range(6):                                         # v1..v6
        ds.append(spark.createDataFrame([(i, "a", i * 10)],
                                        "pk int, part string, v int")
                  .coalesce(1), ref)
    schema = resolve_snapshot(ref.path).schema
    opts = {"maxVersionsPerTrigger": "2", "streamId": "job-7"}

    # run 1: fresh start, two capped batches handed out
    r = TxLogStreamReader(ref.path, schema, dict(opts))
    r.initialOffset()
    assert r.latestOffset() == {"version": 2}
    assert r.latestOffset() == {"version": 4}

    # run 2 (restart, all batches committed): the FIRST latestOffset
    # is still capped — from the persisted frontier, not uncapped
    r2 = TxLogStreamReader(ref.path, schema, dict(opts))
    assert r2.latestOffset() == {"version": 6}   # (4, 6], capped at 2
    # and never regresses below the persisted frontier
    r3 = TxLogStreamReader(ref.path, schema, dict(opts))
    assert r3.latestOffset() == {"version": 6}

    # a DIFFERENT streamId is an independent cursor (fresh start rules)
    r4 = TxLogStreamReader(ref.path, schema,
                           {**opts, "streamId": "job-8"})
    assert r4.latestOffset() == {"version": 6}   # unanchored: uncapped
    # subsequent triggers of job-8 are capped from ITS frontier
    for i in range(2):                                         # v7, v8
        ds.append(spark.createDataFrame([(10 + i, "b", i)],
                                        "pk int, part string, v int")
                  .coalesce(1), ref)
    assert r4.latestOffset() == {"version": 8}

    # the sidecar lives under the table and is never a parquet file
    # (vacuum-safe); malformed ids reject
    import os

    assert os.path.isfile(os.path.join(ref.path, "_streams", "job-7.json"))
    with pytest.raises(DataSourceException, match="streamId"):
        TxLogStreamReader(ref.path, schema, {"streamId": "../evil"})


def test_stream_rate_limit_dv_repoint_not_counted(spark, ds, tmp_path):
    """A deletion-vector re-point re-adds the SAME path it removes in
    one commit — no new rows, so it must not consume file budget and
    shrink batches on delete-heavy tables; and per-version add counts
    are cached (the log is immutable per version)."""
    from x_spark.sources.txlog import DV_ENABLE_KEY, resolve_snapshot
    from x_spark.sources.txlog_datasource import TxLogStreamReader

    ref = TableRef(path=str(tmp_path / "t"))
    ds.append(spark.createDataFrame(
        [(i, "a", i * 10) for i in range(6)],
        "pk int, part string, v int").coalesce(1), ref)         # v1: 1 add
    ds.set_properties(ref, {DV_ENABLE_KEY: "true"})             # v2: 0 adds
    ds.delete(ref, "pk in (1, 2)")          # v3: DV re-point (add==remove)
    ds.append(spark.createDataFrame([(10, "b", 100)],
                                    "pk int, part string, v int")
              .coalesce(1), ref)                                # v4: 1 add
    schema = resolve_snapshot(ref.path).schema

    r = TxLogStreamReader(ref.path, schema,
                          {"maxFilesPerTrigger": "2",
                           "ignoreChanges": "true"})
    r.initialOffset()
    # v1 (1 admitted file) + v2 (0) + v3 (0: re-point) + v4 (1) = budget
    # 2 admits ALL FOUR versions in one batch
    assert r.latestOffset() == {"version": 4}
    assert {v: n for v, (n, _b) in r._add_counts.items()} == \
        {1: 1, 2: 0, 3: 0, 4: 1}
    r.commit({"version": 4})
    assert r._add_counts == {}                  # cache pruned on commit


def test_stream_rate_limit_end_to_end(spark, ds, tmp_path):
    """Caps engage from the first ANCHORED trigger. The very first
    trigger after reader construction is uncapped by design (the
    Python DS API gives latestOffset() no start offset, so capping
    before anything anchors the cursor could regress a restarted
    query's committed offset — exactly-once beats admission there);
    every later trigger is rate-limited."""
    ref = TableRef(path=str(tmp_path / "t"))
    _seed(spark, ds, ref, [(0, "a", 0)])                       # v1
    sdf = (
        spark.readStream.format("txlog").option("path", ref.path)
        .option("maxVersionsPerTrigger", "1").load()
    )
    q = (
        sdf.writeStream.format("memory").queryName("txlog_rate_t")
        .start()
    )
    try:
        q.processAllAvailable()                 # trigger 1 (uncapped): v1
        for i in range(1, 4):                   # backlog of 3 versions
            _seed(spark, ds, ref, [(i, "a", i * 10)])
        q.processAllAvailable()                 # capped drain: 1 version/batch
        got = sorted(map(tuple, spark.table("txlog_rate_t").collect()))
        assert got == [(i, "a", i * 10) for i in range(4)]
        # the 3-version backlog drained one commit per micro-batch
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(batches) >= 4
    finally:
        q.stop()


def test_read_change_feed_batch(spark, ds, tmp_path):
    """readChangeFeed (Delta parity): inserts from appends, deletes
    from CoW rewrites (with the co-located rewrite pairs), DV
    mask-deltas in both directions — and the result row-matches the
    connector's changes() over the same interval."""
    from x_spark.sources.txlog import DV_ENABLE_KEY

    ref = TableRef(path=str(tmp_path / "t"))
    ds.append(spark.createDataFrame(
        [(i, "a", i * 10) for i in range(6)],
        "pk int, part string, v int").coalesce(1), ref)         # v1
    ds.set_properties(ref, {DV_ENABLE_KEY: "true"})             # v2
    ds.delete(ref, "pk in (1, 2)")                              # v3 DV masks
    ds.append(spark.createDataFrame([(10, "b", 100)],
                                    "pk int, part string, v int"), ref)  # v4

    def feed(start, end=None):
        r = (spark.read.format("txlog").option("path", ref.path)
             .option("readChangeFeed", "true")
             .option("startingVersion", str(start)))
        if end is not None:
            r = r.option("endingVersion", str(end))
        return r.load()

    got = feed(1)
    assert got.columns == ["pk", "part", "v", "_change_type",
                           "_commit_version"]
    rows = sorted((r.pk, r._change_type, r._commit_version)
                  for r in got.collect())
    assert rows == sorted(
        [(i, "insert", 1) for i in range(6)]
        + [(1, "delete", 3), (2, "delete", 3), (10, "insert", 4)]
    )
    # inclusive startingVersion, bounded endingVersion
    assert sorted((r.pk, r._change_type) for r in feed(3, 3).collect()) == [
        (1, "delete"), (2, "delete"),
    ]
    # row-parity with the connector CDF over the same interval
    want = sorted(
        (r.pk, r._change_type, r._commit_version)
        for r in ds.changes(ref, 0, 4).collect()
    )
    assert rows == want
    # an interval with NO row changes (metadata-only commit) is an
    # EMPTY relation, not a planner error
    assert feed(2, 2).count() == 0
    # RESTORE un-deletes emit inserts (mask delta, other direction)
    ds.restore(ref, 2)                                          # v5
    back = sorted((r.pk, r._change_type) for r in feed(5, 5).collect())
    assert (1, "insert") in back and (2, "insert") in back
    with pytest.raises(Exception, match="startingVersion"):
        (spark.read.format("txlog").option("path", ref.path)
         .option("readChangeFeed", "true").load().collect())


def test_streaming_change_feed(spark, ds, tmp_path):
    """readChangeFeed on readStream: micro-batches emit change ROWS
    (_change_type/_commit_version) — DV deletes stream as deletes, no
    abort-on-rewrite guard; composes with rate limiting."""
    from x_spark.sources.txlog import DV_ENABLE_KEY

    ref = TableRef(path=str(tmp_path / "t"))
    ds.append(spark.createDataFrame([(i, "a", i * 10) for i in range(4)],
                                    "pk int, part string, v int")
              .coalesce(1), ref)                              # v1
    ds.set_properties(ref, {DV_ENABLE_KEY: "true"})           # v2
    ds.delete(ref, "pk in (1, 2)")                            # v3 (DV)
    ds.append(spark.createDataFrame([(9, "b", 90)],
                                    "pk int, part string, v int"), ref)  # v4

    sdf = (
        spark.readStream.format("txlog").option("path", ref.path)
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "2")
        .load()
    )
    assert "_change_type" in sdf.columns
    q = (
        sdf.writeStream.format("memory").queryName("txlog_cdf_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = sorted(
            (r.pk, r._change_type, r._commit_version)
            for r in spark.table("txlog_cdf_stream").collect()
        )
    finally:
        q.stop()
    want = sorted(
        [(i, "insert", 1) for i in range(4)]
        + [(1, "delete", 3), (2, "delete", 3), (9, "insert", 4)]
    )
    assert rows == want
    # row-parity with the connector CDF over the same interval
    assert rows == sorted(
        (r.pk, r._change_type, r._commit_version)
        for r in ds.changes(ref, 0, 4).collect()
    )


def test_streaming_aborts_on_rewrites_unless_ignore_changes(spark, ds, tmp_path):
    ref = TableRef(path=str(tmp_path / "t"))
    _seed(spark, ds, ref, [(1, "a", 10)])
    ds.delete(ref, "pk = 1")
    sdf = spark.readStream.format("txlog").option("path", ref.path).load()
    q = (
        sdf.writeStream.format("memory").queryName("txlog_stream_x")
        .trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="append-only|STREAM_FAILED"):
        q.awaitTermination()
    # with ignoreChanges the re-added (post-delete) files stream through
    sdf2 = (
        spark.readStream.format("txlog")
        .option("path", ref.path)
        .option("ignoreChanges", "true")
        .load()
    )
    q2 = (
        sdf2.writeStream.format("memory").queryName("txlog_stream_y")
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    assert (1, "a", 10) in {tuple(r) for r in spark.table("txlog_stream_y").collect()}


def test_missing_path_or_table_raise(spark, ds, tmp_path):
    with pytest.raises(Exception, match="requires option 'path'|PYTHON_DATA_SOURCE"):
        spark.read.format("txlog").load().collect()
    with pytest.raises(Exception, match="does not exist|PYTHON_DATA_SOURCE"):
        spark.read.format("txlog").option(
            "path", str(tmp_path / "nope")
        ).load().collect()


def test_batch_and_stream_reads_apply_deletion_vectors(spark, ds, tmp_path):
    """format("txlog") must not resurrect DV-masked rows: the batch
    reader applies each file's mask (time travel reads each version's
    own mask state), and a stream with ignoreChanges=true re-reads a
    re-pointed file's CURRENT (masked) content."""
    from x_spark.sources.txlog import DV_ENABLE_KEY

    ref = TableRef(path=str(tmp_path / "t"))
    ds.append(
        spark.createDataFrame(
            [(i, "a", i * 10) for i in range(10)], "pk int, part string, v int"
        ).coalesce(1),
        ref,
    )
    ds.set_properties(ref, {DV_ENABLE_KEY: "true"})
    v_before = 2
    ds.delete(ref, "pk < 4")

    df = spark.read.format("txlog").option("path", ref.path).load()
    assert sorted(r.pk for r in df.collect()) == list(range(4, 10))
    # connector and datasource agree post-mask
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, ds.read(ref).collect())
    )
    # time travel to the pre-delete version reads no mask
    old = (
        spark.read.format("txlog").option("path", ref.path)
        .option("versionAsOf", v_before).load()
    )
    assert old.count() == 10

    # streaming with ignoreChanges: the re-added file carries its mask
    sdf = (
        spark.readStream.format("txlog").option("path", ref.path)
        .option("ignoreChanges", "true").load()
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # initial add (10 unmasked rows at v1... the add's dv is version-
    # local: v1's add has no dv; the DELETE re-add carries it) plus the
    # re-pointed file: 10 + 6 rows
    pks = sorted(r.pk for r in got.collect())
    assert pks == sorted(list(range(10)) + list(range(4, 10)))


def test_stream_restart_exactly_once_end_to_end(spark, ds, tmp_path):
    """Full restart drill with rate limits on: run a checkpointed
    stream to completion, stop, append more versions, restart — every
    row arrives exactly once. This is the end-to-end form of the
    offset-regression regression test above."""
    ref = TableRef(path=str(tmp_path / "t"))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_to_drain():
        sdf = (
            spark.readStream.format("txlog").option("path", ref.path)
            .option("maxVersionsPerTrigger", "1").load()
        )
        q = (
            sdf.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt).start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    for i in range(3):
        _seed(spark, ds, ref, [(i, "a", i * 10)])              # v1..v3
    run_to_drain()
    for i in range(3, 6):
        _seed(spark, ds, ref, [(i, "a", i * 10)])              # v4..v6
    run_to_drain()

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == [(i, "a", i * 10) for i in range(6)], got


def test_max_bytes_per_trigger(spark, ds, tmp_path):
    """maxBytesPerTrigger (Delta parity): micro-batches advance to the
    commit boundary where admitted add.size reaches the cap; every
    version still streams exactly once; dataChange=false maintenance
    admits zero bytes."""
    from x_spark.sources.txlog import resolve_snapshot
    from x_spark.sources.txlog_datasource import TxLogStreamReader

    ref = TableRef(path=str(tmp_path / "t"))
    for i in range(4):
        ds.append(spark.createDataFrame(
            [(i * 10 + j, "a", j) for j in range(50)],
            "pk int, part string, v int").coalesce(1), ref)    # v1..v4
    snap = resolve_snapshot(ref.path)
    one_file = min(a["size"] for a in snap.files.values())
    assert one_file > 0                      # add.size recorded

    schema = spark.createDataFrame([], "pk int, part string, v int").schema
    r = TxLogStreamReader(ref.path, schema,
                          {"maxBytesPerTrigger": str(one_file)})
    r.initialOffset()
    # each trigger admits >= 1 version and stops at the byte cap:
    # four single-file commits -> four capped triggers
    ends = []
    for _ in range(4):
        ends.append(r.latestOffset()["version"])
    assert ends == [1, 2, 3, 4]
    # Delta-style size strings parse; junk rejects with the typed error
    rs = TxLogStreamReader(ref.path, schema, {"maxBytesPerTrigger": "1g"})
    assert rs.max_bytes == 1 << 30
    import pytest as _pytest

    from x_spark.errors import DataSourceException as _DSE
    with _pytest.raises(_DSE, match="size string"):
        TxLogStreamReader(ref.path, schema, {"maxBytesPerTrigger": "fast"})
    # a huge cap admits the whole backlog in one trigger
    r2 = TxLogStreamReader(ref.path, schema,
                           {"maxBytesPerTrigger": str(1 << 40)})
    r2.initialOffset()
    assert r2.latestOffset()["version"] == 4
    # OPTIMIZE admits zero bytes: the next trigger jumps past it
    ds.optimize(ref, target_size_mb=128)                       # v5
    ds.append(spark.createDataFrame([(999, "a", 1)],
                                    "pk int, part string, v int"), ref)  # v6
    r3 = TxLogStreamReader(ref.path, schema,
                           {"maxBytesPerTrigger": str(one_file)})
    r3.initialOffset()
    r3._pos = 4
    r3._anchored = True
    assert r3.latestOffset()["version"] == 6  # v5 admits 0 bytes
