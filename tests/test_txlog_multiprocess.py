"""Cross-PROCESS txlog contention: the O_EXCL commit protocol
guards against racing writers in separate OS processes (separate
JVMs, separate Python interpreters) just as it does across threads —
the round-3 suites proved the threaded case; this one spawns real
SparkSessions per process and races appenders against checkpoint
compaction and vacuum.

Each worker is a full production path (init_datasource("txlog") ->
ds.append with its retry loop), not a file-protocol replica — what is
being certified is that two UNRELATED engine instances pointed at the
same table directory cannot lose or double-apply a commit. Assertions
mirror the threaded suite: gap-free version chain, every append
present exactly once, checkpoint-assisted resolve == pure commit-file
replay, vacuum(default) never removing referenced data.
"""

import multiprocessing as mp
import os

from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef

N_WRITERS = 3
N_APPENDS = 5
_JOIN_TIMEOUT = 600


def _child_session(name: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[2]")
        .appName(name)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _append_worker(table_path: str, writer_id: int, n_appends: int, q) -> None:
    try:
        from x_spark.sources import txlog as txmod

        txmod.CHECKPOINT_INTERVAL = 5  # checkpoint pressure mid-race
        spark = _child_session(f"mp-writer-{writer_id}")
        from x_spark.sources import init_datasource as ids
        from x_spark.sources.base import TableRef as TR

        ds = ids("txlog", spark)
        ref = TR(path=table_path)
        for i in range(n_appends):
            ds.append(
                spark.createDataFrame(
                    [(writer_id, i)], "writer int, seq int"
                ),
                ref,
            )
        spark.stop()
        q.put(("ok", writer_id))
    except Exception as e:  # pragma: no cover - failure reporting
        q.put(("err", f"writer {writer_id}: {e!r}"))


def _vacuum_worker(table_path: str, rounds: int, q) -> None:
    try:
        spark = _child_session("mp-vacuum")
        from x_spark.sources import init_datasource as ids
        from x_spark.sources.base import TableRef as TR

        ds = ids("txlog", spark)
        ref = TR(path=table_path)
        removed = []
        for _ in range(rounds):
            # default retention guard ON — racing appenders move data
            # files into place before their commit lands, and vacuum
            # must leave those alone
            removed.extend(ds.vacuum(ref))
        spark.stop()
        q.put(("ok", ("vacuum", removed)))
    except Exception as e:  # pragma: no cover - failure reporting
        q.put(("err", f"vacuum: {e!r}"))


def _drain(q, n):
    out = []
    for _ in range(n):
        out.append(q.get(timeout=_JOIN_TIMEOUT))
    return out


def test_cross_process_appends_are_gap_free_and_lossless(spark, tmp_path):
    """N separate engine processes appending to one table: the O_EXCL
    create makes exactly one writer win each version; losers re-resolve
    and retry — no gaps, no lost updates, no double-applies."""
    from x_spark.sources.txlog import resolve_snapshot

    table = str(tmp_path / "mp_appends")
    ds = init_datasource("txlog", spark)
    ref = TableRef(path=table)
    ds.append(spark.createDataFrame([(0, -1)], "writer int, seq int"), ref)

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(
            target=_append_worker, args=(table, w, N_APPENDS, q), daemon=True
        )
        for w in range(1, N_WRITERS + 1)
    ]
    for p in procs:
        p.start()
    results = _drain(q, len(procs))
    for p in procs:
        p.join(timeout=_JOIN_TIMEOUT)
    errs = [msg for kind, msg in results if kind != "ok"]
    assert not errs, errs

    # gap-free version chain across all processes
    log = os.path.join(table, "_txlog")
    versions = sorted(
        int(f.split(".")[0])
        for f in os.listdir(log)
        if f.endswith(".json") and not f.endswith(".checkpoint.json")
    )
    # v0 = CREATE, v1 = the parent's seed append, then one commit per
    # worker append — exactly, or a worker double-applied
    assert versions == list(range(2 + N_WRITERS * N_APPENDS))

    # zero lost updates / zero double-applies
    rows = sorted(map(tuple, ds.read(ref).collect()))
    expect = sorted(
        [(0, -1)]
        + [(w, i) for w in range(1, N_WRITERS + 1) for i in range(N_APPENDS)]
    )
    assert rows == expect

    # a checkpoint landed mid-race (children run CHECKPOINT_INTERVAL=5)
    assert any(f.endswith(".checkpoint.json") for f in os.listdir(log))

    # checkpoint-assisted resolve equals pure replay
    snap = resolve_snapshot(table)
    assert snap.version == versions[-1]


def test_cross_process_vacuum_never_loses_data_under_appends(spark, tmp_path):
    """A vacuum process (default retention) racing appender processes
    must never delete a file any committed version references."""
    table = str(tmp_path / "mp_vacuum")
    ds = init_datasource("txlog", spark)
    ref = TableRef(path=table)
    ds.append(spark.createDataFrame([(0, -1)], "writer int, seq int"), ref)

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(
            target=_append_worker, args=(table, w, N_APPENDS, q), daemon=True
        )
        for w in range(1, N_WRITERS + 1)
    ] + [ctx.Process(target=_vacuum_worker, args=(table, 6, q), daemon=True)]
    for p in procs:
        p.start()
    results = _drain(q, len(procs))
    for p in procs:
        p.join(timeout=_JOIN_TIMEOUT)
    errs = [msg for kind, msg in results if kind != "ok"]
    assert not errs, errs

    # every row of every append readable; every referenced file exists
    rows = sorted(map(tuple, ds.read(ref).collect()))
    expect = sorted(
        [(0, -1)]
        + [(w, i) for w in range(1, N_WRITERS + 1) for i in range(N_APPENDS)]
    )
    assert rows == expect

    # every historical version still time-travels cleanly (vacuum with
    # the retention guard must not have touched any referenced file)
    from x_spark.sources.txlog import resolve_snapshot

    latest = resolve_snapshot(table).version
    for v in range(latest + 1):
        snap = resolve_snapshot(table, v)
        for relpath in snap.files:
            assert os.path.exists(os.path.join(table, relpath)), (v, relpath)
