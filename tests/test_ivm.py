"""Incremental view maintenance over the txlog CDF (operators/ivm.py)."""

import pytest
from pyspark.sql import functions as F

from x_spark.operators.ivm import AggregateView
from x_spark.sources import init_datasource
from x_spark.sources.base import MergeSpec, TableRef


@pytest.fixture()
def ds(spark):
    return init_datasource("txlog", spark)


def _expected(ds, base):
    return sorted(
        map(
            tuple,
            ds.read(base)
            .groupBy("part")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.col("v").cast("decimal(30,6)"))
                .cast("decimal(30,6)")
                .alias("sum_v"),
            )
            .collect(),
        ),
        key=str,
    )


def test_aggregate_view_tracks_all_write_paths(spark, ds, tmp_path):
    base = TableRef(path=str(tmp_path / "base"))
    agg = TableRef(path=str(tmp_path / "agg"))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "pk int, part string, v int"
    )
    ds.create(base, df.schema)
    ds.append(df, base)

    view = AggregateView(ds, base, agg, keys=["part"], sums=["v"])
    v1 = view.refresh()
    assert sorted(map(tuple, view.read().collect()), key=str) == _expected(ds, base)

    # replayed refresh: no-op, no new aggregate commit
    n_commits = len(ds.history(agg))
    assert view.refresh() == v1
    assert len(ds.history(agg)) == n_commits

    # every write path: append, delete, merge-update, merge-insert
    ds.append(
        spark.createDataFrame([(4, "c", 40), (5, "b", 5)], "pk int, part string, v int"),
        base,
    )
    ds.delete(base, "pk = 2")
    ds.merge(
        spark.createDataFrame([(1, 99), (9, 90)], "pk int, v int"),
        base,
        MergeSpec(["pk"], ["v"], insert_when_not_matched=True),
    )
    v2 = view.refresh()
    assert v2 > v1
    assert sorted(map(tuple, view.read().collect()), key=str) == _expected(ds, base)

    # a group emptied by deletes disappears from the view
    ds.delete(base, "part = 'c'")
    view.refresh()
    out = {r.part for r in view.read().collect()}
    assert "c" not in out and out >= {"a", "b"}


def test_aggregate_view_incremental_reads_only_new_versions(spark, ds, tmp_path):
    """After the first refresh, refresh() must fold only the NEW
    commits: reading the full CDF from version 1 would double-count
    (the test poisons the early versions by vacuuming them away)."""
    base = TableRef(path=str(tmp_path / "base"))
    agg = TableRef(path=str(tmp_path / "agg"))
    df = spark.createDataFrame([(1, "a", 10)], "pk int, part string, v int")
    ds.create(base, df.schema)
    ds.append(df, base)
    view = AggregateView(ds, base, agg, keys=["part"], sums=["v"])
    view.refresh()
    ds.append(spark.createDataFrame([(2, "a", 5)], "pk int, part string, v int"), base)
    view.refresh()
    rows = {(r.part): (r.n_rows, float(r.sum_v)) for r in view.read().collect()}
    assert rows == {"a": (2, 15.0)}


from hypothesis import HealthCheck, given, settings, strategies as st

_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"),
                  st.lists(st.tuples(st.integers(0, 3), st.integers(-5, 5)),
                           min_size=1, max_size=3)),
        st.tuples(st.just("delete"), st.integers(0, 3)),
        st.tuples(st.just("refresh"), st.none()),
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=_ops)
def test_aggregate_view_matches_recompute_under_random_ops(
    spark, ds, tmp_path_factory, ops
):
    """State-machine property: interleave appends/deletes with
    refreshes at arbitrary points; after a final refresh the view must
    equal a from-scratch recompute of the base table."""
    tmp_path = tmp_path_factory.mktemp("ivm")
    base = TableRef(path=str(tmp_path / "base"))
    agg = TableRef(path=str(tmp_path / "agg"))
    seed_pk = 1000  # distinct pk space per appended row
    schema = "pk int, part string, v int"
    ds.create(base, spark.createDataFrame([], schema).schema)
    view = AggregateView(ds, base, agg, keys=["part"], sums=["v"])
    for kind, arg in ops:
        if kind == "append":
            rows = [
                (seed_pk + i, f"p{k}", v) for i, (k, v) in enumerate(arg)
            ]
            seed_pk += len(rows)
            ds.append(spark.createDataFrame(rows, schema), base)
        elif kind == "delete":
            ds.delete(base, f"part = 'p{arg}'")
        else:
            view.refresh()
    view.refresh()
    assert sorted(map(tuple, view.read().collect()), key=str) == _expected(ds, base)


def test_join_view_tracks_plain_join_through_mutations(spark, tmp_path):
    """JoinView must equal the bag of the direct join after every
    refresh, across appends/deletes/merges on BOTH sides, and a
    repeated refresh must be a detected no-op."""
    from x_spark.operators.ivm import JoinView
    from x_spark.sources import init_datasource
    from x_spark.sources.base import MergeSpec, TableRef

    ds = init_datasource("txlog", spark)
    a_ref = TableRef(path=str(tmp_path / "a"))
    b_ref = TableRef(path=str(tmp_path / "b"))
    v_ref = TableRef(path=str(tmp_path / "j"))

    ds.append(spark.createDataFrame(
        [(1, 10), (2, 20), (2, 21)], "k int, av int"), a_ref)
    ds.append(spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k int, bv string"), b_ref)

    view = JoinView(ds, a_ref, b_ref, v_ref, on=["k"],
                    a_cols=["av"], b_cols=["bv"])

    def check():
        got = sorted(map(tuple, view.read().collect()))
        want = sorted(map(tuple, (
            ds.read(a_ref).join(ds.read(b_ref), "k")
            .groupBy("k", "av", "bv").agg(F.count("*").alias("n_rows"))
        ).collect()))
        assert got == want, (got, want)

    va, vb = view.refresh()
    check()
    assert view.refresh() == (va, vb)  # no-op detected

    # duplicate join rows: append a second (2, 'y') on the dim side
    ds.append(spark.createDataFrame([(2, "y"), (4, "w")], "k int, bv string"), b_ref)
    view.refresh(); check()

    # delete on the fact side
    ds.delete(a_ref, "av = 21")
    view.refresh(); check()

    # merge (update + insert) on the fact side
    ds.merge(spark.createDataFrame([(1, 11), (4, 40)], "k int, av int"),
             a_ref, MergeSpec(["k"], ["av"]))
    view.refresh(); check()

    # both sides mutate between refreshes
    ds.append(spark.createDataFrame([(5, 50)], "k int, av int"), a_ref)
    ds.delete(b_ref, "k = 2")
    ds.append(spark.createDataFrame([(5, "v")], "k int, bv string"), b_ref)
    view.refresh(); check()


def test_join_view_fused_refresh_single_commit(spark, tmp_path):
    """When BOTH sides have pending deltas, refresh() fuses the two
    increments into ONE view commit (one state rewrite instead of two)
    carrying BOTH application stamps atomically — and the result is
    still the exact bag of the direct join. A single-side refresh
    stays a single-stamp commit."""
    from x_spark.operators.ivm import JoinView
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    a_ref = TableRef(path=str(tmp_path / "a"))
    b_ref = TableRef(path=str(tmp_path / "b"))
    v_ref = TableRef(path=str(tmp_path / "j"))
    ds.append(spark.createDataFrame(
        [(1, 10), (2, 20)], "k int, av int"), a_ref)
    ds.append(spark.createDataFrame(
        [(1, "x"), (2, "y")], "k int, bv string"), b_ref)
    view = JoinView(ds, a_ref, b_ref, v_ref, on=["k"],
                    a_cols=["av"], b_cols=["bv"])

    # initial build: both sides pending -> exactly one view commit,
    # both positions stamped in it
    va, vb = view.refresh()
    hist = ds.history(v_ref)
    n0 = len(hist)
    assert ds.last_txn_version(v_ref, view.app_a) == va
    assert ds.last_txn_version(v_ref, view.app_b) == vb

    # both sides mutate -> still exactly ONE new view commit
    ds.append(spark.createDataFrame([(3, 30)], "k int, av int"), a_ref)
    ds.delete(b_ref, "k = 2")
    va2, vb2 = view.refresh()
    assert (va2, vb2) > (va, vb)
    assert len(ds.history(v_ref)) == n0 + 1
    assert ds.last_txn_version(v_ref, view.app_a) == va2
    assert ds.last_txn_version(v_ref, view.app_b) == vb2
    want = sorted(map(tuple, (
        ds.read(a_ref).join(ds.read(b_ref), "k")
        .groupBy("k", "av", "bv").agg(F.count("*").alias("n_rows"))
    ).collect()))
    assert sorted(map(tuple, view.read().collect())) == want

    # one side mutates -> single-side path, single-stamp commit, and
    # the OTHER side's stamp survives the commit untouched
    ds.append(spark.createDataFrame([(1, "x2")], "k int, bv string"), b_ref)
    va3, vb3 = view.refresh()
    assert va3 == va2 and vb3 > vb2
    assert len(ds.history(v_ref)) == n0 + 2
    assert ds.last_txn_version(v_ref, view.app_a) == va2
    assert ds.last_txn_version(v_ref, view.app_b) == vb3
    # replay: immediate refresh is a no-op on both sides
    assert view.refresh() == (va3, vb3)
    assert len(ds.history(v_ref)) == n0 + 2


def test_multi_stamp_commit_replay_detection(spark, tmp_path):
    """A commit carrying a LIST of txn stamps records every position
    atomically, and the in-commit replay guard rejects the commit if
    ANY stamp is stale (Delta's SetTransaction conflict semantics per
    stamp)."""
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxnAlreadyCommittedException

    ds = init_datasource("txlog", spark)
    ref = TableRef(path=str(tmp_path / "t"))
    df = spark.createDataFrame([(1,)], "x int")
    ds.append(df, ref)
    ds.overwrite(df, ref, txn=[("appA", 3), ("appB", 7)])
    assert ds.last_txn_version(ref, "appA") == 3
    assert ds.last_txn_version(ref, "appB") == 7
    # one fresh stamp + one stale stamp -> whole commit refused
    with pytest.raises(TxnAlreadyCommittedException):
        ds.overwrite(df, ref, txn=[("appA", 4), ("appB", 7)])
    # neither stamp advanced (the commit never landed)
    assert ds.last_txn_version(ref, "appA") == 3
    assert ds.last_txn_version(ref, "appB") == 7
    ds.overwrite(df, ref, txn=[("appA", 4), ("appB", 8)])
    assert ds.last_txn_version(ref, "appA") == 4
    assert ds.last_txn_version(ref, "appB") == 8


def test_join_view_rejects_bad_specs(spark, tmp_path):
    from x_spark.operators.ivm import JoinView
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    r = TableRef(path=str(tmp_path / "x"))
    with pytest.raises(ValueError, match="join key"):
        JoinView(ds, r, r, r, on=[], a_cols=["a"], b_cols=["b"])
    with pytest.raises(ValueError, match="disjoint"):
        JoinView(ds, r, r, r, on=["k"], a_cols=["c"], b_cols=["c"])


def test_join_view_stored_layout_wins_on_reopen(spark, tmp_path):
    """An existing view's on-disk layout always beats the constructor:
    (a) a view created with an explicit bucket count stores it in
    schema metadata and a reopen with a DIFFERENT n_buckets keeps
    folding into the stored hash space; (b) a small auto-mode view
    (the default) stays unbucketed when reopened with an explicit
    count."""
    from x_spark.operators.ivm import JoinView
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)

    def mk(suffix, **kw):
        return JoinView(
            ds, TableRef(path=str(tmp_path / f"a{suffix}")),
            TableRef(path=str(tmp_path / f"b{suffix}")),
            TableRef(path=str(tmp_path / f"j{suffix}")),
            on=["k"], a_cols=["av"], b_cols=["bv"], **kw,
        )

    def want(suffix):
        a = ds.read(TableRef(path=str(tmp_path / f"a{suffix}")))
        b = ds.read(TableRef(path=str(tmp_path / f"b{suffix}")))
        return sorted(map(tuple, (
            a.join(b, "k").groupBy("k", "av", "bv")
            .agg(F.count("*").alias("n_rows")).collect()
        )))

    # (a) explicit bucketed create, hostile reopen with n_buckets=3
    v1 = mk("1", n_buckets=5)
    ds.append(spark.createDataFrame(
        [(k, k) for k in range(1, 9)], "k int, av int"),
        TableRef(path=str(tmp_path / "a1")))
    ds.append(spark.createDataFrame(
        [(k, f"b{k}") for k in range(1, 9)], "k int, bv string"),
        TableRef(path=str(tmp_path / "b1")))
    v1.refresh()
    assert v1._effective_buckets() == 5
    reopened = mk("1", n_buckets=3)
    ds.append(spark.createDataFrame([(4, 40), (9, 90)], "k int, av int"),
              TableRef(path=str(tmp_path / "a1")))
    reopened.refresh()
    assert reopened._effective_buckets() == 5  # stored count wins
    assert sorted(map(tuple, reopened.read().collect())) == want("1")

    # (b) small auto-mode view stays unbucketed under an explicit reopen
    v2 = mk("2")
    assert v2.n_buckets == "auto"
    ds.append(spark.createDataFrame([(1, 10)], "k int, av int"),
              TableRef(path=str(tmp_path / "a2")))
    ds.append(spark.createDataFrame([(1, "x")], "k int, bv string"),
              TableRef(path=str(tmp_path / "b2")))
    v2.refresh()
    assert v2._effective_buckets() is None
    reopened2 = mk("2", n_buckets=7)
    assert reopened2._effective_buckets() is None  # stored layout wins
    ds.append(spark.createDataFrame([(2, 20)], "k int, av int"),
              TableRef(path=str(tmp_path / "a2")))
    ds.append(spark.createDataFrame([(2, "y")], "k int, bv string"),
              TableRef(path=str(tmp_path / "b2")))
    reopened2.refresh()
    assert sorted(map(tuple, reopened2.read().collect())) == want("2")
    assert "_bucket" not in ds.read(
        TableRef(path=str(tmp_path / "j2"))).columns


def test_join_view_auto_migrates_to_bucketed_when_grown(spark, tmp_path,
                                                        monkeypatch):
    """The auto default migrates a grown view to bucketed layout: the
    full-rewrite refresh that finds the stored view at or past
    AUTO_BUCKET_ROWS writes that rewrite bucketed (schema + partition
    change in one stamped commit), subsequent refreshes take the
    partition-scoped path, the maintained bag stays equal to the plain
    join throughout, and replay idempotency survives the migration."""
    from x_spark.operators.ivm import JoinView
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    monkeypatch.setattr(JoinView, "AUTO_BUCKET_ROWS", 10)
    monkeypatch.setattr(JoinView, "DEFAULT_BUCKETS", 4)
    ds = init_datasource("txlog", spark)
    a_ref = TableRef(path=str(tmp_path / "a"))
    b_ref = TableRef(path=str(tmp_path / "b"))
    v_ref = TableRef(path=str(tmp_path / "j"))
    view = JoinView(ds, a_ref, b_ref, v_ref, on=["k"],
                    a_cols=["av"], b_cols=["bv"])

    def check():
        got = sorted(map(tuple, view.read().collect()))
        want = sorted(map(tuple, (
            ds.read(a_ref).join(ds.read(b_ref), "k")
            .groupBy("k", "av", "bv").agg(F.count("*").alias("n_rows"))
        ).collect()))
        assert got == want, (got, want)

    ds.append(spark.createDataFrame(
        [(k, k) for k in range(5)], "k int, av int"), a_ref)
    ds.append(spark.createDataFrame(
        [(k, f"b{k}") for k in range(30)], "k int, bv string"), b_ref)
    view.refresh()
    check()
    assert view._effective_buckets() is None  # 5 rows < threshold

    # grow past the threshold (the refresh that WRITES the growth
    # still found the old 5-row store, so it stays unbucketed) ...
    ds.append(spark.createDataFrame(
        [(k, k) for k in range(5, 30)], "k int, av int"), a_ref)
    view.refresh()
    check()
    assert view._effective_buckets() is None
    # ... and the NEXT full rewrite finds 30 stored rows >= 10: migrate
    ds.append(spark.createDataFrame([(3, 333)], "k int, av int"), a_ref)
    va, vb = view.refresh()
    check()
    assert view._effective_buckets() == 4
    assert "_bucket" in ds.read(v_ref).columns
    assert view.refresh() == (va, vb)  # no-op detected post-migration

    # post-migration refreshes take the partition-scoped path and
    # still drain deletes correctly
    ds.delete(b_ref, "k in (1, 2)")
    ds.append(spark.createDataFrame([(0, 99)], "k int, av int"), a_ref)
    view.refresh()
    check()
    # a fresh object (default ctor) reads the stored count back
    again = JoinView(ds, a_ref, b_ref, v_ref, on=["k"],
                     a_cols=["av"], b_cols=["bv"])
    assert again._effective_buckets() == 4


def test_bucketed_join_view_scopes_the_rewrite(spark, tmp_path):
    """n_buckets partitions the view on a join-key hash bucket so a
    refresh rewrites ONLY the buckets its deltas touch: (a) the
    maintained bag equals the plain join after every refresh (same
    contract as the unbucketed view), (b) files in untouched buckets
    survive a refresh byte-identical (same path, same mtime), and
    (c) a repeated refresh is still a detected no-op."""
    import os

    from x_spark.operators.ivm import JoinView
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    a_ref = TableRef(path=str(tmp_path / "a"))
    b_ref = TableRef(path=str(tmp_path / "b"))
    v_ref = TableRef(path=str(tmp_path / "j"))
    ds.append(spark.createDataFrame(
        [(k, k * 10) for k in range(1, 21)], "k int, av int"), a_ref)
    ds.append(spark.createDataFrame(
        [(k, f"b{k}") for k in range(1, 21)], "k int, bv string"), b_ref)
    view = JoinView(ds, a_ref, b_ref, v_ref, on=["k"],
                    a_cols=["av"], b_cols=["bv"], n_buckets=8)

    def check():
        got = sorted(map(tuple, view.read().collect()))
        want = sorted(map(tuple, (
            ds.read(a_ref).join(ds.read(b_ref), "k")
            .groupBy("k", "av", "bv").agg(F.count("*").alias("n_rows"))
        ).collect()))
        assert got == want, (got, want)

    va, vb = view.refresh()
    check()
    assert view.refresh() == (va, vb)  # no-op detected

    # record the on-disk state of every bucket partition
    def bucket_files():
        out = {}
        for root, _dirs, names in os.walk(str(tmp_path / "j")):
            if "_bucket=" not in root:
                continue
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    out[p] = os.path.getmtime(p)
        return out

    before = bucket_files()
    assert before, "expected hive bucket partition dirs"
    # touch exactly one key -> its bucket rewrites, others must not
    ds.append(spark.createDataFrame([(7, 777)], "k int, av int"), a_ref)
    view.refresh()
    check()
    after = bucket_files()
    from pyspark.sql import functions as FF
    touched_bucket = spark.createDataFrame([(7,)], "k int").select(
        FF.pmod(FF.hash("k"), FF.lit(8)).cast("int").alias("b")
    ).first()["b"]
    survivors = {
        p: m for p, m in before.items()
        if f"_bucket={touched_bucket}" not in p
    }
    assert survivors, "expected untouched buckets"
    for p, m in survivors.items():
        assert p in after and after[p] == m, f"untouched bucket rewritten: {p}"
    # the touched bucket DID rewrite: its old files left the LIVE set
    # (physical deletion is vacuum's job, so check the log, not disk)
    from x_spark.sources.txlog import resolve_snapshot

    live = set(resolve_snapshot(str(tmp_path / "j")).files)
    old_touched = [
        os.path.relpath(p, str(tmp_path / "j"))
        for p in before if f"_bucket={touched_bucket}" in p
    ]
    assert old_touched and all(rel not in live for rel in old_touched)
    assert any(f"_bucket={touched_bucket}" in rel for rel in live)


def test_minmax_view_targeted_rescan(spark, tmp_path):
    """minmax columns maintain min_/max_ per group: inserts tighten
    incrementally; deleting the stored extremum triggers the targeted
    group rescan and lands the survivors' true extremum. The view must
    equal a full recompute after every refresh, including deleting the
    minimum, the maximum, a whole group, and a no-op delete."""
    from x_spark.operators.ivm import AggregateView
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    base = TableRef(path=str(tmp_path / "b"))
    agg = TableRef(path=str(tmp_path / "agg"))
    ds.append(spark.createDataFrame(
        [("a", 1, 10), ("a", 5, 50), ("a", 9, 90),
         ("b", 2, 20), ("b", 8, 80)],
        "g string, v int, w int"), base)
    view = AggregateView(ds, base, agg, keys=["g"], sums=["w"],
                         minmax=["v"])

    def check():
        got = sorted(map(tuple, view.read().select(
            "g", "n_rows", F.col("sum_w").cast("long"), "min_v", "max_v"
        ).collect()))
        want = sorted(map(tuple, ds.read(base).groupBy("g").agg(
            F.count("*").cast("bigint"),
            F.sum("w").cast("long"),
            F.min("v"), F.max("v"),
        ).collect()))
        assert got == want, (got, want)

    v = view.refresh()
    check()
    assert view.refresh() == v  # no-op replay

    # insert-only refresh: extrema tighten without touching the base —
    # assert the refresh never issues a pinned (versionAsOf) base read
    ds.append(spark.createDataFrame([("a", 0, 1), ("b", 11, 5)],
                                    "g string, v int, w int"), base)
    pinned_reads = []
    orig_read = ds.read

    def spy_read(ref, *a, **kw):
        if "versionAsOf" in (ref.options or {}):
            pinned_reads.append(ref)
        return orig_read(ref, *a, **kw)

    ds.read = spy_read
    try:
        view.refresh()
    finally:
        ds.read = orig_read
    assert not pinned_reads, "insert-only refresh read the pinned base"
    check()

    # delete the group minimum -> rescan must find the next-smallest
    ds.delete(base, "g = 'a' AND v = 0")
    view.refresh(); check()
    # delete the group maximum
    ds.delete(base, "g = 'a' AND v = 9")
    view.refresh(); check()
    # interior delete (no rescan needed; extrema unchanged)
    ds.delete(base, "g = 'a' AND v = 5")
    view.refresh(); check()
    # delete an entire group -> it leaves the view
    ds.delete(base, "g = 'b'")
    view.refresh(); check()
    assert [r.g for r in view.read().collect()] == ["a"]

    # first-build-with-deletes path: a fresh view over the same base
    # (whose feed contains all of the above deletes) must also match
    agg2 = TableRef(path=str(tmp_path / "agg2"))
    view2 = AggregateView(ds, base, agg2, keys=["g"], sums=["w"],
                          minmax=["v"])
    view2.refresh()
    got2 = sorted(map(tuple, view2.read().collect()))
    got1 = sorted(map(tuple, view.read().collect()))
    assert got2 == got1


def test_interval_add_only_probe_and_minmax_fast_path(spark, tmp_path):
    """`interval_is_add_only` classifies commit intervals from
    metadata alone (appends -> True; delete / merge-rewrite /
    overwrite in the interval -> False), and an insert-only minmax
    refresh rides it: no eager-checkpoint job, no rescan-probe job —
    the refresh submits no more Spark jobs than a plain (no-minmax)
    view's refresh of the same delta (AQE stage jobs make the absolute
    count plan-dependent, so the plain path is the yardstick), with
    the result still matching a full recompute."""
    from x_spark.operators.ivm import AggregateView
    from x_spark.sources import init_datasource
    from x_spark.sources.base import MergeSpec, TableRef

    ds = init_datasource("txlog", spark)
    base = TableRef(path=str(tmp_path / "b"))
    ds.append(spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "g string, v int, w int"), base)  # v1
    ds.append(spark.createDataFrame(
        [("a", 3, 30)], "g string, v int, w int"), base)                # v2
    assert ds.interval_is_add_only(base, 0, 2)
    ds.delete(base, "v = 3")                                            # v3
    assert ds.interval_is_add_only(base, 0, 2)
    assert not ds.interval_is_add_only(base, 2, 3)
    assert not ds.interval_is_add_only(base, 0, 3)
    assert ds.interval_is_add_only(base, 3, 3)  # empty interval
    ds.merge(spark.createDataFrame([("a", 1, 99)], "g string, v int, w int"),
             base, MergeSpec(["g", "v"], ["w"]))                        # v4
    assert not ds.interval_is_add_only(base, 3, 4)

    # insert-only refresh of a minmax view: no checkpoint/probe jobs —
    # job count must not exceed the plain path's for the same delta
    agg = TableRef(path=str(tmp_path / "agg"))
    plain_agg = TableRef(path=str(tmp_path / "agg_plain"))
    view = AggregateView(ds, base, agg, keys=["g"], sums=["w"],
                         minmax=["v"])
    plain = AggregateView(ds, base, plain_agg, keys=["g"], sums=["w"])
    view.refresh()  # first build folds the delete-carrying feed
    plain.refresh()
    ds.append(spark.createDataFrame(
        [("a", 0, 5), ("c", 7, 70)], "g string, v int, w int"), base)
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup(None))
    plain.refresh()
    mid = set(st.getJobIdsForGroup(None))
    n_plain = len(mid - before)
    view.refresh()
    n_minmax = len(set(st.getJobIdsForGroup(None)) - mid)
    assert n_minmax <= n_plain, (
        f"insert-only minmax refresh ran {n_minmax} jobs vs the plain "
        f"path's {n_plain} — checkpoint/probe jobs are back"
    )
    got = sorted(map(tuple, view.read().select(
        "g", "n_rows", F.col("sum_w").cast("long"), "min_v", "max_v"
    ).collect()))
    want = sorted(map(tuple, ds.read(base).groupBy("g").agg(
        F.count("*").cast("bigint"), F.sum("w").cast("long"),
        F.min("v"), F.max("v"),
    ).collect()))
    assert got == want, (got, want)


def test_bucketed_join_view_empties_bucket_cleanly(spark, tmp_path):
    """Regression (review-confirmed): a refresh that EMPTIES a bucket
    must remove its old files from the live set — a dynamic-partition
    overwrite would skip absent partitions and leave stale join rows.
    Delete every B-row of some keys so entire buckets drain, refresh,
    and require bag == plain join."""
    from x_spark.operators.ivm import JoinView
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    a_ref = TableRef(path=str(tmp_path / "a"))
    b_ref = TableRef(path=str(tmp_path / "b"))
    v_ref = TableRef(path=str(tmp_path / "j"))
    ds.append(spark.createDataFrame(
        [(k, k * 10) for k in range(1, 9)], "k int, av int"), a_ref)
    ds.append(spark.createDataFrame(
        [(k, f"b{k}") for k in range(1, 9)], "k int, bv string"), b_ref)
    view = JoinView(ds, a_ref, b_ref, v_ref, on=["k"],
                    a_cols=["av"], b_cols=["bv"], n_buckets=4)
    view.refresh()
    # drain whole buckets: delete half the dim keys
    ds.delete(b_ref, "k in (1, 3, 7, 8)")
    view.refresh()
    got = sorted(map(tuple, view.read().collect()))
    want = sorted(map(tuple, (
        ds.read(a_ref).join(ds.read(b_ref), "k")
        .groupBy("k", "av", "bv").agg(F.count("*").alias("n_rows"))
    ).collect()))
    assert got == want, (got, want)
    # drain EVERYTHING: the view must come back empty
    ds.delete(b_ref, "TRUE")
    view.refresh()
    assert view.read().count() == 0


def test_staleness_probes(spark, tmp_path):
    from x_spark.operators.ivm import AggregateView, JoinView
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    base = TableRef(path=str(tmp_path / "b"))
    agg = TableRef(path=str(tmp_path / "agg"))
    ds.append(spark.createDataFrame([("a", 1)], "g string, w int"), base)
    view = AggregateView(ds, base, agg, keys=["g"], sums=["w"])
    assert view.staleness() == 1  # v1 unapplied
    view.refresh()
    assert view.staleness() == 0
    ds.append(spark.createDataFrame([("a", 2)], "g string, w int"), base)
    ds.append(spark.createDataFrame([("a", 3)], "g string, w int"), base)
    assert view.staleness() == 2
    view.refresh()
    assert view.staleness() == 0

    b2 = TableRef(path=str(tmp_path / "b2"))
    v2 = TableRef(path=str(tmp_path / "v2"))
    ds.append(spark.createDataFrame([("a", 9)], "g string, x int"), b2)
    jv = JoinView(ds, base, b2, v2, on=["g"], a_cols=["w"], b_cols=["x"])
    assert jv.staleness() == (3, 1)
    jv.refresh()
    assert jv.staleness() == (0, 0)
