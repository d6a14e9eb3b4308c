"""Incremental clustering (the liquid-clustering shape): cluster
passes stamp their adds ``clusteredBy``; an ``incremental=True`` pass
re-lays-out ONLY the unstamped (newly appended) files — maintenance is
O(new data), never O(table) — while pruning stays equivalent because
every cube's files carry tight footer min/max ranges."""

import pytest
from pyspark.sql import functions as F

from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef
from x_spark.sources.txlog import resolve_snapshot


@pytest.fixture()
def ds(spark):
    return init_datasource("txlog", spark)


def _seed(spark, ds, tmp_path, lo, hi, name="t"):
    ref = TableRef(path=str(tmp_path / name))
    df = spark.createDataFrame(
        [(i, i % 7, f"r{i}") for i in range(lo, hi)], "a int, b int, s string"
    )
    ds.append(df.repartition(4), ref)
    return ref


def _candidates(path, col, lo, hi):
    """Files a footer-stats reader must touch for col BETWEEN lo AND
    hi — the same skipping the MERGE/DELETE planner performs."""
    snap = resolve_snapshot(path)
    n = 0
    for a in snap.files.values():
        st = a.get("stats") or {}
        fmin = (st.get("minValues") or {}).get(col)
        fmax = (st.get("maxValues") or {}).get(col)
        if fmin is None or fmax is None or not (hi < fmin or lo > fmax):
            n += 1
    return n


def test_incremental_pass_touches_only_new_files(spark, ds, tmp_path):
    ref = _seed(spark, ds, tmp_path, 0, 4000)
    ds.cluster(ref, ["a"], target_files=4, strategy="zorder")
    snap1 = resolve_snapshot(ref.path)
    clustered = set(snap1.files)
    assert all(a.get("clusteredBy") == {"cols": ["a"], "strategy": "zorder"}
               for a in snap1.files.values())

    # converged: nothing unclustered -> no work, NO commit
    assert ds.cluster(ref, ["a"], strategy="zorder", incremental=True) == 0
    assert resolve_snapshot(ref.path).version == snap1.version

    # append new data, incremental pass lays out ONLY the new files
    ds.append(spark.createDataFrame(
        [(i, i % 7, f"n{i}") for i in range(4000, 6000)],
        "a int, b int, s string").repartition(3), ref)
    n = ds.cluster(ref, ["a"], target_files=2, strategy="zorder",
                   incremental=True)
    assert n == 2
    snap2 = resolve_snapshot(ref.path)
    assert clustered <= set(snap2.files), \
        "already-clustered files must stay byte-identical (path identity)"
    assert all(a.get("clusteredBy") for a in snap2.files.values())
    # content unchanged
    got = ds.read(ref).agg(F.count("*"), F.sum("a")).first()
    assert tuple(got) == (6000, sum(range(6000)))

    # converged again
    assert ds.cluster(ref, ["a"], strategy="zorder", incremental=True) == 0


def test_incremental_pruning_equivalent_to_full(spark, ds, tmp_path):
    # same data: full recluster vs cluster+append+incremental — a
    # narrow range predicate must prune comparably on both
    full = _seed(spark, ds, tmp_path, 0, 8000, name="full")
    ds.append(spark.createDataFrame(
        [(i, i % 7, f"x{i}") for i in range(8000, 10000)],
        "a int, b int, s string").repartition(4), full)
    ds.cluster(full, ["a"], target_files=10, strategy="zorder")

    inc = _seed(spark, ds, tmp_path, 0, 8000, name="inc")
    ds.cluster(inc, ["a"], target_files=8, strategy="zorder")
    ds.append(spark.createDataFrame(
        [(i, i % 7, f"x{i}") for i in range(8000, 10000)],
        "a int, b int, s string").repartition(4), inc)
    ds.cluster(inc, ["a"], target_files=2, strategy="zorder",
               incremental=True)

    total_inc = len(resolve_snapshot(inc.path).files)
    # a 5% slice in the OLD range: the incremental layout reads the
    # matching old-cube file(s) plus at most the new cube's overlap —
    # never the whole table
    c_full = _candidates(full.path, "a", 1000, 1400)
    c_inc = _candidates(inc.path, "a", 1000, 1400)
    assert c_inc <= c_full + 1, (c_inc, c_full)
    assert c_inc < total_inc, "incremental layout must still prune"
    # a slice entirely in the NEW data prunes to the new cube
    assert _candidates(inc.path, "a", 8500, 8900) <= 2


def test_changed_columns_or_strategy_invalidate_stamps(spark, ds, tmp_path):
    ref = _seed(spark, ds, tmp_path, 0, 2000)
    ds.cluster(ref, ["a"], target_files=2, strategy="zorder")
    # different strategy: everything is unclustered again
    n = ds.cluster(ref, ["a"], target_files=2, strategy="hilbert",
                   incremental=True)
    assert n == 2
    # different columns too
    n = ds.cluster(ref, ["a", "b"], target_files=2, strategy="hilbert",
                   incremental=True)
    assert n == 2


def test_optimize_zorder_stamps_count_as_clustered(spark, ds, tmp_path):
    ref = _seed(spark, ds, tmp_path, 0, 2000)
    ds.optimize(ref, zorder_by=["a"], strategy="zorder",
                target_size_mb=128)
    # the OPTIMIZE ZORDER layout already satisfies the same stamp
    assert ds.cluster(ref, ["a"], strategy="zorder", incremental=True) == 0


def test_cluster_cli_incremental_flag(spark, ds, tmp_path):
    from x_spark.cli import main

    ref = _seed(spark, ds, tmp_path, 0, 1000)
    assert main(["cluster", ref.path, "--by", "a", "--strategy", "zorder",
                 "--target-files", "2"]) == 0
    v = resolve_snapshot(ref.path).version
    assert main(["cluster", ref.path, "--by", "a", "--strategy", "zorder",
                 "--incremental"]) == 0
    assert resolve_snapshot(ref.path).version == v  # converged no-op
