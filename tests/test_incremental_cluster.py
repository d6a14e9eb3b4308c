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


def test_auto_cluster_property_driven(spark, ds, tmp_path, monkeypatch):
    """Liquid-clustering auto-maintenance: the ``clusterBy`` table
    property + the ingest-path trigger keep the layout fresh with NO
    operator invoking cluster. Already-clustered files keep path
    identity across triggers; content is intact; residual unclustered
    debt stays below the trigger threshold."""
    ref = _seed(spark, ds, tmp_path, 0, 2000)
    ds.set_properties(ref, {"clusterBy": '["a"]'})
    monkeypatch.setattr(type(ds), "AUTO_CLUSTER_MIN_FILES", 3)
    stamp = {"cols": ["a"], "strategy": "range"}
    stamped_seen: set = set()
    for k in range(4):
        ds.append(spark.createDataFrame(
            [(i, i % 7, f"n{i}")
             for i in range(2000 + k * 500, 2500 + k * 500)],
            "a int, b int, s string").repartition(2), ref)
        snap = resolve_snapshot(ref.path)
        stamped = {p for p, a in snap.files.items()
                   if a.get("clusteredBy") == stamp}
        # files a previous trigger stamped survive byte-identical
        # until THEY are the debt of a column/strategy change (never
        # here) — path identity is the cheap proxy
        assert stamped_seen <= stamped | {
            p for p in stamped_seen if p not in snap.files
        } or stamped_seen <= stamped
        stamped_seen = stamped
    snap = resolve_snapshot(ref.path)
    unstamped = [p for p, a in snap.files.items()
                 if a.get("clusteredBy") != stamp]
    assert len(unstamped) < 3, "ingest never converged the layout"
    assert stamped_seen, "the trigger never fired"
    got = ds.read(ref).agg(F.count("*"), F.sum("a")).first()
    assert tuple(got) == (4000, sum(range(4000)))


def test_auto_cluster_pruning_equivalent_to_explicit(spark, ds, tmp_path,
                                                     monkeypatch):
    """The property-driven layout prunes like an explicitly
    maintained one: same data, same appends — one table auto-
    clustered by property, the twin by operator-invoked incremental
    passes — equal candidate counts for a narrow range predicate."""
    monkeypatch.setattr(type(ds), "AUTO_CLUSTER_MIN_FILES", 3)
    auto = _seed(spark, ds, tmp_path, 0, 4000, name="auto")
    ds.set_properties(auto, {"clusterBy": '["a"]'})
    manual = _seed(spark, ds, tmp_path, 0, 4000, name="manual")
    ds.cluster(manual, ["a"], incremental=True)
    for k in range(3):
        batch = [(i, i % 7, f"n{i}")
                 for i in range(4000 + k * 1000, 5000 + k * 1000)]
        df = spark.createDataFrame(batch, "a int, b int, s string")
        ds.append(df.repartition(2), auto)
        ds.append(df.repartition(2), manual)
        ds.cluster(manual, ["a"], incremental=True)
    a = _candidates(auto.path, "a", 100, 200)
    m = _candidates(manual.path, "a", 100, 200)
    total = len(resolve_snapshot(auto.path).files)
    assert a <= m + 2  # auto may carry sub-threshold residual debt
    assert a < total, "auto-clustered table shows no pruning at all"
    assert (ds.read(auto).agg(F.sum("a")).first()[0]
            == ds.read(manual).agg(F.sum("a")).first()[0])


def test_cluster_property_ddl_validation(spark, ds, tmp_path):
    ref = _seed(spark, ds, tmp_path, 0, 100)
    from x_spark.errors import DataSourceException

    with pytest.raises(DataSourceException, match="existing columns"):
        ds.set_properties(ref, {"clusterBy": '["nope"]'})
    with pytest.raises(DataSourceException, match="range, zorder"):
        ds.set_properties(ref, {"clusterBy": '["a"]',
                                "clusterBy.strategy": "mercator"})
    with pytest.raises(DataSourceException, match="existing columns"):
        ds.set_properties(ref, {"clusterBy": ""})
    # comma form normalizes to the canonical JSON list
    ds.set_properties(ref, {"clusterBy": "a, b",
                            "clusterBy.strategy": "hilbert"})
    snap = resolve_snapshot(ref.path)
    assert snap.configuration["clusterBy"] == '["a", "b"]'
    assert snap.configuration["clusterBy.strategy"] == "hilbert"


def test_auto_cluster_per_partition_scope(spark, ds, tmp_path,
                                          monkeypatch):
    """Round-10: per-partition convergence stamps. Ingest churn in ONE
    partition triggers clustering of that partition alone — unstamped
    files in cold partitions are never re-read or rewritten (pinned
    byte-identical), so enabling clusterBy on a pre-existing table
    can't make an ingest fire an O(table) rewrite."""
    import hashlib
    import os

    from pyspark.sql import types as T

    sch = "a int, part string, s string"
    ref = TableRef(path=str(tmp_path / "pp"))
    ds.create(ref, T._parse_datatype_string(sch), partition_by=["part"])

    def batch(lo, hi, part):
        return spark.createDataFrame(
            [(i, part, f"r{i}") for i in range(lo, hi)], sch
        ).coalesce(1)

    # cold partition: 2 unstamped files — below the (lowered) threshold
    ds.append(batch(0, 10, "cold"), ref)
    ds.append(batch(10, 20, "cold"), ref)
    ds.set_properties(ref, {"clusterBy": '["a"]'})
    monkeypatch.setattr(type(ds), "AUTO_CLUSTER_MIN_FILES", 3)

    def file_hashes(part):
        snap = resolve_snapshot(ref.path)
        out = {}
        for p, a in dict(snap.files).items():
            if (a.get("partitionValues") or {}).get("part") == part:
                with open(os.path.join(ref.path, p), "rb") as fh:
                    out[p] = hashlib.md5(fh.read()).hexdigest()
        return out

    cold_before = file_hashes("cold")
    assert len(cold_before) == 2

    # hot partition: 3 single-file appends -> debt 3 in 'hot' ALONE
    # (old table-wide counting would have fired at the FIRST hot
    # append: 2 cold + 1 hot = 3)
    ds.append(batch(100, 110, "hot"), ref)
    ds.append(batch(110, 120, "hot"), ref)
    ds.append(batch(120, 130, "hot"), ref)

    snap = resolve_snapshot(ref.path)
    files = dict(snap.files)
    stamp = {"cols": ["a"], "strategy": "range"}
    hot = {p: a for p, a in files.items()
           if (a.get("partitionValues") or {}).get("part") == "hot"}
    assert hot, "hot partition lost its files"
    assert all(a.get("clusteredBy") == stamp for a in hot.values()), \
        "hot partition did not converge"
    # cold partition: same paths, same bytes, still unstamped
    assert file_hashes("cold") == cold_before
    cold = {p: a for p, a in files.items()
            if (a.get("partitionValues") or {}).get("part") == "cold"}
    assert all(a.get("clusteredBy") is None for a in cold.values())
    # nothing lost
    assert ds.read(ref).count() == 50
    got = ds.read(ref).filter(F.col("part") == "hot").count()
    assert got == 30
