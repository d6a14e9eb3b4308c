"""Mergeable fixed-grid histogram sketches: lossless merge (exact,
not tolerance-based — unlike HLL), bounded-error quantiles, and the
maintained txlog store flow with exactly-once ingest."""

import pytest
from pyspark.sql import functions as F

from x_spark.operators.histsketch import (
    build_histograms,
    merge_histograms,
    quantiles_from_histograms,
    quantiles_from_store,
    update_histogram_store,
)
from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef

LO, HI, N = 0.0, 100.0, 50
W = (HI - LO) / N


@pytest.fixture()
def ds(spark):
    return init_datasource("txlog", spark)


def _data(spark, seed_shift=0):
    rows = [(("a" if i % 3 else "b"), float((i * 37 + seed_shift) % 100))
            for i in range(600)]
    return spark.createDataFrame(rows, "g string, v double")


def _hist_map(df, g):
    r = df.filter(F.col("g") == g).first()
    return dict(r.buckets), r.n_rows, r.vmin, r.vmax


def test_build_counts_everything_including_out_of_range(spark):
    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 99.9), ("a", 150.0), ("a", None)],
        "g string, v double",
    )
    h = build_histograms(df, "v", ["g"], LO, HI, N)
    m, n, vmin, vmax = _hist_map(h, "a")
    assert n == 4                      # NULL excluded, nothing else lost
    assert m[-1] == 1 and m[N] == 1    # underflow + overflow buckets
    assert vmin == -5.0 and vmax == 150.0
    assert sum(m.values()) == 4


def test_merge_is_lossless_exactly(spark):
    d1, d2 = _data(spark), _data(spark, seed_shift=13)
    one_shot = build_histograms(d1.unionAll(d2), "v", ["g"], LO, HI, N)
    merged = merge_histograms(
        build_histograms(d1, "v", ["g"], LO, HI, N).unionByName(
            build_histograms(d2, "v", ["g"], LO, HI, N)),
        ["g"],
    )
    a = sorted((r.g, sorted(r.buckets.items()), r.n_rows, r.vmin, r.vmax)
               for r in one_shot.collect())
    b = sorted((r.g, sorted(r.buckets.items()), r.n_rows, r.vmin, r.vmax)
               for r in merged.collect())
    assert a == b                      # EXACT — counts just add


def test_quantiles_within_one_bucket_width(spark):
    df = _data(spark)
    h = build_histograms(df, "v", ["g"], LO, HI, N)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = {
        (r.g, r.q): r.value
        for r in quantiles_from_histograms(h, ["g"], LO, HI, N, qs).collect()
    }
    import numpy as np

    pdf = df.toPandas()
    for g in ("a", "b"):
        vals = np.sort(pdf[pdf.g == g].v.values)
        for q in qs:
            exact = vals[max(int(np.ceil(q * len(vals))) - 1, 0)]
            assert abs(got[(g, q)] - exact) <= W + 1e-9, (g, q)
    # estimates never leave the observed range
    for (g, _q), v in got.items():
        vals = pdf[pdf.g == g].v
        assert vals.min() <= v <= vals.max()


def test_coarser_grouping_and_degenerate_groups(spark):
    df = _data(spark)
    h = build_histograms(df, "v", ["g"], LO, HI, N)
    # collapse to a global grouping: quantiles over ALL rows
    glob = quantiles_from_histograms(
        h.withColumn("all", F.lit(1)), ["all"], LO, HI, N, [0.5],
    ).first()
    import numpy as np

    vals = np.sort(_data(spark).toPandas().v.values)
    assert abs(glob.value - vals[int(np.ceil(0.5 * len(vals))) - 1]) <= W
    # single-row group: every quantile is that row's value
    one = build_histograms(
        spark.createDataFrame([("z", 42.0)], "g string, v double"),
        "v", ["g"], LO, HI, N,
    )
    for r in quantiles_from_histograms(one, ["g"], LO, HI, N,
                                       [0.01, 0.5, 0.99]).collect():
        assert abs(r.value - 42.0) <= W


def test_store_incremental_equals_one_shot_and_replay_safe(
        spark, ds, tmp_path):
    from x_spark.sources.txlog import TxnAlreadyCommittedException

    store = TableRef(path=str(tmp_path / "hs"))
    d1, d2 = _data(spark), _data(spark, seed_shift=13)
    update_histogram_store(ds, store, d1, "v", ["g"], LO, HI, N,
                           txn=("hist_app", 0))
    update_histogram_store(ds, store, d2, "v", ["g"], LO, HI, N,
                           txn=("hist_app", 1))
    # replayed epoch: exactly-once, nothing double-counted
    with pytest.raises(TxnAlreadyCommittedException):
        update_histogram_store(ds, store, d2, "v", ["g"], LO, HI, N,
                               txn=("hist_app", 1))
    qs = [0.25, 0.5, 0.95]
    inc = sorted(
        (r.g, r.q, r.value)
        for r in quantiles_from_store(ds, store, ["g"], LO, HI, N,
                                      qs).collect()
    )
    one = sorted(
        (r.g, r.q, r.value)
        for r in quantiles_from_histograms(
            build_histograms(d1.unionAll(d2), "v", ["g"], LO, HI, N),
            ["g"], LO, HI, N, qs).collect()
    )
    assert inc == one                  # EXACT, not within-tolerance


def test_psi_drift_from_sketches(spark):
    from x_spark.operators.histsketch import drift_from_histograms

    base = _data(spark)
    same = build_histograms(base, "v", ["g"], LO, HI, N)
    shifted = build_histograms(
        base.withColumn("v", F.least(F.col("v") + 40.0, F.lit(99.9))),
        "v", ["g"], LO, HI, N,
    )
    stable = {r.g: r.psi for r in
              drift_from_histograms(same, same, ["g"], N).collect()}
    moved = {r.g: r.psi for r in
             drift_from_histograms(same, shifted, ["g"], N).collect()}
    for g in ("a", "b"):
        assert stable[g] < 1e-9          # identical dist: PSI ~ 0
        assert moved[g] > 0.25           # 40-point shift: flagged
    r = drift_from_histograms(same, shifted, ["g"], N).first()
    assert r.n_ref > 0 and r.n_cur > 0


def test_psi_one_sided_group_flags_not_crashes(spark):
    """A category present in only one period (total 0 on the other
    side) must produce a finite, large PSI — not an ANSI 0/0 error."""
    from x_spark.operators.histsketch import drift_from_histograms

    ref = build_histograms(_data(spark), "v", ["g"], LO, HI, N)
    cur = build_histograms(
        _data(spark).withColumn("g", F.concat(F.col("g"), F.lit("_new"))),
        "v", ["g"], LO, HI, N,
    )
    out = {r.g: r.psi for r in
           drift_from_histograms(ref, cur, ["g"], N).collect()}
    assert set(out) == {"a", "b", "a_new", "b_new"}
    assert all(v > 0.25 for v in out.values())  # everything shifted
