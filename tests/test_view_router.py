"""Aggregate-view auto-routing (operators/view_router.py).

The router must (1) serve covered requests from the cheapest covering
view without touching the base table, (2) produce answers identical to
the base-scan fallback, (3) fall back whenever dims or measures are
not derivable, and (4) honor the staleness policy (auto-refresh /
serve-stale / fallback)."""

import pytest
from pyspark.sql import functions as F

from x_spark.operators.ivm import AggregateView
from x_spark.operators.view_router import Measure, Routed, ViewRouter
from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef


@pytest.fixture()
def ds(spark):
    return init_datasource("txlog", spark)


def _rows(df):
    return sorted(map(tuple, df.collect()), key=str)


@pytest.fixture()
def rig(spark, ds, tmp_path):
    """Base table + two maintained views: fine (part, grp) with minmax,
    coarse (part) without."""
    base = TableRef(path=str(tmp_path / "base"))
    df = spark.createDataFrame(
        [(1, "a", "x", 10.0), (2, "a", "y", 20.0), (3, "b", "x", 30.0),
         (4, "b", "y", 40.0), (5, "b", "y", 5.5)],
        "pk int, part string, grp string, v double",
    )
    ds.create(base, df.schema)
    ds.append(df, base)
    fine = AggregateView(
        ds, base, TableRef(path=str(tmp_path / "agg_fine")),
        keys=["part", "grp"], sums=["v"], minmax=["v"],
    )
    coarse = AggregateView(
        ds, base, TableRef(path=str(tmp_path / "agg_coarse")),
        keys=["part"], sums=["v"],
    )
    fine.refresh()
    coarse.refresh()
    router = ViewRouter(ds, base)
    router.register("fine", fine)
    router.register("coarse", coarse)
    return base, router, fine, coarse


MEASURES = [Measure("count", alias="n"), Measure("sum", "v", "total"),
            Measure("avg", "v", "mean")]


def test_routes_to_cheapest_covering_view(rig):
    base, router, fine, coarse = rig
    routed = router.route(["part"], MEASURES)
    assert isinstance(routed, Routed)
    # both views cover (part): coarse has fewer keys -> cheaper
    assert routed.served_from == "view:coarse"
    fallback = ViewRouter(router.ds, base)  # no views -> base path
    expect = fallback.route(["part"], MEASURES)
    assert expect.served_from == "base"
    assert _rows(routed.df) == _rows(expect.df)


def test_rollup_from_finer_view_and_minmax(rig):
    base, router, fine, coarse = rig
    ms = MEASURES + [Measure("min", "v"), Measure("max", "v")]
    routed = router.route(["part"], ms)
    # min/max force the fine view even though coarse has fewer keys
    assert routed.served_from == "view:fine"
    empty = ViewRouter(router.ds, base)
    assert _rows(routed.df) == _rows(empty.route(["part"], ms).df)


def test_empty_dims_grand_total(rig):
    base, router, *_ = rig
    routed = router.route([], MEASURES)
    assert routed.served_from == "view:coarse"
    [(n, total, mean)] = routed.df.collect()
    assert n == 5 and float(total) == pytest.approx(105.5)
    assert mean == pytest.approx(105.5 / 5)


def test_routed_plan_reads_view_not_base(rig):
    base, router, *_ = rig
    routed = router.route(["part"], MEASURES)
    files = routed.df.inputFiles()
    assert files, "expected a file-backed plan"
    assert all("agg_coarse" in f for f in files)
    assert not any("/base/" in f for f in files)


def test_fallback_when_dim_not_covered(rig):
    base, router, *_ = rig
    routed = router.route(["grp", "part"], MEASURES)
    assert routed.served_from == "view:fine"
    # pk is no view's key -> base
    routed = router.route(["pk"], [Measure("count")])
    assert routed.served_from == "base"


def test_fallback_when_measure_not_derivable(rig):
    base, router, *_ = rig
    # min over a column only the fine view tracks, but with a dim set
    # requiring... min over pk: no view tracks pk extrema -> base
    routed = router.route(["part"], [Measure("min", "pk")])
    assert routed.served_from == "base"
    with pytest.raises(ValueError):
        Measure("count_distinct", "v")
    with pytest.raises(ValueError):
        Measure("sum")  # sum without a column


def test_stale_policy_refresh_and_fallback(spark, ds, rig):
    base, router, fine, coarse = rig
    ds.append(
        spark.createDataFrame([(6, "c", "z", 100.0)],
                              "pk int, part string, grp string, v double"),
        base,
    )
    assert coarse.staleness() > 0
    # refresh="never", not allow_stale -> base (fresh values)
    routed = router.route(["part"], MEASURES, refresh="never")
    assert routed.served_from == "base"
    assert any(r.part == "c" for r in routed.df.collect())
    # allow_stale serves the old state (no part=c yet)
    stale = router.route(["part"], MEASURES, refresh="never", allow_stale=True)
    assert stale.served_from == "view:coarse"
    assert not any(r.part == "c" for r in stale.df.collect())
    # default policy refreshes then serves: view now fresh + complete
    fresh = router.route(["part"], MEASURES)
    assert fresh.served_from == "view:coarse"
    assert coarse.staleness() == 0
    empty = ViewRouter(ds, base)
    assert _rows(fresh.df) == _rows(empty.route(["part"], MEASURES).df)


def test_routed_equals_base_after_churn(spark, ds, rig):
    base, router, fine, coarse = rig
    ds.delete(base, "pk = 2")
    ds.append(
        spark.createDataFrame([(7, "a", "x", 1.25)],
                              "pk int, part string, grp string, v double"),
        base,
    )
    ms = MEASURES + [Measure("min", "v"), Measure("max", "v")]
    routed = router.route(["part", "grp"], ms)
    assert routed.served_from == "view:fine"
    empty = ViewRouter(ds, base)
    assert _rows(routed.df) == _rows(empty.route(["part", "grp"], ms).df)


def test_where_over_key_columns(spark, ds, rig):
    base, router, fine, coarse = rig
    ms = [Measure("count", alias="n"), Measure("sum", "v", "total")]
    # grp is a key of the fine view only -> coarse is skipped
    routed = router.route(["part"], ms, where="grp = 'y'",
                          where_cols={"grp"})
    assert routed.served_from == "view:fine"
    empty = ViewRouter(ds, base)
    expect = empty.route(["part"], ms, where="grp = 'y'",
                         where_cols={"grp"})
    assert expect.served_from == "base"
    assert _rows(routed.df) == _rows(expect.df)
    # predicate over a non-key column -> base fallback
    routed = router.route(["part"], ms, where="pk > 1", where_cols={"pk"})
    assert routed.served_from == "base"
    with pytest.raises(ValueError):
        router.route(["part"], ms, where="grp = 'y'")  # no where_cols


def test_register_rejects_foreign_base(ds, rig, tmp_path, spark):
    base, router, *_ = rig
    other = TableRef(path=str(tmp_path / "other"))
    df = spark.createDataFrame([(1, "a", 1.0)], "pk int, part string, v double")
    ds.create(other, df.schema)
    ds.append(df, other)
    view = AggregateView(ds, other, TableRef(path=str(tmp_path / "oagg")),
                         keys=["part"], sums=["v"])
    with pytest.raises(ValueError):
        router.register("foreign", view)
