"""profile_table: metric correctness on a hand-computable frame, NULL
semantics, and the approx-by-default / exact-opt-in distinct modes."""

import pytest

from x_spark.operators.profile import profile_table


def _prof(spark, df, **kw):
    return {
        (r.col_name, r.metric): r.value for r in profile_table(df, **kw).collect()
    }


def test_metrics_on_known_frame(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "aa"), (2, None, "bbbb"), (2, 30.0, None), (4, 20.0, "cc")],
        "k bigint, v double, s string",
    )
    p = _prof(spark, df, exact_distinct=True)
    assert p[("k", "null_count")] == 0.0
    assert p[("k", "n_distinct")] == 3.0
    assert p[("k", "min")] == 1.0 and p[("k", "max")] == 4.0
    assert p[("k", "p50")] == 2.0
    assert p[("v", "null_count")] == 1.0
    assert p[("v", "n_distinct")] == 3.0  # NULL excluded, like COUNT(DISTINCT)
    assert p[("v", "min")] == 10.0 and p[("v", "max")] == 30.0
    assert p[("v", "p50")] == 20.0  # percentile ignores NULLs
    assert p[("s", "null_count")] == 1.0
    assert p[("s", "avg_len")] == pytest.approx((2 + 4 + 2) / 3)
    assert p[("s", "max_len")] == 4.0
    # strings get no numeric range metrics
    assert ("s", "min") not in p and ("s", "p50") not in p


def test_column_subset_and_unknown_column(spark):
    df = spark.createDataFrame([(1, "x")], "k bigint, s string")
    p = _prof(spark, df, columns=["k"])
    assert {c for c, _ in p} == {"k"}
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, columns=["nope"])


def test_approx_distinct_is_the_default(spark):
    """The scale-safe approx plan is what callers get without asking;
    exact is the opt-in. Both must report an n_distinct per column."""
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "k bigint")
    exact = _prof(spark, df, exact_distinct=True)[("k", "n_distinct")]
    default = _prof(spark, df)[("k", "n_distinct")]
    assert exact == 7.0
    # HLL is an estimate but must be in the neighborhood
    assert 5.0 <= default <= 9.0
    # percentiles flip to the bounded-memory sketch in default mode;
    # on a small frame the sketch is near-exact
    p50 = _prof(spark, df)[("k", "p50")]
    assert 2.0 <= p50 <= 4.0


def test_default_profile_is_single_pass(spark):
    """In approx mode the whole profile folds into ONE aggregation
    (n_distinct rides the shared agg — no per-column distinct jobs,
    and no Expand since no exact countDistinct is present)."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k bigint, s string"
    )
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    # a union of per-column distinct plans would show several scans
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 1


def test_profile_drift_flags_changes(spark):
    from x_spark.operators.profile import profile_drift

    before = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, None)], "k bigint, v double"
    )
    after = before.filter("v IS NULL OR v <= 20.0")
    got = {
        (r.col_name, r.metric): r
        for r in profile_drift(before, after, exact_distinct=True).collect()
    }
    r = got[("v", "n_distinct")]
    assert (r.before_value, r.after_value, r.delta) == (3.0, 2.0, -1.0)
    assert r.rel_change == pytest.approx(-1 / 3, abs=1e-6)
    r = got[("v", "max")]
    assert (r.before_value, r.after_value) == (30.0, 20.0)
    # null_count unchanged -> delta 0, rel NULL (before 0? no, before=1)
    r = got[("v", "null_count")]
    assert (r.before_value, r.after_value, r.delta, r.rel_change) == (1.0, 1.0, 0.0, 0.0)
    # k shrank by one row
    assert got[("k", "n_distinct")].delta == -1.0


def test_skew_report_values(spark):
    from x_spark.operators.profile import skew_report

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("a",)] * 5 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string")
    got = [(r.k, r.n_rows, r.share, r.x_mean)
           for r in skew_report(df, ["k"], top=3).collect()]
    # mean key load = 100/4 = 25
    assert got == [("hot", 60, 0.6, 2.4), ("warm", 30, 0.3, 1.2),
                   ("a", 5, 0.05, 0.2)]
    import pytest as _p
    with _p.raises(ValueError):
        skew_report(df, [])
