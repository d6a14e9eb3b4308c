"""profile_table: metric correctness on a hand-computable frame, NULL
semantics, and the approx-distinct escape hatch."""

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
    p = _prof(spark, df)
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


def test_approx_distinct_flag(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "k bigint")
    exact = _prof(spark, df)[("k", "n_distinct")]
    approx = _prof(spark, df, exact_distinct=False)[("k", "n_distinct")]
    assert exact == 7.0
    # HLL is an estimate but must be in the neighborhood
    assert 5.0 <= approx <= 9.0
