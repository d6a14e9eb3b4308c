"""zorder_value unit behavior: dtype coverage, null placement, locality."""

import pytest
from pyspark.sql import functions as F

from x_spark.operators.zorder import zorder_value


def test_zorder_value_mixed_dtypes_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "apple", "2024-01-01"), (100, "zebra", "2024-12-31"),
         (50, "mango", "2024-06-15"), (None, None, None)],
        "n int, s string, d string",
    ).withColumn("d", F.col("d").cast("date"))
    out = df.withColumn("z", zorder_value(df, ["n", "s", "d"])).collect()
    z = {r.n: r.z for r in out}
    assert all(r.z is not None and r.z >= 0 for r in out)
    # nulls bucket to 0 in every dimension -> smallest z
    assert z[None] == 0
    # min-corner row (1,'apple',jan) interleaves low bits; max corner high
    assert z[1] < z[50] < z[100]


def test_zorder_value_constant_and_unsupported(spark):
    df = spark.createDataFrame([(1, [1]), (2, [2])], "a int, arr array<int>")
    # constant column degrades to bucket 0, never errors
    one = spark.createDataFrame([(7,)] * 3, "a int")
    vals = one.withColumn("z", zorder_value(one, ["a"])).collect()
    assert {r.z for r in vals} == {0}
    with pytest.raises(ValueError):
        zorder_value(df, ["arr"])


def test_zorder_value_four_plus_columns_stay_nonnegative(spark):
    """4 clustered columns at 16 bits/col would write bit 63 (the
    bigint sign) and 5+ would wrap shifts mod 64 — bits/col must cap
    at floor(63/n) so extreme rows never go negative and order across
    the extremes is preserved."""
    rows = [
        (0, 0, 0, 0, 0),
        (1_000_000, 1_000_000, 1_000_000, 1_000_000, 1_000_000),
        (500_000, 500_000, 500_000, 500_000, 500_000),
    ]
    df = spark.createDataFrame(rows, "a int, b int, c int, d int, e int")
    for cols in (["a", "b", "c", "d"], ["a", "b", "c", "d", "e"]):
        out = df.withColumn("z", zorder_value(df, cols)).collect()
        zs = {r.a: r.z for r in out}
        assert all(r.z >= 0 for r in out), f"negative z with {len(cols)} cols"
        # all-min < mid < all-max corner ordering must survive the cap
        assert zs[0] < zs[500_000] < zs[1_000_000]
