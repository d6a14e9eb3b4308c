"""Deterministic second-moment statistics: hand-computable values,
NULL-pair exclusion, partitioning determinism."""

import pytest
from pyspark.sql import functions as F

from x_spark.operators.stats import corr_matrix, grouped_linreg


def test_corr_matrix_known_values(spark):
    # y = 2x exactly -> corr 1; z anti-correlated with x -> corr -1
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)],
        "x double, y double, z double",
    )
    got = {(r.col_x, r.col_y): (r.n, r.corr) for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    assert got[("x", "y")] == (3, 1.0)
    assert got[("x", "z")] == (3, -1.0)
    assert got[("y", "z")] == (3, -1.0)


def test_corr_null_policies(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0, 5.0), (2.0, None, 5.0), (3.0, 3.0, 5.0)],
        "x double, y double, c double",
    )
    pw = {
        (r.col_x, r.col_y): (r.n, r.corr)
        for r in corr_matrix(df, ["x", "y", "c"], null_policy="pairwise").collect()
    }
    # pairwise: the NULL y row drops from the (x, y) pair only
    assert pw[("x", "y")] == (2, 1.0)
    assert pw[("x", "c")][0] == 3
    # constant column -> zero variance -> NULL corr
    assert pw[("x", "c")][1] is None
    # complete (default): the NULL row drops everywhere
    comp = {
        (r.col_x, r.col_y): r.n for r in corr_matrix(df, ["x", "y", "c"]).collect()
    }
    assert set(comp.values()) == {2}
    with pytest.raises(ValueError, match="null_policy"):
        corr_matrix(df, ["x", "y"], null_policy="bogus")


def test_corr_policies_agree_on_null_free_data(spark):
    rows = [(float((i * 37) % 100), float((i * 91) % 83)) for i in range(300)]
    df = spark.createDataFrame(rows, "x double, y double")
    a = sorted(map(tuple, corr_matrix(df, ["x", "y"]).collect()))
    b = sorted(
        map(tuple, corr_matrix(df, ["x", "y"], null_policy="pairwise").collect())
    )
    assert a == b


def test_grouped_linreg_known_fit(spark):
    # group a: y = 3x + 1 exactly; group b: constant x -> NULL fit
    rows = [("a", float(x), 3.0 * x + 1.0) for x in range(1, 6)]
    rows += [("b", 2.0, 5.0), ("b", 2.0, 7.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_linreg(df, "x", "y", ["g"]).collect()}
    a = got["a"]
    assert (a.slope, a.intercept, a.r2) == (3.0, 1.0, 1.0)
    b = got["b"]
    assert b.slope is None and b.intercept is None and b.r2 is None


def test_stats_deterministic_across_partitionings(spark):
    rows = [(float((i * 37) % 100), float((i * 91) % 83), str(i % 3)) for i in range(500)]
    df = spark.createDataFrame(rows, "x double, y double, g string")
    a = sorted(map(tuple, grouped_linreg(df, "x", "y", ["g"]).collect()))
    b = sorted(map(tuple, grouped_linreg(df.repartition(17), "x", "y", ["g"]).collect()))
    assert a == b
    c = sorted(map(tuple, corr_matrix(df, ["x", "y"]).collect()))
    d = sorted(map(tuple, corr_matrix(df.repartition(13), ["x", "y"]).collect()))
    assert c == d
