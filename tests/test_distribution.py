"""Semantic unit tests for the distribution-profiling additions:
value_histogram / trimmed_stats (operators/profile.py) and
rolling_anomalies (operators/timeseries.py). Cross-engine hash parity
is covered by test_oracle_parity.py."""

import datetime as dt

import pytest
from pyspark.sql import Row

from x_spark.operators.profile import trimmed_stats, value_histogram
from x_spark.operators.timeseries import rolling_anomalies


def test_histogram_buckets_and_shares(spark):
    df = spark.createDataFrame(
        [(x,) for x in [0.5, 1.0, 4.99, 5.0, 9.99, 10.0, None]], "v double"
    )
    out = {r.bucket: r for r in value_histogram(df, "v", width=5.0).collect()}
    assert {b: out[b].n_rows for b in out} == {0: 3, 1: 2, 2: 1}
    assert out[1].bucket_lo == 5.0
    assert abs(out[0].share - 0.5) < 1e-9  # NULL excluded from the total


def test_histogram_negative_values_floor_not_truncate(spark):
    # -0.01 must land in bucket -1 (floor), not bucket 0 (truncation)
    df = spark.createDataFrame([Row(v=-0.01), Row(v=-5.0), Row(v=0.0)])
    buckets = {r.bucket for r in value_histogram(df, "v", width=5.0).collect()}
    assert buckets == {-1, 0}


def test_histogram_rejects_bad_width(spark):
    df = spark.createDataFrame([Row(v=1.0)])
    with pytest.raises(ValueError):
        value_histogram(df, "v", width=0.0)
    with pytest.raises(ValueError):
        value_histogram(df, "v", width=0.001, scale=2)  # below resolution


def test_trimmed_stats_drops_exact_extremes(spark):
    # 10 rows 1..10 plus outliers -1000/+1000; trim 1/12th each side
    vals = list(range(1, 11)) + [-1000, 1000]
    df = spark.createDataFrame([Row(g="a", v=float(v), i=i) for i, v in enumerate(vals)])
    r = trimmed_stats(df, "v", ["g"], ["i"], trim_frac=1 / 12).collect()[0]
    assert (r.n_total, r.n_kept) == (12, 10)
    assert r.trimmed_min == 1.0 and r.trimmed_max == 10.0
    assert abs(r.trimmed_mean - 5.5) < 1e-9


def test_trimmed_stats_zero_trim_keeps_all(spark):
    df = spark.createDataFrame([Row(g="a", v=float(v), i=v) for v in range(5)])
    r = trimmed_stats(df, "v", ["g"], ["i"], trim_frac=0.0).collect()[0]
    assert (r.n_total, r.n_kept) == (5, 5)


def test_trimmed_stats_validates_args(spark):
    df = spark.createDataFrame([Row(g="a", v=1.0, i=0)])
    with pytest.raises(ValueError):
        trimmed_stats(df, "v", [], ["i"])
    with pytest.raises(ValueError):
        trimmed_stats(df, "v", ["g"], ["i"], trim_frac=0.5)


def _event_rows(values, key="t"):
    t0 = dt.datetime(2025, 1, 1)
    return [
        Row(event_id=i, event_type=key, ts=t0 + dt.timedelta(minutes=i), value=float(v))
        for i, v in enumerate(values)
    ]


def test_rolling_anomalies_flags_planted_spike(spark):
    # stable baseline then one spike; the spike is flagged, baseline not
    vals = [10.0, 11.0, 10.0, 11.0, 10.0, 11.0, 10.0, 11.0, 10.0, 11.0, 500.0, 10.0]
    df = spark.createDataFrame(_event_rows(vals))
    out = rolling_anomalies(df, n=10, z_thresh=3.0, min_periods=5)
    rows = out.collect()
    assert [r.event_id for r in rows] == [10]
    assert rows[0].zscore > 3.0
    assert rows[0].n_window == 10


def test_rolling_anomalies_excludes_self_from_baseline(spark):
    # the row AFTER the spike: its baseline now contains the spike, so a
    # normal value must not be flagged purely because variance exploded
    vals = [10.0, 11.0] * 5 + [500.0] + [10.0, 11.0, 10.0, 11.0, 10.0]
    df = spark.createDataFrame(_event_rows(vals))
    flagged = {r.event_id for r in rolling_anomalies(df, n=10, z_thresh=3.0, min_periods=5).collect()}
    assert 10 in flagged
    assert not flagged & set(range(11, 16))


def test_rolling_anomalies_min_periods_and_zero_variance(spark):
    # constant series: variance 0 -> never flagged, even with min_periods met
    df = spark.createDataFrame(_event_rows([7.0] * 20))
    assert rolling_anomalies(df, n=10, z_thresh=1.0, min_periods=5).count() == 0
    with pytest.raises(ValueError):
        rolling_anomalies(df, n=0)
