"""resample_locf: hand-computable grids — gap fill, leading NULLs,
bucket alignment, last-in-bucket pick, tie determinism."""

import datetime as dt

import pytest

from x_spark.operators.timeseries import resample_locf

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
US = 1_000_000
STEP = 60  # 1-minute buckets


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), v) for (u, s, v) in rows],
        "user_id bigint, ts timestamp, value double",
    )


def _grid(df):
    return {
        (r.user_id, r.bucket_us): (r.value, r.filled) for r in df.collect()
    }


def test_gaps_filled_with_last_observation(spark):
    # user 1: obs in minute 0 and minute 3 -> minutes 1, 2 carry v=10
    ev = _ev(spark, [(1, 10, 10.0), (1, 185, 40.0)])
    got = _grid(resample_locf(ev, "user_id", "ts", "value", STEP))
    base = int(T0.timestamp()) * US
    assert got == {
        (1, base + 0 * 60 * US): (10.0, False),
        (1, base + 1 * 60 * US): (10.0, True),
        (1, base + 2 * 60 * US): (10.0, True),
        (1, base + 3 * 60 * US): (40.0, False),
    }


def test_last_observation_in_bucket_wins(spark):
    # two obs inside minute 0: the later ts wins; exact-tie ts -> max value
    ev = _ev(spark, [(1, 5, 1.0), (1, 50, 2.0), (2, 7, 9.0), (2, 7, 3.0)])
    got = _grid(resample_locf(ev, "user_id", "ts", "value", STEP))
    base = int(T0.timestamp()) * US
    assert got[(1, base)] == (2.0, False)
    assert got[(2, base)] == (9.0, False)


def test_per_key_grids_are_independent(spark):
    # user 2's long history must not widen user 1's grid
    ev = _ev(spark, [(1, 0, 1.0), (2, 0, 5.0), (2, 600, 6.0)])
    got = _grid(resample_locf(ev, "user_id", "ts", "value", STEP))
    assert len([k for k in got if k[0] == 1]) == 1
    assert len([k for k in got if k[0] == 2]) == 11  # minutes 0..10


def test_determinism_across_partitionings(spark):
    rows = [(u, s * 37 % 600, float(s)) for u in (1, 2, 3) for s in range(20)]
    ev = _ev(spark, rows)
    a = _grid(resample_locf(ev, "user_id", "ts", "value", STEP))
    b = _grid(resample_locf(ev.repartition(7), "user_id", "ts", "value", STEP))
    assert a == b


def test_step_validation(spark):
    with pytest.raises(ValueError, match="step_sec"):
        resample_locf(_ev(spark, [(1, 0, 1.0)]), "user_id", "ts", "value", 0)


def test_interp_lerps_between_observations(spark):
    from x_spark.operators.timeseries import resample_interp

    # minute 0: v=10, minute 4: v=50 -> minutes 1,2,3 lerp to 20,30,40
    ev = _ev(spark, [(1, 0, 10.0), (1, 245, 50.0)])
    got = _grid(resample_interp(ev, "user_id", "ts", "value", STEP))
    base = int(T0.timestamp()) * US
    assert got == {
        (1, base + 0 * 60 * US): (10.0, False),
        (1, base + 1 * 60 * US): (20.0, True),
        (1, base + 2 * 60 * US): (30.0, True),
        (1, base + 3 * 60 * US): (40.0, True),
        (1, base + 4 * 60 * US): (50.0, False),
    }


def test_interp_edges_carry_boundary(spark):
    from x_spark.operators.timeseries import resample_interp

    # one observation only: the whole (single-bucket) grid is that value
    ev = _ev(spark, [(1, 30, 7.0)])
    got = _grid(resample_interp(ev, "user_id", "ts", "value", STEP))
    assert list(got.values()) == [(7.0, False)]
