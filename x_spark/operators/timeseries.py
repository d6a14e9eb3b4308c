"""Time-series resampling: regular per-key time grids with
last-observation-carried-forward (LOCF) gap fill — the
``time_bucket_gapfill`` shape hypertable engines ship and plain SQL
groupBy cannot express (an empty bucket has no row to group).

Shape (all DataFrame ops, one key shuffle):

1. bucket every observation to an epoch-aligned step
   (``floor(us / step) * step`` — integer math, engine-portable);
2. collapse to one row per (key, bucket): the LAST observation in the
   bucket wins (max ts, ties impossible per key+ts by contract —
   enforced with a deterministic max_by on the ts);
3. build each key's dense grid with ``sequence(min_bucket,
   max_bucket, step)`` + explode — per-key ranges, so a key active
   for an hour does not pay for the corpus's full history;
4. left-join observations onto the grid and fill holes with
   ``last(value, ignorenulls=True)`` over (key, bucket) — the LOCF
   window; rows before a key's first observation stay NULL (nothing
   to carry), and a ``filled`` flag marks carried rows.

Scale: the explode fans out to (range/step) rows per key — bounded by
the grid the caller asked for, never by other keys' history; the LOCF
window shuffles once on the key and scans each partition in bucket
order (no global sort). At 100 TB, step choice IS the output-size
knob, and the observed-side pre-collapse (step 2) happens before the
fan-out so the join is grid x 1, not grid x observations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from x_spark.functions.portable import umicros

_US = 1_000_000


def _bucketed_grid(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_sec: int,
):
    """Shared prelude of both resamplers: ``(grid, last_in_bucket,
    step)`` — epoch-aligned buckets, the deterministic last-in-bucket
    pick, and each key's dense bucket sequence. One place owns the
    bucketing and tie-break rules so the two fill strategies can never
    silently diverge."""
    if step_sec <= 0:
        raise ValueError("step_sec must be >= 1")
    step = int(step_sec) * _US
    us = umicros(ts_col)
    obs = df.select(
        F.col(key_col).alias("k"),
        (F.floor(us / F.lit(step)) * F.lit(step)).cast("bigint").alias("bucket_us"),
        us.alias("_us"),
        F.col(value_col).alias("_v"),
    )
    # one row per (key, bucket): the observation with the max ts wins;
    # ties on the exact same timestamp break by value so the pick is
    # total (max_by is nondeterministic under ties otherwise)
    last_in_bucket = obs.groupBy("k", "bucket_us").agg(
        F.max_by("_v", F.struct(F.col("_us"), F.col("_v"))).alias("obs_value")
    )
    spans = obs.groupBy("k").agg(
        F.min("bucket_us").alias("_lo"), F.max("bucket_us").alias("_hi")
    )
    grid = spans.select(
        "k",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))
        ).alias("bucket_us"),
    )
    return grid, last_in_bucket, step


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_sec: int,
) -> DataFrame:
    """``(key, bucket_us, value, filled)`` on a dense per-key grid —
    ``bucket_us`` is the epoch-aligned bucket start in microseconds,
    ``value`` the bucket's last observation carried forward across
    empty buckets, ``filled`` true where the value was carried."""
    grid, last_in_bucket, _ = _bucketed_grid(
        df, key_col, ts_col, value_col, step_sec
    )
    w = (
        Window.partitionBy("k")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(last_in_bucket, ["k", "bucket_us"], "left")
        .select(
            F.col("k").alias(key_col),
            "bucket_us",
            F.last("obs_value", ignorenulls=True).over(w).alias("value"),
            F.col("obs_value").isNull().alias("filled"),
        )
    )


def resample_interp(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_sec: int,
) -> DataFrame:
    """Linear-interpolation twin of :func:`resample_locf`:
    ``(key, bucket_us, value, filled)`` where an empty bucket's value
    is the straight line between the key's surrounding observed
    buckets — lerp on the BUCKET axis (the grid's time coordinate):
    ``v = v_prev + (v_next - v_prev) * (t - t_prev) / (t_next -
    t_prev)``. Buckets before the first / after the last observation
    carry the boundary value (edge convention). The lerp is a fixed
    IEEE expression — every op correctly rounded, same result in any
    engine, so it hash-compares.

    Same plan shape as LOCF plus one forward-looking window (the
    next-observation side): still one key shuffle, no global sort."""
    grid, last_in_bucket, _ = _bucketed_grid(
        df, key_col, ts_col, value_col, step_sec
    )
    wb = (
        Window.partitionBy("k")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("k")
        .orderBy("bucket_us")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    joined = grid.join(last_in_bucket, ["k", "bucket_us"], "left")
    obs_t = F.when(F.col("obs_value").isNotNull(), F.col("bucket_us"))
    prev_v = F.last("obs_value", ignorenulls=True).over(wb)
    prev_t = F.last(obs_t, ignorenulls=True).over(wb)
    next_v = F.first("obs_value", ignorenulls=True).over(wf)
    next_t = F.first(obs_t, ignorenulls=True).over(wf)
    lerp = prev_v + (next_v - prev_v) * (
        (F.col("bucket_us") - prev_t).cast("double")
        / (next_t - prev_t).cast("double")
    )
    value = (
        F.when(F.col("obs_value").isNotNull(), F.col("obs_value"))
        .when(prev_v.isNull(), next_v)   # before first obs: backfill edge
        .when(next_v.isNull(), prev_v)   # after last obs: carry edge
        .otherwise(lerp)
    )
    return joined.select(
        F.col("k").alias(key_col),
        "bucket_us",
        value.alias("value"),
        F.col("obs_value").isNull().alias("filled"),
    )


def rolling_anomalies(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n: int = 50,
    z_thresh: float = 2.5,
    min_periods: int = 10,
) -> DataFrame:
    """Trailing-window z-score anomaly detection: flag a point whose
    value sits more than ``z_thresh`` standard deviations from the
    mean of the PREVIOUS ``n`` points of its key (the point itself is
    excluded from its own baseline — an anomaly must not dilute the
    statistics that judge it).

    Variance comes from exact DECIMAL(30,6) window sums of the value
    and its square (the ``stats.py`` closed-form convention — a plain
    double window stddev is association-order-dependent and would not
    hash-match any oracle); the closed forms then run in double on the
    exact sums, so the whole expression tree is IEEE-reproducible.

    Output: ``(event_id, <key_col>, value, n_window, zscore)`` for
    flagged rows only, zscore rounded to 6dp; rows with fewer than
    ``min_periods`` predecessors or zero baseline variance are never
    flagged.

    Scale shape: ONE shuffle on the key; the frame is rows-bounded
    (``n`` rows of running state per key in the window operator —
    never the whole partition buffered). The window PARTITION count is
    the key cardinality, so pick a key that scales with the data
    (user/device/series id): a handful of global keys means a handful
    of window partitions each processed sequentially, regardless of
    cluster size. The registry demo partitions by ``event_type``
    because the oracle needs the exact same tiny grouping — a
    production baseline would be per-entity.
    """
    if n < 1 or min_periods < 2:
        raise ValueError("need n >= 1 and min_periods >= 2")
    v = F.col(value_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(umicros(ts_col), F.col(id_col))
        .rowsBetween(-n, -1)
    )
    cnt = F.count(value_col).over(w)
    s1 = F.sum(v.cast("decimal(30,6)")).over(w)
    s2 = F.sum((v * v).cast("decimal(30,6)")).over(w)
    mean = s1.cast("double") / cnt
    var = s2.cast("double") / cnt - mean * mean
    stats = events.select(
        F.col(id_col), F.col(key_col), v.alias("value"),
        cnt.alias("n_window"),
        mean.alias("_mean"), var.alias("_var"),
    )
    z = (F.col("value") - F.col("_mean")) / F.sqrt(F.col("_var"))
    return (
        stats.filter((F.col("n_window") >= min_periods) & (F.col("_var") > 0))
        .filter(F.abs(z) > z_thresh)
        .select(
            id_col, key_col, "value",
            F.col("n_window").cast("bigint").alias("n_window"),
            F.round(z, 6).alias("zscore"),
        )
    )
