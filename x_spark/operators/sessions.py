"""Behavioral event analytics, batch side: gap-based sessionization,
ordered funnel stages, cohort retention — the classic event-stream
OLAP triple every product-analytics workload runs (the streaming twin
of sessionization lives in ``plans/streams.py`` as
``session_window``; this is the replayable-batch shape).

All three are pure DataFrame plans (window functions + grouped
aggregates + broadcast-sized stage joins — no UDFs, no collects), and
all epoch math goes through ``portable.umicros`` so TIMESTAMP and
TIMESTAMP_NTZ inputs behave identically (DuckDB mirror:
``epoch_us``). Week arithmetic uses integer floor-division on epoch
days — engine-independent, immune to date_trunc('week') dialect
differences.

Scale notes: sessionization is ONE shuffle on user_id (the window
partition), then per-session aggregation reuses the same partitioning
map-side. Funnel stage tables are per-user aggregates (small); the
stage joins all hash on user_id, so AQE plans them without
re-shuffling the aggregated side more than once. Cohort retention is
two grouped aggregates over (user, week) — distinct-user counting is
pre-collapsed per (cohort, offset, user) before the count, which is
the two-stage exact-distinct shape that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from x_spark.functions.portable import umicros

SESSION_GAP_SEC = 1800  # 30 min, the industry-default session gap
_US_PER_DAY = 86_400_000_000
_US_PER_WEEK = 7 * _US_PER_DAY


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = SESSION_GAP_SEC,
) -> DataFrame:
    """Assign a session index per user: a new session starts when the
    gap since the user's previous event exceeds ``gap_sec``. Classic
    lag + running-sum-of-flags; ties on ts are ordered by the full
    sort key (ts, then event order within the frame is irrelevant —
    the flag only looks at the gap).

    Returns the input plus ``(session_idx bigint, ts_us bigint)``.
    """
    w = W.partitionBy(user_col).orderBy("ts_us")
    return (
        df.withColumn("ts_us", umicros(ts_col))
        .withColumn("_prev", F.lag("ts_us").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull()
                | (F.col("ts_us") - F.col("_prev") > gap_sec * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("_new").over(w).cast("bigint"))
        .drop("_prev", "_new")
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = SESSION_GAP_SEC,
) -> DataFrame:
    """Per-session aggregates: ``(user, session_idx, n_events,
    session_start_us, session_end_us, duration_sec)``. One shuffle on
    the user key for the window, then the groupBy reuses it."""
    s = sessionize(df, user_col, ts_col, gap_sec)
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.round(
            (F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000.0), 6
        ).alias("duration_sec"),
    )


def funnel_stages(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_sec: int | None = None,
) -> DataFrame:
    """ORDERED funnel: a user reaches stage i when an event of type
    ``stages[i]`` occurs at-or-after the time they reached stage i-1
    (first-touch semantics: the earliest qualifying timestamp per
    stage). ``within_sec`` additionally bounds each step to a
    conversion window — stage i must land within that many seconds of
    stage i-1 (the "converted within 24h" shape). Returns one row per
    stage: ``(stage_idx int, stage string, n_users bigint)``.

    Shape — ONE lazy plan, one scan, two exchanges, zero persists:
    the event table is pre-filtered to the funnel's event types (the
    predicate pushes to the parquet scan), shuffled ONCE by user, and
    each stage's first-touch timestamp is a ``min(when(...))`` window
    over the user partition. The stage-over-stage dependency (stage i
    qualifies only at-or-after stage i-1's minimum) chains k Window
    operators over the SAME partitioning, so Catalyst plans them on
    one exchange with no re-shuffle; the per-user reduction
    (``groupBy(u)``) reuses that partitioning too. The only other
    exchange carries one partial-aggregate row per partition into the
    final k stage counts, unpivoted to rows with ``stack`` — the
    whole funnel is a single job whose cost is one pushed-down scan
    plus one hash shuffle of the funnel-relevant slice, at any scale.
    (This replaced a per-stage join chain over a persisted slice:
    same result, ~2k shuffles -> 2, and no cache lifecycle to manage;
    sf0.1 went 1.30 s -> ~0.5 s.)
    """
    spark = df.sparkSession
    schema = "stage_idx int, stage string, n_users bigint"
    if not stages:
        return spark.createDataFrame([], schema)
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        umicros(ts_col).alias("us"),
    ).filter(F.col("t").isin(list(stages)))
    w = W.partitionBy("u")
    cur = ev
    prev: str | None = None
    stage_cols: list[str] = []
    for i, stage in enumerate(stages):
        cond = F.col("t") == stage
        if prev is not None:
            # NULL-safe monotonicity: us >= NULL is NULL, so a user who
            # never reached stage i-1 can never reach stage i
            cond = cond & (F.col("us") >= F.col(prev))
            if within_sec is not None:
                # multiply in Python: an int32 literal product overflows
                # under ANSI for windows past ~35 min
                cond = cond & (
                    F.col("us") - F.col(prev)
                    <= F.lit(int(within_sec) * 1_000_000).cast("bigint")
                )
        name = f"_stage_us_{i}"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col("us"))).over(w))
        prev = name
        stage_cols.append(name)
    # one row per user (stage columns are per-user constants; first()
    # rides the window's hash partitioning — no new exchange), then k
    # stage counts in one aggregate. count(u)-style distinct counting
    # would drop NULL users; the per-user reduction keeps the NULL
    # group, matching GROUP BY semantics.
    per_user = cur.groupBy("u").agg(
        *[F.first(c).alias(c) for c in stage_cols]
    )
    counts = per_user.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col(c).isNotNull(), 1)), F.lit(0)
            ).cast("bigint").alias(f"_n_{i}")
            for i, c in enumerate(stage_cols)
        ]
    )
    stack_args = ", ".join(
        # stage labels are data, not SQL: escape embedded quotes
        "int({}), '{}', _n_{}".format(i, stage.replace("'", "''"), i)
        for i, stage in enumerate(stages)
    )
    return counts.select(
        F.expr(
            f"stack({len(stages)}, {stack_args}) "
            "as (stage_idx, stage, n_users)"
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = absolute epoch-week of the
    user's FIRST event; a user is retained at offset k if they have
    any event in cohort_week + k. Returns
    ``(cohort_week bigint, week_offset bigint, n_users bigint)``.

    Weeks are ``floor(epoch_us / 7 days)`` — integer math, identical
    in every engine (no date_trunc dialect trap). Exact distinct users
    via pre-collapse per (cohort, offset, user) then count — the
    scalable two-stage distinct."""
    weeks = df.select(
        F.col(user_col).alias("u"),
        F.floor(umicros(ts_col) / F.lit(_US_PER_WEEK)).alias("wk"),
    )
    first = weeks.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    # (u, wk) distinct already implies (cohort_week, offset, u) distinct
    # — cohort_week is a function of u — so ONE distinct suffices (no
    # second dedup shuffle before the count)
    active = weeks.distinct().join(first, "u")
    return (
        active.select(
            "cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset"), "u"
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )
