"""Behavioral event analytics: sessionization, funnel, cohort —
hand-computable frames."""

import datetime as dt

from pyspark.sql import functions as F

from x_spark.operators.sessions import (
    cohort_retention,
    funnel_stages,
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, t) for i, (s, u, t) in enumerate(rows)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )


def test_sessionize_splits_on_gap(spark):
    # user 1: events at 0s, 100s, 4000s (gap>1800 -> new session), 4100s
    # user 2: single event
    ev = _ev(
        spark,
        [(0, 1, "view"), (100, 1, "view"), (4000, 1, "view"),
         (4100, 1, "view"), (50, 2, "view")],
    )
    got = {
        (r.user_id, r.ts_us): r.session_idx
        for r in sessionize(ev, gap_sec=1800).collect()
    }
    u1 = sorted((us, sid) for (u, us), sid in got.items() if u == 1)
    assert [sid for _, sid in u1] == [1, 1, 2, 2]
    assert [sid for (u, _), sid in got.items() if u == 2] == [1]


def test_session_stats_values(spark):
    ev = _ev(spark, [(0, 1, "view"), (100, 1, "view"), (4000, 1, "view")])
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.duration_sec)
        for r in session_stats(ev, gap_sec=1800).collect()
    }
    assert got == {(1, 1): (2, 100.0), (1, 2): (1, 0.0)}


def test_funnel_requires_stage_order(spark):
    # user 1: view -> click -> purchase (full funnel)
    # user 2: click BEFORE view, purchase after -> reaches view, then a
    #         later click? none after view -> stops at view
    # user 3: view -> click, no purchase
    ev = _ev(
        spark,
        [
            (0, 1, "view"), (10, 1, "click"), (20, 1, "purchase"),
            (0, 2, "click"), (10, 2, "view"), (20, 2, "purchase"),
            (0, 3, "view"), (10, 3, "click"),
        ],
    )
    got = {r.stage: r.n_users for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()}
    # user 2 has no click at/after their first view -> drops at stage 1;
    # their purchase can't count without reaching click first
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_counts(spark):
    """A stage event at EXACTLY the previous stage's time qualifies
    (>=, first-touch convention)."""
    ev = _ev(spark, [(0, 1, "view"), (0, 1, "click")])
    got = {r.stage: r.n_users for r in funnel_stages(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_cohort_retention_matrix(spark):
    week = 7 * 86400
    # user 1 first in week W, active W and W+2; user 2 first in W+1
    ev = _ev(
        spark,
        [
            (0, 1, "view"), (2 * week + 5, 1, "view"),
            (week + 5, 2, "view"), (week + 6, 2, "view"),
        ],
    )
    base = 2817  # floor(epoch_us(2024-01-01) / week_us): fixed epoch week
    got = {
        (r.cohort_week - base, r.week_offset): r.n_users
        for r in cohort_retention(ev).collect()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_sessions_deterministic_across_partitionings(spark):
    rows = [((i * 977) % 5000, i % 7, "view") for i in range(200)]
    ev = _ev(spark, rows)
    a = sorted(map(tuple, session_stats(ev, gap_sec=600).collect()))
    b = sorted(map(tuple, session_stats(ev.repartition(13), gap_sec=600).collect()))
    assert a == b


def test_funnel_conversion_window(spark):
    """within_sec bounds each step: a click 2h after the view converts
    only when the window allows it."""
    ev = _ev(spark, [(0, 1, "view"), (7200, 1, "click"),
                     (0, 2, "view"), (60, 2, "click")])
    tight = {r.stage: r.n_users
             for r in funnel_stages(ev, ["view", "click"], within_sec=600).collect()}
    loose = {r.stage: r.n_users
             for r in funnel_stages(ev, ["view", "click"], within_sec=7200).collect()}
    assert tight == {"view": 2, "click": 1}
    assert loose == {"view": 2, "click": 2}


def test_funnel_scans_events_once(spark):
    """The event table must be materialized exactly ONCE no matter how
    many funnel stages run (verdict r4 #4: the per-stage loop used to
    re-scan the base table k times; the one-pass window plan scans
    once BY CONSTRUCTION — one FileScan under one shuffle). The base
    frame is wrapped in a row-counting mapInPandas tap — an opaque
    barrier no filter can be pushed through — so the accumulator
    records every base-table materialization."""
    rows = [
        (0, 1, "view"), (10, 1, "click"), (20, 1, "purchase"),
        (0, 2, "view"), (10, 2, "click"),
        (0, 3, "view"), (5, 3, "noise"), (9, 3, "signup"),
    ]
    base = _ev(spark, rows)
    acc = spark.sparkContext.accumulator(0)

    def tap(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    tapped = base.mapInPandas(tap, base.schema)
    got = {
        r.stage: r.n_users
        for r in funnel_stages(tapped, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 3, "click": 2, "purchase": 1}
    assert acc.value == len(rows), (
        f"events table scanned {acc.value / len(rows):.1f}x (want exactly 1x)"
    )


def _persistent_rdd_ids(spark) -> set:
    """IDs (not count) of persisted RDDs: the ContextCleaner can reap a
    stale block from an EARLIER test mid-assertion, so count equality is
    flaky in full-suite runs; "no NEW ids" is the leak check we mean."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {rdd.id() for rdd in jmap.values()}


def test_funnel_unpersists_everything(spark):
    """funnel_stages cleans up all its persisted intermediates — a
    long-lived session must not accumulate cached blocks per call."""
    before = _persistent_rdd_ids(spark)
    ev = _ev(spark, [(0, 1, "view"), (10, 1, "click")])
    funnel_stages(ev, ["view", "click"]).collect()
    assert _persistent_rdd_ids(spark) <= before


def test_deep_funnel_correct_and_cache_free(spark):
    """A 6-stage funnel: correctness of the chained window minima at
    depth, and the one-pass plan never creates cached blocks."""
    stages = ["s1", "s2", "s3", "s4", "s5", "s6"]
    rows = []
    for u in range(1, 5):
        # user u completes the first u+2 stages in order
        for i in range(min(u + 2, 6)):
            rows.append((i * 10, u, stages[i]))
    ev = _ev(spark, rows)
    before = _persistent_rdd_ids(spark)
    got = {r.stage: r.n_users for r in funnel_stages(ev, stages).collect()}
    assert got == {"s1": 4, "s2": 4, "s3": 4, "s4": 3, "s5": 2, "s6": 1}
    assert _persistent_rdd_ids(spark) <= before


def test_funnel_plan_shape_one_scan_two_exchanges(spark, tmp_path):
    """The funnel compiles to ONE lazy plan: a single parquet scan
    with the stage-type predicate pushed down, exactly one hash
    exchange by user (the k chained Windows and the per-user groupBy
    all reuse it), one single-partition exchange of partial-aggregate
    rows, and no SinglePartition window anywhere."""
    rows = [
        (0, 1, "view"), (10, 1, "click"), (20, 1, "purchase"),
        (0, 2, "view"), (10, 2, "click"),
        (0, 3, "view"), (9, 3, "signup"),
    ]
    _ev(spark, rows).write.parquet(str(tmp_path / "ev"))
    base = spark.read.parquet(str(tmp_path / "ev"))
    plan = funnel_stages(
        base, ["view", "click", "purchase"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert "PushedFilters: [In(event_type" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1
    assert "windowspecdefinition(u#" in plan  # windows keyed by user...
    # ...and never global: every windowspec carries the partition key
    import re

    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert spec.startswith("windowspecdefinition(u#"), spec


def test_funnel_stage_labels_with_quotes(spark):
    """Stage labels are data: an embedded quote must not break (or
    inject into) the unpivot SQL."""
    from x_spark.operators.sessions import funnel_stages

    ev = spark.createDataFrame(
        [(0, 1, "sign'up"), (10, 1, "o'brien_click")],
        "ts long, user_id int, event_type string",
    )
    got = {r.stage: r.n_users
           for r in funnel_stages(ev, ["sign'up", "o'brien_click"]).collect()}
    assert got == {"sign'up": 1, "o'brien_click": 1}
