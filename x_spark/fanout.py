"""Layout-adaptive scan parallelization.

Several operators do heavy per-row work (md5 shingling, DECIMAL(30,6)
moment accumulation, exact-percentile buffering, Expand) in the stage
BEFORE the first exchange. That stage's parallelism is fixed by the
input layout: a table stored as one file with one row group — this
repo's bench testdata, or a gzip/one-big-file input on a cluster —
plans as ONE scan task, so the expensive projection serializes on a
single core no matter how many are available (optimization guide §2.5,
"input skew: one huge unsplittable file ... repartition immediately
after the read").

:func:`fan_out` applies exactly that guide fix, but only when the
layout actually needs it: if the frame already plans at least
``threshold_frac`` x the session's default parallelism it passes
through untouched — on a healthy 100 TB table (thousands of splits)
this is a no-op and no shuffle is added; on a degenerate layout it
pays one narrow-row shuffle to unlock every core. Callers are expected
to project to the needed columns FIRST so the repartition moves only
the bytes the downstream compute reads (guide §2.3).

Only call this on frames whose plan is scan+project/filter (no
upstream shuffle): inspecting ``df.rdd`` materializes AQE query stages
if the plan contains an exchange, which would run real jobs at plan
time.

Correctness: ``repartition(n)`` is round-robin with Spark's
deterministic sort-before-repartition (SPARK-23207), and every
consumer in this repo that receives a fanned frame aggregates with
order-independent functions (exact DECIMAL sums, count/min/max,
exact-interpolation percentile, per-row hashes) — results are
bit-identical to the unfanned plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, threshold_frac: float = 0.5) -> DataFrame:
    """Round-robin repartition ``df`` to the session default
    parallelism iff its planned partition count is below
    ``threshold_frac`` x that parallelism. See module docstring."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if target <= 1:
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — un-inspectable plan: leave as is
        return df
    if n < target * threshold_frac:
        return df.repartition(target)
    return df
