"""Temporal join operators: as-of join (point-in-time lookup).

The reference has no temporal operators (SURVEY §2.4 J3 — ABSENT);
this is the north-star extension for time-series/feature-store
workloads: for each left row, the most recent right row with
``right_ts <= left_ts`` for the same key.

Spark-first implementation — the union+window formulation:

    tag left rows m=1, right rows m=0; union; one window per key
    ordered by (ts, m, tiebreak) carrying last non-null right payload
    (ROWS UNBOUNDED PRECEDING); keep left rows.

This costs ONE shuffle of (|L|+|R|) rows on the key — no per-key
cross join, no range explosion, and skew is bounded by the hottest
key (AQE handles moderate cases). The classic alternative (range
join) is O(|L|x|R|) per key; at 100 TB the union+window shape is the
one that survives. Ties: a right row at exactly left_ts counts
(at-or-before); among right ties the largest ``tiebreak`` wins —
fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from x_spark.functions.portable import umicros


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: float = -1800.0,
    upper_sec: float = 0.0,
) -> DataFrame:
    """Interval join: pairs (l, r) with the same key and
    ``l.left_ts + lower_sec <= r.right_ts < l.left_ts + upper_sec``.

    Bucketized implementation — the scalable alternative to a raw
    theta-join (which Spark executes as a per-key cross product):
    time is tiled into buckets of the interval width; each left row
    probes the <=2 buckets its window spans, right rows sit in exactly
    one bucket, and the join is pure equi on (key, bucket) with an
    exact residual filter. Candidate fan-out is bounded by actual
    temporal locality, never |L|x|R| per key.

    Returns left rows joined to matching right rows (inner); columns
    are the left columns plus right columns suffixed ``_r``.
    """
    width_us = int((upper_sec - lower_sec) * 1_000_000)
    if width_us <= 0:
        raise ValueError("upper_sec must exceed lower_sec")
    lo_us = int(lower_sec * 1_000_000)
    up_us = int(upper_sec * 1_000_000)

    l2 = left.select(
        *[F.col(c) for c in left.columns],
        umicros(F.col(left_ts)).alias("__lus"),
    ).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((F.col("__lus") + F.lit(lo_us)) / F.lit(width_us)),
                F.floor((F.col("__lus") + F.lit(up_us)) / F.lit(width_us)),
            )
        ),
    )
    r2 = right.select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns],
        umicros(F.col(right_ts)).alias("__rus"),
    ).withColumn("__bucket", F.floor(F.col("__rus") / F.lit(width_us)))
    on = [l2[k] == r2[f"{k}_r"] for k in key_cols] + [l2["__bucket"] == r2["__bucket"]]
    joined = l2.join(r2, reduce_and(on)).filter(
        (F.col("__rus") >= F.col("__lus") + F.lit(lo_us))
        & (F.col("__rus") < F.col("__lus") + F.lit(up_us))
    )
    return joined.select(
        *[l2[c] for c in left.columns],
        *[r2[f"{c}_r"] for c in right.columns],
    )


def reduce_and(conds):
    from functools import reduce

    return reduce(lambda a, b: a & b, conds)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Point-in-time join: left rows + ``<col>_asof`` columns holding
    the payload of the latest right row at-or-before the left
    timestamp (NULL when none exists)."""
    payload = right_payload or [c for c in right.columns if c not in key_cols]
    r_struct = F.struct(
        *[F.col(c).alias(c) for c in payload],
        F.col(right_ts).alias("__asof_ts"),
    )
    order_tb = (
        F.col(tiebreak).cast("long") if tiebreak else F.lit(0)
    )
    l2 = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__m"),
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{f.name}:{f.dataType.simpleString()}" for f in right.select(r_struct.alias("s")).schema["s"].dataType.fields
            ) + ">"
        ).alias("__r"),
    )
    r2 = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__m"),
        order_tb.alias("__tb"),
        F.lit(None).cast(l2.schema["__l"].dataType.simpleString()).alias("__l"),
        r_struct.alias("__r"),
    )
    u = l2.unionByName(r2)
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), F.col("__m").asc(), F.col("__tb").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last("__r", ignorenulls=True).over(w)
    out = (
        u.withColumn("__carried", carried)
        .filter(F.col("__m") == 1)
        .select(
            F.col("__l.*"),
            *[F.col(f"__carried.{c}").alias(f"{c}_asof") for c in payload],
            F.col("__carried.__asof_ts").alias("asof_ts"),
        )
    )
    return out
