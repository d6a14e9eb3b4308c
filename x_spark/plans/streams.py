"""Structured-Streaming query battery over the events table.

Each query executes a real streaming pipeline (readStream file source
-> event-time operator -> AvailableNow trigger -> memory sink /
foreachBatch merge) and returns the final result DataFrame. Because
the operators are event-time based (not processing-time), results are
independent of micro-batch slicing, so each has an exact batch-SQL
DuckDB oracle — the streaming entries get the STRONG correctness
check, not the rows-only fallback.

The reference has no streaming at all (SURVEY §2.11); this battery is
the north-star extension mapped to watermarks + tumbling windows +
session windows + foreachBatch merge (reusing W4 upsert semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from x_spark.streaming.events import (
    chunked_events_dir,
    read_events_stream,
    rollup_final_user_stats,
    rollup_sessions,
    run_to_memory,
    session_profile,
    stateful_user_stats,
    stateful_user_stats_tws,
    stream_stream_click_purchase,
    streaming_ivm_join,
    streaming_ivm_totals,
    streaming_upsert_totals,
    tumbling_profile,
    user_stats_agg,
)

SESSION_GAP_US = 10 * 60 * 1_000_000


def q_stream_tumbling_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    return run_to_memory(tumbling_profile(stream), "complete", shuffle_partitions=8)


ORACLE_STREAM_TUMBLING_PROFILE = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def q_stream_session_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    return rollup_sessions(
        run_to_memory(session_profile(stream), "complete", shuffle_partitions=8)
    )


# Spark session_window: windows [ts, ts+gap) merge while they overlap,
# so a new session starts when the gap to the previous event is >= gap;
# window end = last event + gap. The oracle is the classic
# gaps-and-islands formulation of exactly that rule.
ORACLE_STREAM_SESSION_PROFILE = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), per AS (
  SELECT user_id, sid, count(*) AS n_events,
         epoch_us(max(ts)) + {SESSION_GAP_US} - epoch_us(min(ts)) AS dur_us
  FROM sess GROUP BY user_id, sid
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS total_events,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       max(dur_us) / 1000000.0 AS max_session_sec
FROM per GROUP BY user_id
"""


def q_stream_upsert_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # in-memory accumulator: the MERGE-per-microbatch shape without
    # store I/O (the benched baseline for the streaming-upsert plan)
    return streaming_upsert_totals(spark, sf_dir, accumulator="memory")


def q_stream_upsert_totals_txlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    # production shape: state in a txlog table, every micro-batch MERGE
    # committed atomically WITH its epoch id (exactly-once under
    # at-least-once foreachBatch replay). Costs ~0.4s/microbatch more
    # than the memory variant — that is the durable-commit price, not
    # plan overhead (profiled: stats probe + candidate read + commit).
    return streaming_upsert_totals(spark, sf_dir, accumulator="txlog")


ORACLE_STREAM_UPSERT_TOTALS = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
"""


def q_stream_ivm_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bronze-append + maintained-rollup shape: each micro-batch appends
    # raw rows to a txlog base (epoch-stamped add-only commit) and
    # refreshes an AggregateView from the change feed — exactly-once on
    # both layers; the view's refresh cost is O(batch), never O(corpus).
    return streaming_ivm_totals(spark, sf_dir)


ORACLE_STREAM_IVM_USER_TOTALS = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
"""


def q_stream_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # streaming ingest -> mergeable histogram sketch store (exactly-
    # once epoch-stamped summaries, replay asserted in-flow) -> p50/
    # p90/p99 per event type FROM the store. Lossless merge makes the
    # result independent of micro-batch boundaries, so the oracle is a
    # plain batch bucket-count + inverse-CDF interpolation (mirrored
    # IEEE term for term, like quantile_sketch_store).
    from x_spark.streaming.events import streaming_quantile_sketch

    return streaming_quantile_sketch(spark, sf_dir)


# grid [0, 600) x 60 -> width 10.0 (exact double)
ORACLE_STREAM_QUANTILE_SKETCH = """
WITH pts AS (
  SELECT event_type AS g, value AS v FROM events WHERE value IS NOT NULL
),
b AS (
  SELECT g,
         CASE WHEN fb < 0 THEN -1
              WHEN fb >= 60 THEN 60
              ELSE fb END AS bucket,
         count(*) AS n, min(v) AS blo, max(v) AS bhi
  FROM (SELECT g, v,
               CAST(floor((v - 0.0) / 10.0) AS INT) AS fb
        FROM pts)
  GROUP BY 1, 2
),
cum AS (
  SELECT g, bucket, n,
         sum(n) OVER (PARTITION BY g ORDER BY bucket) AS cum,
         sum(n) OVER (PARTITION BY g) AS total,
         min(blo) OVER (PARTITION BY g) AS gmin,
         max(bhi) OVER (PARTITION BY g) AS gmax
  FROM b
),
qs AS (SELECT CAST(q AS DOUBLE) AS q
       FROM (VALUES (0.5), (0.9), (0.99)) t(q)),
j AS (
  SELECT *, GREATEST(CAST(ceil(q * total) AS BIGINT), 1) AS r
  FROM cum CROSS JOIN qs
)
SELECT g AS event_type, q,
       CASE WHEN bucket < 0 THEN gmin
            WHEN bucket >= 60 THEN gmax
            ELSE GREATEST(LEAST((0.0 + bucket * 10.0)
                                + ((r - (cum - n)) / n) * 10.0,
                                gmax), gmin)
       END AS value
FROM j
WHERE cum >= r AND (cum - n) < r
"""


def q_stream_ivm_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fact-to-dim maintained JOIN view: streaming fact appends
    # (epoch-stamped) + dim merge/delete mid-stream, per-epoch delta
    # refresh; final aggregate == plain join of the final base states.
    return streaming_ivm_join(spark, sf_dir)


ORACLE_STREAM_IVM_JOIN_VIEW = """
WITH dim AS (
  SELECT DISTINCT user_id FROM events
), dim2 AS (
  SELECT user_id,
         CASE WHEN user_id % 3 = 0 THEN 'MOVED'
              ELSE concat('t', CAST(user_id % 5 AS VARCHAR)) END AS tier
  FROM dim WHERE user_id % 11 <> 0
)
SELECT tier, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
FROM events e JOIN dim2 d USING (user_id)
GROUP BY tier, event_type
"""


def q_stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 2 micro-batches: enough to exercise cross-batch state carry; the
    # per-group Python cost scales with groups x batches, and this query
    # is the documented custom-state *pattern* — q_stream_user_stats_agg
    # is the production shape for these built-in-expressible stats.
    src = chunked_events_dir(spark, sf_dir, n_chunks=2)
    stream = read_events_stream(spark, sf_dir, path=src, max_files_per_trigger=1)
    emitted = run_to_memory(stateful_user_stats(stream), "append", shuffle_partitions=8)
    return rollup_final_user_stats(emitted)


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def q_stream_stateful_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``transformWithStateInPandas`` flavor of the custom-state
    operator (Spark 4.x successor API). Requires the RocksDB state
    store provider, scoped to this query and restored after — the
    session invariant is that queries never leak conf changes."""
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, _ROCKSDB_PROVIDER)
    try:
        src = chunked_events_dir(spark, sf_dir, n_chunks=2)
        stream = read_events_stream(spark, sf_dir, path=src, max_files_per_trigger=1)
        emitted = run_to_memory(
            stateful_user_stats_tws(stream), "append", shuffle_partitions=8
        )
        # materialize under the RocksDB conf (memory-sink table is lazy)
        emitted = emitted.localCheckpoint(eager=True)
    finally:
        if old is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, old)
    return rollup_final_user_stats(emitted)


def q_stream_user_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in streaming aggregation over the same chunked multi-batch
    source — JVM state store, no Python; hash-matches the same oracle
    as the custom-state variant."""
    src = chunked_events_dir(spark, sf_dir, n_chunks=4)
    stream = read_events_stream(spark, sf_dir, path=src, max_files_per_trigger=1)
    return run_to_memory(user_stats_agg(stream), "complete", shuffle_partitions=8)


ORACLE_STREAM_STATEFUL_USER_STATS = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS total_cents,
       max(value) AS max_value
FROM events
GROUP BY user_id
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(
        stream_stream_click_purchase(spark, sf_dir), "append", shuffle_partitions=8
    )


ORACLE_STREAM_STREAM_JOIN = """
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id,
       (epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0 AS gap_sec
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts < p.ts
"""


def q_stream_sliding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (2 h length, 30 min slide): every
    event lands in exactly length/slide = 4 overlapping windows —
    the moving-average shape. State is bounded by watermark horizon x
    (length/slide) windows per key. Window starts are emitted as epoch
    seconds so both engines compare plain BIGINTs."""
    from pyspark.sql import functions as F

    from x_spark.functions.portable import umicros

    stream = read_events_stream(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "2 hours", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
        )
        .select(
            (umicros(F.col("w.start")) / F.lit(1_000_000)).cast("bigint").alias("window_start_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return run_to_memory(windowed, "complete", shuffle_partitions=8)


# Spark's sliding windows align to the epoch: the 4 windows containing
# ts start at floor(epoch/1800)*1800 - i*1800 for i in 0..3 (each is a
# 7200-second window with ts inside). The oracle replays exactly that.
ORACLE_STREAM_SLIDING_PROFILE = """
SELECT CAST(floor(epoch_us(ts) / 1000000.0 / 1800) * 1800 - i * 1800 AS BIGINT) AS window_start_epoch,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
FROM events, unnest([0, 1, 2, 3]) AS u(i)
GROUP BY 1, 2
"""


def q_stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup via ``dropDuplicatesWithinWatermark``:
    the input is doubled (every event arrives twice — the at-least-once
    ingestion case), the operator keeps the first arrival per event_id,
    and state evicts once the watermark passes (bounded by horizon x
    arrival rate, not stream length). Emitted rows are batch-aggregated
    so the oracle is a plain GROUP BY over the original table."""
    from pyspark.sql import functions as F

    stream = read_events_stream(spark, sf_dir)
    doubled = stream.withColumn(
        "__copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("__copy")
    deduped = (
        doubled.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", "value")
    )
    out = run_to_memory(deduped, "append", shuffle_partitions=8)
    return out.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
    )


ORACLE_STREAM_DEDUP_EVENTS = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
"""


STREAM_QUERIES = {
    "stream_stream_join": q_stream_stream_join,
    "stream_dedup_events": q_stream_dedup_events,
    "stream_sliding_profile": q_stream_sliding_profile,
    "stream_stateful_user_stats": q_stream_stateful_user_stats,
    "stream_user_stats_agg": q_stream_user_stats_agg,
    "stream_tumbling_profile": q_stream_tumbling_profile,
    "stream_session_profile": q_stream_session_profile,
    "stream_upsert_totals": q_stream_upsert_totals,
    "stream_upsert_totals_txlog": q_stream_upsert_totals_txlog,
    "stream_ivm_user_totals": q_stream_ivm_user_totals,
    "stream_ivm_join_view": q_stream_ivm_join_view,
    "stream_quantile_sketch": q_stream_quantile_sketch,
}

STREAM_ORACLES = {
    "stream_stream_join": ORACLE_STREAM_STREAM_JOIN,
    "stream_dedup_events": ORACLE_STREAM_DEDUP_EVENTS,
    "stream_sliding_profile": ORACLE_STREAM_SLIDING_PROFILE,
    "stream_stateful_user_stats": ORACLE_STREAM_STATEFUL_USER_STATS,
    # same oracle: the built-in agg must match the custom-state operator
    "stream_user_stats_agg": ORACLE_STREAM_STATEFUL_USER_STATS,
    "stream_tumbling_profile": ORACLE_STREAM_TUMBLING_PROFILE,
    "stream_session_profile": ORACLE_STREAM_SESSION_PROFILE,
    "stream_upsert_totals": ORACLE_STREAM_UPSERT_TOTALS,
    # same oracle: exactly-once txlog state must match the memory path
    "stream_upsert_totals_txlog": ORACLE_STREAM_UPSERT_TOTALS,
    "stream_ivm_user_totals": ORACLE_STREAM_IVM_USER_TOTALS,
    "stream_ivm_join_view": ORACLE_STREAM_IVM_JOIN_VIEW,
    "stream_quantile_sketch": ORACLE_STREAM_QUANTILE_SKETCH,
}
