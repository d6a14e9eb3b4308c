"""Mergeable HLL distinct sketches (operators/sketches.py): accuracy
bounds, union-vs-one-shot consistency, and the txlog-maintained
append-only store flow."""

import pytest
from pyspark.sql import functions as F

from x_spark.operators.sketches import (
    build_distinct_sketches,
    estimate_distinct,
    estimate_from_store,
    update_sketch_store,
)
from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef


@pytest.fixture()
def ds(spark):
    return init_datasource("txlog", spark)


def _users(spark, day_users):
    """rows (day, user_id) — day_users: {day: iterable of user ids}."""
    rows = [(d, u) for d, us in day_users.items() for u in us]
    return spark.createDataFrame(rows, "day string, user_id long")


def test_estimate_within_tolerance(spark):
    df = _users(spark, {"d1": range(5000), "d2": range(2500, 7500)})
    sk = build_distinct_sketches(df, "user_id", ["day"])
    per_day = {r.day: r.n_distinct for r in estimate_distinct(sk, ["day"]).collect()}
    assert abs(per_day["d1"] - 5000) / 5000 < 0.05
    assert abs(per_day["d2"] - 5000) / 5000 < 0.05
    # the union answers the cross-day distinct (7500) — a question the
    # per-day exact counts cannot answer without re-scanning raw data
    total = estimate_distinct(sk).collect()[0]
    assert abs(total.n_distinct - 7500) / 7500 < 0.05
    assert total.n_rows == 10000


def test_union_consistent_with_one_shot(spark):
    df = _users(spark, {"d": range(8000)})
    one_shot = estimate_distinct(
        build_distinct_sketches(df, "user_id", ["day"])
    ).collect()[0].n_distinct
    halves = build_distinct_sketches(
        df.withColumn("half", (F.col("user_id") % 2).cast("string")),
        "user_id",
        ["half"],
    )
    merged = estimate_distinct(halves).collect()[0].n_distinct
    # both are estimates of the same 8000; they must agree with the
    # truth (and hence each other) within tolerance
    assert abs(one_shot - 8000) / 8000 < 0.05
    assert abs(merged - 8000) / 8000 < 0.05


def test_store_flow_incremental_and_rolling(spark, ds, tmp_path):
    ref = TableRef(path=str(tmp_path / "sketches"))
    days = {f"d{i}": range(i * 500, i * 500 + 1000) for i in range(5)}
    for i, (d, us) in enumerate(sorted(days.items())):
        update_sketch_store(
            ds, ref, _users(spark, {d: us}), "user_id", ["day"],
            txn=("ingest", i),
        )
    # per-day estimates from the store
    per_day = {r.day: r.n_distinct
               for r in estimate_from_store(ds, ref, ["day"]).collect()}
    assert all(abs(v - 1000) / 1000 < 0.05 for v in per_day.values())
    # rolling slice (d2..d4): overlapping ranges, exact distinct = 2000
    rolled = estimate_from_store(ds, ref, where="day >= 'd2'").collect()[0]
    assert abs(rolled.n_distinct - 2000) / 2000 < 0.05
    # the filter reads sketch rows only: 5 rows in the store
    assert ds.read(ref).count() == 5


def test_store_repeated_unit_unions_not_duplicates(spark, ds, tmp_path):
    ref = TableRef(path=str(tmp_path / "sk2"))
    # the same day ingested twice with overlapping users must union,
    # not double-count
    update_sketch_store(ds, ref, _users(spark, {"d": range(1000)}), "user_id", ["day"])
    update_sketch_store(ds, ref, _users(spark, {"d": range(500, 1500)}), "user_id", ["day"])
    got = estimate_from_store(ds, ref, ["day"]).collect()[0]
    assert abs(got.n_distinct - 1500) / 1500 < 0.05
    assert got.n_rows == 2000  # raw row count still additive


def test_store_replay_is_exactly_once(spark, ds, tmp_path):
    from x_spark.sources.txlog import TxnAlreadyCommittedException

    ref = TableRef(path=str(tmp_path / "sk3"))
    batch = _users(spark, {"d": range(100)})
    update_sketch_store(ds, ref, batch, "user_id", ["day"], txn=("app", 1))
    with pytest.raises(TxnAlreadyCommittedException):
        update_sketch_store(ds, ref, batch, "user_id", ["day"], txn=("app", 1))
    assert ds.read(ref).count() == 1


def test_unit_cols_required(spark):
    df = _users(spark, {"d": range(10)})
    with pytest.raises(ValueError):
        build_distinct_sketches(df, "user_id", [])


def test_store_rejects_mismatched_lg_k(spark, ds, tmp_path):
    ref = TableRef(path=str(tmp_path / "sk4"))
    update_sketch_store(ds, ref, _users(spark, {"d": range(50)}), "user_id", ["day"], lg_k=12)
    with pytest.raises(ValueError, match="lg_k=12"):
        update_sketch_store(ds, ref, _users(spark, {"d": range(50)}), "user_id", ["day"], lg_k=13)
    # the store stays queryable after the rejected ingest
    assert estimate_from_store(ds, ref).collect()[0].n_rows == 50


def test_streaming_sketch_ingest_exactly_once(spark, ds, tmp_path, sf_dir):
    """Streaming composition: foreachBatch feeds per-epoch user-id
    sketches into the maintained store with txn stamping — replayed
    epochs are skipped BEFORE any write, and the final estimate agrees
    with the exact distinct over everything ingested."""
    from x_spark.streaming.events import chunked_events_dir, read_events_stream

    src_dir = chunked_events_dir(spark, sf_dir, n_chunks=3)
    stream = read_events_stream(spark, sf_dir, path=src_dir,
                                max_files_per_trigger=1)
    ref = TableRef(path=str(tmp_path / "stream_sk"))
    app = "stream_sketches"
    seen = []

    def ingest(batch_df, batch_id):
        if batch_id <= ds.last_txn_version(ref, app):
            return  # replayed epoch: durable already
        seen.append(batch_id)
        batch = batch_df.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
        )
        update_sketch_store(ds, ref, batch, "user_id", ["day"],
                            txn=(app, int(batch_id)))
        # simulate at-least-once delivery: a second call with the same
        # epoch must abort inside the store before any log entry lands
        with pytest.raises(Exception):
            update_sketch_store(ds, ref, batch, "user_id", ["day"],
                                txn=(app, int(batch_id)))

    q = (stream.writeStream.foreachBatch(ingest)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert len(seen) >= 2  # genuinely incremental

    got = estimate_from_store(ds, ref).collect()[0]
    from x_spark.session import load_table

    exact = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert abs(got.n_distinct - exact) / exact < 0.05
    # one sketch commit per epoch (plus create): gap-free txn chain
    assert ds.last_txn_version(ref, app) == max(seen)
