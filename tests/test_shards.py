"""Deterministic shuffle-shard map: stability across partitionings and
seeds, shard balance, and the write path's per-shard ordering."""

import os

import pytest
from pyspark.sql import functions as F

from x_spark.operators.shards import shard_manifest, shuffle_shards, write_shards


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc {i} body " + "w " * (i % 7)) for i in range(200)],
        "doc_id bigint, text string",
    )


def test_map_is_deterministic_across_partitionings(docs):
    a = sorted(map(tuple, shuffle_shards(docs, 8, seed="s1").collect()))
    b = sorted(map(tuple, shuffle_shards(docs.repartition(13), 8, seed="s1").collect()))
    assert a == b


def test_positions_are_dense_per_shard(docs):
    rows = shuffle_shards(docs, 4, seed="x").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.pos_in_shard)
    assert set(by_shard) <= set(range(4))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    assert sum(len(v) for v in by_shard.values()) == 200


def test_different_seed_reshuffles(docs):
    a = {r.doc_id: (r.shard_id, r.pos_in_shard)
         for r in shuffle_shards(docs, 8, seed="epoch0").collect()}
    b = {r.doc_id: (r.shard_id, r.pos_in_shard)
         for r in shuffle_shards(docs, 8, seed="epoch1").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 150  # an unrelated permutation, not a nudge


def test_shards_are_hash_balanced(docs):
    sizes = [r.n_docs for r in shard_manifest(shuffle_shards(docs, 4, seed="b")).collect()]
    assert len(sizes) == 4
    # 200 docs over 4 hash shards: no shard degenerate or dominant
    assert min(sizes) > 20 and max(sizes) < 80


def test_manifest_token_accounting(docs):
    from x_spark.functions.portable import token_count

    toks = docs.select("doc_id", token_count(F.col("text")).cast("bigint").alias("n"))
    man = shard_manifest(shuffle_shards(docs, 4, seed="m"), payload=toks, token_col="n")
    total = sum(r.total_tokens for r in man.collect())
    want = toks.agg(F.sum("n")).first()[0]
    assert total == want


def test_write_shards_orders_rows(docs, tmp_path):
    spark = docs.sparkSession
    shards = shuffle_shards(docs, 4, seed="w")
    out = os.path.join(str(tmp_path), "shards")
    write_shards(docs, shards, out)
    back = spark.read.parquet(out)
    assert back.count() == 200
    # every shard directory exists and its rows carry the map positions
    got = {(r.shard_id, r.pos_in_shard): r.doc_id for r in back.collect()}
    want = {(r.shard_id, r.pos_in_shard): r.doc_id for r in shards.collect()}
    assert got == want
    # ON-DISK row order is the permutation order: a loader streaming a
    # shard's file front-to-back must see pos_in_shard 0,1,2,... (read
    # the files directly with pyarrow — no Spark reordering in the way)
    import pyarrow.parquet as pq

    for d in sorted(os.listdir(out)):
        if not d.startswith("shard_id="):
            continue
        files = sorted(
            f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")
        )
        assert len(files) == 1, (d, files)  # one ordered file per shard
        poss = pq.read_table(os.path.join(out, d, files[0]))["pos_in_shard"].to_pylist()
        assert poss == sorted(poss) == list(range(len(poss))), d


def test_shuffle_plan_has_no_global_sort(docs):
    """The shard map must hash-partition on shard_id and rank within
    partitions — never a range-partitioned global sort (the 100 TB
    anti-pattern this operator exists to avoid)."""
    plan = shuffle_shards(docs, 8, seed="p")._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan
    assert "hashpartitioning(shard_id" in plan.lower(), plan


def test_global_positions_matches_sequential_and_is_dense(spark):
    from x_spark.operators.shards import global_positions

    rows = [(i, (i * 37) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, score long")
    out = global_positions(df, ["score", "id"], ascending=[False, True],
                           n_buckets=8)
    got = {r.id: r.position for r in out.collect()}
    want = {rid: pos + 1 for pos, (rid, _) in
            enumerate(sorted(rows, key=lambda r: (-r[1], r[0])))}
    assert got == want
    assert sorted(got.values()) == list(range(1, 201))  # dense, 1-based


def test_global_positions_independent_of_bucket_count(spark):
    from x_spark.operators.shards import global_positions

    df = spark.createDataFrame([(i, i % 7) for i in range(100)], "id long, s long")
    a = sorted(map(tuple, global_positions(df, ["s", "id"], n_buckets=2)
                   .select("id", "position").collect()))
    b = sorted(map(tuple, global_positions(df, ["s", "id"], n_buckets=16)
                   .select("id", "position").collect()))
    assert a == b


def test_global_positions_no_global_sort_in_plan(spark):
    from x_spark.operators.shards import global_positions

    df = spark.createDataFrame([(i,) for i in range(50)], "id long")
    out = global_positions(df, ["id"], n_buckets=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the rank must come from per-partition windows over the pinned
    # range layout, never a single-partition global Sort/Window (the
    # checkpoint cuts lineage, so the range exchange itself lives
    # behind the RDD scan — what must be provably absent downstream is
    # any SinglePartition exchange)
    assert "SinglePartition" not in plan
    # the row_number window partitions by the bucket id, never globally
    assert "windowspecdefinition(_p" in plan


def test_global_positions_validates_args(spark):
    import pytest as _pytest

    from x_spark.operators.shards import global_positions

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError):
        global_positions(df, [])
    with _pytest.raises(ValueError):
        global_positions(df, ["id"], ascending=[True, False])
