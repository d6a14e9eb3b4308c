"""Deterministic corpus shuffle + training-shard assignment.

Every pretraining run needs the corpus in a reproducible pseudo-random
order, materialized as fixed-count shards a data loader can stream.
The naive way — ``orderBy(rand())`` — is neither reproducible across
retries (rand() is partition-order dependent) nor scalable (a global
sort of 100 TB for an order no one needs to be TOTAL). What a loader
actually requires is:

- a seed-parameterized permutation that is STABLE: same seed + same
  corpus => identical shards, bit for bit, on any cluster/partitioning;
- balanced shards (hash-uniform, no planning pass over the data);
- a deterministic position within each shard (the loader's cursor).

Shape: one md5-based 60-bit key per row (``hash60(seed:id)`` — the
repo's portable hash, mirrored exactly in DuckDB oracles), shard =
``key mod n_shards``, position = rank of ``(key, id)`` within the
shard. ONE hash-partition shuffle on shard_id; the per-shard rank
window is partition-sized (shards are sized to the write unit —
1-4 GB — by choosing n_shards, so a shard always fits an executor).
No global sort, no driver-side data, no rand().

Reference parity: the reference has no training-order surface (its
scope ends at ETL); this extends the LLM-pipeline operator family
(SURVEY §2 extensions) alongside packing.py (which orders by doc id —
compose: shuffle first, then pack in ``(shard_id, pos_in_shard)``
order by feeding ``shard_key`` as the packing id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from x_spark.functions.portable import hash60


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "0",
) -> DataFrame:
    """``(id_col, shard_id, pos_in_shard)`` — the deterministic
    shuffle-shard map. ``seed`` reshuffles: a different seed yields an
    unrelated permutation (epoch reshuffling = bump the seed).

    Hash collisions (60-bit keys) are tie-broken by id, so the order
    is total and stable regardless of partitioning."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = hash60(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    keyed = df.select(F.col(id_col), key.alias("_sk"))
    w = Window.partitionBy("shard_id").orderBy("_sk", id_col)
    return (
        keyed.withColumn(
            "shard_id", F.pmod(F.col("_sk"), F.lit(n_shards)).cast("int")
        )
        .withColumn(
            "pos_in_shard", (F.row_number().over(w) - 1).cast("bigint")
        )
        .select(id_col, "shard_id", "pos_in_shard")
    )


def shard_manifest(
    shards: DataFrame,
    payload: DataFrame | None = None,
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest ``(shard_id, n_docs[, total_tokens])`` — the
    metadata a loader reads before touching data. One grouped
    aggregate over the map (plus a co-keyed join when ``payload`` with
    ``token_col`` is supplied for token accounting)."""
    base = shards
    aggs = [F.count("*").cast("bigint").alias("n_docs")]
    if payload is not None and token_col is not None:
        base = shards.join(payload.select(id_col, token_col), id_col)
        aggs.append(
            F.sum(F.col(token_col).cast("bigint")).cast("bigint").alias("total_tokens")
        )
    return base.groupBy("shard_id").agg(*aggs)


def write_shards(
    df: DataFrame,
    shards: DataFrame,
    path: str,
    id_col: str = "doc_id",
) -> None:
    """Materialize the shuffled corpus: join rows to their shard map
    and write parquet partitioned by ``shard_id``, each shard's file
    sorted by ``pos_in_shard`` (``sortWithinPartitions`` after a
    repartition ON shard_id — the sort never crosses shards, so this
    is the cheap per-shard ordering, not a global one). A loader
    streams ``shard_id=K/`` in row order and gets the permutation."""
    (
        df.join(shards, id_col)
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "pos_in_shard")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def global_positions(
    df: DataFrame,
    order_by: list[str],
    ascending: list[bool] | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """Append ``position`` (1-based bigint): each row's rank under the
    TOTAL order ``order_by`` (+ the caller ensuring the key list is a
    total order, e.g. ending in a unique id) — curriculum ordering,
    global sequence numbers, deterministic resume points.

    The scale trap with global ranks is ``row_number() OVER (ORDER BY
    ...)``: one partition ranks the world. This is the distributed
    two-stage form (the ``select_token_budget`` pattern generalized to
    COUNTS): range-partition on the order key (partition id order ==
    global order under a range partitioner), row_number inside each
    partition in parallel, then prefix-sum the per-partition COUNTS on
    the driver (``n_buckets`` longs) and broadcast them back as
    offsets. Result independent of sampled range boundaries — the rank
    is defined by the total order, whatever partition a row lands in.
    """
    if not order_by:
        raise ValueError("order_by must be non-empty")
    asc = ascending if ascending is not None else [True] * len(order_by)
    if len(asc) != len(order_by):
        raise ValueError("ascending must match order_by length")
    sort_cols = [
        F.asc(c) if up else F.desc(c) for c, up in zip(order_by, asc)
    ]
    # PIN the range partitioning: RangePartitioner samples boundaries
    # with a per-execution seed, so without materialization the counts
    # job and the ranking job could draw DIFFERENT boundaries and the
    # offsets would disagree with actual partition contents (wrong or
    # duplicated positions). localCheckpoint makes both jobs read the
    # same physical partitions.
    parts = (
        df.repartitionByRange(n_buckets, *sort_cols)
        .withColumn("_p", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("_p").orderBy(*sort_cols)
    intra = parts.withColumn("_rn", F.row_number().over(w))
    counts = {
        r["_p"]: r["n"]
        for r in parts.groupBy("_p").agg(F.count("*").alias("n")).collect()
    }
    offset, acc = {}, 0
    for p in sorted(counts):
        offset[p] = acc
        acc += counts[p]
    off_df = df.sparkSession.createDataFrame(
        [(p, v) for p, v in offset.items()] or [(0, 0)], "_p int, _off bigint"
    )
    return (
        intra.join(F.broadcast(off_df), "_p")
        .withColumn("position", (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_p", "_rn", "_off")
    )
