"""Sequence packing for pretraining: map every document to its token
offsets in the packed training stream.

GPT-style packing concatenates documents in a deterministic order
(separator-free here; add +1/doc for a separator token upstream if the
tokenizer uses one) and slices the stream into fixed-capacity
sequences; a document can straddle a sequence boundary. The whole
assignment is closed-form once each document knows its global token
START OFFSET — which is a prefix sum, the one primitive a naive
implementation gets wrong at scale (a global ``Window.orderBy`` drags
the corpus through ONE partition).

:func:`token_prefix_offsets` is the distributed two-stage scan:

1. bucket documents into contiguous id ranges (bucket order == global
   order), cumulative-sum INSIDE each bucket (window partitioned by
   bucket — parallel, partition-sized state);
2. per-bucket totals (one tiny agg, ``n_buckets`` rows) prefix-summed
   on the driver and broadcast-joined back as each bucket's base
   offset.

Driver state is ``n_buckets`` longs — metadata scale at any corpus
size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from x_spark.functions.portable import token_count


def token_prefix_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> DataFrame:
    """``(id, n_tokens, start_offset)`` where ``start_offset`` is the
    exclusive prefix sum of token counts in ``id`` order — computed
    with the two-stage distributed scan described in the module
    docstring (never a single-partition global window)."""
    # persist: the token-count scan otherwise re-executes for the
    # min/max agg, the bucket-totals collect, AND the final join (the
    # same recomputation pitfall ngram_hash_table documents); the
    # cached frame is (id, long) — a fraction of the corpus
    toks = df.select(
        F.col(id_col), token_count(F.col(text_col)).cast("bigint").alias("n_tokens")
    ).persist()
    lo, hi = toks.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return toks.withColumn("start_offset", F.lit(0).cast("bigint"))
    width = max(1, math.ceil((hi - lo + 1) / n_buckets))
    toks = toks.withColumn(
        "bucket", ((F.col(id_col) - F.lit(lo)) / F.lit(width)).cast("int")
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    intra = toks.withColumn(
        "intra", F.sum("n_tokens").over(w) - F.col("n_tokens")  # exclusive
    )
    totals = {
        r["bucket"]: r["t"]
        for r in toks.groupBy("bucket").agg(F.sum("n_tokens").alias("t")).collect()
    }
    base, acc = {}, 0
    for b in sorted(totals):
        base[b] = acc
        acc += totals[b]
    base_df = intra.sparkSession.createDataFrame(
        [(b, v) for b, v in base.items()], "bucket int, base bigint"
    )
    return (
        intra.join(F.broadcast(base_df), "bucket")
        .select(
            id_col,
            "n_tokens",
            (F.col("base") + F.col("intra")).cast("bigint").alias("start_offset"),
        )
    )


def pack_sequences(
    df: DataFrame,
    capacity: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> DataFrame:
    """Assign every document its packed-sequence span: the fixed-size
    training sequences ``[first_seq, last_seq]`` its tokens land in,
    given GPT-style concat-and-slice packing at ``capacity`` tokens
    per sequence. Closed-form over the prefix offsets — documents
    straddle boundaries rather than padding them (zero waste), and the
    output is exactly the shard map a loader needs to materialize any
    sequence range."""
    off = token_prefix_offsets(df, id_col, text_col, n_buckets)
    last_tok = F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return off.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / capacity).cast("bigint").alias("first_seq"),
        F.floor(last_tok / capacity).cast("bigint").alias("last_seq"),
        (
            F.floor(last_tok / capacity) - F.floor(F.col("start_offset") / capacity) + 1
        ).cast("bigint").alias("n_seqs"),
    )
