"""Linear text-classifier scoring over hashed unigram features —
fastText-style *inference* as a distributed pipeline stage.

Quality filtering at corpus scale is usually a linear model over
hashed token features (fastText / logistic regression): the model is
tiny (one weight per hash bucket), the corpus is huge. The right
Spark shape is therefore:

    tokenize -> hash token into a bucket -> per-doc term frequencies
    -> broadcast-join the weight vector -> per-doc dot product

Design for 100 TB:

- tokenize/hash/tf is one scan projection + one partial-aggregated
  ``groupBy(doc, bucket)`` — map-side combine collapses repeated
  tokens before the shuffle;
- the weight vector is ``n_buckets`` rows (a model is always
  broadcast-small) — the join never shuffles the corpus;
- the final dot product is one ``groupBy(doc)`` sum, again partially
  aggregated. All JVM expressions, no Python in the hot path.

Weights are any DataFrame ``(bucket int, weight bigint)`` — swap in
trained weights with the same schema. :func:`pseudo_weights` supplies
a deterministic md5-derived stand-in so the scoring plumbing is
oracle-checkable end-to-end (integer weights keep scores exact in
both engines — no float hash drift).

Extension beyond the reference (its YAML surface has no scoring
stage; cf. SURVEY §2 ext. operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from x_spark.functions.portable import hash32, tokens

N_BUCKETS = 4096
WEIGHT_MOD = 2001  # pseudo-weights land in [-1000, 1000]


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-document term frequencies over hashed unigram buckets:
    ``(id_col, bucket, tf)``.

    DuckDB mirror: ``cast(concat('0x', substr(md5(tok),1,8)) as
    bigint) % n_buckets``.
    """
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .select(id_col, (hash32(F.col("tok")) % n_buckets).cast("int").alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("tf"))
    )


def pseudo_weights(
    spark: SparkSession, n_buckets: int = N_BUCKETS, mod: int = WEIGHT_MOD
) -> DataFrame:
    """Deterministic stand-in weight vector: md5-derived integers in
    ``[-(mod//2), mod//2]``. Same schema as a trained model's weights
    — the pipeline doesn't care which it gets."""
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        (hash32(F.col("id").cast("string")) % mod - mod // 2).alias("weight"),
    )


def linear_scores(
    feats: DataFrame, weights: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document linear score ``sum(tf * weight[bucket])``.

    The weight vector is broadcast (models are small; the corpus is
    not) — the only shuffle is the final per-doc sum, partially
    aggregated map-side. The join is LEFT with weight coalesced to 0:
    trained models are sparse (only non-zero buckets stored), and an
    inner join would silently drop documents whose tokens all hash to
    unweighted buckets instead of scoring them 0. Documents with no
    tokens at all have no feature rows and therefore no score row —
    left-join scores back onto the corpus if every doc needs one."""
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("tf") * F.coalesce(F.col("weight"), F.lit(0))
            ).alias("score")
        )
    )
