"""Hot-bucket cap for LSH/simhash band joins (VERDICT r1 item 6).

A boilerplate-heavy corpus puts many documents into the same band
buckets; without a cap the candidate join is O(n^2) in the hot bucket.
The cap must (a) bound candidates on the pathological corpus and
(b) leave recall on a normal corpus unchanged.
"""

from pyspark.sql import functions as F

from x_spark.operators.dedup import (
    minhash_candidate_pairs,
    simhash_near_pairs,
)


def _boilerplate_corpus(spark, n=60):
    """n docs sharing one long identical prefix (the shingled region),
    plus two genuinely-similar docs with distinct text."""
    boiler = (
        "This document is provided under the standard license agreement. "
        "All rights reserved by the issuing organization. " * 4
    )
    rows = [(i, boiler) for i in range(n)]
    rows.append((1000, "the quick brown fox jumps over the lazy dog again and again"))
    rows.append((1001, "the quick brown fox jumps over the lazy dog again and again!"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_cap_bounds_candidates_on_boilerplate_corpus(spark):
    df = _boilerplate_corpus(spark)
    uncapped = minhash_candidate_pairs(df).count()
    capped = minhash_candidate_pairs(df, max_bucket_size=10).count()
    # 60 identical docs -> 60*59/2 = 1770 pairs uncapped
    assert uncapped >= 1770
    # hot buckets dropped; only the genuine near-pair's buckets survive
    assert capped <= 10
    # the genuine near-dup pair must survive the cap
    survivors = {
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(df, max_bucket_size=10).collect()
    }
    assert (1000, 1001) in survivors


def test_cap_bounds_simhash_candidates(spark):
    # identical-text pair (hamming 0) outside the boilerplate group: its
    # buckets have size 2 and must survive the cap
    df = _boilerplate_corpus(spark).withColumn(
        "text",
        F.when(
            F.col("doc_id") >= 1000,
            F.lit("the quick brown fox jumps over the lazy dog again and again"),
        ).otherwise(F.col("text")),
    )
    uncapped = simhash_near_pairs(df).count()
    capped = simhash_near_pairs(df, max_bucket_size=10)
    assert uncapped >= 1770
    rows = {(r.id_a, r.id_b) for r in capped.collect()}
    assert len(rows) <= 10
    assert (1000, 1001) in rows


def test_high_cap_is_identity_on_normal_corpus(spark, sf_dir):
    """On the real documents table a generous cap must not change the
    result at all (recall preserved)."""
    from x_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = {
        (r.id_a, r.id_b, round(r.est_jaccard, 6))
        for r in minhash_candidate_pairs(docs).collect()
    }
    capped = {
        (r.id_a, r.id_b, round(r.est_jaccard, 6))
        for r in minhash_candidate_pairs(docs, max_bucket_size=10_000).collect()
    }
    assert base == capped
