"""Invariant tests for the edit-distance candidate verifier and the
hashed-feature linear classifier scorer."""

from pyspark.sql import functions as F

from x_spark.operators import classifier as C
from x_spark.operators import dedup as D


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_edit_distance_known_pair(spark):
    # Two texts long enough to shingle and share LSH buckets; one is a
    # 5-char append of the other -> edit_dist exactly 5.
    base = "the quick brown fox jumps over the lazy dog " * 4
    df = _docs(spark, [(1, base), (2, base + " xtra")])
    out = D.edit_distance_pairs(df, max_dist=16).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b, r.edit_dist) == (1, 2, 5)
    assert r.len_b - r.len_a == 5


def test_edit_distance_threshold_excludes_far_pairs(spark):
    # Same shingle prefix (LSH candidates) but a tail rewrite far past
    # max_dist: the pair must be dropped, not reported with a wrong
    # distance (3-arg levenshtein returns -1 past the bound).
    base = "the quick brown fox jumps over the lazy dog " * 5  # > SHINGLE_PREFIX
    df = _docs(spark, [(1, base + "A" * 60), (2, base + "B" * 60)])
    cands = D.minhash_candidate_pairs(df).select("id_a", "id_b").collect()
    assert len(cands) == 1  # they DO collide in LSH buckets...
    out = D.edit_distance_pairs(df, max_dist=16).collect()
    assert out == []  # ...but verification rejects them


def test_edit_distance_length_band_prefilter(spark):
    # |len_a - len_b| > max_dist proves dist > max_dist: the pair is
    # dropped by the cheap filter (same result, no DP needed). Keep
    # the appended tail inside EDIT_PREFIX so lengths actually differ.
    base = "the quick brown fox jumps over the lazy dog " * 4  # 176 chars
    df = _docs(spark, [(1, base), (2, base + "x" * 40)])
    out = D.edit_distance_pairs(df, max_dist=16).collect()
    assert out == []
    # sanity: with a bound that admits the gap, the pair comes back
    out2 = D.edit_distance_pairs(df, max_dist=64).collect()
    assert len(out2) == 1 and out2[0].edit_dist == 40


def test_classifier_score_matches_manual(spark):
    docs = _docs(spark, [(1, "alpha beta alpha"), (2, "beta beta gamma")])
    feats = C.hashed_features(docs, n_buckets=64)
    weights = C.pseudo_weights(spark, n_buckets=64)
    scores = {
        r.doc_id: r.score for r in C.linear_scores(feats, weights).collect()
    }
    wmap = {r.bucket: r.weight for r in weights.collect()}
    bmap = {
        r.tok: r.bucket
        for r in docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
        )
        .distinct()
        .select(
            "tok",
            (
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint") % 64
            ).alias("bucket"),
        )
        .collect()
    }
    expect1 = 2 * wmap[bmap["alpha"]] + 1 * wmap[bmap["beta"]]
    expect2 = 2 * wmap[bmap["beta"]] + 1 * wmap[bmap["gamma"]]
    assert scores == {1: expect1, 2: expect2}


def test_classifier_weights_are_broadcast(spark):
    docs = _docs(spark, [(1, "alpha beta")])
    plan = C.linear_scores(
        C.hashed_features(docs), C.pseudo_weights(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pseudo_weights_bounded_and_deterministic(spark):
    w1 = C.pseudo_weights(spark, n_buckets=256).collect()
    w2 = C.pseudo_weights(spark, n_buckets=256).collect()
    assert sorted(w1) == sorted(w2)
    assert all(-1000 <= r.weight <= 1000 for r in w1)
    assert len({r.bucket for r in w1}) == 256
