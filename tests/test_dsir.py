"""DSIR importance resampling + median/MAD robust outliers: direction,
determinism, and hand-computable values."""

import math

import pytest
from pyspark.sql import functions as F

from x_spark.operators.dsir import dsir_log_weights, dsir_select, ngram_bucket_tf
from x_spark.operators.profile import robust_outliers


def _corpus(spark):
    # target-flavored docs repeat "spark shuffle"; off-target docs
    # repeat "duck pond"
    rows = [
        (0, "spark shuffle spark shuffle spark shuffle"),     # target
        (1, "spark shuffle join spark shuffle"),              # raw, target-like
        (2, "duck pond duck pond duck pond"),                 # raw, off-target
        (3, "spark shuffle duck pond"),                       # raw, mixed
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_dsir_ranks_target_like_docs_first(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") == 0)
    raw = docs.filter(F.col("doc_id") != 0)
    got = dsir_select(raw, target, k=3).collect()
    order = [r.doc_id for r in got]
    # most target-like raw doc first, least last
    assert order[0] == 1 and order[-1] == 2
    # weights strictly ordered target-like > mixed > off-target
    w = {r.doc_id: r.log_weight for r in got}
    assert w[1] > w[3] > w[2]


def test_dsir_is_deterministic_across_partitionings(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") == 0)
    raw = docs.filter(F.col("doc_id") != 0)
    a = sorted(map(tuple, dsir_log_weights(raw, target).collect()))
    b = sorted(
        map(
            tuple,
            dsir_log_weights(raw.repartition(7), target.repartition(3)).collect(),
        )
    )
    assert a == b


def test_dsir_ngram_accounting(spark):
    docs = _corpus(spark)
    feats = ngram_bucket_tf(docs, n=2)
    per_doc = {
        r.doc_id: r.n
        for r in feats.groupBy("doc_id").agg(F.sum("tf").alias("n")).collect()
    }
    # a doc with t tokens has t-1 bigrams
    assert per_doc == {0: 5, 1: 4, 2: 5, 3: 3}


def test_dsir_weight_value_on_single_bucket_model(spark):
    """One shared bigram world: the weight reduces to the closed form
    n * (ln(t+1) - ln(r+1) + ln(R+B) - ln(T+B))."""
    docs = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "a b a b")], "doc_id bigint, text string"
    )
    target = docs.filter(F.col("doc_id") == 0)  # 5 bigrams, all hash same? no:
    raw = docs.filter(F.col("doc_id") == 1)
    got = dsir_log_weights(raw, target).collect()
    assert len(got) == 1
    row = got[0]
    assert row.n_grams == 3
    # buckets: "a b"-hash (t=3 in target, r=2 in raw) and "b a"-hash
    # (t=2, r=1); with B=4096, T=5, R=3:
    B, T, R = 4096, 5, 3
    want = (
        2 * (math.log(3 + 1) - math.log(2 + 1))
        + 1 * (math.log(2 + 1) - math.log(1 + 1))
        + 3 * (math.log(R + B) - math.log(T + B))
    )
    assert row.log_weight == pytest.approx(want, abs=2e-6)


def test_robust_outliers_hand_computed(spark):
    # group "a": values 1..9 plus a wild 1000 -> med 5.5, MAD around 2.5
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0)]
    # group "b": constant -> MAD 0, single deviating row flagged
    rows += [("b", 7.0), ("b", 7.0), ("b", 7.0), ("b", 8.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r.g: r for r in robust_outliers(df, "v", ["g"], k=3.0).collect()}
    a = got["a"]
    assert a.n == 10 and a.med == 5.5
    # deviations: 4.5,3.5,...,0.5,0.5,...,994.5 -> MAD = 2.5
    assert a.mad == 2.5
    assert a.n_outliers == 1 and a.outlier_frac == pytest.approx(0.1)
    b = got["b"]
    assert b.mad == 0.0
    # MAD 0: any deviation beats k*0
    assert b.n_outliers == 1
