"""Repetition signals + benchmark-contamination operators
(LLM-pipeline quality family, SURVEY §7 Phase E).

The registry queries exercise these on the synthetic documents table
(no newlines, tiny vocabulary); these tests pin the semantics on
constructed documents where every signal is non-vacuous.
"""

import pytest
from pyspark.sql import functions as F

from x_spark.operators.text import contamination_check, repetition_signals


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_signals_on_constructed_docs(spark):
    docs = _df(
        spark,
        [
            # 4 lines, 2 distinct; 8 tokens (\s+ spans newlines),
            # 3 distinct; "spam spam" occurs 3x in doc 2
            (1, "a b\na b\nc c\nc c"),
            (2, "spam spam spam spam"),
            (3, "all distinct tokens here"),
            (4, ""),  # empty: every signal 0
        ],
    )
    out = {
        r["doc_id"]: r
        for r in repetition_signals(docs)
        .select("doc_id", "dup_line_fraction", "dup_token_fraction", "max_2gram_run")
        .collect()
    }
    assert out[1]["dup_line_fraction"] == pytest.approx(0.5)
    assert out[1]["dup_token_fraction"] == pytest.approx(1 - 3 / 8)
    assert out[2]["max_2gram_run"] == 3  # "spam spam" at positions 1,2,3
    assert out[2]["dup_token_fraction"] == pytest.approx(0.75)
    assert out[3]["dup_token_fraction"] == 0.0
    assert out[3]["max_2gram_run"] == 1
    assert out[4]["dup_line_fraction"] == 0.0
    assert out[4]["dup_token_fraction"] == 0.0
    assert out[4]["max_2gram_run"] == 0


def test_contamination_flags_only_true_overlaps(spark):
    bench = _df(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _df(
        spark,
        [
            # verbatim 8-token overlap: many shared 5-grams
            (1, "intro text the quick brown fox jumps over the lazy dog outro"),
            # shares tokens but no 5-gram
            (2, "fox dog quick brown the lazy over jumps"),
            (3, "completely unrelated words about training data pipelines"),
        ],
    )
    hits = contamination_check(corpus, bench, min_shared=3, n=5).collect()
    assert {(r.train_id, r.eval_id) for r in hits} == {(1, 100)}
    assert hits[0].shared_ngrams >= 3


def test_contamination_counts_distinct_ngrams_once(spark):
    # the same contaminated n-gram repeated in a training doc counts
    # once (hashes are per-doc distinct), so spammy repetition can't
    # inflate shared_ngrams past the true overlap
    bench = _df(spark, [(100, "one two three four five")])
    corpus = _df(spark, [(1, "one two three four five one two three four five")])
    hits = contamination_check(corpus, bench, min_shared=1, n=5).collect()
    assert len(hits) == 1
    # doc 1 holds 6 distinct 5-grams, only those matching bench count
    assert hits[0].shared_ngrams == 1  # bench has exactly one 5-gram
