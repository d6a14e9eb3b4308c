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


def test_chunking_windows_and_overlap(spark):
    from x_spark.operators.text import chunk_documents

    toks = " ".join(f"t{i}" for i in range(1, 31))  # 30 tokens
    docs = _df(spark, [(1, toks), (2, "a b c"), (3, "")])
    out = chunk_documents(docs, chunk_tokens=10, overlap=2).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 1, 9, 17, 25 (stride 8); last chunk has 6 tokens
    assert [(r.start_token, r.n_chunk_tokens) for r in by_doc[1]] == [
        (1, 10), (9, 10), (17, 10), (25, 6),
    ]
    assert by_doc[1][0].chunk_text.startswith("t1 t2 ")
    # consecutive chunks share exactly `overlap` tokens
    a = by_doc[1][0].chunk_text.split()
    b = by_doc[1][1].chunk_text.split()
    assert a[-2:] == b[:2]
    # short doc: single chunk; empty doc: no chunks
    assert [(r.start_token, r.n_chunk_tokens) for r in by_doc[2]] == [(1, 3)]
    assert 3 not in by_doc
    # a trailing start adding <= overlap new tokens is suppressed:
    # 26 tokens, chunk 10/overlap 2 -> starts 1, 9, 17 (25 would add 2)
    short = _df(spark, [(9, " ".join(f"x{i}" for i in range(26)))])
    st = sorted(
        r.start_token
        for r in chunk_documents(short, chunk_tokens=10, overlap=2).collect()
    )
    assert st == [1, 9, 17]


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
