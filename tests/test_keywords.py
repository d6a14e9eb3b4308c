"""Semantic unit tests for operators/keywords.py (TF-IDF, PMI,
vocabulary overlap) against hand-computed values on tiny corpora.
Cross-engine hash parity is covered by test_oracle_parity.py."""

import math

from pyspark.sql import Row

from x_spark.operators.keywords import (
    corpus_token_overlap,
    pmi_collocations,
    tfidf_topk_terms,
)


def _corpus(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t, source=s)
                                  for i, (t, s) in enumerate(rows)])


def test_tfidf_rare_term_outranks_common(spark):
    docs = _corpus(spark, [
        ("apple apple banana", "a"),
        ("banana banana banana", "a"),
        ("banana cherry", "a"),
    ])
    out = {(r.doc_id, r.term_rank): (r.term, r.tfidf)
           for r in tfidf_topk_terms(docs, k=2).collect()}
    # doc 0: apple (tf=2, df=1) must outrank banana (tf=1, df=3)
    assert out[(0, 1)][0] == "apple"
    assert out[(0, 2)][0] == "banana"
    # hand value: 2 * (ln(4/2) + 1)
    assert abs(out[(0, 1)][1] - round(2 * (math.log(2.0) + 1.0), 6)) < 1e-9
    # banana appears in every doc: idf = ln(4/4)+1 = 1, score == tf
    assert out[(1, 1)] == ("banana", 3.0)


def test_tfidf_ties_break_by_term_ascending(spark):
    docs = _corpus(spark, [("zeta alpha", "a"), ("zeta alpha", "a")])
    ranks = {r.term_rank: r.term
             for r in tfidf_topk_terms(docs, k=2).filter("doc_id = 0").collect()}
    assert ranks == {1: "alpha", 2: "zeta"}


def test_pmi_exact_value_and_min_count(spark):
    # "a b" x 5 docs; unigrams: a=5, b=5, N=10; pair (a,b)=5
    docs = _corpus(spark, [("a b", "s")] * 5)
    rows = pmi_collocations(docs, min_count=5, top_n=10).collect()
    assert [(r.w1, r.w2, r.pair_count) for r in rows] == [("a", "b", 5)]
    assert abs(rows[0].pmi - round(math.log(5 * 10 / (5 * 5)), 6)) < 1e-9
    assert pmi_collocations(docs, min_count=6, top_n=10).count() == 0


def test_pmi_skips_single_token_docs(spark):
    docs = _corpus(spark, [("solo", "s")] * 8 + [("x y", "s")] * 5)
    rows = pmi_collocations(docs, min_count=5, top_n=10).collect()
    assert [(r.w1, r.w2) for r in rows] == [("x", "y")]


def test_corpus_overlap_jaccard(spark):
    docs = _corpus(spark, [
        ("a b c", "s1"), ("a b d", "s2"), ("x y z w", "s3"),
    ])
    out = {(r.source_a, r.source_b): r for r in corpus_token_overlap(docs).collect()}
    # disjoint-vocabulary pairs are omitted (inner join on token — a
    # redundancy screen only reports overlapping sources)
    assert set(out) == {("s1", "s2")}
    r = out[("s1", "s2")]
    assert (r.inter, r.vocab_a, r.vocab_b) == (2, 3, 3)  # {a,b} of {a,b,c}/{a,b,d}
    assert abs(r.jaccard - 0.5) < 1e-9
