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


# -- pagerank (operators/graph.py) — lives here with the other corpus
# quality-signal operators ---------------------------------------------------
def test_pagerank_hand_computed_chain(spark):
    from x_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = {r.node: r.rank for r in pagerank(edges, n_iter=1).collect()}
    # N=2, r0=0.5: a has no inbound -> teleport only; b gets 0.85 * 0.5
    assert abs(out["a"] - 0.15 / 2) < 1e-12
    assert abs(out["b"] - (0.15 / 2 + 0.85 * 0.5)) < 1e-9


def test_pagerank_sink_accumulates(spark):
    from x_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c")], "src string, dst string"
    )
    out = {r.node: r.rank for r in pagerank(edges, n_iter=5).collect()}
    assert out["c"] > out["a"] and out["c"] > out["b"]
    assert abs(out["a"] - out["b"]) < 1e-12  # symmetric sources tie exactly


def test_pagerank_splits_outflow_by_degree(spark):
    from x_spark.operators.graph import pagerank

    # a points at both b and c: each gets half of a's rank
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    out = {r.node: r.rank for r in pagerank(edges, n_iter=3).collect()}
    assert abs(out["b"] - out["c"]) < 1e-12
    # the per-edge contribution is cast to DECIMAL(30,6) before the
    # sum (documented): (1/3)/2 = 0.1666... lands as 0.166667
    expected_b = 0.15 / 3 + 0.85 * 0.166667
    one_iter = {r.node: r.rank for r in pagerank(edges, n_iter=1).collect()}
    assert abs(one_iter["b"] - expected_b) < 1e-9


def test_pagerank_validates_args(spark):
    import pytest as _pytest

    from x_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with _pytest.raises(ValueError):
        pagerank(edges, n_iter=0)
    with _pytest.raises(ValueError):
        pagerank(edges, damping=1.0)


def test_pagerank_empty_graph(spark):
    from x_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src string, dst string")
    out = pagerank(edges, n_iter=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "rank"]
