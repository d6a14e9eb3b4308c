"""Corpus lexical statistics: TF-IDF keyword extraction, PMI bigram
collocations, and cross-source vocabulary overlap.

These extend the reference's text-analysis surface (the reference stops
at scalar string functions — ``source/functions.py``) with the standard
corpus-curation lexical tools a training-data pipeline needs: per-doc
keyword extraction for topical tagging/routing, collocation mining for
tokenizer-merge and phrase-vocabulary candidates, and pairwise source
vocabulary overlap as a cheap corpus-redundancy screen before the
(much more expensive) document-level dedup families in
``operators/dedup.py``.

Scale shapes (all JVM-side, no UDFs, no driver data collects):

- ``tfidf_topk_terms``: postings aggregate on (doc, term) with map-side
  combine, a vocabulary-sized df aggregate, one hash join postings x df
  on term (vocabulary << corpus, but unbounded — deliberately NOT
  broadcast), and a per-doc row_number window. Four shuffles total,
  each on a natural key.
- ``pmi_collocations``: adjacent bigrams come from an array transform
  over the tokenized column (one narrow pass — no positional self-join,
  which would shuffle the full posting list twice); the long tail is
  cut by ``min_count`` BEFORE the unigram joins, so the joins see only
  frequent pairs.
- ``corpus_token_overlap``: per-source distinct vocabularies (one
  shuffle), then a self-join on token whose per-key multiplicity is
  bounded by the number of sources (tiny), never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from x_spark.functions import portable as P

__all__ = ["tfidf_topk_terms", "pmi_collocations", "corpus_token_overlap"]


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 5,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF.

    ``idf(t) = ln((N + 1) / (df_t + 1)) + 1`` (sklearn's smooth variant:
    never zero, never negative) and ``score = tf * idf``. Ties broken by
    term ascending, so ranks are fully deterministic.

    Returns (doc_id, term, tfidf, term_rank) with tfidf rounded to 6dp.

    DuckDB oracle shape: see ``ORACLE_DOC_KEYWORDS_TFIDF`` in
    ``plans/pipeline.py`` — the ln/×/÷ expression tree is mirrored
    operation-for-operation so the raw doubles agree.
    """
    postings = (
        docs.select(F.col(id_col).alias("doc_id"), P.tokens(text_col).alias("t"))
        .select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    n_docs = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    df_t = postings.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    if min_df > 1:
        df_t = df_t.filter(F.col("df") >= min_df)
    scored = (
        postings.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (
                F.log(
                    (F.col("n_docs").cast("double") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                )
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("term_rank") <= k)
        .select(
            "doc_id",
            "term",
            F.round("score", 6).alias("tfidf"),
            "term_rank",
        )
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_n: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_n`` adjacent-bigram collocations by pointwise mutual
    information: ``pmi = ln(c_xy * N / (c_x * c_y))`` over whitespace
    tokens, with ``c_xy >= min_count``.

    Bigrams are built with an array ``transform`` over the tokenized
    column — one narrow pass, no positional self-join. The unigram
    joins run only on pairs that survive ``min_count``.

    Returns (w1, w2, pair_count, pmi) with pmi rounded to 6dp,
    ordered (pmi desc, w1, w2) and limited to ``top_n``.
    """
    toks = docs.select(P.tokens(text_col).alias("t")).filter(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.expr("transform(sequence(1, size(t)-1), i -> struct(t[i-1] AS w1, t[i] AS w2))")
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    pair_counts = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    unigrams = (
        docs.select(F.explode(P.tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    total = docs.select(F.explode(P.tokens(text_col)).alias("term")).agg(
        F.count("*").cast("bigint").alias("n_tokens")
    )
    joined = (
        pair_counts.join(
            unigrams.select(F.col("term").alias("w1"), F.col("c").alias("c1")), "w1"
        )
        .join(unigrams.select(F.col("term").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(total))
    )
    pmi = F.log(
        (F.col("pair_count").cast("double") * F.col("n_tokens").cast("double"))
        / (F.col("c1").cast("double") * F.col("c2").cast("double"))
    )
    return (
        joined.select(
            "w1", "w2", "pair_count", F.round(pmi, 6).alias("pmi")
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_n)
    )


def corpus_token_overlap(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise source-vocabulary Jaccard: for every unordered source
    pair with a non-empty intersection, |V_a ∩ V_b| / |V_a ∪ V_b| over
    distinct whitespace tokens (disjoint-vocabulary pairs are omitted —
    a redundancy screen only reports overlapping sources).

    The cheap corpus-redundancy screen: near-1 vocabulary Jaccard
    between two sources flags them for the document-level dedup pass.
    The self-join key is the token, whose per-key multiplicity is
    bounded by the source count — never all-pairs over rows.

    Returns (source_a, source_b, inter, vocab_a, vocab_b, jaccard)
    with jaccard rounded to 6dp.
    """
    vocab = docs.select(
        F.col(source_col).alias("source"), F.explode(P.tokens(text_col)).alias("term")
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count("*").cast("bigint").alias("vsize"))
    a = vocab.select(F.col("source").alias("source_a"), "term")
    b = vocab.select(F.col("source").alias("source_b"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col("source").alias("source_a"), F.col("vsize").alias("vocab_a")),
            "source_a",
        )
        .join(
            sizes.select(F.col("source").alias("source_b"), F.col("vsize").alias("vocab_b")),
            "source_b",
        )
    )
    union = F.col("vocab_a") + F.col("vocab_b") - F.col("inter")
    return out.select(
        "source_a",
        "source_b",
        "inter",
        "vocab_a",
        "vocab_b",
        F.round(F.col("inter").cast("double") / union.cast("double"), 6).alias("jaccard"),
    )
