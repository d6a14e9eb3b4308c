"""Keyword search over the documents corpus: TF-IDF / BM25 ranking.

Extension beyond the reference (it has no text-retrieval operators):
the inverted-index formulation expressed as DataFrame ops —

    tokens  = explode(split(lower(text)))          -- posting list
    tf      = groupBy(doc, term).count()           -- term frequency
    df_t    = groupBy(term).countDistinct(doc)     -- document frequency
    score   = sum_t idf(df_t) * saturation(tf, dl) -- BM25

Everything is built-in JVM expressions; corpus stats (N, avg doc
length) ride along as a broadcast single-row frame instead of a
driver collect, so the whole plan stays declarative and Catalyst can
pipeline the posting-list scan with the scoring join.

Scale: the posting-list explode shuffles |tokens| rows once per query
batch. At 100 TB you materialize ``tokens``/``tf`` ONCE as a bucketed
table on ``token`` (the inverted index) and every query becomes a
broadcast-filter + partial-agg over n_terms posting lists — the same
plan below minus the tokenize scan. Scores use doubles and round to
6dp; ordering ties break on doc_id so top-k is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

K1 = 1.2
B = 0.75


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Distributed deterministic top-k with a dense ``rank`` column.

    ``orderBy(...).limit(k)`` lets Spark keep at most ``k`` rows per
    partition before anything crosses a shuffle (TakeOrderedAndProject
    / LocalLimit+GlobalLimit), so the scored set — corpus-sized for a
    common query term — is never funneled through a single-partition
    global sort. The ``row_number`` window then orders only the ``k``
    surviving rows, which is where a partitionless window is harmless.
    (bm25 desc, doc_id asc) is a total order, so the k rows and their
    ranks are identical to the old whole-set window formulation.
    """
    order = [F.desc("bm25"), F.asc("doc_id")]
    topk = scored.orderBy(*order).limit(k)
    return topk.withColumn(
        "rank", F.row_number().over(W.orderBy(*order)).cast("bigint")
    )


def tokenize(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Posting rows (doc_id, token): lowercase, whitespace-split.

    DuckDB: ``unnest(string_split_regex(lower(text), '\\s+'))``.
    """
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25.

    idf(t)    = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)   (Robertson)
    score(d)  = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    All inputs to the per-term expression are exact integers (tf, df,
    dl, N, total_len), so both engines evaluate the identical IEEE
    double expression; the final per-doc sum is rounded to 6dp before
    ranking (decouples the hash compare from term summation order).
    """
    toks = tokenize(docs, id_col, text_col)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    hits = toks.filter(F.col("token").isin(query_terms))
    tf = hits.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dft = hits.groupBy("token").agg(F.countDistinct("doc_id").alias("dft"))

    n = F.col("n_docs").cast("double")
    avgdl = F.col("total_len").cast("double") / n
    idf = F.log((n - F.col("dft") + F.lit(0.5)) / (F.col("dft") + F.lit(0.5)) + F.lit(1.0))
    sat = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dft), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * sat), 6).alias("bm25"))
    )
    return _rank_topk(scored, k)


def bm25_oracle_sql(query_terms: list[str], k: int = 10,
                    k1: float = K1, b: float = B) -> str:
    """DuckDB equivalent of :func:`bm25_topk` on the ``documents``
    view — identical expression tree so doubles match bit-for-bit."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH toks AS (
  SELECT doc_id, t AS token
  FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS u(t)
  WHERE t <> ''
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl),
hits AS (SELECT * FROM toks WHERE token IN ({terms})),
tf AS (SELECT doc_id, token, count(*) AS tf FROM hits GROUP BY doc_id, token),
dft AS (SELECT token, count(DISTINCT doc_id) AS dft FROM hits GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         round(sum(
           ln((cast(n_docs AS double) - dft + 0.5) / (dft + 0.5) + 1.0)
           * (tf * ({k1} + 1.0)
              / (tf + {k1} * ((1.0 - {b}) + {b} * dl
                 / (cast(total_len AS double) / cast(n_docs AS double)))))
         ), 6) AS bm25
  FROM tf
  JOIN dft USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, bm25,
       row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
FROM scored
QUALIFY rank <= {k}
ORDER BY rank
"""


def build_inverted_index(
    docs: DataFrame,
    name_prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> None:
    """Materialize the inverted index as catalog tables — the at-rest
    form of :func:`bm25_topk` for corpora queried repeatedly:

    - ``{prefix}_tf``    (doc_id, token, tf), BUCKETED by token and
      sorted within buckets: an IN-list of query terms prunes to
      ~n_terms/n_buckets of the files (visible as
      ``SelectedBucketsCount`` in the scan node), and any token-equi
      join is shuffle-free on the bucketed side.
    - ``{prefix}_dl``    (doc_id, dl) document lengths.
    - ``{prefix}_stats`` single row (n_docs, total_len).

    Build cost is one tokenize pass + two aggregations, paid once;
    every subsequent query skips the corpus scan entirely. At 100 TB
    the tf table is the only large artifact and it shards by token —
    exactly the posting-list layout a search engine keeps.
    """
    toks = tokenize(docs, id_col, text_col)
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    (
        tf.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "token")
        .sortBy("token")
        .saveAsTable(f"{name_prefix}_tf")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dl.write.mode("overwrite").format("parquet").saveAsTable(f"{name_prefix}_dl")
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    stats.write.mode("overwrite").format("parquet").saveAsTable(
        f"{name_prefix}_stats"
    )


def bm25_topk_indexed(
    spark,
    name_prefix: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """BM25 top-k over a materialized index (:func:`build_inverted_index`)
    — no corpus scan: the bucketed tf table is filtered to the query
    terms (bucket pruning), df(t) falls out of the pruned posting
    lists (tf holds one row per (doc, token)), and scoring is the same
    expression tree as :func:`bm25_topk`, so results are identical.
    """
    tf = spark.table(f"{name_prefix}_tf").filter(
        F.col("token").isin(query_terms)
    )
    dl = spark.table(f"{name_prefix}_dl")
    stats = spark.table(f"{name_prefix}_stats")
    dft = tf.groupBy("token").agg(F.count("*").alias("dft"))

    n = F.col("n_docs").cast("double")
    avgdl = F.col("total_len").cast("double") / n
    idf = F.log((n - F.col("dft") + F.lit(0.5)) / (F.col("dft") + F.lit(0.5)) + F.lit(1.0))
    sat = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dft), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * sat), 6).alias("bm25"))
    )
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# Maintained (incremental) text index: the catalog-table index above is
# rebuilt per corpus; at 100 TB the posting lists must be a MAINTAINED
# artifact that each ingest batch extends in O(batch). Two txlog tables
# under one root: tf (doc_id, token, tf) partitioned by a token hash
# bucket (query terms prune to their buckets' partition directories)
# and dl (doc_id, dl). Corpus statistics (n_docs, avgdl) and df(t) are
# DERIVED at query time — n_docs/avgdl from one agg over the doc-sized
# dl table, df(t) from the pruned posting slice — so ingest never
# read-modify-writes global state and BM25 scores always reflect the
# full current index.

TEXT_INDEX_BUCKETS = 16  # index layout constant: term -> pmod(hash60, THIS)


def _tok_bucket(col: str = "token") -> F.Column:
    from x_spark.functions.portable import hash60

    return F.pmod(hash60(col), F.lit(TEXT_INDEX_BUCKETS)).cast("int")


def update_text_index(
    ds,
    root: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    txn: tuple[str, int] | None = None,
) -> None:
    """Append one ingest batch's postings to the maintained index —
    O(batch) (the existing corpus is never re-tokenized). Each doc must
    be ingested once (append-only posting lists). With ``txn`` the
    ingest is exactly-once PER TABLE: a replay that already landed one
    of the two appends skips it and completes the other, so a crash
    between the tf and dl commits heals on retry."""
    import os as _os

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxnAlreadyCommittedException

    toks = tokenize(batch, id_col, text_col)
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .withColumn("tok_bucket", _tok_bucket())
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("dl"))
    tf_ref = TableRef(path=_os.path.join(root, "tf"))
    dl_ref = TableRef(path=_os.path.join(root, "dl"))
    if not ds.table_exists(tf_ref):
        ds.create(tf_ref, tf.schema, partition_by=["tok_bucket"])
    if not ds.table_exists(dl_ref):
        ds.create(dl_ref, dl.schema)
    for df, ref in ((tf, tf_ref), (dl, dl_ref)):
        try:
            ds.append(df, ref, txn=txn)
        except TxnAlreadyCommittedException:
            continue  # this half already landed (crash-replay heal)


def bm25_store_topk(
    ds,
    root: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """BM25 top-k over the maintained index: the tf scan prunes to the
    query terms' hash-bucket PARTITIONS (PartitionFilters — pinned by
    test), df/n_docs/avgdl derive from the current index state, and
    the scoring tree is identical to :func:`bm25_topk`, so results
    match the direct corpus computation exactly."""
    import os as _os

    from x_spark.sources.base import TableRef

    buckets = sorted({
        int(h) for h in (
            int(__import__("hashlib").md5(t.encode()).hexdigest()[:15], 16)
            % TEXT_INDEX_BUCKETS for t in query_terms
        )
    })
    tf = (
        ds.read(TableRef(path=_os.path.join(root, "tf")))
        .filter(F.col("tok_bucket").isin(buckets))
        .filter(F.col("token").isin(query_terms))
    )
    dl = ds.read(TableRef(path=_os.path.join(root, "dl")))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    dft = tf.groupBy("token").agg(F.count("*").alias("dft"))
    n = F.col("n_docs").cast("double")
    avgdl = F.col("total_len").cast("double") / n
    idf = F.log((n - F.col("dft") + F.lit(0.5)) / (F.col("dft") + F.lit(0.5)) + F.lit(1.0))
    sat = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dft), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * sat), 6).alias("bm25"))
    )
    return _rank_topk(scored, k)
