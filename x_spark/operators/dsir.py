"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, "Data Selection for Language Models via Importance
Resampling"): pick raw-corpus documents whose hashed n-gram profile
looks like a small TARGET corpus, by scoring each raw document with
the log-likelihood ratio of two bag-of-hashed-ngrams models.

    log w(d) = sum_{g in d} [ ln p_target(bucket(g)) - ln p_raw(bucket(g)) ]

with add-one-smoothed bucket probabilities
``p(b) = (cnt_b + 1) / (total + B)`` over ``B`` hash buckets. This is
the standard pretraining-data targeting recipe (e.g. "select web text
that looks like Wikipedia") and the natural companion to the quality
classifier: DSIR needs no labels, just a target sample.

Spark-first shape (mirrors ``operators/classifier.py``):

- feature extraction is one scan: tokenize -> 32-bit token hashes ->
  polynomial-roll n-gram hash (the contamination-check gram hash —
  ONE md5 per token, every intermediate < 2^52) -> bucket = gh % B ->
  ``groupBy(doc, bucket)`` tf with map-side combine;
- the two corpus bucket-count tables are <= B rows each (B = 4096
  default) — model-sized, BROADCAST; the scoring join never shuffles
  the corpus;
- per-doc scoring is one partially-aggregated ``groupBy(doc)``.

Exactness across engines (the ``unigram_surprise`` pattern): the
per-bucket log-ratio ``ln(t_b+1) - ln(r_b+1)`` is computed on
identical integer inputs, each ``tf * delta`` term is cast to
DECIMAL(30,6) and summed exactly, and the document-level constant
``n_grams * (ln(R+B) - ln(T+B))`` is one double multiply at the end,
rounded to 6dp. Mirrored literally in the DuckDB oracle.

Extension beyond the reference (its YAML surface has no data-selection
stage; cf. SURVEY §2 ext. operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from x_spark.functions.portable import MINHASH_PRIME, hash32_sql

N_BUCKETS = 4096


def ngram_bucket_tf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    n_buckets: int = N_BUCKETS,
    caches: list | None = None,
) -> DataFrame:
    """Per-document hashed n-gram term frequencies:
    ``(id_col, bucket, tf)`` — the DSIR feature extraction.

    The token-hash frame is PERSISTED before the gram lambda runs
    (project collapse would re-inline the regex split into every
    per-gram evaluation — the ``ngram_hash_table`` pitfall). Pass a
    ``caches`` list to receive the persisted intermediate and
    ``unpersist()`` it after your terminal action — otherwise the
    cached blocks live until the session sweeps them (``dsir_select``
    does this cleanup itself)."""
    from x_spark.fanout import fan_out

    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> length(x) > 0)"
    tok_hashes = f"transform({toks}, t -> {hash32_sql('t')})"
    # the per-token hashing AND the downstream per-gram polynomial
    # fold both run at the persisted frame's parallelism, which on a
    # degenerate one-split layout is a single task — fan the projected
    # (id, text) rows out first (guide §2.5; no-op on multi-split
    # tables, per-row hashes are order-independent)
    toks_df = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col).alias(id_col), F.expr(tok_hashes).alias("_th")
    ).persist()
    if caches is not None:
        caches.append(toks_df)
    grams = (
        f"CASE WHEN size(_th) >= {n} THEN transform("
        f"sequence(1, size(_th) - {n} + 1), "
        f"i -> aggregate(slice(_th, i, {n}), 0L, "
        f"(acc, h) -> (acc * 1000003L + h) % {MINHASH_PRIME}L)"
        f") ELSE array() END"
    )
    return (
        toks_df.select(id_col, F.explode(F.expr(grams)).alias("gh"))
        .select(
            id_col, F.pmod(F.col("gh"), F.lit(n_buckets)).cast("int").alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("tf"))
    )


def bucket_counts(feats: DataFrame) -> DataFrame:
    """Corpus-level bucket counts ``(bucket, cnt)`` from per-doc tfs —
    <= n_buckets rows (model-sized, broadcastable)."""
    return feats.groupBy("bucket").agg(F.sum("tf").alias("cnt"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    n_buckets: int = N_BUCKETS,
    caches: list | None = None,
) -> DataFrame:
    """``(id_col, n_grams, log_weight)`` for every raw document with at
    least one n-gram: the add-one-smoothed importance log-ratio of the
    target model over the raw model.

    log w(d) = sum_b tf_b * (ln(t_b+1) - ln(r_b+1))
             + n_grams * (ln(R+B) - ln(T+B))

    where t/r are bucket counts, T/R their totals, B = n_buckets.

    The plan persists two intermediates (the token-hash frames and the
    raw features — each feeds two consumers). Pass ``caches`` to
    receive them and ``unpersist()`` after your terminal action; with
    ``caches=None`` the blocks stay cached for the session (fine for
    one-shot jobs, a leak in a long-lived REPL — ``dsir_select`` is
    the entry point that cleans up automatically).
    """
    # raw features feed BOTH the raw-model bucket counts and the
    # per-doc scoring join — persist so the corpus tokenize/hash scan
    # runs once, not twice (the sketch-table precedent)
    raw_feats = ngram_bucket_tf(
        raw, id_col, text_col, n, n_buckets, caches
    ).persist()
    if caches is not None:
        caches.append(raw_feats)
    tgt_feats = ngram_bucket_tf(target, id_col, text_col, n, n_buckets, caches)
    rc = bucket_counts(raw_feats).withColumnRenamed("cnt", "r_cnt")
    tc = bucket_counts(tgt_feats).withColumnRenamed("cnt", "t_cnt")
    model = (
        rc.join(tc, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
        )
        .withColumn(
            "delta",
            F.log((F.col("t_cnt") + 1).cast("double"))
            - F.log((F.col("r_cnt") + 1).cast("double")),
        )
    )
    totals = model.agg(
        F.sum("r_cnt").alias("r_total"), F.sum("t_cnt").alias("t_total")
    )
    scored = (
        raw_feats.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_grams"),
            F.sum(
                (F.col("tf") * F.col("delta")).cast("decimal(30,6)")
            ).alias("sum_delta"),
        )
    )
    return scored.crossJoin(F.broadcast(totals)).select(
        id_col,
        "n_grams",
        F.round(
            F.col("sum_delta").cast("double")
            + F.col("n_grams")
            * (
                F.log((F.col("r_total") + n_buckets).cast("double"))
                - F.log((F.col("t_total") + n_buckets).cast("double"))
            ),
            6,
        ).alias("log_weight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Deterministic DSIR selection: the ``k`` raw documents with the
    highest importance log-weight (ties by id — fully specified).
    Catalyst plans the sort+limit as TakeOrderedAndProject (a
    distributed top-k, never a global sort). The paper's Gumbel-noise
    resampling variant composes with ``sampling.priority_sample``
    when a stochastic-but-deterministic draw is wanted instead.

    The k-row selection is materialized eagerly (tracked
    localCheckpoint — the ContextCleaner frees its blocks when the
    result is collected and dropped) so the scoring plan's persisted
    intermediates can be unpersisted HERE instead of leaking into a
    long-lived session; k is a selection budget, driver-safe by
    contract."""
    caches: list = []
    w = dsir_log_weights(raw, target, id_col, text_col, n, n_buckets, caches)
    out = (
        w.orderBy(F.desc("log_weight"), F.asc(id_col))
        .limit(k)
        .localCheckpoint(eager=True)
    )
    for c in caches:
        c.unpersist()
    return out
