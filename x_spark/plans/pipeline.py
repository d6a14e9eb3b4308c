"""LLM-data-pipeline query battery: dedup, similarity search, text
analysis, multimodal plumbing — over documents/embeddings (TESTDATA.md).

Each query pairs a Spark-first operator (x_spark.operators.*) with a
DuckDB oracle that replicates the exact semantics, down to bit-level
hash parity (md5-based primitives, integer modular arithmetic, and
6dp-rounded continuous scores — see x_spark.functions.portable).

Near-duplicate demos augment the corpus with deterministic perturbed
copies (id + 100000) because the synthetic corpus has no natural dups;
the augmentation expressions are mirrored in the oracles.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from x_spark.functions import portable as P
from x_spark.operators import bpe as B
from x_spark.operators import dedup as D
from x_spark.operators import similarity as S
from x_spark.operators import text as X
from x_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    sample_frames,
)
from x_spark.session import load_table

# Shared augmentation: whitespace/case-perturbed copies (same
# fingerprint) and appended-token copies (near-dup, not exact).
_AUG_EXACT_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 100000, concat(' ', upper(text), '  ') FROM documents WHERE doc_id % 7 = 0
"""

_AUG_NEAR_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 100000, concat(text, ' xtra') FROM documents WHERE doc_id % 10 = 0
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _docs_aug_exact(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    copies = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit(" "), F.upper("text"), F.lit("  ")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(copies)


def _docs_aug_near(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" xtra")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(copies)


# ---------------------------------------------------------------------------
# Text statistics (column-level, scan-speed at any scale).
def q_text_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.text_stats(_docs(spark, sf_dir)).select(
        "doc_id", "n_chars_calc", "n_tokens", "avg_token_len", "punct_ratio", "digit_ratio"
    )


ORACLE_TEXT_STATISTICS = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CASE WHEN length(regexp_extract_all(text, '\S+')) > 0
            THEN CAST(length(text) - length(regexp_extract_all(text, '\s')) AS BIGINT)
                 / CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT)
            ELSE 0.0 END AS avg_token_len,
       CASE WHEN length(text) > 0
            THEN CAST(length(regexp_extract_all(text, '[^\sA-Za-z0-9]')) AS BIGINT)
                 / CAST(length(text) AS BIGINT)
            ELSE 0.0 END AS punct_ratio,
       CASE WHEN length(text) > 0
            THEN CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT)
                 / CAST(length(text) AS BIGINT)
            ELSE 0.0 END AS digit_ratio
FROM documents
"""


# ---------------------------------------------------------------------------
# Composable filter battery with first-fail attribution (C4/Gopher
# shape rules): one row per rule (plus PASS) counting docs whose FIRST
# violation it is — sums to 100% by construction, so the report says
# which rule actually does the filtering. The oracle replays the same
# CASE chain over the proven text_statistics expression mirrors.
def q_curriculum_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.shards import global_positions

    # shortest-first curriculum: global 1-based positions under
    # (n_chars ASC, doc_id ASC) without a single-partition window
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return global_positions(docs, ["n_chars", "doc_id"])


ORACLE_CURRICULUM_POSITIONS = """
SELECT doc_id, n_chars,
       CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS position
FROM documents
"""


def q_filter_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.text import filter_attribution

    return filter_attribution(_docs(spark, sf_dir))


ORACLE_FILTER_ATTRIBUTION = r"""
WITH s AS (
  SELECT CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CASE WHEN length(regexp_extract_all(text, '\S+')) > 0
              THEN CAST(length(text) - length(regexp_extract_all(text, '\s')) AS BIGINT)
                   / CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT)
              ELSE 0.0 END AS avg_token_len,
         CASE WHEN length(text) > 0
              THEN CAST(length(regexp_extract_all(text, '[^\sA-Za-z0-9]')) AS BIGINT)
                   / CAST(length(text) AS BIGINT)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN length(text) > 0
              THEN CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT)
                   / CAST(length(text) AS BIGINT)
              ELSE 0.0 END AS digit_ratio
  FROM documents
), flagged AS (
  SELECT CASE
           WHEN n_tokens < 10 THEN 'too_short'
           WHEN NOT (avg_token_len BETWEEN 2.0 AND 12.0) THEN 'token_shape'
           WHEN punct_ratio > 0.3 THEN 'excess_punct'
           WHEN digit_ratio > 0.2 THEN 'digit_heavy'
           ELSE 'PASS'
         END AS rule
  FROM s
), c AS (
  SELECT rule, CAST(count(*) AS BIGINT) AS n_docs FROM flagged GROUP BY rule
), t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total FROM c)
SELECT rule, n_docs, round(n_docs / total, 6) AS share FROM c CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Repetition-based quality signals (Gopher-rules family): duplicate
# line/token fractions and the most-frequent-2-gram occurrence count.
# Single-projection JVM array folds — scan speed at any scale; the
# max-2-gram count folds the SORTED gram array instead of exploding.
def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.repetition_signals(_docs(spark, sf_dir)).select(
        "doc_id",
        F.round("dup_line_fraction", 6).alias("dup_line_fraction"),
        F.round("dup_token_fraction", 6).alias("dup_token_fraction"),
        "max_2gram_run",
    )


ORACLE_REPETITION_PROFILE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), x -> length(x) > 0) AS ln,
         regexp_extract_all(lower(text), '\S+') AS tk
  FROM documents
), grams AS (
  SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
    THEN list_transform(range(1, len(tk)), i -> concat(tk[i], ' ', tk[i+1]))
    ELSE [] END) AS g
  FROM toks
), runs AS (
  SELECT doc_id, max(c) AS max_run
  FROM (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT t.doc_id,
       CASE WHEN len(ln) > 0
            THEN round(1.0 - CAST(len(list_distinct(ln)) AS DOUBLE) / len(ln), 6)
            ELSE 0.0 END AS dup_line_fraction,
       CASE WHEN len(tk) > 0
            THEN round(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6)
            ELSE 0.0 END AS dup_token_fraction,
       CAST(coalesce(r.max_run, 0) AS BIGINT) AS max_2gram_run
FROM toks t LEFT JOIN runs r USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Benchmark contamination: training docs sharing >= min_shared distinct
# token n-grams with any eval-set doc (eval set: doc_id % 97 = 0). The
# hash-equi join meets on true n-gram collisions only — never
# |corpus| x |benchmark|; the benchmark side broadcasts (eval sets are
# small by nature). n=3 fits the synthetic corpus's tiny vocabulary;
# real pipelines run the operator's default (CONTAM_NGRAM=5).
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return X.contamination_check(corpus, bench, min_shared=2, n=3)


ORACLE_BENCHMARK_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(lower(text), '\S+'),
                        t -> cast(concat('0x', substr(md5(t),1,8)) as bigint)) AS th
  FROM documents
), g AS (
  -- gram hash = polynomial roll over token hashes, unrolled for n=3,
  -- mirroring Spark's aggregate fold step-for-step (mod after each
  -- multiply-add; every intermediate < 2^52)
  SELECT doc_id, unnest(list_distinct(CASE WHEN len(th) >= 3
    THEN list_transform(range(1, len(th) - 1),
         i -> ((((th[i] % 4294967291) * 1000003 + th[i+1]) % 4294967291)
               * 1000003 + th[i+2]) % 4294967291)
    ELSE [] END)) AS gh
  FROM toks
), c AS (SELECT doc_id AS train_id, gh FROM g WHERE doc_id % 97 <> 0),
   b AS (SELECT doc_id AS eval_id, gh FROM g WHERE doc_id % 97 = 0)
SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS shared_ngrams
FROM c JOIN b USING (gh)
GROUP BY train_id, eval_id
HAVING count(*) >= 2
"""


# ---------------------------------------------------------------------------
# Cross-document repeated n-gram spans (ExactSubstr-style corpus-
# internal span dedup signal) over the near-dup-augmented corpus.
_SPAN_N = 8


def q_cross_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.cross_doc_ngram_spans(_docs_aug_near(spark, sf_dir), n=_SPAN_N)


def _cross_doc_spans_oracle(n: int = _SPAN_N) -> str:
    # unrolled polynomial roll over token hashes, mirroring Spark's
    # aggregate fold step-for-step (mod after each multiply-add)
    poly = f"(th[i] % {P.MINHASH_PRIME})"
    for k in range(1, n):
        poly = f"(({poly} * 1000003 + th[i+{k}]) % {P.MINHASH_PRIME})"
    grams = (
        f"list_distinct(CASE WHEN len(th) >= {n} "
        f"THEN list_transform(range(1, len(th) - {n - 2}), i -> {poly}) "
        f"ELSE [] END)"
    )
    return rf"""
WITH docs_aug AS ({_AUG_NEAR_SQL}),
toks AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(lower(text), '\S+'),
                        t -> cast(concat('0x', substr(md5(t),1,8)) as bigint)) AS th
  FROM docs_aug
), g AS (
  SELECT doc_id, unnest({grams}) AS gh FROM toks
), tot AS (
  SELECT doc_id, CAST(len({grams}) AS BIGINT) AS total_grams FROM toks
), hot AS (
  SELECT gh, count(*) AS n_docs FROM g GROUP BY gh HAVING count(*) >= 2
), per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS shared_grams,
         CAST(max(n_docs) AS BIGINT) AS max_span_docs
  FROM g JOIN hot USING (gh) GROUP BY doc_id
)
SELECT t.doc_id, t.total_grams,
       COALESCE(p.shared_grams, 0) AS shared_grams,
       COALESCE(p.max_span_docs, 0) AS max_span_docs
FROM tot t LEFT JOIN per_doc p USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Cross-document span REMOVAL (the acting half of ExactSubstr dedup:
# cross_doc_spans measures, this one rewrites). Every occurrence of a
# 6-token gram shared by >= 2 docs is cut except the global first;
# overlapping cuts island-merge; the splice is an O(islands) JVM fold.
# The oracle re-derives chars_after as length(text) - merged-island
# mass from the SAME window algebra — if the Spark-side surgery
# dropped or double-cut a single character anywhere in the corpus,
# sum(length(text_scrubbed)) diverges and the hash breaks.
_SCRUB_N = 6


def q_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", F.coalesce("text", F.lit("")).alias("text")
    )
    scrubbed = X.scrub_cross_doc_spans(
        docs.select("doc_id", "text"), n=_SCRUB_N
    )
    return (
        docs.select("doc_id", "source")
        .join(scrubbed, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("chars_removed") > 0).cast("int"))
            .cast("bigint")
            .alias("docs_scrubbed"),
            F.sum("spans_cut").cast("bigint").alias("spans_cut"),
            F.sum("chars_removed").cast("bigint").alias("chars_removed"),
            F.sum(F.length("text_scrubbed")).cast("bigint").alias("chars_after"),
        )
    )


def _span_scrub_oracle(n: int = _SCRUB_N) -> str:
    gram = " || ' ' || ".join(
        ["tok"] + [f"lead(tok, {k}) OVER w" for k in range(1, n)]
    )
    return f"""
WITH d AS (
  SELECT doc_id, source, coalesce(text, '') AS text FROM documents
), toks AS (
  SELECT doc_id, u.tok, u.i
  FROM d, LATERAL (
    SELECT UNNEST(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS i) u
), pos AS (
  SELECT doc_id, tok, i,
         coalesce(sum(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cs
  FROM toks
), grams AS (
  SELECT doc_id, {gram} AS gram, cs AS s,
         lead(cs, {n - 1}) OVER w + length(lead(tok, {n - 1}) OVER w) AS e
  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY i)
), fg AS (
  SELECT doc_id, gram, s, e FROM grams WHERE gram IS NOT NULL
), hot AS (
  SELECT gram FROM fg GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), cut AS (
  SELECT doc_id, s, e FROM (
    SELECT f.doc_id, f.s, f.e,
           row_number() OVER (PARTITION BY f.gram ORDER BY f.doc_id, f.s) AS rn
    FROM fg f JOIN hot USING (gram)) WHERE rn > 1
), marked AS (
  SELECT doc_id, s, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM cut
), numbered AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM marked
), mrg AS (
  SELECT doc_id, isl, min(s) AS s, max(e) AS e
  FROM numbered GROUP BY doc_id, isl
), per_doc AS (
  SELECT doc_id, sum(e - s) AS removed FROM mrg GROUP BY doc_id
), spd AS (
  SELECT doc_id, count(*) AS spans FROM cut GROUP BY doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN coalesce(removed, 0) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_scrubbed,
       CAST(coalesce(sum(spans), 0) AS BIGINT) AS spans_cut,
       CAST(coalesce(sum(removed), 0) AS BIGINT) AS chars_removed,
       CAST(sum(length(text)) - coalesce(sum(removed), 0) AS BIGINT)
         AS chars_after
FROM d LEFT JOIN per_doc USING (doc_id) LEFT JOIN spd USING (doc_id)
GROUP BY source
"""


# ---------------------------------------------------------------------------
# Document chunking: overlapping fixed-token windows (pretraining/RAG
# prep). chunk=16/overlap=4 fits the ~50-token synthetic docs; real
# corpora run the operator defaults (256/32).
def q_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=16, overlap=4
    )


ORACLE_DOCUMENT_CHUNKS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk FROM documents
), starts AS (
  SELECT doc_id, tk, unnest(CASE WHEN len(tk) = 0 THEN []
    ELSE list_filter(range(1, len(tk) + 1, 12),
                     s -> s = 1 OR s <= len(tk) - 4) END) AS s
  FROM toks
)
SELECT doc_id,
       CAST((s - 1) // 12 AS BIGINT) AS chunk_id,
       CAST(s AS BIGINT) AS start_token,
       CAST(len(tk[s:s+15]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(tk[s:s+15], ' ') AS chunk_text
FROM starts
"""


# ---------------------------------------------------------------------------
# Language ID: marker-word argmax vs the labeled lang column.
def q_language_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = X.language_id(_docs(spark, sf_dir))
    return out.groupBy("lang", "lang_pred").agg(F.count("*").alias("n_docs"))


ORACLE_LANGUAGE_PROFILE = r"""
WITH scored AS (
  SELECT lang,
         CAST(length(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS BIGINT)  AS score_en,
         CAST(length(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS score_de,
         CAST(length(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b')) AS BIGINT)  AS score_fr,
         CAST(length(regexp_extract_all(lower(text), '\b(el|los|las|y|es)\b')) AS BIGINT)   AS score_es
  FROM documents
), pred AS (
  SELECT lang,
         CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
              WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
              WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
              WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
              ELSE 'es' END AS lang_pred
  FROM scored
)
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY lang, lang_pred
"""


# ---------------------------------------------------------------------------
# Quality scoring histogram.
def q_quality_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = X.quality_score(_docs(spark, sf_dir))
    return (
        scored.withColumn("bucket", F.floor(F.col("quality") * 10).cast("bigint"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
    )


ORACLE_QUALITY_HISTOGRAM = r"""
WITH stats AS (
  SELECT doc_id, lower(text) AS lt,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CAST(length(text) - length(regexp_extract_all(text, '\s')) AS BIGINT) AS token_chars,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_extract_all(text, '[^\sA-Za-z0-9]')) AS BIGINT) AS punct
  FROM documents
), feat AS (
  SELECT doc_id,
         n_tokens,
         CASE WHEN n_tokens > 0 THEN token_chars / n_tokens ELSE 0.0 END AS avg_token_len,
         CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio,
         CAST(length(regexp_extract_all(lt, '\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by)\b')) AS BIGINT) AS stop_hits
  FROM stats
), scored AS (
  SELECT doc_id,
         0.4 * least(n_tokens / 100.0, 1.0)
         + 0.3 * least((CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0.0 END) / 0.3, 1.0)
         + 0.2 * greatest(1.0 - 2 * punct_ratio, 0.0)
         + 0.1 * (CASE WHEN avg_token_len BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END) AS quality
  FROM feat
)
SELECT CAST(floor(quality * 10) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_docs
FROM scored GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Exact dedup by canonical fingerprint (hash-groupBy; one shuffle).
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = X.add_fingerprint(_docs_aug_exact(spark, sf_dir))
    groups = D.exact_dedup(docs, ["fp"], "doc_id")
    return groups.filter(F.col("group_size") > 1).select("fp", "doc_id", "group_size")


# ---------------------------------------------------------------------------
# Incremental ingest dedup: a new batch (with exact-dup noise) against
# the fingerprint store of the already-ingested half of the corpus —
# O(batch) per ingest, never O(corpus).
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.functions.portable import fingerprint

    docs = _docs(spark, sf_dir)
    seen = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(fingerprint("text").alias("fingerprint"))
        .distinct()
    )
    batch = _docs_aug_exact(spark, sf_dir)
    return D.incremental_dedup(batch, seen)


ORACLE_INCREMENTAL_DEDUP = """
WITH batch AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, concat(' ', upper(text), '  ') FROM documents WHERE doc_id % 7 = 0
), fps AS (
  SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
  FROM batch
), seen AS (
  SELECT DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
  FROM documents WHERE doc_id % 2 = 0
), within AS (
  SELECT fingerprint, min(doc_id) AS doc_id FROM fps GROUP BY fingerprint
)
SELECT w.doc_id, w.fingerprint
FROM within w
WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.fingerprint = w.fingerprint)
"""


ORACLE_EXACT_DEDUP = """
WITH docs_aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, concat(' ', upper(text), '  ') FROM documents WHERE doc_id % 7 = 0
), fps AS (
  SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
  FROM docs_aug
)
SELECT fp, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS group_size
FROM fps GROUP BY fp HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup candidate pairs.
def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = D.minhash_candidate_pairs(_docs_aug_near(spark, sf_dir))
    return pairs.filter(F.col("est_jaccard") >= 0.5)


def _minhash_common_ctes() -> str:
    """Shared CTE chain: augmented docs -> shingles -> hashes -> sigs -> bands -> candidate pairs."""
    r = D.SIGS_PER_BAND
    perm_exprs = ",\n         ".join(
        f"list_aggregate(list_transform(hs, h -> ({a} * h + {b}) % {P.MINHASH_PRIME}), 'min') AS sig_{i}"
        for i, (a, b) in enumerate(D.MINHASH_COEFFS)
    )
    bands = "\n  UNION ALL\n".join(
        "  SELECT doc_id, concat('{j}', '|', {sigs}) AS band_key FROM sigs".format(
            j=j, sigs=", '|', ".join(f"sig_{r * j + i}" for i in range(r))
        )
        for j in range(D.N_BANDS)
    )
    return f"""
WITH docs_aug AS ({_AUG_NEAR_SQL}),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(substr(text,1,{D.SHINGLE_PREFIX}))-{D.SHINGLE_K}+1,0)+1),
                                      i -> substr(substr(text,1,{D.SHINGLE_PREFIX}), i::int, {D.SHINGLE_K}))) AS shingles
  FROM docs_aug
), hashes AS (
  SELECT doc_id, list_transform(shingles, t -> cast(concat('0x', substr(md5(t),1,8)) as bigint)) AS hs
  FROM sh
), sigs AS (
  SELECT doc_id,
         {perm_exprs}
  FROM hashes
), bands AS (
{bands}
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""


def _minhash_oracle() -> str:
    eq_sum = " + ".join(
        f"(CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END)"
        for i in range(len(D.MINHASH_COEFFS))
    )
    k = len(D.MINHASH_COEFFS)
    return f"""{_minhash_common_ctes()}
SELECT id_a, id_b, ({eq_sum}) / {k}.0 AS est_jaccard
FROM pairs
JOIN sigs sa ON sa.doc_id = id_a
JOIN sigs sb ON sb.doc_id = id_b
WHERE ({eq_sum}) / {k}.0 >= 0.5
"""


# ---------------------------------------------------------------------------
# SimHash near-dup pairs (48-bit, 4 bands x 12 bits, hamming <= 3).
def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_pairs(_docs_aug_near(spark, sf_dir)).select(
        "id_a", "id_b", "simhash_a", "simhash_b", "hamming"
    )


_SIMHASH_TOKHASH = (
    "list_transform(regexp_extract_all(lower(text), '\\S+'), "
    f"t -> cast(concat('0x', substr(md5(t),1,{D.SIMHASH_BITS // 4})) as bigint))"
)

_SIMHASH_BAND_W = D.SIMHASH_BITS // D.SIMHASH_BANDS

ORACLE_SIMHASH_NEAR_DUPS = f"""
WITH docs_aug AS ({_AUG_NEAR_SQL}),
toks AS (
  SELECT doc_id, {_SIMHASH_TOKHASH} AS hs FROM docs_aug
), sims AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0,{D.SIMHASH_BITS}), b ->
           CASE WHEN list_sum(list_transform(hs, h -> 2 * ((h >> b) & 1) - 1)) > 0
                THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
  FROM toks
), nibs AS (
  SELECT doc_id, simhash,
         concat(j, '|', (simhash >> ({_SIMHASH_BAND_W}*j::int)) & {(1 << _SIMHASH_BAND_W) - 1}) AS nib_key
  FROM sims, (SELECT unnest(range({D.SIMHASH_BANDS})) AS j)
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS simhash_a, b.simhash AS simhash_b
  FROM nibs a JOIN nibs b ON a.nib_key = b.nib_key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, simhash_a, simhash_b,
       CAST(bit_count(xor(simhash_a, simhash_b)) AS BIGINT) AS hamming
FROM pairs
WHERE bit_count(xor(simhash_a, simhash_b)) <= 3
"""


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard verification of LSH candidates.
def q_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(_docs_aug_near(spark, sf_dir), threshold=0.5)


def _ngram_oracle() -> str:
    # exact jaccard over the 32-bit shingle-hash sets (matches the
    # Spark side, which intersects hash arrays, not strings)
    inter = "CAST(length(list_filter(sa2.hs, x -> list_contains(sb2.hs, x))) AS BIGINT)"
    union = (
        f"(CAST(length(sa2.hs) AS BIGINT) + CAST(length(sb2.hs) AS BIGINT) - {inter})"
    )
    return f"""{_minhash_common_ctes()}
SELECT p.id_a, p.id_b, {inter} / {union} AS jaccard
FROM pairs p
JOIN hashes sa2 ON sa2.doc_id = p.id_a
JOIN hashes sb2 ON sb2.doc_id = p.id_b
WHERE {inter} / {union} >= 0.5
"""


# ---------------------------------------------------------------------------
# Edit-distance verification of LSH candidates: threshold-bounded
# Levenshtein with a length-band prefilter — the character-level
# complement to the shingle-set Jaccard verifier.
def q_edit_distance_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.edit_distance_pairs(_docs_aug_near(spark, sf_dir), max_dist=16)


def _edit_distance_oracle() -> str:
    # DuckDB levenshtein counts bytes, Spark counts codepoints —
    # identical here because the corpus is pure ASCII (asserted at
    # generation; non-ASCII corpora must normalize first).
    return f"""{_minhash_common_ctes()},
txt AS (
  SELECT doc_id, substr(text, 1, {D.EDIT_PREFIX}) AS t FROM docs_aug
)
SELECT p.id_a, p.id_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist,
       CAST(length(a.t) AS BIGINT) AS len_a,
       CAST(length(b.t) AS BIGINT) AS len_b
FROM pairs p
JOIN txt a ON a.doc_id = p.id_a
JOIN txt b ON b.doc_id = p.id_b
WHERE abs(length(a.t) - length(b.t)) <= 16
  AND levenshtein(a.t, b.t) <= 16
"""


# ---------------------------------------------------------------------------
# EXACT set-similarity self-join (AllPairs/PPJoin family): guaranteed
# complete at the threshold via frequency-ordered prefix filtering —
# the certified-recall complement to the probabilistic MinHash path.
# The oracle is the brute-force all-pairs ground truth (fine at
# oracle scale; the Spark side never forms the cross product).
# Word-5-gram elements, not word tokens: the synthetic corpus draws
# from a 32-word vocabulary, so word SETS are near-identical across
# all docs (271M candidate pairs measured at sf0.1 — quadratic);
# 5-gram sets draw from the vocabulary's 5th power, are essentially
# unique per doc, and the true result is the engineered near-dup
# pairs (see the operator docstring).
def q_set_similarity_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.set_similarity_pairs(
        _docs_aug_near(spark, sf_dir), threshold=(1, 2), element="ngram", ngram_n=5
    )


ORACLE_SET_SIMILARITY_DUPS = f"""
WITH docs_aug AS ({_AUG_NEAR_SQL}),
tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM docs_aug
), gr AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 5
              THEN list_transform(range(1, len(t) - 5 + 2),
                     i -> array_to_string(t[i:i+4], ' '))
              ELSE [] END AS grams
  FROM tk
), hs AS (
  SELECT doc_id, list_distinct(list_transform(grams,
           g -> cast(concat('0x', substr(md5(g),1,8)) as bigint))) AS hset
  FROM gr
  WHERE len(grams) > 0
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(length(list_filter(a.hset, x -> list_contains(b.hset, x))) AS BIGINT) AS overlap,
         CAST(length(a.hset) AS BIGINT) + CAST(length(b.hset) AS BIGINT)
           - CAST(length(list_filter(a.hset, x -> list_contains(b.hset, x))) AS BIGINT) AS set_union
  FROM hs a JOIN hs b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, overlap, set_union,
       round(overlap / set_union, 6) AS jaccard
FROM pairs
WHERE overlap * 2 >= set_union * 1
"""


# ---------------------------------------------------------------------------
# BPE tokenizer: training is inherently iterative (each merge depends
# on post-merge counts — Sennrich'16), so the TRAINER query is
# rows-only; the APPLICATION of a merge table is deterministic per
# document and IS hash-checked, against an oracle that replays the
# same merges as a chain of plain string replaces over a
# separator-wrapped symbol string (identical greedy left-to-right
# semantics — pinned in tests/test_bpe.py against a reference
# implementation).
def q_bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = B.train_bpe(_docs(spark, sf_dir), n_merges=12, max_words=10_000)
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["pair_freq"])
         for m in merges],
        "rank int, left string, right string, merged string, pair_freq bigint",
    )


# ---------------------------------------------------------------------------
# Corpus-wide BPE ENCODING through the production encoder shape:
# train merges on the corpus, encode the DISTINCT word vocabulary once
# with the Arrow-batched rank-greedy encoder (bpe_encode_pandas — the
# GPT-2 loop), then broadcast-join token segmentations back onto word
# occurrences. At 100 TB the Python encoder runs over the
# Heaps-sublinear vocabulary, never the corpus: tokenizing 10^12 words
# costs one distinct-vocab pass + a broadcast hash join, the same
# artifact-reuse argument as the IVF codebooks. Correctness is gated
# IN-PLAN on the full vocabulary: every word's segmentation must
# concat back to word || '</w>' (decode-roundtrip) and its token count
# must sit in [1, len(word)+1] — the oracle predicts both gate sums as
# ZERO, so a single mis-segmented word anywhere breaks the driver
# hash. (Rank-greedy == rank-replay equivalence is separately pinned
# by tests/test_bpe.py against apply_merges.)
def q_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", F.coalesce("text", F.lit("")).alias("text")
    )
    merges = B.train_bpe(docs, n_merges=16, max_words=10_000)
    words = docs.select(
        "source",
        "doc_id",
        F.explode(
            F.expr(r"filter(split(lower(text), '\\s+'), x -> length(x) > 0)")
        ).alias("word"),
    )
    vocab = words.select("word").distinct()
    enc = B.bpe_encode_pandas(
        vocab.select("word", F.col("word").alias("wtext")),
        merges, text_col="wtext", id_col="word",
    )
    flags = enc.select(
        "word",
        (F.array_join("bpe_tokens", "")
         != F.concat(F.col("word"), F.lit(B.END_OF_WORD)))
        .cast("int").alias("rt_fail"),
        (~F.size("bpe_tokens").between(1, F.length("word") + 1))
        .cast("int").alias("bound_fail"),
    )
    return (
        words.join(F.broadcast(flags), "word")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_words"),
            F.countDistinct("word").cast("bigint").alias("n_distinct_words"),
            F.sum("rt_fail").cast("bigint").alias("encode_fail_words"),
            F.sum("bound_fail").cast("bigint").alias("bound_fail_words"),
        )
    )


ORACLE_BPE_ENCODE_CORPUS = r"""
WITH d AS (
  SELECT doc_id, source, coalesce(text, '') AS text FROM documents
), w AS (
  SELECT source, doc_id,
         unnest(regexp_extract_all(lower(text), '\S+')) AS word
  FROM d
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(count(DISTINCT word) AS BIGINT) AS n_distinct_words,
       CAST(0 AS BIGINT) AS encode_fail_words,
       CAST(0 AS BIGINT) AS bound_fail_words
FROM w
GROUP BY source
"""


# First 12 merges trained on the sf0.01 corpus (deterministic; pinned
# here as a FIXED vocabulary so the application query is a constant
# function of its input — mirrored literally in the oracle).
_BPE_FIXED_MERGES = [
    {"rank": i, "left": a, "right": b, "merged": a + b}
    for i, (a, b) in enumerate([
        ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
        ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
        ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
    ])
]


def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.fanout import fan_out

    docs = _docs(spark, sf_dir).withColumn("text", F.coalesce("text", F.lit("")))
    # the per-character wrap + 12 chained replaces run per row in the
    # scan stage — fan a degenerate one-split layout out first (guide
    # §2.5; per-row encode is deterministic)
    seg = B.apply_merges_str(
        fan_out(docs.select("doc_id", "text")), _BPE_FIXED_MERGES
    )
    return seg.select(
        "doc_id",
        F.size("bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.size(F.array_distinct("bpe_tokens")).cast("bigint").alias(
            "n_distinct_tokens"
        ),
    )


def _bpe_oracle() -> str:
    sep = "chr(31)"
    expr = "s"
    for m in _BPE_FIXED_MERGES:
        pat = f"{sep}||'{m['left']}'||{sep}||{sep}||'{m['right']}'||{sep}"
        rep = f"{sep}||'{m['merged']}'||{sep}"
        expr = f"replace({expr}, {pat}, {rep})"
    return rf"""
WITH syms AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(lower(coalesce(text, '')), '\S+'),
           w -> regexp_replace(w, '(.)', {sep} || '\1' || {sep}, 'g')
                || {sep} || '</w>' || {sep}) AS ws
  FROM documents
), merged AS (
  SELECT doc_id, list_transform(ws, s -> {expr}) AS ws FROM syms
), toks AS (
  SELECT doc_id, flatten(list_transform(ws, s ->
     string_split(substr(s, 2, length(s) - 2), {sep} || {sep}))) AS tk
  FROM merged
)
SELECT doc_id,
       CAST(length(tk) AS BIGINT) AS n_bpe_tokens,
       CAST(length(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens
FROM toks
"""


# ---------------------------------------------------------------------------
# Unigram-LM cross-entropy scoring (the CCNet perplexity-filter shape,
# with the corpus itself as the LM). DECIMAL-exact per-token sums, one
# final double division mirrored literally in the oracle.
def q_unigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.unigram_logprob(_docs(spark, sf_dir))


ORACLE_UNIGRAM_SURPRISE = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
), tot AS (
  SELECT sum(cnt) AS total FROM vocab
), per_doc AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         sum(CAST(-ln(CAST(cnt AS DOUBLE)) AS DECIMAL(30,6))) AS sum_neg_ln
  FROM toks t JOIN vocab v USING (tok)
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       round(CAST(sum_neg_ln AS DOUBLE) / n_tokens
             + ln(CAST(total AS DOUBLE)), 6) AS cross_entropy
FROM per_doc, tot
"""


# ---------------------------------------------------------------------------
# Linear quality-classifier scoring (fastText-style inference):
# hashed-unigram tf -> broadcast weight vector -> per-doc dot product.
# Integer weights keep the scores exact in both engines.
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators import classifier as C

    docs = _docs(spark, sf_dir)
    feats = C.hashed_features(docs)
    weights = C.pseudo_weights(spark)
    return (
        C.linear_scores(feats, weights)
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


ORACLE_QUALITY_CLASSIFIER = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
  FROM documents
), feats AS (
  SELECT doc_id,
         cast(concat('0x', substr(md5(tok),1,8)) as bigint) % 4096 AS bucket,
         count(*) AS tf
  FROM toks GROUP BY doc_id, 2
), w AS (
  SELECT bucket,
         (cast(concat('0x', substr(md5(cast(bucket AS VARCHAR)),1,8)) as bigint) % 2001) - 1000 AS weight
  FROM (SELECT unnest(range(4096)) AS bucket)
)
SELECT f.doc_id, CAST(sum(f.tf * w.weight) AS BIGINT) AS score
FROM feats f JOIN w USING (bucket)
GROUP BY f.doc_id
ORDER BY score DESC, f.doc_id
LIMIT 20
"""


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al., NeurIPS'23): score raw docs
# by the hashed-bigram log-likelihood ratio of a target-slice model
# over the raw-corpus model; keep the top-k. The target slice here is
# the doc_id % 11 == 0 subset (a stand-in for "looks like Wikipedia").
_DSIR_K = 100
_DSIR_BUCKETS = 4096


def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators import dsir as D

    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("doc_id") % 11 == 0)
    raw = docs.filter(F.col("doc_id") % 11 != 0)
    return D.dsir_select(raw, target, k=_DSIR_K, n_buckets=_DSIR_BUCKETS)


ORACLE_DSIR_SELECTION = rf"""
WITH toks AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(lower(text), '\S+'),
                        t -> cast(concat('0x', substr(md5(t),1,8)) as bigint)) AS th
  FROM documents
), g AS (
  -- bigram hash: one polynomial-roll step over token hashes,
  -- mirroring Spark's aggregate fold (mod after each multiply-add)
  SELECT doc_id, unnest(CASE WHEN len(th) >= 2
    THEN list_transform(range(1, len(th)),
         i -> ((th[i] % 4294967291) * 1000003 + th[i+1]) % 4294967291)
    ELSE [] END) AS gh
  FROM toks
), f AS (
  SELECT doc_id, gh % {_DSIR_BUCKETS} AS bucket, count(*) AS tf
  FROM g GROUP BY 1, 2
), raw_f AS (SELECT * FROM f WHERE doc_id % 11 <> 0),
   tgt_f AS (SELECT * FROM f WHERE doc_id % 11 = 0),
   rc AS (SELECT bucket, sum(tf) AS r_cnt FROM raw_f GROUP BY 1),
   tc AS (SELECT bucket, sum(tf) AS t_cnt FROM tgt_f GROUP BY 1),
   model AS (
     SELECT COALESCE(rc.bucket, tc.bucket) AS bucket,
            COALESCE(r_cnt, 0) AS r_cnt, COALESCE(t_cnt, 0) AS t_cnt,
            ln(cast(COALESCE(t_cnt, 0) + 1 AS double))
              - ln(cast(COALESCE(r_cnt, 0) + 1 AS double)) AS delta
     FROM rc FULL OUTER JOIN tc ON rc.bucket = tc.bucket
   ),
   tot AS (SELECT sum(r_cnt) AS r_total, sum(t_cnt) AS t_total FROM model),
   scored AS (
     SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_grams,
            sum(cast(tf * delta AS decimal(30,6))) AS sum_delta
     FROM raw_f JOIN model USING (bucket) GROUP BY doc_id
   )
SELECT doc_id, n_grams,
       round(cast(sum_delta AS double)
             + n_grams * (ln(cast(r_total + {_DSIR_BUCKETS} AS double))
                          - ln(cast(t_total + {_DSIR_BUCKETS} AS double))),
             6) AS log_weight
FROM scored, tot
ORDER BY log_weight DESC, doc_id ASC
LIMIT {_DSIR_K}
"""


# ---------------------------------------------------------------------------
# Per-source data cards: the governance one-pager a training-data
# pipeline publishes per corpus slice — volume (docs/tokens), exact-dup
# rate (corpus-wide fingerprint collisions attributed per source),
# language spread, and size stats, in ONE grouped pass over a derived
# frame (the fingerprint collision table is a tiny self-agg joined
# back on the hash — never doc x doc).
def q_source_data_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.functions.portable import token_count

    docs = _docs(spark, sf_dir).select(
        "source", "lang", "n_chars",
        F.md5("text").alias("fp"),
        token_count(F.col("text")).cast("bigint").alias("toks"),
    )
    dup = docs.groupBy("fp").agg(F.count("*").alias("fp_n"))
    j = docs.join(dup, "fp")
    return j.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("total_tokens"),
        (F.sum("toks").cast("double") / F.count("*")).alias("avg_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        (
            F.sum(F.when(F.col("fp_n") > 1, 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("dup_frac"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


ORACLE_SOURCE_DATA_CARDS = r"""
WITH f AS (
  SELECT source, lang, n_chars, md5(text) AS fp,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS toks
  FROM documents
), d AS (SELECT fp, count(*) AS fp_n FROM f GROUP BY fp)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS total_tokens,
       CAST(sum(toks) AS DOUBLE) / count(*) AS avg_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(CASE WHEN fp_n > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM f JOIN d USING (fp)
GROUP BY source
"""


# ---------------------------------------------------------------------------
# Token-budget selection (operators/sampling.select_token_budget):
# keep the best documents until a token budget fills — the running sum
# comes from the distributed two-stage scan over (n_chars DESC, id),
# never a single-partition global window. The oracle is the plain SQL
# cumulative window.
def q_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.sampling import select_token_budget

    return select_token_budget(
        _docs(spark, sf_dir), budget_tokens=20_000, order_col="n_chars"
    )


ORACLE_TOKEN_BUDGET_SELECTION = r"""
WITH t AS (
  SELECT doc_id, n_chars,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, n_chars, n_tokens,
         CAST(sum(n_tokens) OVER (
           ORDER BY n_chars DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS running_total
  FROM t
)
SELECT doc_id, n_chars, n_tokens, running_total
FROM o WHERE running_total <= 20000
"""


# ---------------------------------------------------------------------------
# Time-series resampling (operators/timeseries.py): dense per-user
# 6-hour grid with last-observation-carried-forward gap fill — the
# time_bucket_gapfill shape plain groupBy cannot express (empty
# buckets have no row to group). The oracle rebuilds the grid with
# generate_series and fills with last_value IGNORE NULLS.
def q_events_resampled_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.timeseries import resample_locf

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    out = resample_locf(ev, "user_id", "ts", "value", step_sec=6 * 3600)
    return out.select(
        "user_id", "bucket_us", F.round("value", 6).alias("value"), "filled"
    )


ORACLE_EVENTS_RESAMPLED_LOCF = """
WITH obs AS (
  SELECT user_id AS k,
         CAST(floor(epoch_us(ts) / 21600000000) * 21600000000 AS BIGINT) AS bucket_us,
         epoch_us(ts) AS us, value AS v
  FROM events WHERE user_id < 8
), lastv AS (
  SELECT k, bucket_us, v AS obs_value FROM (
    SELECT k, bucket_us, v,
           row_number() OVER (PARTITION BY k, bucket_us
                              ORDER BY us DESC, v DESC) AS rn
    FROM obs
  ) WHERE rn = 1
), spans AS (
  SELECT k, min(bucket_us) AS lo, max(bucket_us) AS hi FROM obs GROUP BY k
), grid AS (
  SELECT k, CAST(unnest(generate_series(lo, hi, 21600000000)) AS BIGINT) AS bucket_us
  FROM spans
)
SELECT g.k AS user_id, g.bucket_us,
       round(last_value(l.obs_value IGNORE NULLS) OVER (
         PARTITION BY g.k ORDER BY g.bucket_us
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value,
       l.obs_value IS NULL AS filled
FROM grid g LEFT JOIN lastv l USING (k, bucket_us)
"""


def q_events_resampled_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.timeseries import resample_interp

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    out = resample_interp(ev, "user_id", "ts", "value", step_sec=6 * 3600)
    return out.select(
        "user_id", "bucket_us", F.round("value", 6).alias("value"), "filled"
    )


# the lerp is the IDENTICAL expression tree on both sides (prev +
# (next - prev) * (dt / span)) — every op correctly rounded, so the
# doubles match bit for bit before the final display round.
ORACLE_EVENTS_RESAMPLED_INTERP = """
WITH obs AS (
  SELECT user_id AS k,
         CAST(floor(epoch_us(ts) / 21600000000) * 21600000000 AS BIGINT) AS bucket_us,
         epoch_us(ts) AS us, value AS v
  FROM events WHERE user_id < 8
), lastv AS (
  SELECT k, bucket_us, v AS obs_value FROM (
    SELECT k, bucket_us, v,
           row_number() OVER (PARTITION BY k, bucket_us
                              ORDER BY us DESC, v DESC) AS rn
    FROM obs
  ) WHERE rn = 1
), spans AS (
  SELECT k, min(bucket_us) AS lo, max(bucket_us) AS hi FROM obs GROUP BY k
), grid AS (
  SELECT k, CAST(unnest(generate_series(lo, hi, 21600000000)) AS BIGINT) AS bucket_us
  FROM spans
), j AS (
  SELECT g.k, g.bucket_us, l.obs_value,
         last_value(l.obs_value IGNORE NULLS) OVER (
           PARTITION BY g.k ORDER BY g.bucket_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(CASE WHEN l.obs_value IS NOT NULL THEN g.bucket_us END IGNORE NULLS) OVER (
           PARTITION BY g.k ORDER BY g.bucket_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
         first_value(l.obs_value IGNORE NULLS) OVER (
           PARTITION BY g.k ORDER BY g.bucket_us
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN l.obs_value IS NOT NULL THEN g.bucket_us END IGNORE NULLS) OVER (
           PARTITION BY g.k ORDER BY g.bucket_us
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM grid g LEFT JOIN lastv l USING (k, bucket_us)
)
SELECT k AS user_id, bucket_us,
       round(CASE WHEN obs_value IS NOT NULL THEN obs_value
                  WHEN prev_v IS NULL THEN next_v
                  WHEN next_v IS NULL THEN prev_v
                  ELSE prev_v + (next_v - prev_v) *
                       (CAST(bucket_us - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
             END, 6) AS value,
       obs_value IS NULL AS filled
FROM j
"""


# ---------------------------------------------------------------------------
# Behavioral event analytics (operators/sessions.py): gap-based
# sessionization, ordered funnel, weekly cohort retention.
_SESSION_GAP = 7200  # 2h: the synthetic per-user event cadence makes
# 30-min sessions mostly singletons; 2h forms real multi-event sessions


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.sessions import session_stats

    ev = load_table(spark, sf_dir, "events")
    s = session_stats(ev, gap_sec=_SESSION_GAP)
    return s.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.round(F.avg("n_events"), 6).alias("avg_session_events"),
        F.round(F.max("duration_sec"), 6).alias("max_duration_sec"),
    )


ORACLE_EVENT_SESSIONS = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
lagd AS (
  SELECT user_id, us,
         lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev
  FROM e
), flags AS (
  SELECT user_id, us,
         CASE WHEN prev IS NULL OR us - prev > {_SESSION_GAP} * CAST(1000000 AS BIGINT)
              THEN 1 ELSE 0 END AS nw
  FROM lagd
), sess AS (
  SELECT user_id, us,
         sum(nw) OVER (PARTITION BY user_id ORDER BY us
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM flags
), agg AS (
  SELECT user_id, sid, count(*) AS n_events,
         min(us) AS s, max(us) AS e
  FROM sess GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       round(avg(n_events), 6) AS avg_session_events,
       round(max((e - s) / 1000000.0), 6) AS max_duration_sec
FROM agg GROUP BY user_id
"""


_FUNNEL_STAGES = ["view", "click", "purchase"]


def q_signup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.sessions import funnel_stages

    ev = load_table(spark, sf_dir, "events")
    return funnel_stages(ev, _FUNNEL_STAGES)


ORACLE_SIGNUP_FUNNEL = """
WITH e AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us
           FROM events),
s0 AS (SELECT u, min(us) AS st FROM e WHERE t = 'view' GROUP BY u),
s1 AS (SELECT e.u, min(e.us) AS st
       FROM e JOIN s0 ON e.u = s0.u AND e.us >= s0.st
       WHERE e.t = 'click' GROUP BY e.u),
s2 AS (SELECT e.u, min(e.us) AS st
       FROM e JOIN s1 ON e.u = s1.u AND e.us >= s1.st
       WHERE e.t = 'purchase' GROUP BY e.u)
SELECT CAST(0 AS INTEGER) AS stage_idx, 'view' AS stage,
       CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
UNION ALL
SELECT CAST(1 AS INTEGER), 'click', CAST((SELECT count(*) FROM s1) AS BIGINT)
UNION ALL
SELECT CAST(2 AS INTEGER), 'purchase', CAST((SELECT count(*) FROM s2) AS BIGINT)
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.sessions import cohort_retention

    return cohort_retention(load_table(spark, sf_dir, "events"))


ORACLE_COHORT_RETENTION = """
WITH w AS (
  SELECT user_id AS u,
         CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS wk
  FROM events
), f AS (SELECT u, min(wk) AS cohort_week FROM w GROUP BY u),
a AS (
  SELECT DISTINCT w.u, f.cohort_week, w.wk - f.cohort_week AS week_offset
  FROM w JOIN f USING (u)
)
SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Robust per-group outlier profile (median/MAD) over order totals —
# the data-quality screen whose thresholds outliers cannot drag.
def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.profile import robust_outliers
    from x_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    return robust_outliers(orders, "o_totalprice", ["o_orderstatus"], k=3.0)


ORACLE_ROBUST_OUTLIERS = """
WITH med AS (
  SELECT o_orderstatus,
         quantile_cont(cast(o_totalprice AS double), 0.5) AS med
  FROM orders GROUP BY 1
), d AS (
  SELECT o.o_orderstatus,
         round(abs(cast(o.o_totalprice AS double) - med.med), 6) AS dev,
         med.med
  FROM orders o JOIN med USING (o_orderstatus)
), m AS (
  SELECT o_orderstatus, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1
)
SELECT d.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       round(any_value(d.med), 6) AS med,
       round(any_value(m.mad), 6) AS mad,
       CAST(sum(CASE WHEN dev > 3.0 * round(m.mad, 6) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       round(sum(CASE WHEN dev > 3.0 * round(m.mad, 6) THEN 1 ELSE 0 END)
             / count(*), 6) AS outlier_frac
FROM d JOIN m USING (o_orderstatus)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Deterministic corpus splitting: per-language stratified sampling +
# content-hash train/val/test assignment, summarized per (lang, split).
def q_corpus_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.sampling import hash_split, stratified_sample

    docs = _docs(spark, sf_dir)
    sampled = stratified_sample(
        docs,
        "lang",
        {"en": 0.8, "de": 0.5, "fr": 0.5, "es": 0.25},
        key_col="doc_id",
        default_rate=0.1,
    )
    split = hash_split(sampled, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return split.groupBy("lang", "split").agg(F.count("*").alias("n_docs"))


ORACLE_CORPUS_SPLITS = """
WITH b AS (
  SELECT lang, doc_id,
         cast(concat('0x', substr(md5(cast(doc_id AS VARCHAR)),1,8)) as bigint) % 10000 AS bucket
  FROM documents
), sampled AS (
  SELECT * FROM b
  WHERE bucket < CASE lang WHEN 'en' THEN 8000 WHEN 'de' THEN 5000
                           WHEN 'fr' THEN 5000 WHEN 'es' THEN 2500 ELSE 1000 END
), split AS (
  -- ranges allocated in sorted(split name) order: test, train, val
  SELECT lang,
         CASE WHEN bucket < 1000 THEN 'test'
              WHEN bucket < 9000 THEN 'train'
              ELSE 'val' END AS split
  FROM sampled
)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs
FROM split GROUP BY lang, split
"""


# ---------------------------------------------------------------------------
# Duplicate CLUSTERS: connected components (iterative min-label
# propagation) over the verified near-dup pairs — pairwise detection
# -> transitive groups, the survivor-selection unit of a real dedup
# pipeline. Oracle: recursive-CTE transitive closure.
def q_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.graph import connected_components

    pairs = D.ngram_jaccard_pairs(_docs_aug_near(spark, sf_dir), threshold=0.5)
    labels = connected_components(pairs, pairs_distinct=True)
    return labels.groupBy("component").agg(F.count("*").alias("cluster_size"))


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection: one representative per duplicate cluster
    (longest text wins, ties by min doc_id); non-duplicated docs
    survive as singletons. The end-to-end dedup story:
    pairs -> components -> survivors."""
    from x_spark.operators.graph import connected_components, select_survivors

    docs = _docs_aug_near(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5)
    labels = connected_components(pairs, pairs_distinct=True)
    survivors = select_survivors(
        docs.withColumn("n_chars_calc", F.length("text")),
        labels,
        order_cols=[F.desc("n_chars_calc")],
    )
    return survivors.select(
        "component",
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        F.col("doc_id").alias("survivor_id"),
        F.col("n_chars_calc").cast("bigint").alias("survivor_chars"),
    )


def _dedup_survivors_oracle() -> str:
    ngram = _ngram_oracle()
    return f"""
WITH RECURSIVE sp AS ({ngram}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM sp
  UNION
  SELECT id_b, id_a FROM sp
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
),
aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, concat(text, ' xtra') FROM documents WHERE doc_id % 10 = 0
),
labeled AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
         length(d.text) AS n_chars_calc
  FROM aug d LEFT JOIN comp c ON d.doc_id = c.node
)
SELECT component,
       CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
       doc_id AS survivor_id,
       CAST(n_chars_calc AS BIGINT) AS survivor_chars
FROM labeled
QUALIFY row_number() OVER (PARTITION BY component
                           ORDER BY n_chars_calc DESC, doc_id) = 1
"""


def _dup_components_oracle() -> str:
    ngram = _ngram_oracle()
    return f"""
WITH RECURSIVE sp AS ({ngram}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM sp
  UNION
  SELECT id_b, id_a FROM sp
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
)
SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
FROM comp GROUP BY component
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs.
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    aug = emb.select("vec_id", "embedding", "label").unionByName(copies)
    return S.embedding_near_dup_pairs(aug, threshold=0.999)


ORACLE_EMBEDDING_NEAR_DUPS = """
WITH aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding::DOUBLE[] FROM embeddings WHERE vec_id % 25 = 0
), scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1] * b.v[i+1]))
               / (sqrt(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1] * a.v[i+1])))
                  * sqrt(list_sum(list_transform(range(len(b.v)), i -> b.v[i+1] * b.v[i+1])))), 6) AS cos_sim
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.999
"""


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al.): semantic dedup over embeddings — cosine
# near-dup pairs -> connected components -> one survivor per semantic
# cluster (min id), singletons kept. Pure composition of the tested
# ε-join + components + survivor-selection operators.
def q_semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.graph import connected_components, select_survivors

    emb = load_table(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    aug = emb.select("vec_id", "embedding", "label").unionByName(copies)
    pairs = S.embedding_near_dup_pairs(aug, threshold=0.999)
    labels = connected_components(pairs, pairs_distinct=True)
    survivors = select_survivors(aug, labels, id_col="vec_id")
    return survivors.select(
        "component",
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        F.col("vec_id").alias("survivor_id"),
        F.col("label").cast("bigint").alias("survivor_label"),
    )


ORACLE_SEMANTIC_DEDUP_SURVIVORS = """
WITH RECURSIVE aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding::DOUBLE[], label FROM embeddings WHERE vec_id % 25 = 0
), scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1] * b.v[i+1]))
               / (sqrt(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1] * a.v[i+1])))
                  * sqrt(list_sum(list_transform(range(len(b.v)), i -> b.v[i+1] * b.v[i+1])))), 6) AS cos_sim
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
), sp AS (
  SELECT id_a, id_b FROM scored WHERE cos_sim >= 0.999
), edges AS (
  SELECT id_a AS a, id_b AS b FROM sp
  UNION
  SELECT id_b, id_a FROM sp
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), comp AS (
  SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
), labeled AS (
  SELECT g.vec_id, coalesce(c.component, g.vec_id) AS component, g.label
  FROM aug g LEFT JOIN comp c ON g.vec_id = c.node
)
SELECT component,
       CAST(count(*) AS BIGINT) AS cluster_size,
       min(vec_id) AS survivor_id,
       CAST(arg_min(label, vec_id) AS BIGINT) AS survivor_label
FROM labeled GROUP BY component
"""


# ---------------------------------------------------------------------------
# ANN: brute-force cosine top-k (exact baseline).
def q_ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    return S.brute_force_topk(corpus, queries, k=10)


ORACLE_ANN_TOPK_BRUTEFORCE = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT query_id, cand_id,
         round(list_sum(list_transform(range(len(qv)), i -> qv[i+1] * cv[i+1]))
               / (sqrt(list_sum(list_transform(range(len(qv)), i -> qv[i+1] * qv[i+1])))
                  * sqrt(list_sum(list_transform(range(len(cv)), i -> cv[i+1] * cv[i+1])))), 6) AS cos_sim
  FROM q, c
), ranked AS (
  SELECT query_id, cand_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# ANN: IVF-style bucketed top-k (sign-pattern coarse quantizer, 2 probes).
def q_ann_topk_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    return S.bucketed_topk(corpus, queries, k=10, n_buckets=8, n_probe=2)


# ---------------------------------------------------------------------------
# ANN: IVF with a TRAINED k-means codebook (deterministic spherical
# Lloyd's, fixed iterations). The codebook is data-dependent, so there
# is no closed-form SQL oracle — the driver records the rows-only check;
# determinism + recall vs brute force are pinned by pytest
# (tests/test_ivf.py) and recall@10 is reported by bench.py.
_IVF_CODEBOOK_CACHE: dict[str, list] = {}


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    # Train-offline story: the codebook is trained once per immutable
    # corpus (training is deterministic) and PERSISTED as a parquet
    # table — at scale it lives next to the data; queries (including
    # other processes — the driver's bench and correctness runs are
    # separate JVMs) load it and pay only the probe path. The persisted
    # copy is keyed by the corpus identity (realpath + mtime) so a
    # regenerated corpus retrains.
    key = os.path.realpath(sf_dir)
    codebook = _IVF_CODEBOOK_CACHE.get(key)
    if codebook is None:
        src = os.path.join(key, "embeddings.parquet")
        tag = hashlib.md5(
            f"{key}|{os.path.getmtime(src):.0f}|c16i5".encode()
        ).hexdigest()[:16]
        cb_path = os.path.join(
            tempfile.gettempdir(), f"xs_ivf_codebook_{tag}.parquet"
        )
        if os.path.isdir(cb_path):
            codebook = S.load_codebook(spark, cb_path)
        else:
            # pinned at 16 centroids for timing continuity with the
            # frozen baseline; the sqrt(n)-scaled default and the
            # IVF-PQ operating points are measured in bench.py's
            # ann_recall_report (recall 0.8 @ 10% raw at sf0.1)
            codebook = S.train_codebook(corpus, n_centroids=16, n_iters=5)
            S.save_codebook(spark, codebook, cb_path)
        _IVF_CODEBOOK_CACHE[key] = codebook
    return S.ivf_topk(corpus, queries, codebook, k=10, n_probe=3)


# ---------------------------------------------------------------------------
# ANN, the measured scale path (verdict r4 #2): IVF-PQ with an OPQ
# rotation + exact cosine re-rank — the registry representative of the
# operator a user would actually run at 100 TB. The coarse quantizer is
# FINE (centroid count scales with the corpus, trained via the
# Arrow-sampled numpy k-means so codegen caps don't apply), codes are
# m=8 one-byte subquantizer indices (the persisted artifact is ~32x
# smaller than raw vectors), the ADC stage probes ~25% of the code
# table via probed-cluster pushdown, and only a ~10% re-rank pool ever
# touches raw vectors. Rows-only by design (data-dependent codebooks
# have no closed-form SQL oracle); the recall floor at this exact
# operating point is pinned by tests/test_ivf.py::
# test_ann_topk_pq_registry_recall_floor and the sf0.1 measurement is
# reported by bench.py's ann_recall_report (0.865 @ 24.6% codes / 10%
# raw in BENCH_DETAIL).
_PQ_ARTIFACT_CACHE: dict[str, tuple] = {}


def _pq_artifacts(spark, corpus, key: str, n: int) -> tuple:
    """Train-once IVF-PQ+OPQ artifacts for a corpus identity: cached
    in-process AND persisted to a temp JSON keyed by (corpus identity,
    config) so the driver's separate bench/correctness JVMs retrain at
    most once. Artifacts are metadata-scale (centroids + codebooks +
    the d x d rotation)."""
    import json

    from x_spark.operators import pq as PQ

    nc = max(8, min(256, n // 8))
    art = _PQ_ARTIFACT_CACHE.get(key)
    if art is not None:
        return art
    src = os.path.join(key, "embeddings.parquet")
    tag = hashlib.md5(
        f"{key}|{os.path.getmtime(src):.0f}|pq8-opq-c{nc}".encode()
    ).hexdigest()[:16]
    art_path = os.path.join(tempfile.gettempdir(), f"xs_pq_{tag}.json")
    if os.path.isfile(art_path):
        with open(art_path) as fh:
            blob = json.load(fh)
        art = (blob["codebook"], blob["rotation"], blob["books"])
    else:
        codebook = S.train_codebook_arrow(corpus, n_centroids=nc, n_iters=8)
        rotation, books = PQ.train_opq(
            corpus, codebook, m=8, ks=min(256, max(16, n // 4)),
            n_iters=4, opq_iters=4,
        )
        tmp = art_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"codebook": codebook, "rotation": rotation, "books": books}, fh
            )
        os.replace(tmp, art_path)
        art = (codebook, rotation, books)
    _PQ_ARTIFACT_CACHE[key] = art
    return art


def q_ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators import pq as PQ

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    n = corpus.count()
    key = os.path.realpath(sf_dir)
    codebook, rotation, books = _pq_artifacts(spark, corpus, key, n)
    nc = len(codebook)
    return PQ.pq_topk(
        corpus, queries, codebook, books,
        k=10,
        n_probe=max(1, round(0.25 * nc)),
        rerank=max(10, n // 10),
        rotation=rotation,
    )


# ---------------------------------------------------------------------------
# Maintained IVF index STORE, driver-checkable end to end: ingest the
# corpus into the cluster-partitioned txlog store in two txn-stamped
# batches, REPLAY batch 1 (the detected no-op is load-bearing — a
# double-applied batch would duplicate candidates and shift every rank
# below them, hash-diverging), then search the stored assignments with
# partition-pruned probes. Unlike ann_topk_ivf/pq the codebook here is
# data-INDEPENDENT — one-hot unit centroids on the first 8 dims — so
# DuckDB replicates the complete IVF semantics closed-form: assignment
# = first argmax of the first 8 coords, probes = top-2 coords (ties:
# lower index), candidates = probed clusters only, exact cosine
# re-rank. Any drift in ingest, store layout, replay detection, probe
# choice, pruning, or scoring hash-diverges.
def q_ivf_store_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxnAlreadyCommittedException

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    dim = len(emb.select("embedding").head()["embedding"])
    codebook = [
        [1.0 if j == i else 0.0 for j in range(dim)] for i in range(8)
    ]
    workdir = tempfile.mkdtemp(prefix="xs_ivf_store_")
    try:
        ds = init_datasource("txlog", spark)
        ref = TableRef(path=os.path.join(workdir, "idx"))
        b1 = corpus.filter(F.col("vec_id") % 2 == 0)
        b2 = corpus.filter(F.col("vec_id") % 2 == 1)
        S.update_ivf_store(ds, ref, b1, codebook, txn=("ivfq", 1))
        S.update_ivf_store(ds, ref, b2, codebook, txn=("ivfq", 2))
        try:
            S.update_ivf_store(ds, ref, b1, codebook, txn=("ivfq", 1))
            raise AssertionError("replayed IVF ingest batch not detected")
        except TxnAlreadyCommittedException:
            pass
        return S.ivf_store_topk(
            ds, ref, queries, codebook, k=10, n_probe=2
        ).localCheckpoint(eager=True)  # materialize before rmtree
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_IVF_STORE_SEARCH = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 5),
dims AS (SELECT unnest(range(8)) AS i),
probes AS (
  SELECT query_id, i AS cluster FROM (
    SELECT q.query_id, d.i,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY q.qv[d.i + 1] DESC, d.i ASC) AS pr
    FROM q, dims d
  ) WHERE pr <= 2
),
assigned AS (
  SELECT cand_id, i AS cluster FROM (
    SELECT c.cand_id, d.i,
           row_number() OVER (PARTITION BY c.cand_id
                              ORDER BY c.cv[d.i + 1] DESC, d.i ASC) AS rr
    FROM c, dims d
  ) WHERE rr = 1
),
scored AS (
  SELECT p.query_id, a.cand_id,
         round(list_sum(list_transform(range(len(qv)), i -> qv[i+1] * cv[i+1]))
               / (sqrt(list_sum(list_transform(range(len(qv)), i -> qv[i+1] * qv[i+1])))
                  * sqrt(list_sum(list_transform(range(len(cv)), i -> cv[i+1] * cv[i+1])))), 6) AS cos_sim
  FROM probes p
  JOIN assigned a USING (cluster)
  JOIN q USING (query_id)
  JOIN c ON c.cand_id = a.cand_id
), ranked AS (
  SELECT query_id, cand_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


ORACLE_ANN_TOPK_BUCKETED = """
WITH c AS (
  SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) AS bucket
  FROM embeddings WHERE vec_id >= 5
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) AS bucket0
  FROM embeddings WHERE vec_id < 5
), probes AS (
  SELECT DISTINCT query_id, qv, bucket FROM (
    SELECT query_id, qv, bucket0 AS bucket FROM q
    UNION ALL
    SELECT query_id, qv, xor(bucket0, 1) FROM q
  )
), scored AS (
  SELECT query_id, cand_id,
         round(list_sum(list_transform(range(len(qv)), i -> qv[i+1] * cv[i+1]))
               / (sqrt(list_sum(list_transform(range(len(qv)), i -> qv[i+1] * qv[i+1])))
                  * sqrt(list_sum(list_transform(range(len(cv)), i -> cv[i+1] * cv[i+1])))), 6) AS cos_sim
  FROM probes JOIN c USING (bucket)
), ranked AS (
  SELECT query_id, cand_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# End-to-end curation pipeline: quality filter -> deterministic hash
# sample -> exact-dedup survivor selection -> per-language corpus
# stats. The composition is ONE Catalyst plan — filters fuse into the
# scan, the only shuffles are the dedup groupBy and the final agg.
# Sampling is content-hash based (md5 of the fingerprint), so it is
# reproducible across runs, engines, and cluster layouts — the
# property a training-data pipeline needs (seeded rand() is not
# stable across partitionings).
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    corpus = emb.filter(F.col("vec_id") >= 8)
    return S.hard_negatives(corpus, queries, k=5, sim_lo=0.15, sim_hi=0.9)


ORACLE_HARD_NEGATIVE_MINING = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 8),
scored AS (
  SELECT query_id, cand_id,
         round(list_sum(list_transform(range(len(qv)), i -> qv[i+1] * cv[i+1]))
               / (sqrt(list_sum(list_transform(range(len(qv)), i -> qv[i+1] * qv[i+1])))
                  * sqrt(list_sum(list_transform(range(len(cv)), i -> cv[i+1] * cv[i+1])))), 6) AS cos_sim
  FROM q, c WHERE query_id <> cand_id
), banded AS (
  SELECT * FROM scored WHERE cos_sim >= 0.15 AND cos_sim < 0.9
), ranked AS (
  SELECT query_id, cand_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id ASC) AS neg_rank
  FROM banded
)
SELECT query_id, cand_id, cos_sim, CAST(neg_rank AS BIGINT) AS neg_rank
FROM ranked WHERE neg_rank <= 5
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from x_spark.functions.portable import hash32

    docs = X.quality_score(X.add_fingerprint(_docs_aug_exact(spark, sf_dir).join(
        _docs(spark, sf_dir).select("doc_id", "lang"), "doc_id", "left"
    )))
    kept = docs.filter(F.col("quality") >= 0.5).filter(hash32("fp") % 10 < 8)
    w = W.partitionBy("fp").orderBy(F.asc("doc_id"))
    survivors = (
        kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    return survivors.groupBy(F.coalesce("lang", F.lit("unknown")).alias("lang")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.regexp_count("text", F.lit(r"\S+")).cast("bigint")).alias("total_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


ORACLE_CURATION_PIPELINE = r"""
WITH docs_aug AS (
  SELECT d.doc_id, d.text, o.lang
  FROM (SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, concat(' ', upper(text), '  ') FROM documents WHERE doc_id % 7 = 0) d
  LEFT JOIN (SELECT doc_id, lang FROM documents) o USING (doc_id)
), feat AS (
  SELECT doc_id, text, lang,
         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CAST(length(text) - length(regexp_extract_all(text, '\s')) AS BIGINT) AS token_chars,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_extract_all(text, '[^\sA-Za-z0-9]')) AS BIGINT) AS punct,
         CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by)\b')) AS BIGINT) AS stop_hits
  FROM docs_aug
), scored AS (
  SELECT doc_id, text, lang, fp, n_tokens,
         0.4 * least(n_tokens / 100.0, 1.0)
         + 0.3 * least((CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0.0 END) / 0.3, 1.0)
         + 0.2 * greatest(1.0 - 2 * (CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END), 0.0)
         + 0.1 * (CASE WHEN (CASE WHEN n_tokens > 0 THEN token_chars / n_tokens ELSE 0.0 END)
                       BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END) AS quality
  FROM feat
), kept AS (
  SELECT * FROM scored
  WHERE quality >= 0.5
    AND cast(concat('0x', substr(md5(fp),1,8)) as bigint) % 10 < 8
), survivors AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM kept
)
SELECT coalesce(lang, 'unknown') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(quality), 6) AS avg_quality
FROM survivors WHERE rn = 1
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# ANN: the vectorized-Python path (Arrow batches -> numpy matmul with
# per-batch partial top-k) — same semantics/oracle as the JVM
# expression baseline; exists to document the "when Python is
# unavoidable" pattern with measured numbers next to the default.
def q_ann_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    return S.cosine_topk_pandas(corpus, queries, k=10)


# ---------------------------------------------------------------------------
# Multimodal: binary payload + typed metadata through an Arrow-batched
# mapInPandas decode pipeline (deterministic stub decoder).
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(_docs(spark, sf_dir))
    return extract_features(media)


ORACLE_MULTIMODAL_FEATURES = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum, -- DuckDB md5 hashes the VARCHAR's UTF-8 bytes = the payload bytes
       CAST((octet_length(encode(text)) % 640) + 1 AS BIGINT) AS width,
       CAST(((octet_length(encode(text)) * 7) % 480) + 1 AS BIGINT) AS height,
       CAST((octet_length(encode(text)) * 13) % 60000 AS BIGINT) AS duration_ms
FROM documents
"""


# ---------------------------------------------------------------------------
# Multimodal frame sampling: row-expanding mapInPandas (video -> one
# row per sampled frame, 10s stride over the stub-decoded duration).
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(_docs(spark, sf_dir))
    return sample_frames(media, every_ms=10_000)


ORACLE_MULTIMODAL_FRAMES = """
WITH vids AS (
  SELECT doc_id, text, (octet_length(encode(text)) * 13) % 60000 AS duration_ms
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id AS media_id,
       CAST(i AS BIGINT) AS frame_idx,
       CAST(i * 10000 AS BIGINT) AS ts_ms,
       md5(text || '#' || CAST(i AS VARCHAR)) AS frame_sig
FROM vids, LATERAL (SELECT unnest(range(0, CAST(ceil(duration_ms / 10000.0) AS BIGINT))) AS i)
WHERE duration_ms > 0
"""


# ---------------------------------------------------------------------------
# External-DB connector round trip: publish the supplier dimension into
# DuckDB through the connector surface (append path), read it back
# through the same connector, and join it against the parquet-side
# nation table — proving the second connector end-to-end inside the
# driver's own correctness gate. The oracle is plain SQL because the
# round trip must be lossless.
def q_duckdb_dim_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("duckdb", spark)  # in-memory, scoped to this call
    ref = TableRef(table="supplier_dim")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    ds.append(sup, ref)
    back = ds.read(ref)
    nat = load_table(spark, sf_dir, "nation")
    return (
        back.join(F.broadcast(nat), back.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(30,6)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


ORACLE_DUCKDB_DIM_ROUNDTRIP = """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(CAST(s_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# Same round trip through the JDBC connector (Derby embedded — the
# cluster-grade external-DB path: executor-side cursors + partitioned
# range read back). Same oracle shape: the trip must be lossless.
# ONE database per process (embedded Derby keeps opened databases
# booted in the JVM until shutdown); the write is a full overwrite so
# repeated invocations (bench warmup + timed runs) stay idempotent.
_JDBC_DB_CACHE: dict[str, str] = {}


def q_jdbc_dim_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    url = _JDBC_DB_CACHE.setdefault(
        os.path.realpath(sf_dir),
        f"jdbc:derby:{tempfile.mkdtemp(prefix='xs_jdbc_')}/db;create=true",
    )
    ds = init_datasource(url, spark)
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    ds.overwrite(sup, TableRef(table="supplier_dim"))
    # read back as a PARTITIONED parallel scan (4 range queries on the
    # key — the 100 TB ingest shape for an indexed source table)
    hi = sup.agg(F.max("s_suppkey")).first()[0]
    back = ds.read(TableRef(table="supplier_dim", options={
        "partitionColumn": "s_suppkey", "lowerBound": "0",
        "upperBound": str(int(hi) + 1), "numPartitions": "4",
    }))
    nat = load_table(spark, sf_dir, "nation")
    return (
        back.join(F.broadcast(nat), back.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(30,6)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


ORACLE_JDBC_DIM_ROUNDTRIP = ORACLE_DUCKDB_DIM_ROUNDTRIP


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination: result-identical to
# benchmark_contamination (the exact join kills Bloom false positives)
# so it shares the oracle; the plan drops non-member corpus grams
# BEFORE the shuffle via an 8 KB broadcast filter literal.
def q_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return X.contamination_check_bloom(corpus, bench, min_shared=2, n=3)


ORACLE_CONTAMINATION_BLOOM = ORACLE_BENCHMARK_CONTAMINATION


# ---------------------------------------------------------------------------
# Corpus-level line dedup (C4 boilerplate rule). The synthetic docs are
# single-line, so the query appends deterministic boilerplate lines (a
# footer on every doc, a promo line on every third) — mirrored in the
# oracle; the operator must keep each boilerplate line only at its
# global first occurrence while every original line survives.
def q_line_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nsubscribe to premium updates"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("\nlimited time offer today"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    out = X.line_dedup(docs, min_count=2)
    return out.select(
        "doc_id", F.md5("clean_text").alias("clean_sig"), "n_kept", "n_removed"
    )


ORACLE_LINE_DEDUP_BOILERPLATE = """
WITH aug AS (
  SELECT doc_id,
         concat(text, chr(10), 'subscribe to premium updates',
                CASE WHEN doc_id % 3 = 0
                     THEN concat(chr(10), 'limited time offer today')
                     ELSE '' END) AS text
  FROM documents
), l AS (
  SELECT doc_id, i - 1 AS pos, ls[i] AS line, trim(lower(ls[i])) AS norm
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM aug),
       LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS i)
), occ AS (
  SELECT norm, count(*) AS n_occ, min(doc_id * 1000000 + pos) AS first_key
  FROM l WHERE norm <> '' GROUP BY norm
), kept AS (
  SELECT l.* FROM l LEFT JOIN occ USING (norm)
  WHERE norm = '' OR n_occ < 2 OR doc_id * 1000000 + pos = first_key
)
SELECT a.doc_id,
       md5(coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '')) AS clean_sig,
       CAST(count(k.pos) AS BIGINT) AS n_kept,
       CAST((SELECT count(*) FROM l WHERE l.doc_id = a.doc_id) - count(k.pos)
            AS BIGINT) AS n_removed
FROM aug a LEFT JOIN kept k ON a.doc_id = k.doc_id
GROUP BY a.doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic training-order shuffle + shard assignment
# (operators/shards.py): seed-parameterized md5 permutation, shard =
# key mod n, position = per-shard rank — one hash-partition shuffle,
# never a global sort, never rand(). The oracle replays the identical
# hash math (hash60 == DuckDB '0x'||substr(md5,1,15) cast) and window.
def q_corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.shards import shard_manifest, shuffle_shards
    from x_spark.functions.portable import token_count

    docs = _docs(spark, sf_dir)
    shards = shuffle_shards(docs, n_shards=8, seed="42")
    # manifest join-back: the per-shard doc/token accounting a loader
    # reads first — checks the map AND the co-keyed manifest in one row
    # set (shard sizes must be hash-balanced and token sums exact)
    toks = docs.select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    man = shard_manifest(shards, payload=toks, token_col="n_tokens")
    return shards.join(man, "shard_id").select(
        "doc_id", "shard_id", "pos_in_shard", "n_docs", "total_tokens"
    )


ORACLE_CORPUS_SHUFFLE_SHARDS = r"""
WITH keyed AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(concat('42:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS sk,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
), assigned AS (
  SELECT doc_id, sk, n_tokens, CAST(sk % 8 AS INT) AS shard_id FROM keyed
), pos AS (
  SELECT doc_id, shard_id, n_tokens,
         CAST(row_number() OVER (PARTITION BY shard_id ORDER BY sk, doc_id) - 1 AS BIGINT)
           AS pos_in_shard
  FROM assigned
), man AS (
  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens
  FROM pos GROUP BY shard_id
)
SELECT p.doc_id, p.shard_id, p.pos_in_shard, m.n_docs, m.total_tokens
FROM pos p JOIN man m USING (shard_id)
"""


# ---------------------------------------------------------------------------
# Sequence packing (GPT-style concat-and-slice): every document's span
# of fixed-capacity training sequences, from a DISTRIBUTED two-stage
# prefix sum of token counts (never a single-partition global window —
# x_spark/operators/packing.py). The oracle is the plain global cumsum.
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.packing import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), capacity=256)


ORACLE_SEQUENCE_PACKING = r"""
WITH t AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM t
)
SELECT doc_id, n_tokens, start_offset,
       CAST(floor(start_offset / 256) AS BIGINT) AS first_seq,
       CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / 256) AS BIGINT)
         AS last_seq,
       CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / 256)
            - floor(start_offset / 256) + 1 AS BIGINT) AS n_seqs
FROM o
"""


# ---------------------------------------------------------------------------
# Keyword search: BM25 top-k over the documents corpus (inverted-index
# formulation — x_spark.operators.text_search). "dup" is the corpus's
# one rare token, so the idf spread is real, not degenerate.
_BM25_TERMS = ["dup", "vector", "spark"]


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.text_search import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), _BM25_TERMS, k=15)


def _bm25_oracle() -> str:
    from x_spark.operators.text_search import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_TERMS, k=15)


# ---------------------------------------------------------------------------
# The MAINTAINED BM25 index driven against the same oracle as the
# direct computation: the index is built incrementally inside the
# query (three ingest batches into the token-bucket-partitioned txlog
# postings store), then searched through the pruned-scan path. A
# drifted posting count, a lost batch, or a broken derived-stats
# formula all hash-diverge from the direct-BM25 oracle.
def q_bm25_indexed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from x_spark.operators.text_search import bm25_store_topk, update_text_index
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_bm25_idx_")
    try:
        ds = TxLogDataSource(spark)
        root = os.path.join(workdir, "idx")
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        for b in range(3):
            update_text_index(
                ds, root, docs.filter(F.col("doc_id") % 3 == b), txn=("ing", b)
            )
        return bm25_store_topk(ds, root, _BM25_TERMS, k=15).localCheckpoint(
            eager=True  # materialize before the temp store disappears
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


# ---------------------------------------------------------------------------
# PII audit: the synthetic corpus carries no natural PII, so the query
# injects deterministic emails/phones/IPs (mirrored in the oracle) and
# audits detection + redaction completeness per source.
def _pii_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id").cast("string")
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat("text", F.lit(" mail user"), did, F.lit("@example.com ok")),
        )
        .when(
            F.col("doc_id") % 5 == 0,
            F.concat("text", F.lit(" call +1 555-123-4567 now")),
        )
        .when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                "text",
                F.lit(" from 192.168."),
                (F.col("doc_id") % 254).cast("string"),
                F.lit(".7 up"),
            ),
        )
        .otherwise(F.col("text")),
    )


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.pii import scan_documents

    return scan_documents(_pii_augmented(spark, sf_dir))


ORACLE_PII_SCAN = r"""
WITH aug AS (
  SELECT doc_id, source,
         CASE
           WHEN doc_id % 7 = 0 THEN text || ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com ok'
           WHEN doc_id % 5 = 0 THEN text || ' call +1 555-123-4567 now'
           WHEN doc_id % 3 = 0 THEN text || ' from 192.168.' || CAST(doc_id % 254 AS VARCHAR) || '.7 up'
           ELSE text
         END AS text
  FROM documents
),
counted AS (
  SELECT source,
         length(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c_email,
         length(regexp_extract_all(text, '\+?[0-9]{1,2}[ -][0-9]{3}[ -][0-9]{3}[ -]?[0-9]{4}')) AS c_phone,
         length(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS c_ipv4,
         regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\+?[0-9]{1,2}[ -][0-9]{3}[ -][0-9]{3}[ -]?[0-9]{4}', '[PHONE]', 'g'),
             '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g') AS red
  FROM aug
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN c_email + c_phone + c_ipv4 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       CAST(sum(c_email) AS BIGINT) AS n_email,
       CAST(sum(c_phone) AS BIGINT) AS n_phone,
       CAST(sum(c_ipv4) AS BIGINT) AS n_ipv4,
       CAST(sum(
           length(regexp_extract_all(red, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
         + length(regexp_extract_all(red, '\+?[0-9]{1,2}[ -][0-9]{3}[ -][0-9]{3}[ -]?[0-9]{4}'))
         + length(regexp_extract_all(red, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
       ) AS BIGINT) AS residual_after_redact
FROM counted
GROUP BY source
"""


# ---------------------------------------------------------------------------
# Corpus mixing + weighted sampling (training-data mixing step).
_MIX_PROPS = {"en": 0.5, "de": 0.2, "es": 0.15, "fr": 0.1, "zh": 0.05}


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.sampling import mix_corpus

    kept = mix_corpus(_docs(spark, sf_dir), "lang", _MIX_PROPS, "doc_id")
    return kept.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("docid_sum"),
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixing (mT5 rule): proportions ~ count^alpha at
# alpha=0.5 — the sqrt setting is IEEE-correctly-rounded, so the quota
# algebra (w_s = sqrt(c_s), quota_s = floor(w_s * min(c_s / w_s)); the
# normalizer cancels) is bit-identical in Spark and DuckDB. Groups by
# source over the documents table; deterministic lowest-hash keeps.
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.sampling import temperature_mix

    kept = temperature_mix(_docs(spark, sf_dir), "source", "doc_id", alpha=0.5)
    return kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("docid_sum"),
    )


ORACLE_TEMPERATURE_MIXTURE = """
WITH c AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS cnt FROM documents GROUP BY source
), w AS (
  SELECT source, sqrt(cnt) AS wt, cnt / sqrt(cnt) AS ratio FROM c
), m AS (SELECT min(ratio) AS mr FROM w),
q AS (
  SELECT source, CAST(floor(wt * mr) AS BIGINT) AS quota FROM w CROSS JOIN m
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000,
                    doc_id
         ) AS rk
  FROM documents
),
kept AS (SELECT r.doc_id, r.source FROM ranked r JOIN q USING (source) WHERE rk <= quota)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS docid_sum
FROM kept GROUP BY source
"""


ORACLE_CORPUS_MIXTURE = """
WITH props(lang, p) AS (
  VALUES ('en', 0.5), ('de', 0.2), ('es', 0.15), ('fr', 0.1), ('zh', 0.05)
),
tagged AS (
  SELECT d.doc_id, d.lang, CAST(p AS DOUBLE) AS p
  FROM documents d JOIN props USING (lang)
),
counts AS (SELECT lang, p, count(*) AS cnt FROM tagged GROUP BY lang, p),
total AS (SELECT min(CAST(cnt AS DOUBLE) / p) AS t FROM counts),
quota AS (
  SELECT lang, CAST(floor(p * t) AS BIGINT) AS q
  FROM counts CROSS JOIN total
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000,
                    doc_id
         ) AS rk
  FROM tagged
),
kept AS (SELECT r.doc_id, r.lang FROM ranked r JOIN quota USING (lang) WHERE rk <= q)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS docid_sum
FROM kept GROUP BY lang
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.sampling import priority_sample

    return priority_sample(
        _docs(spark, sf_dir), "n_chars", 50, "doc_id"
    ).select("doc_id", "lang", "n_chars")


ORACLE_WEIGHTED_SAMPLE = """
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         -ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
            / 4294967296.0) / CAST(n_chars AS DOUBLE) AS prio
  FROM documents
) ORDER BY prio, doc_id LIMIT 50
"""


# ---------------------------------------------------------------------------
# Trailing-window anomaly detection (operators/timeseries.py): z-score
# against the previous-50-points baseline per event type, variance from
# exact DECIMAL(30,6) window sums (a raw double window stddev is
# association-order-dependent and would never hash-match).
def q_rolling_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.timeseries import rolling_anomalies

    ev = load_table(spark, sf_dir, "events")
    return rolling_anomalies(ev, n=50, z_thresh=2.5, min_periods=10)


ORACLE_ROLLING_VALUE_ANOMALIES = """
WITH w AS (
  SELECT event_id, event_type, value,
         count(value) OVER fr AS cnt,
         sum(CAST(value AS DECIMAL(30,6))) OVER fr AS s1,
         sum(CAST(value * value AS DECIMAL(30,6))) OVER fr AS s2
  FROM events
  WINDOW fr AS (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
), z AS (
  SELECT event_id, event_type, value, CAST(cnt AS BIGINT) AS n_window,
         (value - CAST(s1 AS DOUBLE) / cnt)
           / sqrt(CAST(s2 AS DOUBLE) / cnt
                  - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt)) AS zr
  FROM w
  WHERE cnt >= 10
    AND CAST(s2 AS DOUBLE) / cnt
        - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt) > 0
)
SELECT event_id, event_type, value, n_window, round(zr, 6) AS zscore
FROM z WHERE abs(zr) > 2.5
"""


# ---------------------------------------------------------------------------
# Corpus lexical statistics (operators/keywords.py): TF-IDF keyword
# extraction, PMI collocations, cross-source vocabulary overlap. The
# ln expression trees are mirrored operation-for-operation in the
# oracles (the same convention weighted_sample / bm25_search rely on).
def q_doc_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.keywords import tfidf_topk_terms

    return tfidf_topk_terms(_docs(spark, sf_dir), k=3)


ORACLE_DOC_KEYWORDS_TFIDF = r"""
WITH p AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
), tfq AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM p GROUP BY doc_id, term
), dfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfq GROUP BY term
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tfq.doc_id, tfq.term,
         CAST(tf AS DOUBLE)
           * (ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) + 1.0)
           AS score
  FROM tfq JOIN dfq USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, score,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term)
              AS BIGINT) AS term_rank
  FROM scored
)
SELECT doc_id, term, round(score, 6) AS tfidf, term_rank
FROM ranked WHERE term_rank <= 3
"""


def q_bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.keywords import pmi_collocations

    return pmi_collocations(_docs(spark, sf_dir), min_count=5, top_n=40)


ORACLE_BIGRAM_COLLOCATIONS = r"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '\S+') AS t FROM documents
), big AS (
  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
), pc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
  FROM big GROUP BY w1, w2 HAVING count(*) >= 5
), uni AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term FROM documents)
  GROUP BY term
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tokens
  FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term FROM documents)
)
SELECT pc.w1, pc.w2, pc.pair_count,
       round(ln((CAST(pair_count AS DOUBLE) * CAST(n_tokens AS DOUBLE))
                / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 6) AS pmi
FROM pc
JOIN uni u1 ON pc.w1 = u1.term
JOIN uni u2 ON pc.w2 = u2.term
CROSS JOIN tot
ORDER BY pmi DESC, w1, w2
LIMIT 40
"""


def q_corpus_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.keywords import corpus_token_overlap

    return corpus_token_overlap(_docs(spark, sf_dir))


ORACLE_CORPUS_VOCAB_OVERLAP = r"""
WITH v AS (
  SELECT DISTINCT source, term FROM (
    SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS term
    FROM documents
  )
), s AS (SELECT source, CAST(count(*) AS BIGINT) AS vsize FROM v GROUP BY source),
i AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS inter
  FROM v a JOIN v b ON a.term = b.term AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b, inter,
       sa.vsize AS vocab_a, sb.vsize AS vocab_b,
       round(CAST(inter AS DOUBLE) / CAST(sa.vsize + sb.vsize - inter AS DOUBLE), 6)
         AS jaccard
FROM i
JOIN s sa ON i.source_a = sa.source
JOIN s sb ON i.source_b = sb.source
"""



# Maintained histogram-sketch store, driver-checked end to end: two
# lineitem batches append per-flag fixed-grid summaries to a txlog
# store (txn-stamped exactly-once, replay asserted inside the timed
# window), then quantiles per flag are answered FROM the store —
# summed bucket counts + inverse-CDF interpolation, never re-reading
# the ingested rows. Fixed-grid histograms merge LOSSLESSLY (counts
# add), so unlike HLL every output is an exact function of the data
# and the whole flow hash-checks against a declarative DuckDB oracle
# that recomputes buckets + the identical interpolation expression
# (IEEE-double operation order mirrored term for term).
def q_quantile_sketch_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from x_spark.operators.histsketch import (
        quantiles_from_store, update_histogram_store,
    )
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxnAlreadyCommittedException

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .alias("charge"),
    )
    lo, hi, nb = 0.0, 110000.0, 64
    workdir = tempfile.mkdtemp(prefix="xs_qsk_")
    try:
        ds = init_datasource("txlog", spark)
        store = TableRef(path=os.path.join(workdir, "hs"))
        b1 = li.filter(F.col("l_orderkey") % 2 == 0)
        b2 = li.filter(F.col("l_orderkey") % 2 == 1)
        update_histogram_store(ds, store, b1, "charge", ["l_returnflag"],
                               lo, hi, nb, txn=("qskq", 1))
        update_histogram_store(ds, store, b2, "charge", ["l_returnflag"],
                               lo, hi, nb, txn=("qskq", 2))
        try:
            update_histogram_store(ds, store, b1, "charge",
                                   ["l_returnflag"], lo, hi, nb,
                                   txn=("qskq", 1))
            raise AssertionError("replayed sketch ingest not detected")
        except TxnAlreadyCommittedException:
            pass
        return quantiles_from_store(
            ds, store, ["l_returnflag"], lo, hi, nb,
            [0.25, 0.5, 0.75, 0.95],
        ).localCheckpoint(eager=True)  # materialize before rmtree
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


# The oracle mirrors the estimator expression TERM FOR TERM — double
# arithmetic order (lo + bucket*w) + frac*w, ceil-rank inverse CDF,
# extrema clamps — so equality is IEEE-exact, no rounding needed.
ORACLE_QUANTILE_SKETCH_STORE = """
WITH pts AS (
  SELECT l_returnflag AS g,
         l_extendedprice * (1.0 - l_discount) AS v
  FROM lineitem
),
b AS (
  SELECT g,
         CASE WHEN fb < 0 THEN -1
              WHEN fb >= 64 THEN 64
              ELSE fb END AS bucket,
         count(*) AS n, min(v) AS blo, max(v) AS bhi
  FROM (SELECT g, v,
               CAST(floor((v - 0.0) / 1718.75) AS INT) AS fb
        FROM pts)
  GROUP BY 1, 2
),
cum AS (
  SELECT g, bucket, n,
         sum(n) OVER (PARTITION BY g ORDER BY bucket) AS cum,
         sum(n) OVER (PARTITION BY g) AS total,
         min(blo) OVER (PARTITION BY g) AS gmin,
         max(bhi) OVER (PARTITION BY g) AS gmax
  FROM b
),
qs AS (SELECT CAST(q AS DOUBLE) AS q
       FROM (VALUES (0.25), (0.5), (0.75), (0.95)) t(q)),
j AS (
  SELECT *, GREATEST(CAST(ceil(q * total) AS BIGINT), 1) AS r
  FROM cum CROSS JOIN qs
)
SELECT g AS l_returnflag, q,
       CASE WHEN bucket < 0 THEN gmin
            WHEN bucket >= 64 THEN gmax
            ELSE GREATEST(LEAST((0.0 + bucket * 1718.75)
                                + ((r - (cum - n)) / n) * 1718.75,
                                gmax), gmin)
       END AS value
FROM j
WHERE cum >= r AND (cum - n) < r
"""

PIPELINE_QUERIES = {
    "bm25_search": q_bm25_search,
    "pii_scan": q_pii_scan,
    "corpus_mixture": q_corpus_mixture,
    "weighted_sample": q_weighted_sample,
    "multimodal_frames": q_multimodal_frames,
    "duckdb_dim_roundtrip": q_duckdb_dim_roundtrip,
    "jdbc_dim_roundtrip": q_jdbc_dim_roundtrip,
    "contamination_bloom": q_contamination_bloom,
    "line_dedup_boilerplate": q_line_dedup_boilerplate,
    "sequence_packing": q_sequence_packing,
    "corpus_shuffle_shards": q_corpus_shuffle_shards,
    "temperature_mixture": q_temperature_mixture,
    "events_resampled_locf": q_events_resampled_locf,
    "source_data_cards": q_source_data_cards,
    "token_budget_selection": q_token_budget_selection,
    "rolling_value_anomalies": q_rolling_value_anomalies,
    "bm25_indexed_search": q_bm25_indexed_search,
    "hard_negative_mining": q_hard_negative_mining,
    "filter_attribution": q_filter_attribution,
    "curriculum_positions": q_curriculum_positions,
    "doc_keywords_tfidf": q_doc_keywords_tfidf,
    "bigram_collocations": q_bigram_collocations,
    "corpus_vocab_overlap": q_corpus_vocab_overlap,
    "events_resampled_interp": q_events_resampled_interp,
    "ann_topk_pandas": q_ann_topk_pandas,
    "curation_pipeline": q_curation_pipeline,
    "dup_components": q_dup_components,
    "dedup_survivors": q_dedup_survivors,
    "corpus_splits": q_corpus_splits,
    "text_statistics": q_text_statistics,
    "repetition_profile": q_repetition_profile,
    "benchmark_contamination": q_benchmark_contamination,
    "document_chunks": q_document_chunks,
    "cross_doc_spans": q_cross_doc_spans,
    "span_scrub": q_span_scrub,
    "language_profile": q_language_profile,
    "quality_histogram": q_quality_histogram,
    "exact_dedup": q_exact_dedup,
    "incremental_dedup": q_incremental_dedup,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_near_dups": q_simhash_near_dups,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "edit_distance_dups": q_edit_distance_dups,
    "set_similarity_dups": q_set_similarity_dups,
    "bpe_token_stats": q_bpe_token_stats,
    "bpe_encode_corpus": q_bpe_encode_corpus,
    "bpe_merge_table": q_bpe_merge_table,  # rows-only: iterative trainer
    "quality_classifier": q_quality_classifier,
    "dsir_selection": q_dsir_selection,
    "event_sessions": q_event_sessions,
    "signup_funnel": q_signup_funnel,
    "cohort_retention": q_cohort_retention,
    "robust_outliers": q_robust_outliers,
    "unigram_surprise": q_unigram_surprise,
    "embedding_near_dups": q_embedding_near_dups,
    "semantic_dedup_survivors": q_semantic_dedup_survivors,
    "ann_topk_bruteforce": q_ann_topk_bruteforce,
    "ann_topk_bucketed": q_ann_topk_bucketed,
    "ann_topk_ivf": q_ann_topk_ivf,  # rows-only: data-dependent codebook
    "ann_topk_pq": q_ann_topk_pq,  # rows-only: the measured IVF-PQ+OPQ scale path
    "ivf_store_search": q_ivf_store_search,
    "quantile_sketch_store": q_quantile_sketch_store,
    "multimodal_features": q_multimodal_features,
}

PIPELINE_ORACLES = {
    "bm25_search": _bm25_oracle(),
    "ivf_store_search": ORACLE_IVF_STORE_SEARCH,
    "quantile_sketch_store": ORACLE_QUANTILE_SKETCH_STORE,
    "pii_scan": ORACLE_PII_SCAN,
    "corpus_mixture": ORACLE_CORPUS_MIXTURE,
    "weighted_sample": ORACLE_WEIGHTED_SAMPLE,
    "multimodal_frames": ORACLE_MULTIMODAL_FRAMES,
    "duckdb_dim_roundtrip": ORACLE_DUCKDB_DIM_ROUNDTRIP,
    "jdbc_dim_roundtrip": ORACLE_JDBC_DIM_ROUNDTRIP,
    "contamination_bloom": ORACLE_CONTAMINATION_BLOOM,
    "line_dedup_boilerplate": ORACLE_LINE_DEDUP_BOILERPLATE,
    "sequence_packing": ORACLE_SEQUENCE_PACKING,
    "corpus_shuffle_shards": ORACLE_CORPUS_SHUFFLE_SHARDS,
    "temperature_mixture": ORACLE_TEMPERATURE_MIXTURE,
    "events_resampled_locf": ORACLE_EVENTS_RESAMPLED_LOCF,
    "source_data_cards": ORACLE_SOURCE_DATA_CARDS,
    "token_budget_selection": ORACLE_TOKEN_BUDGET_SELECTION,
    "rolling_value_anomalies": ORACLE_ROLLING_VALUE_ANOMALIES,
    "bm25_indexed_search": _bm25_oracle(),
    "hard_negative_mining": ORACLE_HARD_NEGATIVE_MINING,
    "filter_attribution": ORACLE_FILTER_ATTRIBUTION,
    "curriculum_positions": ORACLE_CURRICULUM_POSITIONS,
    "doc_keywords_tfidf": ORACLE_DOC_KEYWORDS_TFIDF,
    "bigram_collocations": ORACLE_BIGRAM_COLLOCATIONS,
    "corpus_vocab_overlap": ORACLE_CORPUS_VOCAB_OVERLAP,
    "events_resampled_interp": ORACLE_EVENTS_RESAMPLED_INTERP,
    "ann_topk_pandas": ORACLE_ANN_TOPK_BRUTEFORCE,
    "curation_pipeline": ORACLE_CURATION_PIPELINE,
    "dup_components": _dup_components_oracle(),
    "dedup_survivors": _dedup_survivors_oracle(),
    "corpus_splits": ORACLE_CORPUS_SPLITS,
    "text_statistics": ORACLE_TEXT_STATISTICS,
    "repetition_profile": ORACLE_REPETITION_PROFILE,
    "benchmark_contamination": ORACLE_BENCHMARK_CONTAMINATION,
    "document_chunks": ORACLE_DOCUMENT_CHUNKS,
    "cross_doc_spans": _cross_doc_spans_oracle(),
    "span_scrub": _span_scrub_oracle(),
    "language_profile": ORACLE_LANGUAGE_PROFILE,
    "quality_histogram": ORACLE_QUALITY_HISTOGRAM,
    "exact_dedup": ORACLE_EXACT_DEDUP,
    "incremental_dedup": ORACLE_INCREMENTAL_DEDUP,
    "minhash_near_dups": _minhash_oracle(),
    "simhash_near_dups": ORACLE_SIMHASH_NEAR_DUPS,
    "ngram_jaccard_dups": _ngram_oracle(),
    "edit_distance_dups": _edit_distance_oracle(),
    "set_similarity_dups": ORACLE_SET_SIMILARITY_DUPS,
    "bpe_token_stats": _bpe_oracle(),
    "bpe_encode_corpus": ORACLE_BPE_ENCODE_CORPUS,
    "quality_classifier": ORACLE_QUALITY_CLASSIFIER,
    "dsir_selection": ORACLE_DSIR_SELECTION,
    "event_sessions": ORACLE_EVENT_SESSIONS,
    "signup_funnel": ORACLE_SIGNUP_FUNNEL,
    "cohort_retention": ORACLE_COHORT_RETENTION,
    "robust_outliers": ORACLE_ROBUST_OUTLIERS,
    "unigram_surprise": ORACLE_UNIGRAM_SURPRISE,
    "embedding_near_dups": ORACLE_EMBEDDING_NEAR_DUPS,
    "semantic_dedup_survivors": ORACLE_SEMANTIC_DEDUP_SURVIVORS,
    "ann_topk_bruteforce": ORACLE_ANN_TOPK_BRUTEFORCE,
    "ann_topk_bucketed": ORACLE_ANN_TOPK_BUCKETED,
    "multimodal_features": ORACLE_MULTIMODAL_FEATURES,
}
