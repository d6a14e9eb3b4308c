"""Text-analysis operators for large-scale training-data pipelines.

Extensions beyond the reference (SURVEY §7 Phase E): language ID
(marker-word heuristic), quality scoring, token statistics, document
fingerprinting. All column-level: pure ``pyspark.sql.functions``
expressions (JVM-side, whole-stage codegen — no Python UDFs in the hot
path), embarrassingly parallel, no shuffles. At 100 TB these run at
scan speed.

Every expression has an exact DuckDB equivalent (see
x_spark.functions.portable for the shared primitives); integer counts
and single-division ratios are bit-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from x_spark.functions.portable import fingerprint, token_count

# Marker words per language for the n-gram/stopword language heuristic.
# Word-boundary regexes are RE2/Java-regex compatible (portable to the
# DuckDB oracle). Tie-break: first language in this list wins.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}

ENGLISH_STOPWORDS = r"\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by)\b"


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append token/char statistics columns.

    n_chars_calc   length in characters
    n_tokens       whitespace-delimited token count
    avg_token_len  mean token length (0 for empty text)
    punct_ratio    punctuation chars / total chars
    digit_ratio    digit chars / total chars
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("bigint")
    n_tokens = token_count(t).cast("bigint")
    # total length of tokens = chars minus whitespace
    token_chars = (n_chars - F.regexp_count(t, F.lit(r"\s"))).cast("bigint")
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            F.when(n_tokens > 0, token_chars / n_tokens).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(
                n_chars > 0,
                F.regexp_count(t, F.lit(r"[^\sA-Za-z0-9]")).cast("bigint") / n_chars,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "digit_ratio",
            F.when(
                n_chars > 0,
                F.regexp_count(t, F.lit(r"[0-9]")).cast("bigint") / n_chars,
            ).otherwise(F.lit(0.0)),
        )
    )


def language_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language marker-word hit counts (on lowercased text)."""
    t = F.lower(F.col(text_col))
    return {
        lang: F.regexp_count(t, F.lit(pattern)).cast("bigint")
        for lang, pattern in LANG_MARKERS.items()
    }


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``lang_pred``: argmax of marker scores, 'und' when all 0.

    Tie-break is the fixed LANG_MARKERS order (first max wins), so the
    prediction is deterministic and oracle-replicable as a CASE chain.
    """
    scores = language_scores(text_col)
    out = df
    for lang, score in scores.items():
        out = out.withColumn(f"score_{lang}", score)
    langs = list(scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:  # first-in-order max wins
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return out.withColumn("lang_pred", pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append a [0,1] quality score from shape heuristics:

    0.4 * token-count saturation (n_tokens/100 capped at 1)
    0.3 * stopword presence  (en stopword hits / tokens, capped at .3->1)
    0.2 * (1 - punct_ratio excess)
    0.1 * mean-token-length plausibility (1 when 3<=avg<=12)

    Deterministic: integer counts + single divisions + least/greatest.
    Requires the ``text_stats`` columns; computes them when absent.
    """
    if "n_tokens" not in df.columns:
        df = text_stats(df, text_col)
    t = F.lower(F.col(text_col))
    stop_hits = F.regexp_count(t, F.lit(ENGLISH_STOPWORDS)).cast("bigint")
    stop_ratio = F.when(F.col("n_tokens") > 0, stop_hits / F.col("n_tokens")).otherwise(
        F.lit(0.0)
    )
    score = (
        0.4 * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
        + 0.3 * F.least(stop_ratio / F.lit(0.3), F.lit(1.0))
        + 0.2 * F.greatest(F.lit(1.0) - 2 * F.col("punct_ratio"), F.lit(0.0))
        + 0.1
        * F.when(F.col("avg_token_len").between(3.0, 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return df.withColumn("quality", score)


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the canonical md5 fingerprint (whitespace/punct/case
    insensitive) used for exact near-duplicate grouping."""
    return df.withColumn("fp", fingerprint(F.col(text_col)))
