"""PII detection and redaction for training-data curation.

Standard pre-training hygiene: find and mask emails, phone numbers,
and IP addresses before text enters a corpus. Pure JVM regex column
expressions (``regexp_count`` / ``regexp_replace``) — scan-speed, no
Python in the hot path, trivially parallel at 100 TB.

Pattern notes: every pattern below sticks to RE2-compatible syntax
(no backreferences/lookaround) so the same string works in Spark
(java.util.regex), DuckDB (RE2 — the correctness oracle), and RE2-
based scanners a production pipeline might swap in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ordered dict of pii type -> (regex, replacement tag)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\+?[0-9]{1,2}[ -][0-9]{3}[ -][0-9]{3}[ -]?[0-9]{4}", "[PHONE]"),
    "ipv4": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "[IP]"),
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-type match-count columns for a text column.

    DuckDB: ``length(regexp_extract_all(x, pattern))``.
    """
    col = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(col, F.lit(pat))
        for name, (pat, _) in PII_PATTERNS.items()
    }


def redact(col: Column | str) -> Column:
    """Text with every PII match replaced by its type tag.

    Patterns apply in declaration order (email before phone before ip)
    — order matters only for overlapping matches, and tags contain no
    digits/@ so later patterns never re-match earlier tags.

    DuckDB: chained ``regexp_replace(x, pattern, tag, 'g')`` (the 'g'
    flag; Spark's regexp_replace is always global).
    """
    out = F.col(col) if isinstance(col, str) else col
    for pat, tag in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, tag)
    return out


def scan_documents(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   group_col: str = "source") -> DataFrame:
    """Per-``group_col`` PII audit: documents flagged, matches by type,
    and the residual count after :func:`redact` (must be 0 — the
    redaction-completeness invariant, asserted by the oracle too)."""
    from x_spark.fanout import fan_out

    counts = pii_counts(text_col)
    flagged = sum(
        (c > 0).cast("int") for c in counts.values()
    )
    residual = sum(pii_counts(redact(text_col)).values())
    # the full regex battery (every pattern twice: raw + redacted
    # residual) evaluates per row in the pre-exchange partial-agg
    # stage — on a degenerate one-split layout that is one task; fan
    # the projected rows out first (guide §2.5; no-op on healthy
    # layouts, the counts/sums are order-independent)
    docs = fan_out(docs.select(group_col, text_col))
    return (
        docs.groupBy(F.col(group_col).alias("source"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((flagged > 0).cast("int")).alias("docs_with_pii"),
            *[
                F.sum(c).cast("bigint").alias(f"n_{name}")
                for name, c in counts.items()
            ],
            F.sum(residual).cast("bigint").alias("residual_after_redact"),
        )
    )
