"""Portable deterministic primitives — identical results in Spark and
in the DuckDB oracle.

The correctness gate hash-compares Spark output against DuckDB output,
so every content-derived value (dedup hashes, fingerprints, token
counts) must be bit-identical across engines. MD5 is the shared
primitive: both engines produce the same lowercase hex digest, and a
15/8-hex-digit prefix parses to the same integer
(Spark ``conv(hex,16,10)``, DuckDB ``cast(concat('0x',hex) as bigint)``).

All arithmetic stays below 2^52 so Spark's ANSI mode (4.x default)
never overflows and DuckDB's bigint math matches exactly.

Each helper documents its DuckDB-SQL equivalent; keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Largest prime < 2^32 — modulus for minhash permutations. A 20-bit
# multiplier times a 32-bit hash stays < 2^52: ANSI-safe.
MINHASH_PRIME = 4294967291


def hash60(col: Column | str) -> Column:
    """60-bit integer hash of a string (md5-prefix based).

    DuckDB: ``cast(concat('0x', substr(md5(x),1,15)) as bigint)``
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash32(col: Column | str) -> Column:
    """32-bit integer hash of a string (md5-prefix based), for
    overflow-safe modular arithmetic.

    DuckDB: ``cast(concat('0x', substr(md5(x),1,8)) as bigint)``
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def hash32_sql(expr: str) -> str:
    """Spark-SQL string form of :func:`hash32` (for use inside
    higher-order lambda expressions where Column objects can't reach)."""
    return f"cast(conv(substr(md5({expr}),1,8),16,10) as bigint)"


def char_shingles(col: Column | str, k: int = 8, prefix: int | None = None) -> Column:
    """Array of all ``k``-char shingles; empty array for short strings.

    Spark's ``sequence(1, n)`` counts DOWN when n < 1 (it supports
    descending ranges), so short strings are guarded explicitly.
    ``prefix`` caps the scanned text length (bounded work per row —
    at 100 TB shingling the full document is wasteful; a fixed prefix
    is the standard sketching trade-off).

    DuckDB: ``list_transform(range(1, greatest(length(x)-k+1,0)+1),
    i -> substr(x, i::int, k))``
    """
    name = col if isinstance(col, str) else None
    expr = name if name else None
    if expr is None:
        raise ValueError("char_shingles needs a column name (used in SQL expr)")
    text = f"substr({expr}, 1, {prefix})" if prefix else expr
    return F.expr(
        f"CASE WHEN length({text}) >= {k} "
        f"THEN transform(sequence(1, length({text})-{k}+1), i -> substr({text}, i, {k})) "
        f"ELSE array() END"
    )


def tokens(col_expr: str) -> Column:
    """Whitespace tokens as an array (lowercased).

    DuckDB: ``regexp_extract_all(lower(x), '\\S+')``
    """
    return F.expr(f"regexp_extract_all(lower({col_expr}), '\\\\S+', 0)")


def token_count(col: Column | str) -> Column:
    """Number of whitespace-delimited tokens.

    DuckDB: ``length(regexp_extract_all(x, '\\S+'))``
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(col, F.lit(r"\S+"))


def fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the text normalized to
    lowercase alphanumerics (whitespace/punctuation-insensitive —
    catches trivially-reformatted duplicates).

    DuckDB: ``md5(regexp_replace(lower(x), '[^a-z0-9]', '', 'g'))``
    (lower FIRST, then strip — keep the order identical in both engines)

    Note DuckDB needs the 'g' flag for global replacement; Spark
    ``regexp_replace`` is always global.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(col), "[^a-z0-9]", ""))


def umicros(col: Column | str) -> Column:
    """Microseconds since epoch for TIMESTAMP *or* TIMESTAMP_NTZ.

    Spark's ``unix_micros`` rejects ``TIMESTAMP_NTZ`` inputs
    (DATATYPE_MISMATCH since 4.x); every engine session pins
    ``spark.sql.session.timeZone=UTC`` (see ``x_spark.session``), so
    casting NTZ to TIMESTAMP is exact and the cast is a no-op for
    already-zoned timestamps.

    DuckDB: ``epoch_us(x)``
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(col.cast("timestamp"))
