"""Deterministic sampling operators for training-data pipelines.

Content-hash based (md5 of the key), NOT seeded rand(): the sample a
row lands in is a pure function of its key, so results are
reproducible across runs, engines, partitionings, and cluster sizes —
and rows keep their assignment when the corpus is incrementally
re-processed (critical: a train/test split must never leak when data
is re-ingested). All scan-speed projections, no shuffles.

DuckDB equivalents are embedded in each helper for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from x_spark.functions.portable import hash32

DENOM = 10_000  # rate resolution: 0.01%


def _bucket(key_col: str | Column) -> Column:
    """Uniform bucket in [0, DENOM) from the key's md5.

    DuckDB: ``cast(concat('0x', substr(md5(cast(k as varchar)),1,8)) as bigint) % 10000``
    """
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(hash32(col.cast("string")), F.lit(DENOM))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically
    by key hash. Rates are quantized to 1/DENOM."""
    thresh = F.lit(int(default_rate * DENOM))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(rate * DENOM))
        ).otherwise(thresh)
    return df.filter(_bucket(key_col) < thresh)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash range — e.g.
    {"train": 0.8, "val": 0.1, "test": 0.1}. Ranges are allocated in
    sorted(split name) order so the assignment is fully specified."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _bucket(key_col)
    expr = None
    lo = 0
    for name, w in sorted(weights.items()):
        hi = lo + int(w * DENOM)
        cond = (bucket >= F.lit(lo)) & (bucket < F.lit(hi))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    # hash residue from rounding goes to the last (sorted) split
    last = sorted(weights)[-1]
    return df.withColumn(split_col, expr.otherwise(F.lit(last)))
