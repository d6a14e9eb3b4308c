"""Mergeable fixed-grid histogram sketches: distribution monitoring
(quantiles, drift, tails) maintained incrementally over an append-only
store.

The scale problem: exact percentiles over a 100 TB history need a
global sort (or an approx_percentile re-scan) PER QUESTION, and exact
distributions don't add across ingest batches. A FIXED bucketing
makes histograms LOSSLESSLY mergeable — counts just add — so each
ingest batch contributes one tiny per-unit summary (<= n_buckets + 2
longs), any coarser grouping is answered by summing stored maps, and
quantile estimates carry a deterministic <= bucket-width error bound.
Unlike HLL (engine-specific estimates), every number here is an exact
function of the bucket counts, so the whole flow is cross-engine
oracle-checkable.

Three layers, mirroring ``sketches.py``:
- :func:`build_histograms`: one partial-aggregable pass over a batch
  -> (unit..., buckets map<int,bigint>, n_rows, vmin, vmax).
- :func:`merge_histograms` / :func:`quantiles_from_histograms`:
  union at any coarser grouping (explode + sum + re-map — bounded by
  n_buckets rows per group, never the data) and quantile estimation
  by linear interpolation inside the covering bucket.
- :func:`update_histogram_store` / :func:`quantiles_from_store`: the
  maintained flow — summaries APPENDED to a txlog table per ingest
  batch (txn-stamped exactly-once), merged at query time. Ingest is
  O(batch); the store is O(units x batches x n_buckets) longs.

Bucketing contract: ``bucket = floor((v - lo) / width)`` clamped to
[-1, n_buckets] — bucket -1 holds underflow, n_buckets overflow, so
out-of-range values are counted, never lost. NULLs are excluded from
the histogram but reported via n_rows vs map total if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from x_spark.sources.base import TableRef
from x_spark.sources.txlog import TxLogDataSource

__all__ = [
    "build_histograms",
    "merge_histograms",
    "quantiles_from_histograms",
    "update_histogram_store",
    "quantiles_from_store",
]


def _bucket_expr(value_col: str, lo: float, width: float,
                 n_buckets: int) -> F.Column:
    raw = F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(float(width)))
    return (
        F.when(raw < 0, F.lit(-1))
        .when(raw >= n_buckets, F.lit(n_buckets))
        .otherwise(raw)
        .cast("int")
    )


def build_histograms(
    df: DataFrame,
    value_col: str,
    unit_cols: list[str],
    lo: float,
    hi: float,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-unit fixed-grid histogram of ``value_col`` — two
    partial-aggregable stages (bucket counts, then one map per unit;
    collect_list is bounded by n_buckets + 2 entries per unit). The
    grid [lo, hi) is part of the sketch IDENTITY: only summaries built
    on the same grid merge."""
    if not hi > lo:
        raise ValueError(f"empty grid [{lo}, {hi})")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    width = (float(hi) - float(lo)) / int(n_buckets)
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*unit_cols,
                 _bucket_expr(value_col, lo, width, n_buckets)
                 .alias("__bucket"))
        .agg(F.count("*").cast("bigint").alias("__n"),
             F.min(value_col).alias("__lo"),
             F.max(value_col).alias("__hi"))
    )
    return (
        counts.groupBy(*unit_cols)
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(
                    F.struct(F.col("__bucket"), F.col("__n"))
                ))
            ).alias("buckets"),
            F.sum("__n").cast("bigint").alias("n_rows"),
            F.min("__lo").alias("vmin"),
            F.max("__hi").alias("vmax"),
        )
    )


def _exploded(df: DataFrame, group_cols: list[str]) -> DataFrame:
    return df.select(
        *group_cols,
        F.explode("buckets").alias("__bucket", "__n"),
        F.col("vmin").alias("__lo"),
        F.col("vmax").alias("__hi"),
    )


def merge_histograms(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union summaries at any coarser grouping: counts ADD (lossless —
    the property exact percentiles fundamentally lack). Work is
    bounded by groups x n_buckets rows, never the original data."""
    ex = _exploded(df, group_cols)
    counts = (
        ex.groupBy(*group_cols, "__bucket")
        .agg(F.sum("__n").cast("bigint").alias("__n"),
             F.min("__lo").alias("__lo"),
             F.max("__hi").alias("__hi"))
    )
    return (
        counts.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(
                    F.struct(F.col("__bucket"), F.col("__n"))
                ))
            ).alias("buckets"),
            F.sum("__n").cast("bigint").alias("n_rows"),
            F.min("__lo").alias("vmin"),
            F.max("__hi").alias("vmax"),
        )
    )


def quantiles_from_histograms(
    df: DataFrame,
    group_cols: list[str],
    lo: float,
    hi: float,
    n_buckets: int,
    qs: list[float],
) -> DataFrame:
    """Quantile estimates per group from (possibly merged) summaries:
    for each q, find the bucket where the cumulative count crosses
    ceil(q * n) and linearly interpolate inside it — deterministic,
    engine-independent, error <= one bucket width for in-range data
    (underflow/overflow buckets clamp to the stored exact vmin/vmax).
    Cost: <= n_buckets + 2 rows per group through one bounded window.

    Output: group_cols..., q double, value double."""
    width = (float(hi) - float(lo)) / int(n_buckets)
    ex = _exploded(df, group_cols)
    summed = (
        ex.groupBy(*group_cols, "__bucket")
        .agg(F.sum("__n").cast("bigint").alias("__n"),
             F.min("__lo").alias("__lo"),
             F.max("__hi").alias("__hi"))
    )
    w = Window.partitionBy(*group_cols).orderBy("__bucket")
    wg = Window.partitionBy(*group_cols)
    cum = (
        summed
        .withColumn("__cum", F.sum("__n").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("__total", F.sum("__n").over(wg))
        .withColumn("__gmin", F.min("__lo").over(wg))
        .withColumn("__gmax", F.max("__hi").over(wg))
    )
    qdf = cum.crossJoin(
        F.broadcast(
            cum.sparkSession.createDataFrame([(float(q),) for q in qs],
                                             "q double")
        )
    )
    # rank of the q-th element (1-based, ceil — the standard inverse
    # empirical CDF convention, exact-match-able in plain SQL)
    rank = F.ceil(F.col("q") * F.col("__total")).cast("bigint")
    rank = F.greatest(rank, F.lit(1))
    covering = qdf.filter(
        (F.col("__cum") >= rank)
        & ((F.col("__cum") - F.col("__n")) < rank)
    )
    frac = (rank - (F.col("__cum") - F.col("__n"))) / F.col("__n")
    b_lo = F.lit(float(lo)) + F.col("__bucket") * F.lit(width)
    est = b_lo + frac * F.lit(width)
    # clamp: underflow/overflow buckets and grid edges report the
    # group's exact observed extrema instead of grid positions
    est = (
        F.when(F.col("__bucket") < 0, F.col("__gmin"))
        .when(F.col("__bucket") >= n_buckets, F.col("__gmax"))
        .otherwise(F.greatest(F.least(est, F.col("__gmax")),
                              F.col("__gmin")))
    )
    return covering.select(
        *group_cols, "q",
        est.cast("double").alias("value"),
    )


def update_histogram_store(
    ds: TxLogDataSource,
    store: TableRef,
    batch: DataFrame,
    value_col: str,
    unit_cols: list[str],
    lo: float,
    hi: float,
    n_buckets: int = 64,
    txn: tuple[str, int] | None = None,
) -> None:
    """Append one batch's per-unit summaries to the txlog store —
    O(batch) work, append-only (the same unit in later batches merges
    at query time, no read-modify-write), exactly-once under a ``txn``
    stamp like every other ingest path here."""
    sk = build_histograms(batch, value_col, unit_cols, lo, hi, n_buckets)
    if not ds.table_exists(store):
        ds.create(store, sk.schema)
    ds.append(sk, store, txn=txn)


def quantiles_from_store(
    ds: TxLogDataSource,
    store: TableRef,
    group_cols: list[str],
    lo: float,
    hi: float,
    n_buckets: int,
    qs: list[float],
) -> DataFrame:
    """Quantiles at any grouping from the maintained store: reads ONLY
    the summary table (units x batches x n_buckets longs), never the
    ingested data."""
    return quantiles_from_histograms(
        ds.read(store), group_cols, lo, hi, n_buckets, qs,
    )


def drift_from_histograms(
    ref_df: DataFrame,
    cur_df: DataFrame,
    group_cols: list[str],
    n_buckets: int,
    epsilon: float = 1e-4,
) -> DataFrame:
    """Population Stability Index per group between two summary sets
    built on the SAME grid — the standard distribution-drift gate
    (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 shifted), computed
    entirely FROM sketches: at 100 TB the reference period's data is
    long gone, but its summaries answer drift forever.

    PSI = sum_b (p_b - q_b) * ln(p_b / q_b) over the shared grid,
    with ``epsilon`` floor-smoothing for empty buckets (the standard
    convention — PSI is undefined on zeros). Deterministic given the
    counts. Output: group_cols..., psi double, n_ref, n_cur."""
    def shares(df: DataFrame, name: str) -> DataFrame:
        ex = _exploded(df, group_cols)
        return (
            ex.groupBy(*group_cols, "__bucket")
            .agg(F.sum("__n").cast("bigint").alias(name))
        )

    ref = shares(ref_df, "__nr")
    cur = shares(cur_df, "__nc")
    joined = ref.join(cur, [*group_cols, "__bucket"], "full_outer").fillna(
        0, subset=["__nr", "__nc"]
    )
    wg = Window.partitionBy(*group_cols)
    joined = (
        joined
        .withColumn("__tr", F.sum("__nr").over(wg))
        .withColumn("__tc", F.sum("__nc").over(wg))
    )
    # a group present in only ONE period (the canonical drift event —
    # a brand-new category) has total 0 on the other side: its shares
    # floor to epsilon rather than evaluating 0/0 (ANSI would throw)
    def share(n: str, t: str) -> F.Column:
        raw = F.when(F.col(t) > 0, F.col(n) / F.col(t)).otherwise(F.lit(0.0))
        return F.greatest(raw, F.lit(float(epsilon)))

    p = share("__nr", "__tr")
    q = share("__nc", "__tc")
    term = (p - q) * F.log(p / q)
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.sum(term).cast("double").alias("psi"),
            F.max("__tr").cast("bigint").alias("n_ref"),
            F.max("__tc").cast("bigint").alias("n_cur"),
        )
    )
