"""Mergeable distinct-count sketches (Apache DataSketches HLL, via
Spark's ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

The scale problem these solve: "distinct users per day, and rolling
windows of it, maintained incrementally" — exact countDistinct over a
100 TB history re-scans the corpus per question, and exact distinct
state is O(cardinality). A sketch table is O(units x 2^lg_k bytes),
each ingest batch only touches its own units (never the corpus), and
ANY grouping coarser than the stored unit is answered by unioning
sketches — the property exact distinct counts fundamentally lack
(distincts don't add across days; sketches union losslessly).

Three layers:
- ``build_distinct_sketches``: one partial-aggregable pass over a
  batch -> (unit..., sketch BINARY, n_rows).
- ``estimate_distinct``: union + estimate at any coarser grouping.
- ``update_sketch_store`` / ``estimate_from_store``: the maintained
  flow — sketches APPENDED to a txlog table per ingest batch
  (txn-stamped exactly-once like every other ingest path here); the
  same unit appearing in many batches is unioned at query time, so
  ingest stays append-only O(batch) with no read-modify-write.

Estimates are engine-specific (the registry entry is rows-only, the
``approx_distinct_users`` precedent); accuracy is pinned by tests
(lg_k=12 -> ~1.6% typical relative error) and the incremental==batch
property is asserted within the same tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from x_spark.sources.base import TableRef
from x_spark.sources.txlog import TxLogDataSource

__all__ = [
    "build_distinct_sketches",
    "estimate_distinct",
    "update_sketch_store",
    "estimate_from_store",
]


def build_distinct_sketches(
    df: DataFrame,
    value_col: str,
    unit_cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-unit HLL sketches of ``value_col`` in ONE aggregation pass
    (hll_sketch_agg is partial-aggregable: map-side partials union
    into 2^lg_k-byte registers, never row sets).

    Returns ``(*unit_cols, sketch binary, n_rows bigint)``."""
    if not unit_cols:
        raise ValueError("unit_cols must be non-empty (use a constant for global)")
    return df.groupBy(*unit_cols).agg(
        F.expr(f"hll_sketch_agg({value_col}, {int(lg_k)})").alias("sketch"),
        F.count(value_col).cast("bigint").alias("n_rows"),
        # lg_k rides with every sketch row: hll_union_agg REJECTS mixed
        # lg_k configs, so the store must be able to catch a mismatched
        # ingest at write time rather than poisoning reads
        F.lit(int(lg_k)).cast("int").alias("lg_k"),
    )


def estimate_distinct(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct estimates at any grouping COARSER than the stored unit
    (or global with ``group_cols=None/[]``): union the sketches, then
    estimate. Duplicate units (one per ingest batch in the maintained
    flow) union losslessly.

    Returns ``(*group_cols, n_distinct bigint, n_rows bigint)``."""
    est = F.expr("hll_sketch_estimate(hll_union_agg(sketch))").cast("bigint")
    aggs = [est.alias("n_distinct"), F.sum("n_rows").cast("bigint").alias("n_rows")]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*aggs)
    return sketches.agg(*aggs)


def update_sketch_store(
    ds: TxLogDataSource,
    ref: TableRef,
    batch: DataFrame,
    value_col: str,
    unit_cols: list[str],
    lg_k: int = 12,
    txn: tuple[str, int] | None = None,
) -> None:
    """Append the batch's per-unit sketches to a txlog store —
    O(batch) per ingest, append-only (no read-modify-write: repeated
    units are unioned at query time), ``txn``-stamped for exactly-once
    replay like every other ingest path."""
    sk = build_distinct_sketches(batch, value_col, unit_cols, lg_k)
    if not ds.table_exists(ref):
        ds.create(ref, sk.schema)
    else:
        # hll_union_agg rejects mixed lg_k: fail THIS write, not every
        # later read — one existing row's lg_k pins the store's config
        existing = ds.read(ref).select("lg_k").first()
        if existing is not None and existing["lg_k"] != int(lg_k):
            raise ValueError(
                f"sketch store {ds._table_path(ref)!r} was built with "
                f"lg_k={existing['lg_k']}; refusing an lg_k={lg_k} ingest "
                "(hll_union_agg cannot merge mixed configs)"
            )
    ds.append(sk, ref, txn=txn)


def estimate_from_store(
    ds: TxLogDataSource,
    ref: TableRef,
    group_cols: list[str] | None = None,
    where: str | None = None,
) -> DataFrame:
    """Estimates over the maintained store; ``where`` filters the
    stored units (e.g. a rolling 7-day slice) BEFORE the union — the
    scan reads sketch rows, never the ingested corpus."""
    sketches = ds.read(ref)
    if where:
        sketches = sketches.filter(where)
    return estimate_distinct(sketches, group_cols)
