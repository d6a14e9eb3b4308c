"""Join-based MERGE algebra (Delta MERGE semantics as pure DataFrame ops).

Given a target and source DataFrame plus a MergeSpec, produce the
post-merge state:

- matched rows (pk equality AND extra predicate) -> update set columns
  from the source
- unmatched target rows -> unchanged
- unmatched source rows -> inserted with pk+update columns, other
  columns NULL (upsert only; reference quirk SURVEY §8.7)

This is exactly the join phase Delta MERGE executes under the hood
(reference: etl/update_and_upsert.py + datasource/delta.py:135-148);
expressing it as a DataFrame program lets Catalyst choose the join
strategy (broadcast when the source is small, sort-merge otherwise) and
makes the semantics oracle-checkable as plain SQL.

Scale notes: one shuffle of each side on the primary key; AQE handles
skewed keys. No driver-side materialization.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from x_spark.errors import ETLJobException
from x_spark.sources.base import MergeSpec

_SRC_MARKER = "__x_spark_src_marker"


def check_unique_source_keys(src: DataFrame, spec: MergeSpec) -> None:
    """Delta MERGE aborts when one target row matches multiple source
    rows; enforce the same contract (bounded: LIMIT 1 probe)."""
    dup = (
        src.groupBy(*spec.primary_key_columns)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ETLJobException(
            "merge source has duplicate rows per primary key "
            f"{spec.primary_key_columns}; Delta MERGE would abort"
        )


def _insert_col(c: str, set_cols: set, tgt_dtypes: dict,
                insert_defaults: dict[str, str] | None):
    """One inserted row's column: source value for set columns,
    DEFAULT expression (when declared) or NULL otherwise — always
    assignment-cast to the target type."""
    if c in set_cols:
        return F.col(f"SRC.{c}").cast(tgt_dtypes[c]).alias(c)
    d = (insert_defaults or {}).get(c)
    base = F.expr(d) if d is not None else F.lit(None)
    return base.cast(tgt_dtypes[c]).alias(c)


def merge_frames(tgt: DataFrame, src: DataFrame, spec: MergeSpec,
                 insert_defaults: dict[str, str] | None = None) -> DataFrame:
    """Return the post-merge state of ``tgt``. ``insert_defaults``
    (col -> constant SQL expr) fills non-set columns of INSERTED rows
    with their DEFAULT instead of NULL (Delta's allowColumnDefaults);
    matched/unmatched target rows are never touched by it."""
    if spec.validate_unique_source_keys:
        check_unique_source_keys(src, spec)

    tgt_cols = tgt.columns
    tgt_dtypes = dict(tgt.dtypes)
    set_cols = set(spec.all_set_columns)
    missing = [c for c in set_cols if c not in tgt_cols]
    if missing:
        raise ETLJobException(f"merge columns {missing} not present in target")

    src_marked = src.withColumn(_SRC_MARKER, F.lit(True)).alias("SRC")
    tgt_aliased = tgt.alias("TGT")
    pk_cond = reduce(
        lambda a, b: a & b,
        [F.col(f"TGT.{c}") == F.col(f"SRC.{c}") for c in spec.primary_key_columns],
    )
    cond = pk_cond & F.expr(spec.extra_target_predicate)

    matched = F.col(f"SRC.{_SRC_MARKER}").isNotNull()
    updated = tgt_aliased.join(src_marked, cond, "left").select(
        *[
            (
                F.when(matched, F.col(f"SRC.{c}")).otherwise(F.col(f"TGT.{c}")).alias(c)
                if c in set_cols
                else F.col(f"TGT.{c}").alias(c)
            )
            for c in tgt_cols
        ]
    )
    if not spec.insert_when_not_matched:
        return updated

    inserts = src_marked.join(tgt.alias("TGT"), cond, "left_anti").select(
        *[_insert_col(c, set_cols, tgt_dtypes, insert_defaults)
          for c in tgt_cols]
    )
    return updated.unionByName(inserts)


def merge_split_frames(
    tgt: DataFrame, src: DataFrame, spec: MergeSpec, meta_cols: list[str],
    insert_defaults: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame | None]:
    """Merge-on-read decomposition of the same MERGE algebra: instead
    of the full post-merge state, return

    - ``matched_meta``: the ``meta_cols`` (row-position columns the
      caller threaded through ``tgt``, e.g. file name + row index) of
      every target row that MATCHES — the rows to mask,
    - ``matched_pre``: those rows' OLD images (the change feed's
      ``update_preimage`` rows, free from the same pin),
    - ``matched_post``: their post-merge images, and
    - ``inserts``: the unmatched source inserts (None when the spec
      is update-only) — the caller appends ``matched_post UNION
      inserts``.

    Untouched target rows never appear in any frame: at 100 TB this
    is the difference between a MERGE whose write cost tracks the
    CHANGED rows and one that rewrites every candidate file.
    Row-for-row equivalent to :func:`merge_frames` by construction:
    matched images here are the inner-join restriction of its
    left-join ``when(matched, ...)`` images, and the insert branch is
    identical. The matched join is eagerly checkpointed and carries
    BOTH images (old set-column values ride as ``__pre_`` columns) —
    the expensive target-slice x source join runs ONCE and feeds the
    mask write, the data write, and all the change-feed rows.
    """
    if spec.validate_unique_source_keys:
        check_unique_source_keys(src, spec)
    tgt_cols = [c for c in tgt.columns if c not in set(meta_cols)]
    tgt_dtypes = dict(tgt.dtypes)
    set_cols = set(spec.all_set_columns)
    missing = [c for c in set_cols if c not in tgt_cols]
    if missing:
        raise ETLJobException(f"merge columns {missing} not present in target")

    src_marked = src.withColumn(_SRC_MARKER, F.lit(True)).alias("SRC")
    pk_cond = reduce(
        lambda a, b: a & b,
        [F.col(f"TGT.{c}") == F.col(f"SRC.{c}") for c in spec.primary_key_columns],
    )
    cond = pk_cond & F.expr(spec.extra_target_predicate)

    matched_j = tgt.alias("TGT").join(src_marked, cond, "inner").select(
        *[F.col(f"TGT.{m}").alias(m) for m in meta_cols],
        *[
            (
                F.col(f"SRC.{c}").cast(tgt_dtypes[c]).alias(c)
                if c in set_cols
                else F.col(f"TGT.{c}").alias(c)
            )
            for c in tgt_cols
        ],
        # old values of the set columns (pre/post differ only there)
        *[F.col(f"TGT.{c}").alias(f"__pre_{c}")
          for c in tgt_cols if c in set_cols],
    ).localCheckpoint(eager=True)
    matched_meta = matched_j.select(*meta_cols)
    matched_post = matched_j.select(*tgt_cols)
    matched_pre = matched_j.select(*[
        (F.col(f"__pre_{c}") if c in set_cols else F.col(c)).alias(c)
        for c in tgt_cols
    ])
    if not spec.insert_when_not_matched:
        return matched_meta, matched_pre, matched_post, None
    inserts = src_marked.join(tgt.alias("TGT"), cond, "left_anti").select(
        *[_insert_col(c, set_cols, tgt_dtypes, insert_defaults)
          for c in tgt_cols]
    )
    return matched_meta, matched_pre, matched_post, inserts
