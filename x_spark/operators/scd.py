"""SCD Type-2 (slowly-changing dimension) apply — W7 extension.

The reference stops at update/upsert (SURVEY §2.2 W7 ABSENT); SCD2 is
the standard history-preserving variant: when a tracked attribute
changes, the open row is closed (``valid_to = change ts``) and a new
open row is inserted; unchanged rows pass through; brand-new keys are
inserted open.

Spark-first shape: ONE full-outer join of the open rows against the
changeset on the key (closed history rows never join), then three
projections unioned — no iterative merges, one shuffle each side,
history rows move untouched. At 100 TB the dimension is partitioned by
key-hash bucket so the join co-locates; Delta MERGE can express the
same thing transactionally, but the algebra here is engine-neutral and
oracle-checkable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    track_cols: list[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Return the post-apply dimension table.

    ``dim``: (*key_cols, *track_cols, valid_from, valid_to) with
    ``valid_to IS NULL`` marking open rows. ``changes``: (*key_cols,
    *track_cols, ts_col), at most one change row per key.
    """
    closed_hist = dim.filter(F.col(valid_to).isNotNull())
    open_rows = dim.filter(F.col(valid_to).isNull())

    ch = changes.select(
        *[F.col(c).alias(f"__ch_{c}") for c in key_cols],
        *[F.col(c).alias(f"__new_{c}") for c in track_cols],
        F.col(ts_col).alias("__ch_ts"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [open_rows[k] == ch[f"__ch_{k}"] for k in key_cols],
    )
    j = open_rows.join(ch, cond, "full_outer")

    differs = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"__new_{c}")) for c in track_cols],
    )
    has_dim = F.col(valid_from).isNotNull()
    has_change = F.col("__ch_ts").isNotNull()

    # open rows with a real attribute change -> closed
    closes = j.filter(has_dim & has_change & differs).select(
        *key_cols,
        *track_cols,
        F.col(valid_from),
        F.col("__ch_ts").alias(valid_to),
    )
    # their replacements + brand-new keys -> new open rows
    opens = j.filter(has_change & (~has_dim | differs)).select(
        *[F.coalesce(F.col(k), F.col(f"__ch_{k}")).alias(k) for k in key_cols],
        *[F.col(f"__new_{c}").alias(c) for c in track_cols],
        F.col("__ch_ts").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )
    # open rows without a change, or with a no-op change -> unchanged
    keeps = j.filter(has_dim & (~has_change | ~differs)).select(
        *key_cols, *track_cols, F.col(valid_from), F.col(valid_to)
    )
    cols = [*key_cols, *track_cols, valid_from, valid_to]
    return (
        closed_hist.select(*cols)
        .unionByName(closes)
        .unionByName(opens)
        .unionByName(keeps)
    )
