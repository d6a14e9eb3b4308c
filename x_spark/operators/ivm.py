"""Incremental view maintenance (IVM) over the txlog change data feed.

A materialized aggregate (counts + sums per group key) is kept in sync
with a txlog base table WITHOUT rescanning it: each refresh reads only
the base versions committed since the last refresh — through
``TxLogDataSource.changes``, which is itself file-granular — folds the
row-level inserts/deletes into signed deltas, and applies them to the
aggregate with one full-outer join. At 100 TB this is the difference
between an O(changed-data) nightly refresh and an O(table) recompute;
counts and DECIMAL sums are self-maintainable under insert+delete (no
base rescan ever needed — contrast MIN/MAX, which need a rescan of the
affected groups on delete and are deliberately out of scope here).

Refresh position is stored as a txnAppId/txnVersion stamp ON THE
AGGREGATE TABLE's own commit (``app_id = "ivm:<agg-name>"``, version =
the base version applied). The new aggregate state and its position
therefore land in ONE atomic commit — a crashed refresh leaves the old
state with the old position, and a replayed refresh (same base
version) is a detected no-op, the same exactly-once argument as the
streaming sink (streaming/events.txlog_exactly_once_upsert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from x_spark.sources.base import TableRef
from x_spark.sources.txlog import TxLogDataSource, resolve_snapshot


class AggregateView:
    """Spec + refresh driver for one maintained aggregate.

    ``keys``: group-by columns. ``sums``: numeric columns kept as
    DECIMAL(30,6)-exact ``sum_<col>`` measures; ``n_rows`` is always
    maintained. The aggregate lives in its own txlog table at
    ``agg_ref`` and drops groups whose count reaches zero.
    """

    def __init__(self, ds: TxLogDataSource, base_ref: TableRef,
                 agg_ref: TableRef, keys: list[str], sums: list[str]):
        if not keys:
            raise ValueError("AggregateView requires at least one key column")
        self.ds = ds
        self.base_ref = base_ref
        self.agg_ref = agg_ref
        self.keys = list(keys)
        self.sums = list(sums)
        self.app_id = "ivm:" + (agg_ref.table or agg_ref.path or "agg")

    # -- internals -----------------------------------------------------
    def _fold(self, rows: DataFrame, sign_col) -> DataFrame:
        """Signed per-group deltas of (n_rows, sum_*)."""
        return rows.groupBy(*self.keys).agg(
            F.sum(sign_col).cast("bigint").alias("n_rows"),
            *[
                F.sum(sign_col * F.col(c).cast("decimal(30,6)"))
                .cast("decimal(30,6)")
                .alias(f"sum_{c}")
                for c in self.sums
            ],
        )

    def refresh(self) -> int:
        """Bring the aggregate up to the base table's latest version;
        returns that version. No-op (same version returned) when
        nothing changed. The incremental path reads ONLY the commits
        after the stored position; position -1 (first call) folds the
        full CDF from version 1, which equals a full compute."""
        base_table = self.ds._table_path(self.base_ref)
        snap = resolve_snapshot(base_table)
        if snap is None:
            raise ValueError("base table does not exist")
        current = snap.version
        last = (
            self.ds.last_txn_version(self.agg_ref, self.app_id)
            if self.ds.table_exists(self.agg_ref)
            else -1
        )
        if last >= current:
            return last
        # changes() is EXCLUSIVE of from_version: pass the last applied
        # version itself (or 0 on first build -> the full feed)
        cdf = self.ds.changes(
            self.base_ref, from_version=max(last, 0), to_version=current
        )
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        deltas = self._fold(
            cdf.select(*self.keys, *self.sums, "_change_type"), sign
        )
        if last >= 0:
            prior = self.ds.read(self.agg_ref)
            merged = (
                prior.unionByName(deltas)
                .groupBy(*self.keys)
                .agg(
                    F.sum("n_rows").cast("bigint").alias("n_rows"),
                    *[
                        F.sum(f"sum_{c}").cast("decimal(30,6)").alias(f"sum_{c}")
                        for c in self.sums
                    ],
                )
            )
        else:
            merged = deltas
        result = merged.filter(F.col("n_rows") > 0)
        if not self.ds.table_exists(self.agg_ref):
            self.ds.create(self.agg_ref, result.schema)
        self.ds.overwrite(result, self.agg_ref, txn=(self.app_id, current))
        return current

    def read(self) -> DataFrame:
        return self.ds.read(self.agg_ref)
