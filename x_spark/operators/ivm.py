"""Incremental view maintenance (IVM) over the txlog change data feed.

A materialized aggregate (counts + sums per group key) is kept in sync
with a txlog base table WITHOUT rescanning it: each refresh reads only
the base versions committed since the last refresh — through
``TxLogDataSource.changes``, which is itself file-granular — folds the
row-level inserts/deletes into signed deltas, and applies them to the
aggregate with one full-outer join. At 100 TB this is the difference
between an O(changed-data) nightly refresh and an O(table) recompute;
counts and DECIMAL sums are self-maintainable under insert+delete (no
base rescan ever needed). MIN/MAX are maintained too (``minmax=``) via
TARGETED rescans: only groups where a deleted value ties-or-beats the
stored extremum re-aggregate from the base, group-pruned by semi-join.

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

    ``minmax``: columns additionally maintained as ``min_<col>`` /
    ``max_<col>``. MIN/MAX are NOT self-maintainable under deletes (a
    deleted row equal to the stored extremum leaves the new extremum
    unknown), so the refresh handles them with a TARGETED RESCAN:
    inserts fold incrementally (``least``/``greatest`` against the
    stored value), and only the groups where a deleted value ties or
    beats the stored extremum are recomputed — one semi-joined,
    group-pruned aggregate over the base snapshot, never a full
    recompute. At 100 TB: insert-only days refresh with zero base
    reads; delete days re-aggregate only the touched groups' slices
    (partition/stats pruning applies to the semi-joined scan).
    """

    def __init__(self, ds: TxLogDataSource, base_ref: TableRef,
                 agg_ref: TableRef, keys: list[str], sums: list[str],
                 minmax: list[str] | None = None):
        if not keys:
            raise ValueError("AggregateView requires at least one key column")
        self.ds = ds
        self.base_ref = base_ref
        self.agg_ref = agg_ref
        self.keys = list(keys)
        self.sums = list(sums)
        self.minmax = list(minmax or [])
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
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        if self.minmax:
            result = self._merge_with_minmax(cdf, sign, last, current)
        else:
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

    def _merge_with_minmax(self, cdf: DataFrame, sign, last: int,
                           current: int) -> DataFrame:
        """Join-based fold for the minmax path: counts/sums accumulate
        as usual; stored extrema tighten with inserted extrema
        (``least``/``greatest`` skip NULLs); groups where a DELETED
        value ties-or-beats a stored extremum are recomputed from the
        base snapshot pinned at ``current``, pruned with a semi-join
        on the rescan keys. Must be eagerly materialized downstream
        (overwrite does) before the pinned read goes stale."""
        ins = F.col("_change_type").isin("insert", "update_postimage")
        value_cols = list(dict.fromkeys([*self.sums, *self.minmax]))
        deltas = cdf.select(
            *self.keys, *value_cols, "_change_type"
        ).groupBy(*self.keys).agg(
            F.sum(sign).cast("bigint").alias("d_n"),
            *[
                F.sum(sign * F.col(c).cast("decimal(30,6)"))
                .cast("decimal(30,6)")
                .alias(f"d_sum_{c}")
                for c in self.sums
            ],
            *[
                e
                for c in self.minmax
                for e in (
                    F.min(F.when(ins, F.col(c))).alias(f"ins_min_{c}"),
                    F.max(F.when(ins, F.col(c))).alias(f"ins_max_{c}"),
                    F.min(F.when(~ins, F.col(c))).alias(f"del_min_{c}"),
                    F.max(F.when(~ins, F.col(c))).alias(f"del_max_{c}"),
                )
            ],
        )
        if last >= 0:
            prior = self.ds.read(self.agg_ref)
        else:
            prior = None
        if prior is None:
            # first build: the CDF from v1 IS the whole base; deletes
            # in the initial feed are handled by the rescan rule below
            # (candidate extrema come from the feed's inserts)
            j = deltas
            n_new = F.col("d_n")
            sums_new = {c: F.col(f"d_sum_{c}") for c in self.sums}
            cand_min = {c: F.col(f"ins_min_{c}") for c in self.minmax}
            cand_max = {c: F.col(f"ins_max_{c}") for c in self.minmax}
        else:
            j = prior.join(deltas, self.keys, "full_outer")
            n_new = F.coalesce("n_rows", F.lit(0)) + F.coalesce("d_n", F.lit(0))
            sums_new = {
                c: (
                    F.coalesce(F.col(f"sum_{c}"), F.lit(0).cast("decimal(30,6)"))
                    + F.coalesce(
                        F.col(f"d_sum_{c}"), F.lit(0).cast("decimal(30,6)")
                    )
                ).cast("decimal(30,6)")
                for c in self.sums
            }
            cand_min = {
                c: F.least(F.col(f"min_{c}"), F.col(f"ins_min_{c}"))
                for c in self.minmax
            }
            cand_max = {
                c: F.greatest(F.col(f"max_{c}"), F.col(f"ins_max_{c}"))
                for c in self.minmax
            }
        # a group needs a rescan when a deleted value ties-or-beats the
        # CANDIDATE extremum (stored state tightened by this refresh's
        # inserts): if del_min <= cand_min the deleted row may have
        # BEEN the minimum, so the survivors' true minimum is unknown.
        # Comparing against the candidate (not just the stored value)
        # also makes the first build correct when the initial change
        # feed already contains deletes. NULL-valued deletes never
        # force a rescan (MIN/MAX ignore NULLs).
        insert_only_out = j.select(
            *self.keys,
            n_new.cast("bigint").alias("n_rows"),
            *[sums_new[c].alias(f"sum_{c}") for c in self.sums],
            *[
                e
                for c in self.minmax
                for e in (
                    cand_min[c].alias(f"min_{c}"),
                    cand_max[c].alias(f"max_{c}"),
                )
            ],
        )
        if self.ds.interval_is_add_only(self.base_ref, max(last, 0), current):
            # the interval's commit METADATA proves the feed carries no
            # deletes (append-only ingest — the common refresh), so no
            # extremum can weaken: skip the delete/rescan machinery
            # outright. The downstream overwrite computes this plan
            # exactly once, replacing the eager-checkpoint job + the
            # rescan-probe job the data-driven branch below pays —
            # zero base reads AND two fewer Spark jobs per refresh.
            return insert_only_out.filter(F.col("n_rows") > 0)
        rescan_cond = None
        for c in self.minmax:
            cond = (
                F.col(f"del_min_{c}") <= cand_min[c]
            ) | (
                F.col(f"del_max_{c}") >= cand_max[c]
            )
            rescan_cond = cond if rescan_cond is None else (rescan_cond | cond)
        # materialize the joined aggregate state ONCE (it is
        # aggregate-sized): it feeds the rescan-count probe, the rescan
        # key set, and the output projection — and the probe is what
        # lets a delete-carrying but extremum-safe refresh still skip
        # the base
        j = (
            j.withColumn("_rescan", F.coalesce(rescan_cond, F.lit(False)))
            .localCheckpoint(eager=True)
        )
        rescan_keys = j.filter("_rescan").select(*self.keys)
        if rescan_keys.limit(1).count() == 0:
            # deletes present but none ties-or-beats a candidate
            # extremum: ZERO base reads — the advertised contract; the
            # recompute join would otherwise wire a full pinned-base
            # scan into the plan. (Recompute the projection over the
            # checkpointed j so the probe's work is reused.)
            out = j.select(
                *self.keys,
                n_new.cast("bigint").alias("n_rows"),
                *[sums_new[c].alias(f"sum_{c}") for c in self.sums],
                *[
                    e
                    for c in self.minmax
                    for e in (
                        cand_min[c].alias(f"min_{c}"),
                        cand_max[c].alias(f"max_{c}"),
                    )
                ],
            )
            return out.filter(F.col("n_rows") > 0)
        pinned = TableRef(
            table=self.base_ref.table, path=self.base_ref.path,
            options={**self.base_ref.options, "versionAsOf": str(current)},
        )
        recomputed = (
            self.ds.read(pinned)
            .join(rescan_keys, self.keys, "left_semi")
            .groupBy(*self.keys)
            .agg(
                *[
                    e
                    for c in self.minmax
                    for e in (
                        F.min(c).alias(f"re_min_{c}"),
                        F.max(c).alias(f"re_max_{c}"),
                    )
                ]
            )
        )
        out = j.join(recomputed, self.keys, "left").select(
            *self.keys,
            n_new.cast("bigint").alias("n_rows"),
            *[sums_new[c].alias(f"sum_{c}") for c in self.sums],
            *[
                e
                for c in self.minmax
                for e in (
                    F.when(F.col("_rescan"), F.col(f"re_min_{c}"))
                    .otherwise(cand_min[c])
                    .alias(f"min_{c}"),
                    F.when(F.col("_rescan"), F.col(f"re_max_{c}"))
                    .otherwise(cand_max[c])
                    .alias(f"max_{c}"),
                )
            ],
        )
        return out.filter(F.col("n_rows") > 0)

    def read(self) -> DataFrame:
        return self.ds.read(self.agg_ref)

    def staleness(self) -> int:
        """How many base versions the view is behind (0 = fresh): the
        monitoring probe a refresh scheduler polls — two log reads, no
        data touched."""
        base_table = self.ds._table_path(self.base_ref)
        snap = resolve_snapshot(base_table)
        if snap is None:
            raise ValueError("base table does not exist")
        last = (
            self.ds.last_txn_version(self.agg_ref, self.app_id)
            if self.ds.table_exists(self.agg_ref)
            else -1
        )
        return max(0, snap.version - max(last, 0))


class JoinView:
    """Materialized equi-JOIN of two txlog base tables, incrementally
    maintained from their change feeds (the classic delta rule):

        J_new = J_old
              + ΔA ⋈ B@vb_applied          (step 1, stamped va)
              + ΔB ⋈ A@va_applied          (step 2, stamped vb)

    When only one side is pending the steps run staged as written;
    when BOTH are pending :meth:`refresh` FUSES them — same pins, one
    aggregation over the union of both increments, one state rewrite,
    both positions stamped in a single atomic multi-stamp commit (see
    the method docstring for the equivalence argument).

    Each step joins ONE side's signed CDF rows against the OTHER side
    PINNED at its last-applied version (txlog time travel), which is
    what makes the two applications compose exactly: step 1 must not
    see B rows whose effect step 2 will add, and step 2's A@va already
    contains step 1's inserts — so every (a, b) pair is produced
    exactly once. Deletes ride through as sign -1 (updates in the CDF
    are delete+insert pairs).

    The view is stored as a BAG: one row per distinct joined tuple
    plus an ``n_rows`` multiplicity (duplicate base rows multiply
    through the join, exactly like the real join's output). Each step
    lands state + position in ONE atomic stamped commit (appIds
    ``ivmj:<name>:a`` / ``:b``), so a crashed or replayed refresh is
    detected the same way as :class:`AggregateView`.

    Scale: each refresh reads the delta side's CDF (file-granular) and
    the pinned side once; with the pinned side clustered on the join
    keys, footer stats prune its scan to the touched key range. The
    O(changed-data) claim covers the delta side; the pinned-side read
    is the inherent cost of join maintenance.

    Bucketing — the partition-scoped refresh that still works when the
    view ITSELF is large (rewrite only the join-key hash buckets the
    deltas touch) — is automatic by DEFAULT (``n_buckets="auto"``):
    the view starts unbucketed (small views rewrite whole faster than
    they churn hive partitions), and the first full-rewrite refresh
    that finds the stored view at or past ``AUTO_BUCKET_ROWS``
    (metadata-only count) writes THAT rewrite in bucketed layout —
    migration costs nothing, because the unbucketed refresh was
    rewriting the whole view anyway. ``n_buckets=<int>`` buckets from
    birth; ``n_buckets=None`` is the explicit never-bucket opt-in.
    An EXISTING view's on-disk layout always wins over the
    constructor: a bucketed store's count is read back from the
    ``_bucket`` field's schema metadata (stamped at create), so
    reopening with a different constructor value can never split a
    key's rows across two hash spaces.
    """

    DEFAULT_BUCKETS = 32
    # auto-migration threshold: past this many stored view rows a full
    # rewrite per refresh is the wrong plan; one metadata-only count
    # per unbucketed refresh checks it
    AUTO_BUCKET_ROWS = 2_000_000

    def __init__(self, ds: TxLogDataSource, a_ref: TableRef, b_ref: TableRef,
                 view_ref: TableRef, on: list[str],
                 a_cols: list[str], b_cols: list[str],
                 n_buckets: int | None | str = "auto"):
        if not on:
            raise ValueError("JoinView requires at least one join key")
        overlap = set(a_cols) & set(b_cols)
        if overlap or set(on) & (set(a_cols) | set(b_cols)):
            raise ValueError(
                f"payload columns must be disjoint from each other and the "
                f"keys (overlap: {sorted(overlap)})"
            )
        if isinstance(n_buckets, str):
            if n_buckets != "auto":
                raise ValueError(f"n_buckets: int, None or 'auto', "
                                 f"got {n_buckets!r}")
        elif n_buckets is not None and n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        self.ds = ds
        self.a_ref, self.b_ref, self.view_ref = a_ref, b_ref, view_ref
        self.on = list(on)
        self.a_cols, self.b_cols = list(a_cols), list(b_cols)
        # n_buckets: the bucket count used IF this view is created by
        # this object; once the view exists, _effective_buckets reads
        # the mode back from the stored layout instead. Size n_buckets
        # so a bucket ~ the write unit; deltas touching few keys then
        # rewrite a few buckets, and untouched buckets' files are
        # never read or written (byte-identical survival is pinned by
        # test).
        self.n_buckets = n_buckets
        name = view_ref.table or view_ref.path or "join"
        self.app_a, self.app_b = f"ivmj:{name}:a", f"ivmj:{name}:b"

    # -- internals -----------------------------------------------------
    def _effective_buckets(self) -> int | None:
        """Bucket mode, stored-layout-first (see class docstring): a
        view that does not exist yet buckets from birth only for an
        explicit int; an existing view's schema decides — no
        ``_bucket`` field means (currently) unbucketed, a ``_bucket``
        field carries the count it was created with in its schema
        metadata."""
        snap = resolve_snapshot(self.ds._table_path(self.view_ref))
        if snap is None:
            return self.n_buckets if isinstance(self.n_buckets, int) else None
        fields = {f.name: f for f in snap.schema.fields}
        if "_bucket" not in fields:
            return None
        stored = (fields["_bucket"].metadata or {}).get("ivm_n_buckets")
        if stored is not None:
            return int(stored)
        # bucketed view created before the metadata stamp existed: the
        # constructor value is the only source of truth left, and
        # silently guessing would scatter keys across hash spaces
        if not isinstance(self.n_buckets, int):
            raise ValueError(
                f"view {self.ds._table_path(self.view_ref)!r} is bucket-"
                "partitioned but carries no ivm_n_buckets metadata; pass "
                "the n_buckets it was created with"
            )
        return self.n_buckets

    def _pos(self, app_id: str) -> int:
        if not self.ds.table_exists(self.view_ref):
            return -1
        return self.ds.last_txn_version(self.view_ref, app_id)

    def _read_at(self, ref: TableRef, version: int, cols: list[str]) -> DataFrame:
        """Pinned projection of a base table; version -1 = empty (the
        state before the table contributed anything)."""
        if version < 0:
            snap = resolve_snapshot(self.ds._table_path(ref))
            if snap is None:
                # mirror _apply_side's existence check: the pinned side
                # must at least have a schema before a first refresh
                raise ValueError(
                    f"base table {self.ds._table_path(ref)!r} does not exist"
                )
            spark = self.ds.spark
            empty = spark.createDataFrame([], snap.schema)
            return empty.select(*cols)
        pinned = TableRef(
            table=ref.table, path=ref.path,
            options={**ref.options, "versionAsOf": str(version)},
        )
        return self.ds.read(pinned).select(*cols)

    def _joined_signed(self, delta_ref: TableRef, last: int, current: int,
                       delta_cols: list[str], pinned_ref: TableRef,
                       pinned_version: int,
                       pinned_cols: list[str]) -> DataFrame:
        """One side's increment: the side's signed CDF rows over
        versions (last, current], joined against the other side pinned
        at ``pinned_version`` — projected to a common column order so
        the fused path can union both sides' increments."""
        cdf = self.ds.changes(
            delta_ref, from_version=max(last, 0), to_version=current
        )
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        signed = cdf.select(*self.on, *delta_cols, sign.alias("_sign"))
        pinned = self._read_at(pinned_ref, pinned_version,
                               self.on + pinned_cols)
        out_cols = self.on + self.a_cols + self.b_cols
        return signed.join(pinned, self.on).select(*out_cols, "_sign")

    def _apply_delta(self, joined_signed: DataFrame,
                     txn: tuple[str, int] | list[tuple[str, int]]) -> None:
        """Fold the (already joined, signed) increment rows into the
        stored view and land the new state + applied position(s) in
        ONE atomic stamped commit — ``txn`` is a single stamp for a
        one-side refresh, or both sides' stamps when the fused path
        applies both increments with a single rewrite."""
        out_cols = self.on + self.a_cols + self.b_cols
        delta_j = joined_signed.groupBy(*out_cols).agg(
            F.sum("_sign").cast("bigint").alias("n_rows")
        )
        nb = self._effective_buckets()
        if nb is not None:
            self._apply_bucketed(delta_j, out_cols, txn, nb)
            return
        exists = self.ds.table_exists(self.view_ref)
        if exists:
            prior = self.ds.read(self.view_ref)
            merged = (
                prior.unionByName(delta_j)
                .groupBy(*out_cols)
                .agg(F.sum("n_rows").cast("bigint").alias("n_rows"))
            )
        else:
            merged = delta_j
        result = merged.filter(F.col("n_rows") > 0)
        if (exists and self.n_buckets == "auto"
                and self.ds.count_rows(self.view_ref) >= self.AUTO_BUCKET_ROWS):
            # the view outgrew full-rewrite refreshes: this refresh was
            # going to rewrite everything anyway, so write THIS rewrite
            # in bucketed layout (schema + partitioning replaced in the
            # same atomic stamped commit) — every later refresh takes
            # the partition-scoped path
            nb = self.DEFAULT_BUCKETS
            result_b = result.select(
                "*",
                self._bucket_col(nb).alias(
                    "_bucket", metadata={"ivm_n_buckets": nb}),
            )
            self.ds.overwrite(result_b, self.view_ref, txn=txn,
                              overwrite_schema=True, partition_by=["_bucket"])
            return
        if not exists:
            self.ds.create(self.view_ref, result.schema)
        self.ds.overwrite(result, self.view_ref, txn=txn)

    def _apply_side(self, delta_ref: TableRef, app_id: str,
                    delta_cols: list[str], pinned_ref: TableRef,
                    pinned_app: str, pinned_cols: list[str]) -> int:
        base_table = self.ds._table_path(delta_ref)
        snap = resolve_snapshot(base_table)
        if snap is None:
            raise ValueError(f"base table {base_table!r} does not exist")
        current = snap.version
        last = self._pos(app_id)
        if last >= current:
            return last
        inc = self._joined_signed(
            delta_ref, last, current, delta_cols,
            pinned_ref, self._pos(pinned_app), pinned_cols,
        )
        self._apply_delta(inc, txn=(app_id, current))
        return current

    def _bucket_col(self, n_buckets: int) -> F.Column:
        return F.pmod(F.hash(*self.on), F.lit(n_buckets)).cast("int")

    def _apply_bucketed(self, delta_j: DataFrame, out_cols: list[str],
                        txn: tuple[str, int] | list[tuple[str, int]],
                        n_buckets: int) -> None:
        """Partition-scoped apply: fold the deltas into ONLY the view
        partitions (join-key hash buckets) they touch, and land the new
        bucket contents + position via one stamped replaceWhere over
        the touched buckets — untouched buckets' files are never read
        or written.

        replaceWhere (not dynamic-partition overwrite) is load-bearing:
        a refresh that EMPTIES a bucket produces no rows for it, and a
        dynamic overwrite only replaces partitions present in the
        frame — the emptied bucket's old files would stay live (stale
        join rows). The predicate removes every touched bucket's files
        whether or not new rows exist for it.

        The delta frame is eagerly checkpointed first: it feeds the
        touched-bucket collect, the replaceWhere validation/write, and
        the merge union — without the checkpoint the expensive
        CDF-x-pinned-side join would execute once per consumer."""
        delta_b = (
            delta_j.withColumn("_bucket", self._bucket_col(n_buckets))
            .localCheckpoint(eager=True)
        )
        # the touched-bucket list is metadata-sized (<= n_buckets)
        touched = sorted(
            r["_bucket"] for r in delta_b.select("_bucket").distinct().collect()
        )
        exists = self.ds.table_exists(self.view_ref)
        if exists:
            prior = self.ds.read(self.view_ref).filter(
                F.col("_bucket").isin(touched) if touched else F.lit(False)
            )
            merged = (
                prior.unionByName(delta_b)
                .groupBy(*out_cols, "_bucket")
                .agg(F.sum("n_rows").cast("bigint").alias("n_rows"))
            )
        else:
            merged = delta_b.select(*out_cols, "_bucket", "n_rows")
        result = merged.filter(F.col("n_rows") > 0).select(
            *out_cols, "n_rows", "_bucket"
        )
        if not exists:
            # stamp the bucket count into the _bucket field's schema
            # metadata so a reopen can never mis-resolve the hash space
            from pyspark.sql.types import StructField, StructType

            stamped = StructType([
                StructField(f.name, f.dataType, f.nullable,
                            {"ivm_n_buckets": n_buckets}
                            if f.name == "_bucket" else f.metadata)
                for f in result.schema.fields
            ])
            self.ds.create(self.view_ref, stamped, partition_by=["_bucket"])
        if touched:
            self.ds.overwrite(
                result, self.view_ref,
                replace_where=(
                    "_bucket IN (" + ", ".join(str(b) for b in touched) + ")"
                ),
                txn=txn,
            )
        else:
            # nothing changed (e.g. rewrite pairs canceled): advance the
            # applied position without touching any partition
            self.ds.overwrite_dynamic(result, self.view_ref, txn=txn)

    def refresh(self) -> tuple[int, int]:
        """Apply A's outstanding deltas, then B's; returns the applied
        (a_version, b_version). Calling refresh again immediately is a
        detected no-op on both sides.

        When only one side is pending the staged single-side path
        runs; when BOTH are pending the two increments are FUSED into
        one state rewrite (one write job instead of two) committed
        with both positions stamped atomically. The fused increments
        use exactly the staged path's pins — ΔA ⋈ B@vb_applied, then
        ΔB ⋈ A@va_new (va_new includes ΔA) — so every (a, b) pair is
        still produced exactly once; the fold is one aggregation over
        the union instead of two sequential ones, and exact bag counts
        are associative, so the stored bag is identical. Crash safety
        is unchanged: a crash before the single commit leaves the old
        state with BOTH old positions."""
        sa = resolve_snapshot(self.ds._table_path(self.a_ref))
        sb = resolve_snapshot(self.ds._table_path(self.b_ref))
        if sa is None:
            raise ValueError(
                f"base table {self.ds._table_path(self.a_ref)!r} does not exist"
            )
        if sb is None:
            raise ValueError(
                f"base table {self.ds._table_path(self.b_ref)!r} does not exist"
            )
        va_cur, vb_cur = sa.version, sb.version
        la, lb = self._pos(self.app_a), self._pos(self.app_b)
        a_pending, b_pending = la < va_cur, lb < vb_cur
        if a_pending and b_pending:
            inc_a = self._joined_signed(
                self.a_ref, la, va_cur, self.a_cols,
                self.b_ref, lb, self.b_cols,
            )
            inc_b = self._joined_signed(
                self.b_ref, lb, vb_cur, self.b_cols,
                self.a_ref, va_cur, self.a_cols,
            )
            self._apply_delta(
                inc_a.unionByName(inc_b),
                txn=[(self.app_a, va_cur), (self.app_b, vb_cur)],
            )
            return va_cur, vb_cur
        if a_pending:
            va = self._apply_side(
                self.a_ref, self.app_a, self.a_cols,
                self.b_ref, self.app_b, self.b_cols,
            )
            return va, lb
        if b_pending:
            vb = self._apply_side(
                self.b_ref, self.app_b, self.b_cols,
                self.a_ref, self.app_a, self.a_cols,
            )
            return la, vb
        return la, lb

    def read(self) -> DataFrame:
        """The maintained bag: joined tuples + n_rows multiplicity
        (the internal bucket column, if any, is dropped)."""
        df = self.ds.read(self.view_ref)
        return df.drop("_bucket") if "_bucket" in df.columns else df

    def staleness(self) -> tuple[int, int]:
        """(a_behind, b_behind): versions each base has advanced past
        the view's applied positions — the refresh-scheduler probe."""
        out = []
        for ref, app in ((self.a_ref, self.app_a), (self.b_ref, self.app_b)):
            snap = resolve_snapshot(self.ds._table_path(ref))
            if snap is None:
                raise ValueError(f"base table {ref!r} does not exist")
            out.append(max(0, snap.version - max(self._pos(app), 0)))
        return tuple(out)
