"""Parquet-backed datasource: catalog tables or filesystem paths.

This is the working default connector. It reproduces the observable
semantics of the reference's Delta operations (SURVEY §2.2 W1-W5) with
Spark-native mechanisms:

- append            -> ``saveAsTable``/``save`` with mode=append
- overwrite         -> full overwrite, or partition-scoped via Spark's
                      dynamic partition overwrite (the built-in
                      equivalent of Delta replaceWhere derived from the
                      source's partitions, etl/overwrite.py:20-36), or a
                      generic predicate-scoped rewrite
- merge (update/upsert) -> join-based merge (what Delta MERGE compiles
                      to under the hood) + staged atomic-ish rewrite
- truncate          -> TRUNCATE TABLE / empty overwrite

Scale notes (100 TB): the merge path shuffles target and source on the
primary key — identical to Delta MERGE's join phase. The difference is
the write phase: Delta rewrites only touched files; without a
transactional format we rewrite the table (or, when the target is
partitioned and the merge predicate prunes partitions, only those
partitions — see ``merge``). With delta-spark installed the registry
dispatches to the real MERGE instead.
"""

from __future__ import annotations

import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, functions as F

from x_spark.sources.base import BaseDataSource, MergeSpec, TableRef


class ParquetCatalogDataSource(BaseDataSource):
    format_name = "parquet"

    # -- reads ---------------------------------------------------------
    def read(self, ref: TableRef) -> DataFrame:
        if ref.is_path:
            return self.spark.read.options(**ref.options).parquet(ref.path)
        return self.spark.table(ref.table)

    # -- writes --------------------------------------------------------
    def append(self, df: DataFrame, ref: TableRef) -> None:
        if ref.is_path:
            writer = df.write.format(self.format_name).options(**ref.options).mode("append")
            # an existing layout is authoritative; partition_by only
            # shapes relations this write creates
            part_cols = (
                self._path_partition_columns(ref.path)
                if self._path_exists(ref.path)
                else list(ref.partition_by)
            )
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            writer.save(ref.path)
            return
        if self.spark.catalog.tableExists(ref.table):
            # By-name resolution against the existing schema (missing
            # columns in df raise; extra columns raise) — matches Delta
            # append semantics rather than positional insertInto.
            target_cols = self.spark.table(ref.table).columns
            df = df.select(*target_cols)
            df.write.format(self.format_name).mode("append").insertInto(ref.table)
        else:
            writer = df.write.format(self.format_name).options(**ref.options).mode("append")
            if ref.partition_by:
                writer = writer.partitionBy(*ref.partition_by)
            writer.saveAsTable(ref.table)

    def overwrite(self, df: DataFrame, ref: TableRef, replace_where: str | None = None) -> None:
        """Full overwrite, or Delta replaceWhere semantics when an
        explicit predicate is given:

        - source rows violating the predicate abort the write (Delta
          rejects them; silently overwriting their partitions would
          diverge),
        - target rows where the predicate is TRUE are replaced; FALSE
          *or NULL* survive (mirrors ``delete()`` — ``~NULL`` is NULL
          and would silently drop NULL-valued rows otherwise).

        Callers that want "replace the partitions present in df" use
        ``overwrite_dynamic`` — that path needs no target read at all.
        """
        part_cols = self.partition_columns(ref) if self.table_exists(ref) else []
        if replace_where in (None, "", "1=1") or not self.table_exists(ref):
            self._full_overwrite(df, ref, part_cols)
            return
        pred = F.coalesce(F.expr(replace_where), F.lit(False))
        # Single-pass source constraint: rows failing the predicate hit
        # raise_error during the write (OR short-circuits row-wise in
        # codegen, so conforming rows never evaluate the error branch).
        checked = df.filter(
            pred
            | F.raise_error(
                F.lit(f"source rows violate replaceWhere predicate {replace_where!r}")
            ).cast("boolean")
        )
        kept = self.read(ref).filter(~pred)
        result = kept.unionByName(checked.select(*kept.columns))
        self._staged_rewrite(result, ref, part_cols)

    def overwrite_dynamic(self, df: DataFrame, ref: TableRef) -> None:
        """Replace exactly the partitions present in ``df`` (or the whole
        table when unpartitioned) without reading the target."""
        if not self.table_exists(ref):
            self._full_overwrite(df, ref, [])
            return
        part_cols = self.partition_columns(ref)
        if part_cols:
            self._dynamic_partition_overwrite(df, ref)
        else:
            self._full_overwrite(df, ref, [])

    def merge(self, df: DataFrame, ref: TableRef, spec: MergeSpec) -> None:
        """Join-based MERGE with Delta semantics (SURVEY §2.2 W3/W4) —
        the algebra lives in x_spark.operators.merge.merge_frames; this
        method materializes the post-merge state into the target.

        Scale path: when the target is partitioned and no partition
        column is updatable, only the partitions a merge can touch
        (those holding pk-matched target rows, plus the partitions
        inserted rows land in) are read and rewritten — the
        partition-level analogue of Delta MERGE's file pruning. Falls
        back to a full staged rewrite otherwise."""
        from x_spark.operators.merge import check_unique_source_keys, merge_frames

        part_cols = self.partition_columns(ref)
        target = self.read(ref)
        touched = self._merge_touched_predicate(target, df, spec, part_cols)
        if touched is not None:
            # Uniqueness is a property of the source alone — check it
            # against the full contract, then skip the re-check inside
            # merge_frames.
            if spec.validate_unique_source_keys:
                import dataclasses

                check_unique_source_keys(df, spec)
                spec = dataclasses.replace(spec, validate_unique_source_keys=False)
            if not touched:  # no matched keys, no inserts: no-op merge
                return
            from functools import reduce

            pred = reduce(lambda a, b: a | b, touched)
            restricted = target.filter(pred)
            result = merge_frames(restricted, df, spec)
            # Merge never deletes, and partition values can't change on
            # this path, so every touched partition appears in `result`
            # — dynamic partition overwrite replaces exactly those.
            self._staged_rewrite(result, ref, part_cols, dynamic=True)
            return
        result = merge_frames(target, df, spec)
        self._staged_rewrite(result, ref, part_cols)

    def _merge_touched_predicate(
        self, target: DataFrame, src: DataFrame, spec: MergeSpec, part_cols: list[str]
    ):
        """Per-partition-tuple predicate clauses a merge can modify, or
        None when partition pruning is unsafe (unpartitioned target, or
        a partition column is in the update set so rows could move
        across partitions). An empty list means the merge is a no-op.

        Touched = partitions of target rows whose pk matches some source
        row (pk-only superset of the full match condition — safe) union,
        for upserts, the partitions inserted rows land in (source value
        when the partition column is carried by the insert, else NULL —
        the reference's NULL-insert quirk, SURVEY §8.7). The collect is
        bounded by the touched-partition count: metadata scale."""
        from functools import reduce

        if not part_cols or set(part_cols) & set(spec.update_columns):
            return None
        src_keys = src.select(*spec.primary_key_columns).distinct()
        matched = (
            target.join(src_keys, spec.primary_key_columns, "left_semi")
            .select(*part_cols)
            .distinct()
        )
        if spec.insert_when_not_matched:
            carried = set(spec.all_set_columns)
            ins_tuples = src.select(
                *[
                    (F.col(c) if c in carried else F.lit(None).cast(dict(target.dtypes)[c])).alias(c)
                    for c in part_cols
                ]
            ).distinct()
            matched = matched.unionByName(ins_tuples).distinct()
        rows = matched.collect()
        clauses = []
        for row in rows:
            terms = [
                F.col(c).isNull() if row[c] is None else (F.col(c) == F.lit(row[c]))
                for c in part_cols
            ]
            clauses.append(reduce(lambda a, b: a & b, terms))
        return clauses

    def truncate(self, ref: TableRef) -> None:
        if ref.is_path:
            empty = self.read(ref).limit(0)
            self._staged_rewrite(empty, ref, [])
        else:
            self.spark.sql(f"TRUNCATE TABLE {ref.table}")

    def delete(self, ref: TableRef, predicate: str) -> None:
        """ANSI DELETE: drop rows where the predicate is TRUE (FALSE or
        NULL survive); staged rewrite of the survivors."""
        kept = self.read(ref).filter(~F.coalesce(F.expr(predicate), F.lit(False)))
        self._staged_rewrite(kept, ref, self.partition_columns(ref))

    def _compact_rewrite(self, df: DataFrame, ref: TableRef) -> None:
        self._staged_rewrite(df, ref, self.partition_columns(ref))

    # -- metadata ------------------------------------------------------
    def partition_columns(self, ref: TableRef) -> list[str]:
        """Partition columns via the catalog API — the robust replacement
        for the reference's SHOW PARTITIONS error-message sniffing
        (etl/overwrite.py:10-18)."""
        if ref.is_path:
            return self._path_partition_columns(ref.path)
        return [c.name for c in self.spark.catalog.listColumns(ref.table) if c.isPartition]

    # -- internals -----------------------------------------------------
    def _path_exists(self, path: str) -> bool:
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return bool(fs.exists(hpath))

    def _full_overwrite(self, df: DataFrame, ref: TableRef, part_cols: list[str]) -> None:
        part_cols = part_cols or list(ref.partition_by)
        if ref.is_path:
            writer = df.write.format(self.format_name).options(**ref.options).mode("overwrite")
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            # static scope: a session-level dynamic mode would silently
            # leave partitions absent from df behind on a FULL overwrite
            with self._overwrite_mode("static"):
                writer.save(ref.path)
            return
        if self.spark.catalog.tableExists(ref.table):
            # Preserve the table definition (schema order, partitioning):
            # static INSERT OVERWRITE replaces all contents.
            target_cols = self.spark.table(ref.table).columns
            with self._overwrite_mode("static"):
                df.select(*target_cols).write.mode("overwrite").insertInto(ref.table)
        else:
            writer = df.write.format(self.format_name).mode("overwrite")
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            writer.saveAsTable(ref.table)

    def _dynamic_partition_overwrite(self, df: DataFrame, ref: TableRef) -> None:
        with self._overwrite_mode("dynamic"):
            if ref.is_path:
                part_cols = self._path_partition_columns(ref.path)
                writer = df.write.format(self.format_name).mode("overwrite")
                if part_cols:
                    writer = writer.partitionBy(*part_cols)
                writer.save(ref.path)
            else:
                target_cols = self.spark.table(ref.table).columns
                df.select(*target_cols).write.mode("overwrite").insertInto(ref.table)

    @contextmanager
    def _overwrite_mode(self, mode: str):
        """Scoped spark.sql.sources.partitionOverwriteMode: restore the
        caller session's prior value (the engine must not permanently
        flip session-global confs on vanilla sessions)."""
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = self.spark.conf.get(key, None)
        self.spark.conf.set(key, mode)
        try:
            yield
        finally:
            if prev is None:
                self.spark.conf.unset(key)
            else:
                self.spark.conf.set(key, prev)

    def _staged_rewrite(
        self, result: DataFrame, ref: TableRef, part_cols: list[str], *, dynamic: bool = False
    ) -> None:
        """Materialize ``result`` to a staging dir, then overwrite the
        target from it. Needed because Spark refuses to overwrite a
        table that the plan is also reading. Two writes instead of
        Delta's single transactional commit — the price of running
        without a table format; partition pruning in callers keeps the
        rewritten byte count down. ``dynamic=True`` replaces only the
        partitions present in ``result`` (the pruned-merge write path)."""
        staging = self._staging_path()
        result.write.parquet(staging)
        try:
            staged = self.spark.read.parquet(staging)
            if dynamic:
                self._dynamic_partition_overwrite(staged, ref)
            else:
                self._full_overwrite(staged, ref, part_cols)
        finally:
            self._hadoop_delete(staging)

    def _staging_path(self) -> str:
        warehouse = self.spark.conf.get(
            "spark.sql.warehouse.dir", "file:/tmp/x_spark-warehouse"
        )
        return f"{warehouse.rstrip('/')}/.x_spark_staging/{uuid.uuid4().hex}"

    def _hadoop_delete(self, path: str) -> None:
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        fs.delete(hpath, True)

    def _path_partition_columns(self, path: str) -> list[str]:
        """Infer hive-style partition columns from one directory level at
        a time (works on any Hadoop-compatible FS)."""
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        cols: list[str] = []
        current = path
        while True:
            hpath = jvm.org.apache.hadoop.fs.Path(current)
            try:
                fs = hpath.getFileSystem(conf)
                statuses = fs.listStatus(hpath)
            except Exception:
                return cols
            subdir = None
            for st in statuses:
                name = st.getPath().getName()
                if st.isDirectory() and "=" in name and not name.startswith(("_", ".")):
                    subdir = st.getPath().toString()
                    cols.append(name.split("=", 1)[0])
                    break
            if subdir is None:
                return cols
            current = subdir
