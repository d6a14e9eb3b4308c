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
        part_cols = self.partition_columns(ref) if self.table_exists(ref) else []
        if replace_where in (None, "", "1=1") or not self.table_exists(ref):
            self._full_overwrite(df, ref, part_cols)
            return
        if part_cols:
            # Partition-scoped: Spark dynamic partition overwrite replaces
            # exactly the partitions present in df — the same observable
            # result as Delta replaceWhere with a source-derived partition
            # predicate (reference golden: untouched partitions survive,
            # FIXTURES.md §2 overwrite block).
            self._dynamic_partition_overwrite(df, ref)
        else:
            # Generic predicate on an unpartitioned target: keep rows NOT
            # matching the predicate, union the new data, rewrite.
            kept = self.read(ref).filter(~F.expr(replace_where))
            result = kept.unionByName(df.select(*kept.columns))
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
        method materializes the post-merge state into the target."""
        from x_spark.operators.merge import merge_frames

        result = merge_frames(self.read(ref), df, spec)
        self._staged_rewrite(result, ref, self.partition_columns(ref))

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
            writer.save(ref.path)
            return
        if self.spark.catalog.tableExists(ref.table):
            # Preserve the table definition (schema order, partitioning):
            # static INSERT OVERWRITE replaces all contents.
            target_cols = self.spark.table(ref.table).columns
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
            try:
                df.select(*target_cols).write.mode("overwrite").insertInto(ref.table)
            finally:
                self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        else:
            writer = df.write.format(self.format_name).mode("overwrite")
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            writer.saveAsTable(ref.table)

    def _dynamic_partition_overwrite(self, df: DataFrame, ref: TableRef) -> None:
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        if ref.is_path:
            part_cols = self._path_partition_columns(ref.path)
            writer = df.write.format(self.format_name).mode("overwrite")
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            writer.save(ref.path)
        else:
            target_cols = self.spark.table(ref.table).columns
            df.select(*target_cols).write.mode("overwrite").insertInto(ref.table)

    def _staged_rewrite(self, result: DataFrame, ref: TableRef, part_cols: list[str]) -> None:
        """Materialize ``result`` to a staging dir, then overwrite the
        target from it. Needed because Spark refuses to overwrite a
        table that the plan is also reading. Two writes instead of
        Delta's single transactional commit — the price of running
        without a table format; partition pruning in callers keeps the
        rewritten byte count down."""
        staging = self._staging_path()
        result.write.parquet(staging)
        try:
            staged = self.spark.read.parquet(staging)
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
