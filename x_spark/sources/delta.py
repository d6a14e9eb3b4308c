"""Delta Lake datasource — available only when delta-spark is installed.

Reference parity: datasource/delta.py (sql/table/write/merge). This
module is import-gated by the registry (x_spark.sources.__init__); in
environments without delta-spark the parquet connector provides the
same observable semantics.

Scale note: this is the preferred connector at 100 TB — MERGE rewrites
only touched files, replaceWhere prunes at the transaction log, and
OPTIMIZE/VACUUM handle compaction.
"""

from __future__ import annotations

from functools import reduce

from delta.tables import DeltaTable  # noqa: F401  (ImportError gates the module)
from pyspark.sql import DataFrame

from x_spark.sources.base import BaseDataSource, MergeSpec, TableRef


class DeltaDataSource(BaseDataSource):
    format_name = "delta"

    def _delta_table(self, ref: TableRef) -> DeltaTable:
        if ref.is_path:
            return DeltaTable.forPath(self.spark, ref.path)
        return DeltaTable.forName(self.spark, ref.table)

    def read(self, ref: TableRef) -> DataFrame:
        if ref.is_path:
            return self.spark.read.format("delta").load(ref.path)
        return self.spark.table(ref.table)

    def append(self, df: DataFrame, ref: TableRef) -> None:
        writer = df.write.format("delta").options(**ref.options).mode("append")
        if ref.is_path:
            writer.save(ref.path)
        else:
            writer.saveAsTable(ref.table)

    def overwrite(self, df: DataFrame, ref: TableRef, replace_where: str | None = None) -> None:
        writer = df.write.format("delta").mode("overwrite")
        if replace_where not in (None, "", "1=1"):
            writer = writer.option("replaceWhere", replace_where)
        if ref.is_path:
            writer.save(ref.path)
        else:
            writer.saveAsTable(ref.table)

    def overwrite_dynamic(self, df: DataFrame, ref: TableRef) -> None:
        writer = df.write.format("delta").mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        )
        if ref.is_path:
            writer.save(ref.path)
        else:
            writer.saveAsTable(ref.table)

    def merge(self, df: DataFrame, ref: TableRef, spec: MergeSpec) -> None:
        cond = " AND ".join(
            [f"({spec.extra_target_predicate})"]
            + [f"TGT.`{c}` = SRC.`{c}`" for c in spec.primary_key_columns]
        )
        set_map = {c: f"SRC.`{c}`" for c in spec.all_set_columns}
        builder = (
            self._delta_table(ref)
            .alias("TGT")
            .merge(df.alias("SRC"), cond)
            .whenMatchedUpdate(set=set_map)
        )
        if spec.insert_when_not_matched:
            builder = builder.whenNotMatchedInsert(values=set_map)
        builder.execute()

    def truncate(self, ref: TableRef) -> None:
        self._delta_table(ref).delete("true")

    def delete(self, ref: TableRef, predicate: str) -> None:
        self._delta_table(ref).delete(predicate)

    def _compact_rewrite(self, df: DataFrame, ref: TableRef) -> None:
        # OPTIMIZE is the native Delta path; repartition+overwrite is the
        # portable fallback shared with the base implementation
        self.overwrite(df, ref)

    def partition_columns(self, ref: TableRef) -> list[str]:
        detail = self._delta_table(ref).detail().select("partitionColumns").head()
        return list(detail[0]) if detail else []
