"""Read-oriented file datasource: parquet/csv/json/orc path scans.

Extension beyond the reference (SURVEY §2.1 S10 — the reference rejects
every non-delta datasource at etl/parent.py:96-99). Write support is
append/overwrite to a path; merge is unsupported (no keyed table
semantics for loose files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from x_spark.errors import DataSourceException
from x_spark.sources.base import BaseDataSource, MergeSpec, TableRef


class FileDataSource(BaseDataSource):
    """``options`` may carry ``format`` (default parquet) plus any Spark
    reader/writer options (header, inferSchema, ...)."""

    def _format(self, ref: TableRef) -> str:
        return ref.options.get("format", "parquet")

    def _spark_options(self, ref: TableRef) -> dict[str, str]:
        return {k: v for k, v in ref.options.items() if k != "format"}

    def read(self, ref: TableRef) -> DataFrame:
        if not ref.is_path:
            return self.spark.table(ref.table)
        return (
            self.spark.read.format(self._format(ref))
            .options(**self._spark_options(ref))
            .load(ref.path)
        )

    def append(self, df: DataFrame, ref: TableRef) -> None:
        self._write(df, ref, "append")

    def overwrite(self, df: DataFrame, ref: TableRef, replace_where: str | None = None) -> None:
        if replace_where not in (None, "", "1=1"):
            raise DataSourceException("FileDataSource does not support replaceWhere")
        self._write(df, ref, "overwrite")

    def merge(self, df: DataFrame, ref: TableRef, spec: MergeSpec) -> None:
        raise DataSourceException("FileDataSource does not support merge; use parquet/delta")

    def truncate(self, ref: TableRef) -> None:
        raise DataSourceException("FileDataSource does not support truncate")

    def delete(self, ref: TableRef, predicate: str) -> None:
        raise DataSourceException("FileDataSource does not support delete; use parquet/delta")

    def partition_columns(self, ref: TableRef) -> list[str]:
        return []

    def _write(self, df: DataFrame, ref: TableRef, mode: str) -> None:
        writer = df.write.format(self._format(ref)).options(**self._spark_options(ref)).mode(mode)
        if ref.is_path:
            writer.save(ref.path)
        else:
            writer.saveAsTable(ref.table)
