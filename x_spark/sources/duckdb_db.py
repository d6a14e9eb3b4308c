"""DuckDB datasource: a real second external-database connector.

Exercises the registry's extension story (the reference rejects every
non-delta datasource, etl/parent.py:96-99): the full connector surface
— sql / read / append / overwrite / merge / truncate / delete — against
an embedded analytical database, with Arrow as the interchange format
in both directions.

Addressing: ``datasource: "duckdb:/path/to/db.duckdb"`` in job configs
(the part after the colon is the database file; empty -> in-memory,
scoped to the connector instance). ``table:`` refs name DuckDB tables.

Scale stance: rows cross the driver (DuckDB is an embedded single-node
engine), so this connector is for DIMENSION/metadata tables, config
lookups, and result publishing — the same role a JDBC dim-table read
plays in a Spark job. Big facts stay on parquet/delta. A cluster-grade
external-DB connector would use Spark's JDBC source with partitioned
reads (predicate ranges on an indexed column); the op surface here is
identical, so swapping the transport later does not change job configs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from x_spark.errors import DataSourceException
from x_spark.sources.base import BaseDataSource, MergeSpec, TableRef, split_sql_statements


class DuckDBDataSource(BaseDataSource):
    format_name = "duckdb"

    def __init__(self, spark: SparkSession, database: str = "") -> None:
        super().__init__(spark)
        import duckdb  # embedded; gated here so environments without it fail lazily

        self.database = database or ":memory:"
        self._con = duckdb.connect(self.database)

    # -- SQL (runs on DuckDB, not Spark) -------------------------------
    def sql(self, query: str) -> DataFrame:
        """Run one atomic statement ON DUCKDB; the result (if any)
        comes back as a Spark DataFrame via Arrow."""
        if ";" in query.rstrip().rstrip(";"):
            raise ValueError("sql() accepts a single atomic statement (no ';')")
        return self._to_spark(self._con.sql(query))

    def sql_script(self, script: str) -> DataFrame | None:
        result = None
        for stmt in split_sql_statements(script):
            result = self.sql(stmt)
        return result

    def _to_spark(self, rel) -> DataFrame:
        if rel is None:  # DDL/DML statements yield no relation
            return self.spark.createDataFrame([], "ok string")
        tbl = rel.arrow()
        from pyspark.sql.pandas.types import from_arrow_schema

        # explicit schema: empty results can't infer, and Arrow types
        # round-trip more faithfully than pandas-object inference
        schema = from_arrow_schema(tbl.schema, prefer_timestamp_ntz=True)
        return self.spark.createDataFrame(tbl.to_pandas(), schema=schema)

    # -- reads ---------------------------------------------------------
    def read(self, ref: TableRef) -> DataFrame:
        if ref.is_path:
            raise DataSourceException(
                "duckdb refs are table names; use the file/parquet datasource for paths"
            )
        return self._to_spark(self._con.table(ref.table))

    # -- writes --------------------------------------------------------
    def _register(self, df: DataFrame, view: str) -> None:
        # Arrow-batched transfer (driver-bounded by design — see module
        # docstring); registration is zero-copy on the DuckDB side
        self._con.register(view, df.toPandas())

    def append(self, df: DataFrame, ref: TableRef) -> None:
        self._register(df, "_xs_src")
        try:
            if self.table_exists(ref):
                cols = ", ".join(self._columns(ref.table))
                self._con.sql(f"INSERT INTO {ref.table} ({cols}) SELECT {cols} FROM _xs_src")
            else:
                self._con.sql(f"CREATE TABLE {ref.table} AS SELECT * FROM _xs_src")
        finally:
            self._con.unregister("_xs_src")

    def overwrite(self, df: DataFrame, ref: TableRef, replace_where: str | None = None) -> None:
        self._register(df, "_xs_src")
        try:
            if replace_where in (None, "", "1=1") or not self.table_exists(ref):
                self._con.sql(
                    f"CREATE OR REPLACE TABLE {ref.table} AS SELECT * FROM _xs_src"
                )
            else:
                # Delta replaceWhere contract (mirrors parquet connector)
                bad = self._con.sql(
                    f"SELECT count(*) FROM _xs_src WHERE NOT coalesce({replace_where}, false)"
                ).fetchone()[0]
                if bad:
                    raise DataSourceException(
                        f"source rows violate replaceWhere predicate {replace_where!r}"
                    )
                self._con.sql(
                    f"DELETE FROM {ref.table} WHERE coalesce({replace_where}, false)"
                )
                cols = ", ".join(self._columns(ref.table))
                self._con.sql(f"INSERT INTO {ref.table} ({cols}) SELECT {cols} FROM _xs_src")
        finally:
            self._con.unregister("_xs_src")

    def merge(self, df: DataFrame, ref: TableRef, spec: MergeSpec) -> None:
        """MERGE with the engine's Delta-parity algebra: target is read
        into Spark, merged with merge_frames (duplicate-source abort,
        NULL-insert quirk), and written back — semantics identical to
        the parquet/delta connectors, proven by the shared conformance
        suite."""
        from x_spark.operators.merge import merge_frames

        result = merge_frames(self.read(ref), df, spec)
        self._register(result, "_xs_merged")
        try:
            self._con.sql(f"CREATE OR REPLACE TABLE {ref.table} AS SELECT * FROM _xs_merged")
        finally:
            self._con.unregister("_xs_merged")

    def truncate(self, ref: TableRef) -> None:
        self._con.sql(f"DELETE FROM {ref.table}")

    def delete(self, ref: TableRef, predicate: str) -> None:
        self._con.sql(f"DELETE FROM {ref.table} WHERE coalesce({predicate}, false)")

    # -- metadata ------------------------------------------------------
    def partition_columns(self, ref: TableRef) -> list[str]:
        return []

    def table_exists(self, ref: TableRef) -> bool:
        if ref.is_path:
            return False
        row = self._con.sql(
            "SELECT count(*) FROM information_schema.tables WHERE table_name = ?",
            params=[ref.table],
        ).fetchone()
        return bool(row and row[0])

    def _columns(self, table: str) -> list[str]:
        rows = self._con.sql(
            "SELECT column_name FROM information_schema.columns "
            "WHERE table_name = ? ORDER BY ordinal_position",
            params=[table],
        ).fetchall()
        return [r[0] for r in rows]
