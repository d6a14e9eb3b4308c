"""Datasource connector registry.

Reference parity: ``init_datasource(source_type, spark)``
(datasource/base_datasource.py:13-24) with only ``"delta"`` accepted.
Our registry supports:

- ``parquet`` — catalog tables stored as parquet (the working default in
  environments without delta-spark); implements the full write/merge
  surface with Spark-native equivalents.
- ``delta``   — real Delta Lake connector, available only when the
  ``delta-spark`` package is importable; otherwise resolves to the
  txlog transactional connector, which executes the same transactional
  semantics (atomic commits, replaceWhere, MERGE file-skipping, time
  travel) against its own Delta-protocol-shaped log.
- ``file``    — read-only path scans for parquet/csv/json (SURVEY §2.1
  S10 extension).
- ``duckdb[:/path/db.duckdb]`` — embedded external-database connector
  (dimension tables / result publishing; Arrow interchange).
- ``jdbc:<url>`` — Spark's real JDBC source (executor-side cursors,
  predicate pushdown, partitioned range reads); Derby's embedded
  driver ships with Spark so the connector is live in this container.
- ``txlog``  — transaction-logged parquet tables: atomic versioned
  commits, snapshot isolation, time travel, footer-stats file skipping
  for MERGE/DELETE (the transactional mechanics the delta fallback
  emulates observably; see x_spark/sources/txlog.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from x_spark.errors import DataSourceException
from x_spark.sources.base import BaseDataSource
from x_spark.sources.parquet_catalog import ParquetCatalogDataSource
from x_spark.sources.files import FileDataSource
from x_spark.sources.txlog import DeltaFallbackDataSource, TxLogDataSource

try:  # delta-spark is optional; gate the import (no pip installs here)
    from x_spark.sources.delta import DeltaDataSource  # noqa: F401

    _HAS_DELTA = True
except ImportError:  # pragma: no cover - environment-dependent
    _HAS_DELTA = False

_REGISTRY: dict[str, type[BaseDataSource]] = {
    "parquet": ParquetCatalogDataSource,
    "file": FileDataSource,
    "txlog": TxLogDataSource,
}
if _HAS_DELTA:  # pragma: no cover
    _REGISTRY["delta"] = DeltaDataSource
else:
    # Delta configs still run — against the txlog transactional store,
    # which implements Delta's MECHANICS (atomic versioned commits,
    # snapshot isolation, replaceWhere, MERGE file-skipping, time
    # travel), not just its observable op results. Table names that
    # pre-exist in the Spark catalog keep routing there (no split-brain
    # shadow tables); see txlog.DeltaFallbackDataSource.
    _REGISTRY["delta"] = DeltaFallbackDataSource


def init_datasource(source_type: str, spark: SparkSession) -> BaseDataSource:
    """Factory mirroring datasource/base_datasource.py:13-24. The
    ``duckdb`` type carries its database file after a colon
    (``duckdb:/path/db.duckdb``; bare ``duckdb`` -> in-memory)."""
    raw = source_type or "delta"
    source_type = raw.lower()
    if source_type == "duckdb" or source_type.startswith("duckdb:"):
        from x_spark.sources.duckdb_db import DuckDBDataSource

        _, _, database = raw.partition(":")  # path keeps its case
        return DuckDBDataSource(spark, database)
    if source_type.startswith("jdbc:"):
        from x_spark.sources.jdbc import JdbcDataSource

        return JdbcDataSource(spark, raw)  # the type IS the JDBC url
    cls = _REGISTRY.get(source_type)
    if cls is None:
        raise DataSourceException(
            f"Unknown datasource type {source_type!r}; expected one of "
            f"{sorted(_REGISTRY) + ['duckdb[:/path]', 'jdbc:<url>']}"
        )
    return cls(spark)
