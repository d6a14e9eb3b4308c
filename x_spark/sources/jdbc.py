"""JDBC datasource: cluster-grade external-database connector.

The reference rejects every non-delta datasource (etl/parent.py:96-99);
this is the registry extension that closes the JDBC gap with Spark's
REAL JDBC source — reads are executor-side JDBC cursors with predicate
pushdown (``PushedFilters`` in the scan) and optional partitioned
parallelism, not a driver round-trip.

Addressing: ``datasource: "jdbc:<url>"`` in job configs — the value IS
the JDBC URL (e.g. ``jdbc:derby:/path/db;create=true``). ``table:``
refs name database tables. ``TableRef.options`` pass through to
Spark's JDBC source, so the scale knobs are first-class:

- ``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``
  split the read into parallel range queries (the 100 TB ingest shape
  for an indexed source table);
- ``fetchsize`` sizes the cursor batches;
- ``driver`` overrides the driver class (inferred for known URLs).

Execution model: SELECT-shaped ``sql()`` statements run as Spark JDBC
``query`` reads (distributed); DDL/DML hooks execute on the database
through a JVM ``DriverManager`` connection — no new Python deps, the
driver jar already sits on Spark's classpath (Derby ships with Spark).

MERGE uses the engine's Delta-parity algebra (read → merge_frames →
overwrite-back), identical semantics to the duckdb/parquet connectors.
A push-down MERGE would be dialect-specific SQL; the RMW shape keeps
the contract engine-portable and is proven by the same tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from x_spark.errors import DataSourceException
from x_spark.sources.base import BaseDataSource, MergeSpec, TableRef

# driver classes for URL schemes whose jars commonly ride Spark's
# classpath; anything else must pass options={"driver": ...}
_DRIVERS = {
    "derby": "org.apache.derby.jdbc.EmbeddedDriver",
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "sqlite": "org.sqlite.JDBC",
}


def _infer_driver(url: str) -> str | None:
    parts = url.split(":")
    return _DRIVERS.get(parts[1]) if len(parts) > 1 else None


class JdbcDataSource(BaseDataSource):
    format_name = "jdbc"

    def __init__(self, spark: SparkSession, url: str,
                 driver: str | None = None) -> None:
        super().__init__(spark)
        if not url.startswith("jdbc:"):
            raise DataSourceException(f"not a JDBC url: {url!r}")
        self.url = url
        self.driver = driver or _infer_driver(url)
        if self.driver is None:
            raise DataSourceException(
                f"cannot infer a JDBC driver for {url!r}; pass options={{'driver': ...}}"
            )
        if self.driver == _DRIVERS["derby"]:
            # keep derby.log out of the working directory
            import tempfile

            spark._jvm.java.lang.System.setProperty(
                "derby.stream.error.field",
                "org.apache.derby.io.DevNull.DEV_NULL",
            )
            spark._jvm.java.lang.System.getProperty("derby.system.home") or \
                spark._jvm.java.lang.System.setProperty(
                    "derby.system.home", tempfile.gettempdir()
                )

    def register_catalog(self, name: str, pushdown: bool = True) -> str:
        """Expose this database as a Spark DSv2 catalog
        (``JDBCTableCatalog``): ``spark.table(f"{name}.<SCHEMA>.<TBL>")``
        plans V2 scans where GROUP BY aggregates, LIMIT, and filters
        push INTO the database (``PushedAggregates`` /
        ``PushedGroupByExpressions`` in the plan) — Spark reads one row
        per group instead of the table. The V1 ``read()`` path pushes
        filters only; this is the knob for aggregation-heavy dim
        queries. Derby note: unquoted identifiers store uppercase, so
        the qualified name is e.g. ``{name}.APP.T_AGG``."""
        base = f"spark.sql.catalog.{name}"
        self.spark.conf.set(
            base,
            "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
        )
        self.spark.conf.set(base + ".url", self.url)
        self.spark.conf.set(base + ".driver", self.driver)
        if pushdown:
            self.spark.conf.set(base + ".pushDownAggregate", "true")
            self.spark.conf.set(base + ".pushDownLimit", "true")
        return name

    # -- plumbing ------------------------------------------------------
    def _reader(self, **opts):
        r = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("driver", self.driver)
        )
        for k, v in opts.items():
            r = r.option(k, v)
        return r

    def _execute_update(self, sql: str) -> None:
        """Run one DDL/DML statement on the database via a JVM
        DriverManager connection (driver-side, metadata-scale work —
        the data plane stays in the executor-side JDBC scans)."""
        jvm = self.spark._jvm
        jvm.java.lang.Class.forName(self.driver)
        conn = jvm.java.sql.DriverManager.getConnection(self.url)
        try:
            stmt = conn.createStatement()
            try:
                stmt.execute(sql)
            finally:
                stmt.close()
        finally:
            conn.close()

    # -- SQL (runs on the database, like the duckdb connector) ---------
    def _execute_statement(self, stmt: str) -> DataFrame:
        import re

        lead = re.sub(r"^\s*(?:--[^\n]*\n|/\*.*?\*/\s*)*", "", stmt,
                      flags=re.S).lstrip()
        if re.match(r"(?i)select|with|values", lead):
            return self._reader(query=stmt).load()
        self._execute_update(stmt)
        return self.spark.createDataFrame([], "ok string")

    # -- reads ---------------------------------------------------------
    def read(self, ref: TableRef) -> DataFrame:
        if ref.is_path:
            raise DataSourceException(
                "jdbc refs are table names; use the file/parquet datasource for paths"
            )
        return self._reader(dbtable=ref.table, **ref.options).load()

    # -- writes --------------------------------------------------------
    def _writer(self, df: DataFrame, ref: TableRef, mode: str):
        w = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("driver", self.driver)
            .option("dbtable", ref.table)
            .mode(mode)
        )
        for k, v in ref.options.items():
            w = w.option(k, v)
        return w

    def append(self, df: DataFrame, ref: TableRef) -> None:
        if self.table_exists(ref):
            # by-name resolution (Delta parity): align to the target's
            # column order before the positional JDBC INSERT
            df = df.select(*self.read(ref).columns)
        self._writer(df, ref, "append").save()

    def overwrite(self, df: DataFrame, ref: TableRef,
                  replace_where: str | None = None) -> None:
        if replace_where in (None, "", "1=1") or not self.table_exists(ref):
            self._writer(df, ref, "overwrite").save()
            return
        # Delta replaceWhere contract (shared with every connector):
        # violating source rows abort; target rows where the predicate
        # is TRUE are replaced, FALSE or NULL survive. The violation
        # probe runs Spark-side (the predicate is Spark SQL).
        from pyspark.sql import functions as F

        bad = df.filter(
            ~F.coalesce(F.expr(replace_where), F.lit(False))
        ).limit(1).count()
        if bad:
            raise DataSourceException(
                f"source rows violate replaceWhere predicate {replace_where!r}"
            )
        # plain WHERE: SQL DELETE removes only rows where the predicate
        # is TRUE — FALSE and NULL survive, exactly the Delta contract
        # (no COALESCE wrapper: Derby's grammar rejects boolean args)
        self._execute_update(
            f"DELETE FROM {ref.table} WHERE {self._quote_predicate(ref, replace_where)}"
        )
        self.append(df, ref)

    def _quote_predicate(self, ref: TableRef, predicate: str) -> str:
        """Quote column identifiers in a user predicate with their
        STORED case. Spark's JDBC writer quotes column names at CREATE
        (stored as written, e.g. lowercase) while unquoted identifiers
        in database SQL fold to uppercase — a raw predicate would miss
        every Spark-created column. Matching is case-insensitive and
        skips single-quoted string literals."""
        import re

        cols = self.read(ref).columns
        segments = re.split(r"('(?:[^']|'')*')", predicate)
        for c in sorted(cols, key=len, reverse=True):
            pat = re.compile(rf'(?<![\w."]){re.escape(c)}(?![\w."])', re.I)
            for i in range(0, len(segments), 2):
                segments[i] = pat.sub(f'"{c}"', segments[i])
        return "".join(segments)

    def merge(self, df: DataFrame, ref: TableRef, spec: MergeSpec) -> None:
        from x_spark.operators.merge import merge_frames

        result = merge_frames(self.read(ref), df, spec)
        # materialize BEFORE the overwrite drops the table the plan reads
        out = result.localCheckpoint(eager=True)
        self._writer(out, ref, "overwrite").save()

    def truncate(self, ref: TableRef) -> None:
        self._execute_update(f"TRUNCATE TABLE {ref.table}")

    def delete(self, ref: TableRef, predicate: str) -> None:
        # TRUE rows deleted; FALSE/NULL survive (ANSI DELETE semantics)
        self._execute_update(
            f"DELETE FROM {ref.table} WHERE {self._quote_predicate(ref, predicate)}"
        )

    # -- metadata ------------------------------------------------------
    def partition_columns(self, ref: TableRef) -> list[str]:
        return []

    def table_exists(self, ref: TableRef) -> bool:
        if ref.is_path:
            return False
        jvm = self.spark._jvm
        jvm.java.lang.Class.forName(self.driver)
        conn = jvm.java.sql.DriverManager.getConnection(self.url)
        try:
            meta = conn.getMetaData()
            for name in (ref.table, ref.table.upper()):
                rs = meta.getTables(None, None, name, None)
                try:
                    if rs.next():
                        return True
                finally:
                    rs.close()
            return False
        finally:
            conn.close()
