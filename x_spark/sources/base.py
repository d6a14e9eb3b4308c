"""Abstract datasource connector.

Reference parity: datasource/base_datasource.py:27-61 defines the op
surface ``sql / table / write / merge``. We add ``truncate`` and
``partition_columns`` (the reference reaches those through raw SQL and
SHOW PARTITIONS error-sniffing, etl/overwrite.py:10-18 — catalog-API
introspection is the robust Spark-native replacement).
"""

from __future__ import annotations

import datetime
import decimal
from abc import ABC, abstractmethod
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def sql_literal(value) -> str:
    """Render a Python value as a typed ANSI SQL literal.

    Strings are quote-escaped by doubling (`O'Brien` -> `'O''Brien'`),
    numerics/booleans render bare, date/datetime use DATE/TIMESTAMP
    keyword literals. Never interpolate raw values into predicates —
    the reference relied on implicit string->type casts
    (etl/overwrite.py:26, SURVEY §7 hard-item 3) and breaks on quotes.
    """
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float, decimal.Decimal)):
        return str(value)
    if isinstance(value, datetime.datetime):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    if isinstance(value, datetime.date):
        return f"DATE '{value.isoformat()}'"
    escaped = str(value).replace("'", "''")
    return f"'{escaped}'"


def split_sql_statements(text: str) -> list[str]:
    """Split a SQL script on ';' outside quoted strings and comments.

    Skips ``--`` line comments and ``/* ... */`` block comments, and
    handles doubled (``''``) and backslash-escaped quotes inside
    strings; comment-only fragments are dropped. The working version of
    the reference wheel's commented-out multi-statement executor
    (parent.py:129-157)."""
    stmts: list[str] = []
    buf: list[str] = []
    quote: str | None = None
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if quote:
            if ch == "\\" and i + 1 < n:
                buf.append(text[i : i + 2])
                i += 2
                continue
            buf.append(ch)
            if ch == quote:
                if i + 1 < n and text[i + 1] == quote:  # doubled quote: literal
                    buf.append(quote)
                    i += 2
                    continue
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
            i += 1
            continue
        if text.startswith("--", i):
            j = text.find("\n", i)
            j = n if j == -1 else j
            buf.append(text[i:j])
            i = j
            continue
        if text.startswith("/*", i):
            j = text.find("*/", i + 2)
            j = n if j == -1 else j + 2
            buf.append(text[i:j])
            i = j
            continue
        if ch == ";":
            stmts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip() and not _comment_only(s)]


def _comment_only(stmt: str) -> bool:
    """True when a fragment holds nothing but comments/whitespace (e.g.
    a trailing ``-- done`` after the last ';')."""
    import re

    stripped = re.sub(r"/\*.*?\*/", "", stmt, flags=re.S)
    stripped = re.sub(r"--[^\n]*", "", stripped)
    return not stripped.strip()


def partition_tuple_clause(row, part_cols: list[str]) -> str:
    """One `(c1 = lit AND c2 IS NULL ...)` conjunct for a partition
    tuple; NULL partition values render as IS NULL (NULL = NULL would
    never match)."""
    terms = [
        f"{c} IS NULL" if row[c] is None else f"{c} = {sql_literal(row[c])}"
        for c in part_cols
    ]
    return "(" + " AND ".join(terms) + ")"


@dataclass(frozen=True)
class MergeSpec:
    """Declarative description of an update/upsert merge.

    Reference parity: etl/update_and_upsert.py:3-8 builds the condition
    ``<where_statement_on_table> AND TGT.pk = SRC.pk AND ...``; the update
    set is ``{col: SRC.col}`` over ``update_column`` and (per the
    reference's golden-confirmed quirk, SURVEY §8.7) insert values cover
    primary-key + update columns, everything else NULL.
    """

    primary_key_columns: list[str]
    update_columns: list[str]
    extra_target_predicate: str = "1=1"
    insert_when_not_matched: bool = False  # False = update, True = upsert
    validate_unique_source_keys: bool = True

    @property
    def all_set_columns(self) -> list[str]:
        seen: dict[str, None] = dict.fromkeys(self.update_columns)
        for c in self.primary_key_columns:
            seen.setdefault(c, None)
        return list(seen)


@dataclass
class TableRef:
    """Target/source addressing: catalog table name or filesystem path.

    Reference parity: every op accepts ``table:`` or ``path:``
    (etl/append.py:12-28, datasource/delta.py:96-100).
    """

    table: str | None = None
    path: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    # layout when the write CREATES the relation (existing layouts win)
    partition_by: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        if (self.table is None) == (self.path is None):
            raise ValueError("exactly one of table/path must be set")

    @property
    def is_path(self) -> bool:
        return self.path is not None

    @property
    def location(self) -> str:
        return self.path if self.is_path else self.table  # type: ignore[return-value]


class BaseDataSource(ABC):
    """Strategy class over Spark's built-in format connectors."""

    format_name: str = "parquet"

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    # -- reads ---------------------------------------------------------
    def _execute_statement(self, stmt: str) -> DataFrame:
        """Execute one SQL statement. Connectors whose tables live
        outside the Spark catalog (txlog) override this to resolve
        their own table names first."""
        return self.spark.sql(stmt)

    def sql(self, query: str) -> DataFrame:
        """Run one atomic Spark SQL statement (datasource/delta.py:30-41)."""
        if ";" in query.rstrip().rstrip(";"):
            raise ValueError("sql() accepts a single atomic statement (no ';')")
        return self._execute_statement(query)

    def sql_script(self, script: str) -> DataFrame | None:
        """Run a ';'-separated SQL script sequentially; returns the last
        statement's DataFrame (None for an empty script). Opt-in for
        lifecycle hooks via the endpoint's ``sql_scripts: true`` config
        flag — the default hook contract stays atomic, matching the
        reference (datasource/delta.py:30-41)."""
        result: DataFrame | None = None
        for stmt in split_sql_statements(script):
            result = self._execute_statement(stmt)
        return result

    @abstractmethod
    def read(self, ref: TableRef) -> DataFrame:
        """Scan a table or path (datasource/delta.py:43-60)."""

    # -- writes --------------------------------------------------------
    @abstractmethod
    def append(self, df: DataFrame, ref: TableRef) -> None:
        ...

    @abstractmethod
    def overwrite(self, df: DataFrame, ref: TableRef, replace_where: str | None = None) -> None:
        """Full overwrite, or partition-scoped when ``replace_where`` given."""

    @abstractmethod
    def merge(self, df: DataFrame, ref: TableRef, spec: MergeSpec) -> None:
        ...

    @abstractmethod
    def truncate(self, ref: TableRef) -> None:
        ...

    @abstractmethod
    def delete(self, ref: TableRef, predicate: str) -> None:
        """ANSI DELETE semantics: remove rows where ``predicate`` is
        TRUE; rows where it is FALSE or NULL survive (W7 extension —
        the reference stops at update/upsert)."""

    def compact(self, ref: TableRef, target_files: int | None = None) -> int:
        """Small-file compaction (the OPTIMIZE analogue for plain
        formats): rewrite the relation into ``target_files`` files
        (default: sized from input bytes at ~128 MB/file). Returns the
        target file count. At 100 TB run per-partition, not
        table-wide."""
        import math

        df = self.read(ref)
        if target_files is None:
            jvm = self.spark._jvm
            conf = self.spark._jsc.hadoopConfiguration()
            nbytes = 0
            for f in df.inputFiles():
                p = jvm.org.apache.hadoop.fs.Path(f)
                nbytes += p.getFileSystem(conf).getFileStatus(p).getLen()
            target_files = max(1, math.ceil(nbytes / (128 << 20)))
        self._compact_rewrite(df.repartition(target_files), ref)
        return target_files

    def _compact_rewrite(self, df: DataFrame, ref: TableRef) -> None:
        self.overwrite(df, ref)

    # -- metadata ------------------------------------------------------
    @abstractmethod
    def partition_columns(self, ref: TableRef) -> list[str]:
        """Partition column names, [] when unpartitioned."""

    def table_exists(self, ref: TableRef) -> bool:
        if ref.is_path:
            try:
                self.read(ref)
                return True
            except Exception:
                return False
        return self.spark.catalog.tableExists(ref.table)  # type: ignore[arg-type]
