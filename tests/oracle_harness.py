"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a Spark query and its DuckDB oracle SQL on the same parquet
tables, then compares row count + sorted-column value sets. Values are
canonicalized conservatively (exact float repr — no tolerance), so a
query that passes here should hash-match any reasonable driver
implementation.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import numpy as np

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        if f == int(f) and abs(f) < 1e15:
            return f"num:{int(f)}"
        return f"num:{f!r}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return f"num:{int(v)}"
    if isinstance(v, (np.bool_, bool)):
        return f"bool:{bool(v)}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    return f"s:{v}"


def canonical_rows(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows), cols


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "query"):
    """Return (ok, message)."""
    spark_pdf = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        duck_pdf = con.sql(oracle_sql).df()
    finally:
        con.close()

    if len(spark_pdf) != len(duck_pdf):
        return False, f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    s_cols = sorted(spark_pdf.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return False, f"{name}: columns {s_cols} != {d_cols}"

    s_rows, _ = canonical_rows(spark_pdf)
    d_rows, _ = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diffs = [
            f"  spark={sr}\n  duck ={dr}"
            for sr, dr in zip(s_rows, d_rows)
            if sr != dr
        ][:5]
        only_s = [r for r in s_rows if r not in set(d_rows)][:3]
        only_d = [r for r in d_rows if r not in set(s_rows)][:3]
        return False, (
            f"{name}: value mismatch (cols={s_cols})\n"
            + "\n".join(diffs)
            + f"\n  only-spark={only_s}\n  only-duck={only_d}"
        )
    return True, f"{name}: OK ({len(spark_pdf)} rows)"
