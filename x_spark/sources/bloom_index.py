"""File-level Bloom-filter data skipping for txlog tables.

Footer min/max stats (``txlog._files_overlapping_keys``) and Z-order /
Hilbert clustering (``operators/zorder.py``) prune RANGE predicates;
they are blind to point lookups over values that are clustered per
file but scattered across the value range — the classic "which ingest
batch holds user X" shape, where every file's min/max spans the whole
key space. Delta Lake answers this with per-file Bloom filter indexes
(reference parity: the reference's delta datasource delegates exactly
this to Delta — ``datasource/delta.py``); this module is the txlog
equivalent, written as a log-free sidecar exactly like Delta's
``_delta_index`` companion files.

Design:

- ``build_bloom_index`` scans the CURRENT snapshot once, distributed:
  the indexed column is hashed JVM-side (md5-prefix ``hash32`` — the
  same portable hash family the text Bloom uses), each value fans out
  to k probe positions, and the (file, word) bitmap is bit_or-reduced
  in ONE aggregation. The driver collects only the filters themselves
  (``m_bits/64`` longs per file — 512 B at the default m=4096, i.e.
  ~5 MB for a 10k-file table).
- The index is a JSON sidecar under ``<table>/_index/`` stamped with
  the snapshot version it indexed. It is advisory metadata, never read
  by the transactional core: files ADDED after the index was built are
  absent from it and therefore always candidates (safe), files REMOVED
  are simply ignored, and a concurrent writer can at worst make the
  index conservative, never wrong.
- ``bloom_prune``/``read_where_in`` probe the filter DRIVER-side (pure
  Python md5 on the lookup values — position-for-position identical to
  the JVM build expression, pinned by test) and hand the surviving
  file list to the snapshot reader; the exact predicate still runs on
  the survivors, so false positives cost I/O, never correctness.

Only string and integer columns are indexable: the probe recomputes
Spark's ``CAST(col AS STRING)`` in Python, and those are the types
whose rendering is identical in both runtimes (floats/decimals are
not — and are range-shaped anyway, which min/max already serves).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType, StringType

from x_spark.errors import DataSourceException
from x_spark.operators.text import BLOOM_PROBES, _bloom_positions
from x_spark.sources.base import TableRef
from x_spark.sources.txlog import TxLogDataSource, resolve_snapshot

# Default filter size. Size for the per-FILE distinct cardinality:
# ~10 bits per expected distinct value keeps the false-positive rate
# ~1%; an undersized filter saturates and degrades (gracefully) toward
# no pruning. 4096 bits serves ~400 distinct values per file.
BLOOM_INDEX_BITS = 4096  # 64 longs / 512 B per file

_INDEXABLE = (StringType, ByteType, ShortType, IntegerType, LongType)


def _index_dir(table: str) -> str:
    return os.path.join(table, "_index")


def _index_path(table: str, column: str, version: int) -> str:
    return os.path.join(_index_dir(table), f"bloom-{column}-v{version:020d}.json")


def _latest_index(table: str, column: str) -> dict | None:
    d = _index_dir(table)
    if not os.path.isdir(d):
        return None
    names = sorted(n for n in os.listdir(d)
                   if n.startswith(f"bloom-{column}-v") and n.endswith(".json"))
    if not names:
        return None
    with open(os.path.join(d, names[-1])) as fh:
        return json.load(fh)


def _probe_positions(value, m_bits: int) -> list[int]:
    """Driver-side replica of ``_bloom_positions`` over ``hash32``:
    int(md5(str(value))[:8], 16) then the affine probes. Must stay
    expression-identical to the JVM build side (pinned by test)."""
    gh = int(hashlib.md5(str(value).encode()).hexdigest()[:8], 16)
    return [((gh * a + b) % 4294967291) % m_bits for a, b in BLOOM_PROBES]


def _might_contain(words: list[int], value, m_bits: int) -> bool:
    for p in _probe_positions(value, m_bits):
        if not (words[p // 64] >> (p % 64)) & 1:
            return False
    return True


def build_bloom_index(
    ds: TxLogDataSource,
    ref: TableRef,
    column: str,
    m_bits: int = BLOOM_INDEX_BITS,
) -> dict:
    """Build (or rebuild) the Bloom sidecar for ``column`` over the
    current snapshot. Returns a summary dict
    ``{column, snapshot_version, n_files, m_bits}``."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    table = ds._table_path(ref)
    snap = resolve_snapshot(table)
    if snap is None:
        raise DataSourceException(f"txlog table {table!r} does not exist")
    dtype = next((f.dataType for f in snap.schema.fields if f.name == column), None)
    if dtype is None:
        raise DataSourceException(f"column {column!r} not in {table!r}")
    if not isinstance(dtype, _INDEXABLE):
        raise DataSourceException(
            f"bloom index needs a string/integer column, got {dtype.simpleString()}"
        )
    rels = sorted(snap.files)
    files: dict[str, list[int]] = {rel: [0] * (m_bits // 64) for rel in rels}
    if rels:
        gh = F.conv(
            F.substring(F.md5(F.col(column).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        pos_union = ", ".join(_bloom_positions("gh", m_bits))
        rows = (
            ds._read_snapshot(table, snap)
            .filter(F.col(column).isNotNull())
            .select(F.input_file_name().alias("f"), gh.alias("gh"))
            .select("f", F.explode(F.expr(f"array({pos_union})")).alias("pos"))
            .groupBy("f", (F.col("pos") / 64).cast("int").alias("widx"))
            .agg(F.expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").alias("word"))
            .collect()
        )
        # input_file_name is a percent-encoded file URI; decode it to
        # the filesystem path for a direct dict hit. An unmappable URI
        # must FAIL the build: silently skipping it would leave that
        # file's all-zero bitmap in the index, which reads as
        # "contains nothing" — a false-NEGATIVE prune. (All-zero is
        # legitimate only for files whose indexed column is all NULL.)
        from urllib.parse import unquote, urlparse

        by_path = {os.path.join(table, rel): rel for rel in rels}
        for r in rows:
            parsed = urlparse(r["f"])
            path = unquote(parsed.path) if parsed.scheme else r["f"]
            rel = by_path.get(path) or next(
                (v for k, v in by_path.items() if path.endswith(k)), None
            )
            if rel is None:
                raise DataSourceException(
                    f"bloom index build could not map scanned file {r['f']!r} "
                    f"back to a snapshot path of {table!r} — refusing to "
                    "write an index that would prune it as empty"
                )
            files[rel][r["widx"]] = r["word"]
    idx = {
        "column": column,
        "m_bits": m_bits,
        "snapshot_version": snap.version,
        "files": files,
    }
    os.makedirs(_index_dir(table), exist_ok=True)
    tmp = _index_path(table, column, snap.version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(idx, fh)
    os.replace(tmp, _index_path(table, column, snap.version))
    return {
        "column": column,
        "snapshot_version": snap.version,
        "n_files": len(rels),
        "m_bits": m_bits,
    }


def bloom_prune(
    ds: TxLogDataSource,
    ref: TableRef,
    column: str,
    values: list,
) -> tuple[list[str], int]:
    """(surviving relpaths, total live files) for an IN-list lookup.
    Files unknown to the index (added after the build, or no index at
    all) are always candidates — pruning is advisory, never lossy."""
    table = ds._table_path(ref)
    snap = resolve_snapshot(table)
    if snap is None:
        raise DataSourceException(f"txlog table {table!r} does not exist")
    rels = sorted(snap.files)
    idx = _latest_index(table, column)
    if idx is None or not values:
        return rels, len(rels)
    m_bits = idx["m_bits"]
    kept = []
    for rel in rels:
        words = idx["files"].get(rel)
        if words is None or any(_might_contain(words, v, m_bits) for v in values):
            kept.append(rel)
    return kept, len(rels)


def read_where_in(
    ds: TxLogDataSource,
    ref: TableRef,
    column: str,
    values: list,
) -> DataFrame:
    """Snapshot read of rows where ``column IN values``, scanning only
    the Bloom survivors. The exact IN predicate still applies — false
    positives cost I/O, never rows."""
    table = ds._table_path(ref)
    snap = resolve_snapshot(table)
    if snap is None:
        raise DataSourceException(f"txlog table {table!r} does not exist")
    kept, _total = bloom_prune(ds, ref, column, values)
    return ds._read_snapshot(table, snap, kept).filter(F.col(column).isin(values))
