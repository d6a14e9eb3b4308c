"""Transaction-logged parquet tables ("txlog"): atomic commits,
snapshot isolation, time travel, file-level data skipping.

The reference's entire storage layer is Delta
(reference ``datasource/delta.py:5`` imports ``delta.tables``;
``etl/overwrite.py:56-70`` relies on replaceWhere). delta-spark cannot
be installed in this environment, so the parquet connector emulates
Delta's *observable* semantics (proven by
``tests/test_delta_conformance.py``). This module goes one level
deeper and implements the transactional *mechanics* themselves, in the
shape of the public Delta transaction-log protocol (versioned JSON
action files; add/remove file actions) without any Delta code:

- **Atomic commits** — a table version is exactly one JSON file in
  ``<table>/_txlog/``, created with ``O_CREAT|O_EXCL``. A commit either
  fully exists or doesn't; a crashed writer leaves only orphaned data
  files (cleaned by :meth:`TxLogDataSource.vacuum`), never a
  half-visible table state. Contrast the parquet connector's staged
  rewrite, where overwrite is a window of missing data.
- **Snapshot isolation** — a read resolves the live file set from the
  log once; concurrent commits never shift a running query's input.
- **Time travel** — ``TableRef(path=p, options={"versionAsOf": "3"})``.
- **File-level operations** — append only adds files; MERGE/DELETE
  rewrite only files whose footer min/max statistics (collected at
  write time via pyarrow) or partition values can contain affected
  rows — the data-skipping behavior that makes MERGE sub-linear in
  table size. Untouched files are never read or written.
- **Optimistic concurrency** — version-file collision means another
  writer won; appends (commutative) re-resolve and retry, while
  read-modify-write commits abort with
  :class:`ConcurrentWriteException`.

Scale notes (100 TB): log replay is O(commits) JSON files; a
checkpoint (full live-set snapshot) is written every
``CHECKPOINT_INTERVAL`` commits and readers replay only the suffix.
Filesystem ops use ``os``/``shutil`` (single-node container); on a
cluster they map 1:1 onto the object-store/Hadoop FS API — the commit
primitive (create-exclusive) is exactly what object stores offer as
put-if-absent.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import shutil
import uuid
from collections.abc import Mapping

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructField, StructType

from x_spark.errors import DataSourceException, ETLJobException
from x_spark.sources.base import BaseDataSource, MergeSpec, TableRef

LOG_DIR = "_txlog"
CHECKPOINT_INTERVAL = 20
# live sets at or above this size checkpoint their adds as a parquet
# sidecar instead of inline JSON (see _write_checkpoint / LazyAdds)
CHECKPOINT_PARQUET_MIN = 256
# commits carrying at least this many add actions write them as a
# parquet BATCH sidecar referenced by one addBatch action instead of
# N JSON lines — the multi-part-checkpoint idea applied to the TAIL,
# so replaying a huge write between checkpoints is a lazy columnar
# scan, never a driver-side JSON parse loop (see _commit / LazyAdds)
COMMIT_PARQUET_MIN = 256
# COPY INTO ledgers holding more rows than this stop materializing on
# the driver: the already-loaded set-difference becomes a distributed
# left-anti join (see _copy_new_files)
COPY_LEDGER_DRIVER_MAX = 100_000
# publishes staging at least this many files collect their parquet
# footer stats EXECUTOR-side (parallelize + per-file footer read)
# instead of a driver loop (see _collect_footer_stats)
FOOTER_STATS_DISTRIBUTED_MIN = 64
# liquid-clustering table properties: clusterBy names the layout
# columns (JSON list), clusterBy.strategy the curve (default range);
# ingest then auto-maintains the layout (see _maybe_auto_cluster)
CLUSTER_BY_KEY = "clusterBy"
CLUSTER_STRATEGY_KEY = "clusterBy.strategy"

# Deletion vectors (Delta's merge-on-read soft deletes): when a table
# sets this configuration key to "true", DELETE masks rows instead of
# rewriting files — each affected file's add action gains a ``dv``
# field {"path": <sidecar dir>, "cardinality": <masked rows>} pointing
# at a parquet directory of (file_name, row_index) mask rows, and every
# reader left-anti joins the mask via the parquet ``_metadata.row_index``
# column. The dv field rides ON the add action, so checkpoints, RESTORE,
# CLONE and time travel carry mask state with zero extra machinery.
DV_ENABLE_KEY = "enableDeletionVectors"
ROW_TRACKING_KEY = "enableRowTracking"
# physical carry columns a preserving rewrite materializes into its
# parquet files: a row's stable id, and its last-modified commit
# version when it differs from the new file's default. Never part of
# the logical schema; the pinned-schema readers' explicit schemas
# simply do not select them.
ROW_ID_COL = "_x_row_id"
ROW_RCV_COL = "_x_rcv"
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# Change data feed (Delta's delta.enableChangeDataFeed): with the
# property set, UPDATE / MERGE / copy-on-write DELETE additionally
# write their exact change rows — stamped update_preimage /
# update_postimage / insert / delete — as parquet under
# ``_change_data/`` and reference them with ``cdc`` actions in the
# same commit (Delta's cdc action). CDF readers then serve a commit
# FROM its cdc files when present (row-exact, Delta's 4-type
# contract) and fall back to the file-granular add/remove/mask-delta
# derivation otherwise — which remains always available (a superset
# of Delta, whose CDF refuses without the property).
CDF_ENABLE_KEY = "enableChangeDataFeed"
CDC_DIR = "_change_data"

# Column mapping (Delta's columnMapping.mode = "name"): data files
# store columns under stable PHYSICAL names (StructField metadata key
# below, stamped physical=logical at enablement, col-<uuid> for columns
# added afterwards) while the schema's field names stay the user-facing
# LOGICAL names. RENAME COLUMN then only edits the logical name and
# DROP COLUMN only removes the field — both metadata-only commits that
# never touch a data file, which is the difference between O(1) and a
# 100-TB rewrite. A re-added column gets a FRESH physical name, so
# dropped data can never resurrect (Delta semantics). Translation
# happens at exactly two choke points: ``_write_files`` renames
# logical->physical before the parquet write (add actions keep
# PHYSICAL-keyed partitionValues/stats — rename-stable, so a file
# written years before a rename still prunes), and the pinned-schema
# readers scan with the physical schema and alias back. Metadata
# consumers translate logical->physical at lookup. Tables that never
# enable mapping use identity names and pay nothing.
COLUMN_MAPPING_KEY = "columnMapping.mode"
PHYSICAL_NAME_KEY = "x_spark.columnMapping.physicalName"


def _physical_name(field: StructField) -> str:
    return (field.metadata or {}).get(PHYSICAL_NAME_KEY, field.name)


def _physical_map(schema: StructType) -> dict[str, str]:
    """logical -> physical column name (identity when unstamped)."""
    return {f.name: _physical_name(f) for f in schema.fields}


def _physical_schema(schema: StructType) -> StructType:
    """The schema as it lives in data files: physical field names."""
    return StructType([
        StructField(_physical_name(f), f.dataType, f.nullable)
        for f in schema.fields
    ])


def _fresh_physical() -> str:
    return f"col-{uuid.uuid4().hex[:12]}"


def _commit_timestamp_ms(path: str) -> int | None:
    """The in-commit timestamp (epoch ms) of a commit file, None for
    pre-ICT commits. The commitInfo action is written LAST, so the
    scan reads the tail line first."""
    try:
        with open(path) as fh:
            lines = fh.readlines()
    except OSError:
        return None
    for line in reversed(lines):
        try:
            info = json.loads(line).get("commitInfo")
        except json.JSONDecodeError:
            continue
        if info is not None:
            ts = info.get("timestamp")
            return int(ts) if ts is not None else None
    return None


def _is_widening(frm, to) -> bool:
    """True when values written as ``frm`` can be read through a table
    schema pinned at ``to`` by Spark's parquet reader with no rewrite
    (Delta's type-widening matrix, each cell verified against Spark
    4.1: integral upcasts byte<short<int<long, float->double,
    byte/short/int->double (long->double is lossy past 2^53 and
    refused), integral->decimal with enough integer digits, and
    decimal growth that never shrinks scale or integer digits)."""
    from pyspark.sql.types import (
        ByteType, DecimalType, DoubleType, FloatType, IntegerType,
        LongType, ShortType,
    )

    order = [ByteType, ShortType, IntegerType, LongType]
    if type(frm) in order and type(to) in order:
        return order.index(type(frm)) < order.index(type(to))
    if isinstance(frm, FloatType) and isinstance(to, DoubleType):
        return True
    if type(frm) in (ByteType, ShortType, IntegerType) \
            and isinstance(to, DoubleType):
        return True
    digits = {ByteType: 3, ShortType: 5, IntegerType: 10, LongType: 19}
    if type(frm) in digits and isinstance(to, DecimalType):
        return to.precision - to.scale >= digits[type(frm)]
    if isinstance(frm, DecimalType) and isinstance(to, DecimalType):
        return (
            to.scale >= frm.scale
            and to.precision - to.scale >= frm.precision - frm.scale
            and (to.precision, to.scale) != (frm.precision, frm.scale)
        )
    return False


def _stamp_physical(new_schema: StructType, old_schema: StructType,
                    configuration: dict[str, str]) -> StructType:
    """Physical-name stamping for a schema REPLACEMENT under column
    mapping: a column whose logical name survives keeps its stable
    physical name (old files keep binding); a brand-new column gets a
    FRESH one (a previously dropped column of the same name can never
    resurrect). Identity when mapping is off."""
    if (configuration or {}).get(COLUMN_MAPPING_KEY) != "name":
        return new_schema
    old = {f.name: _physical_name(f) for f in old_schema.fields}
    return StructType([
        StructField(
            f.name, f.dataType, f.nullable,
            {**(f.metadata or {}),
             PHYSICAL_NAME_KEY: old.get(f.name, _fresh_physical())},
        )
        for f in new_schema.fields
    ])


class ConcurrentWriteException(DataSourceException):
    """Another writer committed the version this transaction targeted
    and the operation is not commutative (read-modify-write)."""


class TxnAlreadyCommittedException(ConcurrentWriteException):
    """A commit stamped with the same ``txnAppId`` and a transaction
    version >= the incoming one is already durable — the write being
    attempted is a replay (Delta's SetTransaction conflict). The caller
    should treat the work as done, not retry."""


# ---------------------------------------------------------------------------
# snapshot model


class Snapshot:
    """Resolved table state at one version: schema, partitioning,
    table configuration (constraints live under ``constraint.<name>``
    keys, Delta's convention), and the live file set (relative path ->
    add-action dict)."""

    def __init__(self, version: int, schema_json: str, partition_cols: list[str],
                 files: dict[str, dict],
                 configuration: dict[str, str] | None = None,
                 row_id_high: int = -1):
        self.version = version
        self.schema_json = schema_json
        self.partition_cols = partition_cols
        self.files = files
        self.configuration = dict(configuration or {})
        # row tracking: highest row id ever assigned (-1 = none);
        # replayed from rowIdHighWaterMark actions / checkpoints
        self.row_id_high = row_id_high

    @property
    def constraints(self) -> dict[str, str]:
        """name -> CHECK expression, from ``constraint.<name>`` keys."""
        return {
            k[len("constraint."):]: v
            for k, v in self.configuration.items()
            if k.startswith("constraint.")
        }

    @property
    def generated(self) -> dict[str, str]:
        """col -> generation expression, from ``generated.<col>`` keys
        (Delta's generated-columns convention)."""
        return {
            k[len("generated."):]: v
            for k, v in self.configuration.items()
            if k.startswith("generated.")
        }

    @property
    def defaults(self) -> dict[str, str]:
        """col -> DEFAULT expression SQL, from ``default.<col>`` keys
        (Delta's allowColumnDefaults convention): an insert-shaped
        write that OMITS the column fills it with the expression
        instead of NULL. Constant expressions only (validated at DDL
        time); an explicitly provided NULL stays NULL."""
        return {
            k[len("default."):]: v
            for k, v in self.configuration.items()
            if k.startswith("default.")
        }

    @property
    def identity(self) -> dict[str, dict]:
        """col -> {start, step, high} from ``identity.<col>`` keys
        (GENERATED ALWAYS AS IDENTITY). ``high`` is the last allocated
        value (start - step before any allocation)."""
        return {
            k[len("identity."):]: json.loads(v)
            for k, v in self.configuration.items()
            if k.startswith("identity.")
        }

    @property
    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self.schema_json))


def _contains_map(dt) -> bool:
    """True when a MapType occurs anywhere in the type tree — the one
    Spark type eqNullSafe/comparisons cannot order (maps are unordered
    by definition), so whole-row struct comparisons must be avoided."""
    from pyspark.sql.types import ArrayType, MapType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    return False


def _log_path(table: str) -> str:
    return os.path.join(table, LOG_DIR)


def _version_of(fname: str) -> int:
    return int(fname.split(".", 1)[0])


def _conform(df: DataFrame, schema: StructType) -> DataFrame:
    """Resolve a write's columns against the table schema by NAME with
    Delta's assignment cast (a NULL-typed ``null as c`` literal or a
    compatible numeric narrows/widens; a missing column is a hard
    error via the unresolved reference)."""
    return df.select(*[
        F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields
    ])


def _strip_sql_literals(expr: str) -> str:
    """Blank out single/double-quoted literal contents so keyword
    scans never match text inside strings ('now' stays a value)."""
    import re

    return re.sub(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"", "''", expr)


def _normalize_ident(ident: str) -> str:
    """``` `db` . `tbl` ``` -> ``db.tbl`` (strip backticks/whitespace)."""
    import re

    parts = re.findall(r"`[^`]+`|[A-Za-z_]\w*", ident)
    return ".".join(p[1:-1] if p.startswith("`") else p for p in parts)


def _parse_update_statement(stmt: str):
    """``UPDATE t SET c1 = e1, c2 = e2 [WHERE pred]`` ->
    (normalized target, {col: expr}, predicate) or None. The SET list
    is split on TOP-LEVEL commas (a scanner tracking paren depth and
    string literals — ``SET note = concat(a, ',', b)`` must stay one
    assignment) and the WHERE keyword is matched only at top level."""
    import re

    ident = r"((?:`[^`]+`|[A-Za-z_]\w*)(?:\s*\.\s*(?:`[^`]+`|[A-Za-z_]\w*))*)"
    m = re.match(rf"\s*update\s+{ident}\s+set\s+", stmt, re.I)
    if not m:
        return None
    rest = stmt.rstrip().rstrip(";")[m.end():]

    def structural(s: str) -> set[int]:
        """Indices at paren depth 0 OUTSIDE string literals. Both
        quote styles count (Spark treats double-quoted tokens as
        string literals by default) and a doubled quote escapes
        inside its own literal ('it''s', "a""b")."""
        out: set[int] = set()
        depth, quote, i = 0, None, 0
        while i < len(s):
            ch = s[i]
            if quote:
                if ch == quote:
                    if i + 1 < len(s) and s[i + 1] == quote:
                        i += 1  # doubled-quote escape stays inside
                    else:
                        quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0:
                out.add(i)
            i += 1
        return out

    top = structural(rest)
    where_at = None
    for i in sorted(top):
        if (rest[i:i + 5].lower() == "where"
                and all(k in top for k in range(i, min(i + 5, len(rest))))
                and (i == 0 or not (rest[i - 1].isalnum()
                                    or rest[i - 1] == "_"))
                and (i + 5 == len(rest)
                     or not (rest[i + 5].isalnum()
                             or rest[i + 5] == "_"))):
            where_at = i
            break
    set_part = rest[:where_at] if where_at is not None else rest
    predicate = (rest[where_at + 5:].strip()
                 if where_at is not None else "TRUE")
    set_top = structural(set_part)
    parts, start = [], 0
    for j, ch in enumerate(set_part):
        if ch == "," and j in set_top:
            parts.append(set_part[start:j])
            start = j + 1
    if set_part[start:]:
        parts.append(set_part[start:])
    assignments: dict[str, str] = {}
    for p in parts:
        pm = re.match(r"\s*(`[^`]+`|\w+)\s*=\s*(.+?)\s*$", p, re.S)
        if not pm:
            return None
        assignments[pm.group(1).strip("`")] = pm.group(2)
    if not assignments:
        return None
    return _normalize_ident(m.group(1)), assignments, predicate


def _stat_sidecar_kind(declared) -> str | None:
    """Arrow carrier kind for a column's min/max in the TYPED sidecar:
    ``int`` (integral types), ``float`` (float/double), ``str``
    (string, plus the types whose footer stats JSON-serialize as
    strings: date/timestamp/decimal — lexicographic order matches for
    the ISO shapes, exact re-parse for decimal). None = the type never
    participates in stats pruning (bool, binary, nested)."""
    from pyspark.sql.types import (  # noqa: PLC0415
        ByteType, DateType, DecimalType, DoubleType, FloatType,
        IntegerType, LongType, ShortType, StringType, TimestampNTZType,
        TimestampType,
    )

    if isinstance(declared, (ByteType, ShortType, IntegerType, LongType)):
        return "int"
    if isinstance(declared, (FloatType, DoubleType)):
        return "float"
    if isinstance(declared, (StringType, DateType, TimestampType,
                             TimestampNTZType, DecimalType)):
        return "str"
    return None


def _typed_stat(kind: str, raw):
    """A replayed stat value coerced onto its sidecar carrier kind;
    None when the stored kind cannot soundly carry (a mismatched kind
    must never prune — the same conservatism as _stats_exclude's
    stored-kind gate, enforced once at extraction)."""
    if raw is None or isinstance(raw, bool):
        return None
    if kind == "int":
        return raw if isinstance(raw, int) else None
    if kind == "float":
        return float(raw) if isinstance(raw, (int, float)) else None
    if isinstance(raw, str):
        return raw
    # an in-memory (not yet JSON-roundtripped) date/timestamp/decimal:
    # serialize exactly the way json.dumps(default=str) would
    import datetime  # noqa: PLC0415
    from decimal import Decimal  # noqa: PLC0415

    if isinstance(raw, (datetime.date, datetime.datetime, Decimal)):
        return str(raw)
    return None


def _sidecar_arrow_fields(schema, partition_cols: list[str]) -> list:
    """(name, arrow type) for the TYPED sidecar layout of the CURRENT
    table schema — the target layout both the from-dicts builder and
    the incremental columnar refresh align to."""
    import pyarrow as pa  # noqa: PLC0415

    pmap = _physical_map(schema)
    pa_kind = {"int": pa.int64(), "float": pa.float64(),
               "str": pa.string()}
    fields = [
        ("path", pa.string()), ("size", pa.int64()),
        ("num_records", pa.int64()), ("dv_json", pa.string()),
        ("clustered_by", pa.string()),
    ]
    for c in partition_cols:
        fields.append((f"pv::{pmap.get(c, c)}", pa.string()))
    for f in schema.fields:
        k = _stat_sidecar_kind(f.dataType)
        if k is None:
            continue
        phys = pmap.get(f.name, f.name)
        fields.append((f"min::{phys}", pa_kind[k]))
        fields.append((f"max::{phys}", pa_kind[k]))
    fields.append(("add_json", pa.string()))
    return fields


def _publish_adds_sidecar(dest: str, adds: list[dict], schema,
                          partition_cols: list[str]) -> None:
    """Write a TYPED adds sidecar (checkpoint or commit batch) to
    ``dest`` via tmp+rename: typed columns alongside the lossless
    ``add_json`` (replay truth) — the metadata plane (candidate
    pruning, pv matching, file counts) reads just the columns it
    needs (column-pruned, vectorizable, distributable via
    ``spark.read.parquet`` when the driver outgrows it) and never
    deserializes an add. This is Delta's stats_parsed /
    partitionValues_parsed checkpoint design."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    tmp = dest + f".tmp-{uuid.uuid4().hex}"
    pq.write_table(_adds_arrow_table(adds, schema, partition_cols), tmp)
    os.replace(tmp, dest)


def _adds_arrow_table(adds: list[dict], schema,
                      partition_cols: list[str]):
    """The TYPED sidecar pyarrow table for a list of parsed add
    dicts (see :func:`_publish_adds_sidecar`)."""
    import pyarrow as pa  # noqa: PLC0415

    pmap = _physical_map(schema)
    pa_kind = {"int": pa.int64(), "float": pa.float64(),
               "str": pa.string()}
    cols: dict = {
        "path": pa.array([a["path"] for a in adds], pa.string()),
        "size": pa.array(
            [None if a.get("size") is None else int(a["size"])
             for a in adds], pa.int64()),
        "num_records": pa.array(
            [None if a.get("numRecords") is None
             else int(a["numRecords"]) for a in adds],
            pa.int64()),
        # the scan plane's one per-file need besides the path:
        # the deletion-vector pointer (null = plain scan)
        "dv_json": pa.array(
            [json.dumps(a["dv"]) if a.get("dv") else None
             for a in adds], pa.string()),
        # liquid-clustering stamp: incremental cluster passes
        # and the auto-cluster trigger count debt from it
        "clustered_by": pa.array(
            [json.dumps(a["clusteredBy"], sort_keys=True)
             if a.get("clusteredBy") else None
             for a in adds], pa.string()),
    }
    for c in partition_cols:
        phys = pmap.get(c, c)
        cols[f"pv::{phys}"] = pa.array(
            [(lambda v: None if v is None else str(v))(
                (a.get("partitionValues") or {}).get(phys))
             for a in adds], pa.string())
    for f in schema.fields:
        k = _stat_sidecar_kind(f.dataType)
        if k is None:
            continue
        phys = pmap.get(f.name, f.name)
        for bound, key in (("min", "minValues"),
                           ("max", "maxValues")):
            cols[f"{bound}::{phys}"] = pa.array(
                [_typed_stat(
                    k, ((a.get("stats") or {}).get(key) or {})
                    .get(phys)) for a in adds], pa_kind[k])
    cols["add_json"] = pa.array(
        [json.dumps(a, default=str) for a in adds], pa.string())
    return pa.table(cols)


def _refresh_typed_sidecar(lazy: "LazyAdds", schema,
                           partition_cols: list[str],
                           dest: str) -> int:
    """Write the NEXT checkpoint's adds sidecar by COLUMNAR refresh of
    a typed layered live set: previous sidecar(s) filter out rows
    superseded by later layers (arrow is_in mask — no JSON touched),
    only the tail's small-commit delta adds serialize fresh, and the
    result concatenates + sorts arrow-side. The every-20th-commit
    checkpoint on a million-file table therefore costs O(tail changes
    + columnar copy), never O(live set) driver-side json.loads —
    the incremental-checkpoint idea applied to stats_parsed. Returns
    the row count written; output is row-equivalent to the from-dicts
    builder (parity-pinned by tests/test_commit_batch.py)."""
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.compute as pc  # noqa: PLC0415
    import pyarrow.parquet as pq  # noqa: PLC0415

    layers = lazy._layers
    # kill-set per layer: paths any LATER layer adds/removes supersede
    kills: list[set[str]] = [set() for _ in layers]
    later: set[str] = set()
    sidecar_paths: dict[int, list[str]] = {}
    for i in range(len(layers) - 1, -1, -1):
        kills[i] = set(later)
        kind, payload = layers[i]
        if kind == "sidecar":
            ps = lazy._read_one(payload, ["path"]).column(
                "path").to_pylist()
            sidecar_paths[i] = ps
            later.update(ps)
        else:
            later.update(payload.keys())

    target = _sidecar_arrow_fields(schema, partition_cols)

    def align(t):
        """``t`` reshaped onto the target layout: missing columns
        null-fill (a column the old sidecar predates never prunes),
        extra columns drop (stats of since-dropped logical columns),
        kind changes cast (type widening, e.g. int -> double)."""
        cols = []
        for name, typ in target:
            if name in t.column_names:
                cols.append(pc.cast(t.column(name), typ))
            else:
                cols.append(pa.nulls(t.num_rows, typ))
        return pa.table(dict(zip((n for n, _ in target), cols)))

    chunks = []
    for i, (kind, payload) in enumerate(layers):
        if kind == "sidecar":
            t = lazy._read_one(payload, None)
            if kills[i] & set(sidecar_paths[i]):
                mask = pc.invert(pc.is_in(
                    t.column("path"),
                    value_set=pa.array(sorted(kills[i]), pa.string()),
                ))
                t = t.filter(mask)
            chunks.append(align(t))
        else:
            adds = [a for p, a in payload.items()
                    if a is not None and p not in kills[i]]
            if adds:
                chunks.append(align(
                    _adds_arrow_table(adds, schema, partition_cols)
                ))
    if chunks:
        out = pa.concat_tables(chunks).sort_by("path")
    else:
        out = _adds_arrow_table([], schema, partition_cols)
    tmp = dest + f".tmp-{uuid.uuid4().hex}"
    pq.write_table(out, tmp)
    os.replace(tmp, dest)
    return out.num_rows


def _footer_stats_of(path: str) -> tuple[int, dict]:
    """(row count, {minValues, maxValues}) from the parquet footer —
    collected once at write time, used for merge/delete file skipping.
    Non-primitive and statless columns are omitted (consumers treat a
    missing bound as 'could match'). Module-level and self-contained
    so large publishes can run it EXECUTOR-side (cloudpickled by
    reference into a mapPartitions over the staged file list)."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            name = col.path_in_schema
            if "." in name:  # nested: no row-level skipping
                continue
            try:
                lo, hi = st.min, st.max
            except Exception:
                # pyarrow raises ArrowNotImplementedError for
                # types it cannot extract (DECIMAL statistics) —
                # has_min_max alone does not guarantee access;
                # the column simply gets no skipping bounds
                continue
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    return md.num_rows, {"minValues": mins, "maxValues": maxs}


def _read_batch_adds(table: str, batch: dict) -> list[dict]:
    """The parsed add actions of one ``addBatch`` reference — bulk
    columnar read, for flows that need per-action granularity (CDF,
    streaming admission, vacuum); snapshot resolution instead layers
    the batch lazily through LazyAdds."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    p = os.path.join(_log_path(table), batch["parquet"])
    try:
        rows = pq.read_table(p, columns=["add_json"]).column("add_json")
    except FileNotFoundError as exc:
        raise DataSourceException(
            f"commit batch sidecar {batch['parquet']!r} missing for "
            f"{table!r} — the log directory was partially copied or "
            "externally modified"
        ) from exc
    return [json.loads(s) for s in rows.to_pylist()]


def iter_commit_actions(table: str, fname: str):
    """Yield one commit's actions in order, expanding any ``addBatch``
    parquet reference back into its add actions — the uniform reader
    for per-action consumers (CDF derivation, streaming admission,
    vacuum candidates)."""
    with open(os.path.join(_log_path(table), fname)) as fh:
        for line in fh:
            action = json.loads(line)
            if "addBatch" in action:
                for a in _read_batch_adds(table, action["addBatch"]):
                    yield {"add": a}
            else:
                yield action


# words a predicate may contain that are never column references:
# operators/keywords, literal prefixes, CAST targets. Anything NOT here
# (and not called as a function) must be a partition column for the
# partition-pruning pass to run — see _partition_only_predicate.
_SQL_NONCOLUMN_WORDS = frozenset("""
and or not in is null between like ilike rlike regexp true false
date timestamp timestamp_ntz interval cast as case when then else end
distinct exists all any some escape div
int integer bigint smallint tinyint float double real decimal numeric
string boolean varchar char binary
""".split())


def _partition_only_predicate(predicate: str,
                              partition_cols: list[str]) -> bool:
    """Cheap driver-side pre-check that every column reference in
    ``predicate`` is a partition column. Predicates referencing
    non-partition columns must skip partition-value pruning (correct:
    pruning is an optimization), and deciding that by letting JVM
    analysis fail logs a full ERROR stack trace per occurrence — this
    check keeps a 100-TB job's logs clean on every non-partition
    predicate. Conservative by construction: an identifier that is not
    a keyword, not immediately called as a function, not a number, and
    not a partition column — or any dotted qualifier — returns False
    (no pruning, always sound). A predicate passing this check still
    evaluates under the exception backstop, so a false positive cannot
    mis-prune."""
    parts = {c.lower() for c in partition_cols}
    segs = re.split(r"('(?:[^']|'')*')", predicate)
    for i in range(0, len(segs), 2):
        seg = segs[i]
        for m in re.finditer(r"`([^`]+)`|\b([A-Za-z_]\w*)\b", seg):
            ident = (m.group(1) or m.group(2))
            rest = seg[m.end():].lstrip()
            before = seg[:m.start()].rstrip()
            if before.endswith(".") or rest.startswith("."):
                return False  # qualified name: frame has bare names
            if m.group(2) is not None:
                if rest.startswith("("):
                    continue  # function call
                if ident.lower() in _SQL_NONCOLUMN_WORDS:
                    continue
            if ident.lower() not in parts:
                return False
    return True


class LazyAdds(Mapping):
    """The live file set of a sidecar-backed snapshot, JSON-parse
    deferred. Three access tiers, each touching only what it needs:

    - iteration / ``len`` / ``in`` read the sidecars' ``path`` column
      (no JSON);
    - the metadata plane (:meth:`meta`) reads the TYPED stat columns
      (``min::<phys>`` / ``max::<phys>`` / ``pv::<phys>`` /
      ``num_records`` / ``size``) — a column-pruned parquet read, so
      candidate selection at millions of files never deserializes an
      add action;
    - dict-style value access materializes the full add dicts once
      (bulk ``add_json`` read + json.loads), paid only by flows that
      truly rewrite files.

    The live set is an ordered stack of LAYERS, merged later-wins:
    ``("sidecar", path)`` — a parquet adds sidecar (the checkpoint's,
    or a large commit's batch — Delta's multi-part-checkpoint
    analogue applied to the tail, so a 100k-file write replays as a
    columnar scan, never 100k driver-side json.loads) — and
    ``("delta", {path: add|None})`` — small-commit adds/removes in
    replay order. The tail is bounded by CHECKPOINT_INTERVAL commits,
    so the merge is O(tail sidecars + small-commit actions), never
    O(live set). A pre-typed sidecar (no ``path`` column) degrades
    every lazy tier to the materialized one transparently.

    SNAPSHOT LIFETIME: unlike the old eager parse, a resolved snapshot
    is backed by the sidecar FILEs on disk, so it stays valid only
    while those files exist. clean_log's floor refresh may supersede a
    sidecar, but the superseded file is reaped strictly age-guarded
    (``_reap_log_orphans``: only past ``min_age_sec``, default 600 s) —
    a snapshot is therefore safe for any read shorter than the vacuum
    retention window, the same contract Delta gives data files. Hold a
    snapshot longer than ``min_age_sec`` across a concurrent
    ``clean_log`` and ``_read`` fails loudly (never silently changes).
    """

    def __init__(self, table: str,
                 layers: list[tuple[str, object]]):
        self._table = table
        self._layers = layers
        self._cols: set[str] | None = None
        self._live: list[str] | None = None
        self._live_set: frozenset[str] | None = None
        self._full: dict[str, dict] | None = None
        self._dv: dict[str, dict | None] | None = None

    # -- sidecar IO ----------------------------------------------------
    def _sidecar_paths(self) -> list[str]:
        return [p for kind, p in self._layers if kind == "sidecar"]

    def _read_one(self, sidecar: str, columns: list[str]):
        import pyarrow.parquet as pq  # noqa: PLC0415

        try:
            return pq.read_table(sidecar, columns=columns)
        except FileNotFoundError as exc:
            raise DataSourceException(
                f"adds sidecar "
                f"{os.path.basename(sidecar)!r} missing for "
                f"{self._table!r} — the log directory was partially "
                "copied or externally modified, or this snapshot "
                "outlived clean_log's sidecar retention window "
                "(min_age_sec) across a concurrent clean_log; "
                "re-resolve the snapshot"
            ) from exc

    def sidecar_columns(self) -> set[str]:
        """Column names present in EVERY sidecar layer (footer-only
        reads) — the intersection, so a column one layer predates
        falls back to the materialized tier rather than serving
        part-missing values."""
        if self._cols is None:
            import pyarrow.parquet as pq  # noqa: PLC0415

            cols: set[str] | None = None
            for sidecar in self._sidecar_paths():
                try:
                    names = set(
                        pq.ParquetFile(sidecar).schema_arrow.names
                    )
                except FileNotFoundError as exc:
                    raise DataSourceException(
                        f"adds sidecar "
                        f"{os.path.basename(sidecar)!r} missing for "
                        f"{self._table!r} — the log directory was "
                        "partially copied or externally modified"
                    ) from exc
                cols = names if cols is None else (cols & names)
            self._cols = cols or set()
        return self._cols

    def typed(self) -> bool:
        return "path" in self.sidecar_columns()

    # -- layered merge core ---------------------------------------------
    def _fold(self, sidecar_cols: list[str], sidecar_row, delta_val):
        """Merge the layer stack into ``{path: value}``, later layer
        wins: sidecar layers contribute ``sidecar_row(zipped column
        values)`` per row (columns read column-pruned), delta layers
        ``delta_val(add)`` per surviving add (None = remove)."""
        out: dict[str, object] = {}
        for kind, payload in self._layers:
            if kind == "sidecar":
                t = self._read_one(payload, ["path", *sidecar_cols])
                cols = [t.column(c).to_pylist() for c in sidecar_cols]
                for i, p in enumerate(t.column("path").to_pylist()):
                    out[p] = sidecar_row(*(c[i] for c in cols))
            else:
                for p, a in payload.items():
                    if a is None:
                        out.pop(p, None)
                    else:
                        out[p] = delta_val(a)
        return out

    # -- Mapping protocol ----------------------------------------------
    def _ensure_live(self) -> None:
        if self._live is not None:
            return
        if self.typed():
            alive = self._fold([], lambda: True, lambda a: True)
            live = list(alive)
        else:  # pre-typed sidecar: add_json is the only path source
            live = list(self._materialize())
        self._live = live
        self._live_set = frozenset(live)

    def __iter__(self):
        self._ensure_live()
        return iter(self._live)

    def __len__(self) -> int:
        self._ensure_live()
        return len(self._live)

    def __contains__(self, key) -> bool:
        self._ensure_live()
        return key in self._live_set

    def _materialize(self) -> dict[str, dict]:
        """The fully-parsed add dicts (bulk ``add_json`` read +
        json.loads per sidecar layer, in layer order). Cached: paid
        once, only by flows that truly need every dict. Pre-typed
        sidecars have no ``path`` column — the parsed dict supplies
        the key instead."""
        if self._full is None:
            if self.typed():
                self._full = self._fold(
                    ["add_json"], lambda s: json.loads(s), lambda a: a
                )
            else:
                out: dict[str, dict] = {}
                for kind, payload in self._layers:
                    if kind == "sidecar":
                        col = self._read_one(
                            payload, ["add_json"]
                        ).column("add_json")
                        for s in col.to_pylist():
                            a = json.loads(s)
                            out[a["path"]] = a
                    else:
                        for p, a in payload.items():
                            if a is None:
                                out.pop(p, None)
                            else:
                                out[p] = a
                self._full = out
        return self._full

    def __getitem__(self, key):
        return self._materialize()[key]

    # -- metadata plane ------------------------------------------------
    def field_map(self, col: str, field: str,
                  decode: bool = False) -> dict[str, object]:
        """path -> one per-file metadata value for the live set, from
        a typed sidecar column (delta-layer adds extracted from their
        dicts). A column any sidecar predates falls back to the
        materialized dicts — correct, just unlazy."""
        if col not in self.sidecar_columns():
            return {
                p: a.get(field) for p, a in self._materialize().items()
            }
        return self._fold(
            [col],
            (lambda v: json.loads(v) if v else None) if decode
            else (lambda v: v),
            lambda a: a.get(field),
        )

    def dv_map(self) -> dict[str, dict | None]:
        """path -> deletion-vector dict (or None) for the live set —
        the scan plane's only per-file need besides the path, so a
        plain read never deserializes add actions. Cached: every read
        of the snapshot hits it."""
        if self._dv is None:
            self._dv = self.field_map("dv_json", "dv", decode=True)
        return self._dv

    def meta(self, stat_kinds: dict[str, str], pv_phys: list[str],
             ) -> tuple[list[str], dict[str, tuple[list, list]],
                        dict[str, list]]:
        """``(paths, {phys: (mins, maxs)}, {phys: pv_values})`` for the
        live set, reading ONLY the typed sidecar columns the caller
        names (``stat_kinds``: phys col -> carrier kind), merged
        across layers later-wins. A requested column absent from the
        sidecars (added after they were written) yields None bounds
        for sidecar rows — never-prune, safe."""
        have = self.sidecar_columns()
        names: list[str] = []
        extractors = []
        for c, k in stat_kinds.items():
            names.append(f"min::{c}")
            extractors.append(lambda a, c=c, k=k: _typed_stat(
                k, ((a.get("stats") or {}).get("minValues") or {})
                .get(c)))
            names.append(f"max::{c}")
            extractors.append(lambda a, c=c, k=k: _typed_stat(
                k, ((a.get("stats") or {}).get("maxValues") or {})
                .get(c)))
        for c in pv_phys:
            names.append(f"pv::{c}")
            extractors.append(lambda a, c=c: (
                a.get("partitionValues") or {}).get(c))

        sidecar_cols = [n for n in names if n in have]
        idx = {n: sidecar_cols.index(n) for n in names if n in have}

        def sidecar_row(*vals):
            return tuple(
                vals[idx[n]] if n in idx else None for n in names
            )

        def delta_val(a):
            return tuple(ex(a) for ex in extractors)

        rows = self._fold(sidecar_cols, sidecar_row, delta_val)
        paths = list(rows)
        columns = list(zip(*rows.values())) if rows else [
            [] for _ in names
        ]
        by_name = dict(zip(names, (list(c) for c in columns)))
        stats = {
            c: (by_name[f"min::{c}"], by_name[f"max::{c}"])
            for c in stat_kinds
        }
        pvs = {c: by_name[f"pv::{c}"] for c in pv_phys}
        return paths, stats, pvs


def _files_meta(snap, stat_kinds: dict[str, str], pv_phys: list[str],
                ) -> tuple[list[str], dict[str, tuple[list, list]],
                           dict[str, list]]:
    """``(paths, {phys: (mins, maxs)}, {phys: pv_values})`` for a
    snapshot's live set — from the typed sidecar when available
    (column-pruned parquet read, no add-action deserialization), else
    extracted from the materialized add dicts (small tables and
    pre-typed sidecars, where the dict already exists or is cheap)."""
    files = snap.files
    if isinstance(files, LazyAdds) and files.typed():
        return files.meta(stat_kinds, pv_phys)
    paths = sorted(files)

    def stat(p: str, key: str, c: str, k: str):
        return _typed_stat(
            k, ((files[p].get("stats") or {}).get(key) or {}).get(c)
        )

    stats = {
        c: ([stat(p, "minValues", c, k) for p in paths],
            [stat(p, "maxValues", c, k) for p in paths])
        for c, k in stat_kinds.items()
    }
    pvs = {
        c: [(files[p].get("partitionValues") or {}).get(c) for p in paths]
        for c in pv_phys
    }
    return paths, stats, pvs


def _files_dv(snap) -> Mapping[str, dict | None]:
    """path -> dv dict (or None) for the live set — typed-column read
    on sidecar-backed snapshots, dict extraction otherwise."""
    files = snap.files
    if isinstance(files, LazyAdds) and files.typed():
        return files.dv_map()
    return {p: a.get("dv") for p, a in files.items()}


def _files_field(snap, col: str, field: str,
                 decode: bool = False) -> dict[str, object]:
    """path -> one per-file add field for the live set — typed-column
    read on sidecar-backed snapshots, dict extraction otherwise."""
    files = snap.files
    if isinstance(files, LazyAdds) and files.typed():
        return files.field_map(col, field, decode=decode)
    return {p: a.get(field) for p, a in files.items()}


def _np_bounds(vals: list, kind: str):
    """(numpy array with null sentinel, validity mask) for a bounds
    column — int64/float64 for the numeric kinds (int stays int64:
    float promotion could mis-compare past 2^53), object array of
    strings otherwise."""
    import numpy as np  # noqa: PLC0415

    n = len(vals)
    valid = np.fromiter((v is not None for v in vals), dtype=bool, count=n)
    if kind == "int":
        arr = np.fromiter(
            (v if v is not None else 0 for v in vals),
            dtype=np.int64, count=n,
        )
    elif kind == "float":
        arr = np.fromiter(
            (v if v is not None else 0.0 for v in vals),
            dtype=np.float64, count=n,
        )
    else:
        arr = np.array([v if v is not None else "" for v in vals],
                       dtype=object)
    return arr, valid


def _list_log(table: str) -> tuple[list[str], list[str]]:
    """(commit files, checkpoint files), each sorted by version."""
    d = _log_path(table)
    if not os.path.isdir(d):
        return [], []
    commits, checkpoints = [], []
    for f in os.listdir(d):
        if f.endswith(".checkpoint.json"):
            checkpoints.append(f)
        elif f.endswith(".json"):
            commits.append(f)
    return sorted(commits, key=_version_of), sorted(checkpoints, key=_version_of)


def resolve_snapshot(table: str, version: int | None = None) -> Snapshot | None:
    """Replay the log up to ``version`` (default: latest). Starts from
    the newest checkpoint at or below the target so replay cost is
    bounded by CHECKPOINT_INTERVAL, not table age — and within that
    tail, a large commit's adds live in a parquet BATCH sidecar
    (``addBatch`` action) that replays as one lazy columnar layer, so
    even a 100k-file write between checkpoints never json.loads its
    adds on the driver."""
    commits, checkpoints = _list_log(table)
    if not commits:
        return None
    target = _version_of(commits[-1]) if version is None else version
    if version is not None and all(_version_of(c) != version for c in commits):
        raise DataSourceException(
            f"version {version} does not exist for txlog table {table!r}"
        )
    schema_json: str | None = None
    part_cols: list[str] = []
    configuration: dict[str, str] = {}
    row_id_high = -1
    start = 0
    # ordered layer stack (see LazyAdds): ("sidecar", parquet path) |
    # ("delta", {path: add|None}); stays a plain eager dict unless a
    # sidecar layer appears anywhere
    layers: list[tuple[str, object]] = []
    usable = [c for c in checkpoints if _version_of(c) <= target]
    if usable:
        with open(os.path.join(_log_path(table), usable[-1])) as fh:
            ck = json.load(fh)
        schema_json = ck["schemaJson"]
        part_cols = ck["partitionColumns"]
        configuration = dict(ck.get("configuration", {}))
        if "addsParquet" in ck:
            # sidecar-backed: defer the per-add json.loads — at
            # millions of live files that parse IS the snapshot-
            # resolution bottleneck.
            layers.append(("sidecar",
                           os.path.join(_log_path(table),
                                        ck["addsParquet"])))
        else:
            layers.append(
                ("delta", {a["path"]: a for a in ck["adds"]})
            )
        row_id_high = int(ck.get("rowIdHighWaterMark", -1))
        start = _version_of(usable[-1]) + 1

    def delta() -> dict:
        """The current trailing delta layer (created on demand)."""
        if not layers or layers[-1][0] != "delta":
            layers.append(("delta", {}))
        return layers[-1][1]  # type: ignore[return-value]

    for fname in commits:
        v = _version_of(fname)
        if v < start or v > target:
            continue
        with open(os.path.join(_log_path(table), fname)) as fh:
            for line in fh:
                action = json.loads(line)
                if "metaData" in action:
                    schema_json = action["metaData"]["schemaJson"]
                    part_cols = action["metaData"]["partitionColumns"]
                    configuration = dict(
                        action["metaData"].get("configuration", {})
                    )
                elif "add" in action:
                    delta()[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    delta()[action["remove"]["path"]] = None
                elif "addBatch" in action:
                    layers.append(("sidecar", os.path.join(
                        _log_path(table), action["addBatch"]["parquet"]
                    )))
                elif "rowIdHighWaterMark" in action:
                    # monotone: the mark never regresses, even through
                    # RESTORE (re-used ids would alias distinct rows)
                    row_id_high = max(
                        row_id_high, int(action["rowIdHighWaterMark"])
                    )
    if schema_json is None:
        raise DataSourceException(f"txlog table {table!r} has no metaData action")
    if any(kind == "sidecar" for kind, _ in layers):
        live: Mapping = LazyAdds(table, layers)
    else:
        files: dict[str, dict] = {}
        for _, d in layers:
            for p, a in d.items():  # type: ignore[union-attr]
                if a is None:
                    files.pop(p, None)
                else:
                    files[p] = a
        live = files
    return Snapshot(target, schema_json, part_cols, live, configuration,
                    row_id_high=row_id_high)


# ---------------------------------------------------------------------------
# connector


class TxLogDataSource(BaseDataSource):
    format_name = "txlog"

    # -- addressing ----------------------------------------------------
    def _names_file(self) -> str:
        warehouse = self.spark.conf.get(
            "spark.sql.warehouse.dir", "file:/tmp/x_spark-warehouse"
        )
        root = warehouse.removeprefix("file:")
        return os.path.join(root, "_txlog_names.json")

    def _resolve_name(self, name: str, create: bool = False) -> str:
        """Catalog-name addressing: a warehouse-level names file maps
        table names to txlog directories (the metastore analogue — the
        log itself replaces everything else a metastore holds). New
        names allocate ``<warehouse>/txlog/<name>``; the mapping file
        is republished atomically via rename."""
        nf = self._names_file()
        names: dict[str, str] = {}
        if os.path.isfile(nf):
            with open(nf) as fh:
                names = json.load(fh)
        if name in names:
            return names[name]
        if not create:
            raise DataSourceException(f"unknown txlog table name {name!r}")
        path = os.path.join(os.path.dirname(nf), "txlog", name)
        names[name] = path
        os.makedirs(os.path.dirname(nf), exist_ok=True)
        tmp = nf + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(names, fh)
        os.replace(tmp, nf)
        return path

    def _table_path(self, ref: TableRef, create: bool = False) -> str:
        if ref.is_path:
            return ref.path  # type: ignore[return-value]
        return self._resolve_name(ref.table, create)  # type: ignore[arg-type]

    def _known_names(self) -> dict[str, str]:
        nf = self._names_file()
        if os.path.isfile(nf):
            with open(nf) as fh:
                return json.load(fh)
        return {}

    def rename_table(self, ref: TableRef, new_name: str) -> None:
        """``ALTER TABLE ... RENAME TO``: re-key the catalog name in
        one atomic names-file republish. The table DIRECTORY does not
        move, so the rename is O(1) at any table size — the metastore
        rename Delta does on Databricks. Path-addressed tables have no
        name to change; registered views store raw SQL and are NOT
        rewritten (Delta's behavior: such a view breaks until
        re-created)."""
        if ref.is_path:
            raise DataSourceException(
                "ALTER TABLE RENAME TO needs a catalog table name"
            )
        new_name = _normalize_ident(new_name)
        names = self._known_names()
        if ref.table not in names:
            raise DataSourceException(
                f"unknown txlog table name {ref.table!r}"
            )
        if new_name in names:
            raise DataSourceException(
                f"txlog table {new_name!r} already exists"
            )
        # mirror create_view's table-name guard in reverse: one
        # identifier must never be owned by both registries, or view
        # expansion would shadow the renamed table
        if new_name in self._known_views() or new_name in self._temp_views():
            raise DataSourceException(
                f"{new_name!r} is a txlog VIEW — pick another table name"
            )
        if new_name in self.mviews.specs():
            raise DataSourceException(
                f"{new_name!r} is a MATERIALIZED view — pick another "
                "table name"
            )
        names[new_name] = names.pop(ref.table)  # type: ignore[arg-type]
        nf = self._names_file()
        tmp = nf + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(names, fh)
        os.replace(tmp, nf)

    # -- views -----------------------------------------------------------
    def _views_file(self) -> str:
        return os.path.join(
            os.path.dirname(self._names_file()), "_txlog_views.json"
        )

    def _known_views(self) -> dict[str, str]:
        vf = self._views_file()
        if os.path.isfile(vf):
            with open(vf) as fh:
                return json.load(fh)
        return {}

    def _temp_views(self) -> dict[str, str]:
        """Session-scoped view store (rides the SparkSession object so
        every datasource instance of the session shares it)."""
        store = getattr(self.spark, "_x_txlog_temp_views", None)
        if store is None:
            store = {}
            self.spark._x_txlog_temp_views = store  # type: ignore[attr-defined]
        return store

    def create_view(self, name: str, query: str, replace: bool = False,
                    temporary: bool = False) -> None:
        """``CREATE [OR REPLACE] [TEMPORARY] VIEW name AS query`` over
        txlog names. Stores the RAW SQL (persistent: a warehouse-level
        views file, the metastore analogue of the names file;
        temporary: session-scoped) and expands it at QUERY time, so
        the view always reads the current snapshot — Spark/Delta view
        semantics, never creation-time freezing. The definition is
        analyzed now (plan only, no execution) so a typo errors at
        CREATE like Spark's."""
        name = _normalize_ident(name)
        if name in self._known_names():
            raise DataSourceException(
                f"{name!r} is a txlog TABLE — pick another view name"
            )
        if name in self.mviews.specs():
            raise DataSourceException(
                f"{name!r} is a MATERIALIZED view — pick another view name"
            )
        store = self._temp_views() if temporary else self._known_views()
        if name in store and not replace:
            raise DataSourceException(f"view {name!r} already exists")
        _ = self.spark.sql(self._rewrite_query(query)).schema  # analyze
        if temporary:
            self._temp_views()[name] = query
            return
        views = self._known_views()
        views[name] = query
        vf = self._views_file()
        os.makedirs(os.path.dirname(vf), exist_ok=True)
        tmp = vf + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(views, fh)
        os.replace(tmp, vf)

    def drop_view(self, name: str, if_exists: bool = True) -> None:
        """DROP VIEW: temporary first (it shadows), then persistent."""
        name = _normalize_ident(name)
        temp = self._temp_views()
        if name in temp:
            del temp[name]
            return
        views = self._known_views()
        if name not in views:
            if if_exists:
                return
            raise DataSourceException(f"unknown view {name!r}")
        del views[name]
        vf = self._views_file()
        tmp = vf + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(views, fh)
        os.replace(tmp, vf)

    def show_views(self) -> DataFrame:
        """``SHOW VIEWS``: the session's Spark-catalog views UNIONed
        with the txlog view registry (persistent + session temp), in
        Spark's (namespace, viewName, isTemporary) shape — one listing
        surface for both worlds."""
        ours = [("", n, False) for n in sorted(self._known_views())]
        ours += [("", n, True) for n in sorted(self._temp_views())]
        mine = self.spark.createDataFrame(
            ours or [("", "", True)],
            "namespace string, viewName string, isTemporary boolean",
        )
        if not ours:
            mine = mine.limit(0)
        return self.spark.sql("SHOW VIEWS").unionByName(mine)

    def describe_view(self, name: str) -> DataFrame:
        """``DESCRIBE VIEW v``: the view's resolved columns (analyzed
        from the stored SQL against CURRENT snapshots) followed by a
        ``# definition`` metadata row carrying the raw stored SQL —
        the read-back that lets a user audit what a registered view
        will actually do."""
        name = _normalize_ident(name)
        views = {**self._known_views(), **self._temp_views()}
        if name not in views:
            raise DataSourceException(f"unknown view {name!r}")
        schema = self.spark.sql(self._rewrite_query(views[name])).schema
        rows = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        rows += [("# definition", views[name])]
        return self.spark.createDataFrame(
            rows, "col_name string, data_type string"
        )

    def show_partitions(self, ref: TableRef) -> DataFrame:
        """``SHOW PARTITIONS`` (reference D1 — etl/overwrite.py:10-18
        reads the result's ``.columns`` for the partition column names
        and sniffs 'not partitioned' from the error): the distinct
        partition tuples, one TYPED column per partition column,
        computed entirely from the metadata plane's pv columns — no
        data file is opened, so the answer is O(metadata) at any
        table size."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(
                f"txlog table {table!r} does not exist"
            )
        if not snap.partition_cols:
            raise DataSourceException(
                f"table {table!r} is not partitioned"
            )
        pmap = _physical_map(snap.schema)
        pv_phys = [pmap.get(c, c) for c in snap.partition_cols]
        _, _, pvs = _files_meta(snap, {}, pv_phys)
        n = len(next(iter(pvs.values()))) if pvs else 0
        rows = sorted(
            {tuple(pvs[p][i] for p in pv_phys) for i in range(n)},
            key=lambda t: tuple("" if v is None else str(v) for v in t),
        )
        by_name = {f.name: f for f in snap.schema.fields}
        str_schema = ", ".join(
            f"`{c}` string" for c in snap.partition_cols
        )
        return self.spark.createDataFrame(rows, str_schema).select(
            *[F.col(c).cast(by_name[c].dataType).alias(c)
              for c in snap.partition_cols]
        )

    def partition_stats(self, ref: TableRef) -> DataFrame:
        """Per-partition profile — typed partition columns plus
        ``n_files`` and ``n_rows`` — computed ENTIRELY from the
        metadata plane (the pv and num_records typed sidecar columns /
        add metadata): the partition-level dashboard a 100-TB ingest
        polls without opening a single data file. Rows masked by
        deletion vectors are still counted (footer counts, Delta's
        numRecords convention)."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(
                f"txlog table {table!r} does not exist"
            )
        if not snap.partition_cols:
            raise DataSourceException(
                f"table {table!r} is not partitioned"
            )
        pmap = _physical_map(snap.schema)
        pv_phys = [pmap.get(c, c) for c in snap.partition_cols]
        paths, _, pvs = _files_meta(snap, {}, pv_phys)
        nrec = _files_field(snap, "num_records", "numRecords")
        agg: dict[tuple, list[int]] = {}
        for i, p in enumerate(paths):
            key = tuple(pvs[c][i] for c in pv_phys)
            cell = agg.setdefault(key, [0, 0])
            cell[0] += 1
            cell[1] += int(nrec.get(p) or 0)
        rows = [
            (*k, v[0], v[1]) for k, v in sorted(
                agg.items(),
                key=lambda kv: tuple(
                    "" if x is None else str(x) for x in kv[0]
                ),
            )
        ]
        by_name = {f.name: f for f in snap.schema.fields}
        schema = ", ".join(
            [f"`{c}` string" for c in snap.partition_cols]
            + ["n_files bigint", "n_rows bigint"]
        )
        return self.spark.createDataFrame(rows, schema).select(
            *[F.col(c).cast(by_name[c].dataType).alias(c)
              for c in snap.partition_cols],
            "n_files", "n_rows",
        )

    def drop_table(self, ref: TableRef, if_exists: bool = True) -> None:
        """Remove a txlog table: unregister the catalog name (atomic
        names-file republish) and delete the table directory."""
        if ref.is_path:
            if os.path.isdir(ref.path):  # type: ignore[arg-type]
                shutil.rmtree(ref.path)  # type: ignore[arg-type]
            elif not if_exists:
                raise DataSourceException(f"no txlog table at {ref.path!r}")
            return
        names = self._known_names()
        if ref.table not in names:
            if if_exists:
                return
            raise DataSourceException(f"unknown txlog table name {ref.table!r}")
        path = names.pop(ref.table)  # type: ignore[arg-type]
        nf = self._names_file()
        tmp = nf + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(names, fh)
        os.replace(tmp, nf)
        if os.path.isdir(path):
            shutil.rmtree(path)

    # -- SQL over catalog-named txlog tables ---------------------------
    # txlog tables live outside the Spark catalog (the names file is
    # the metastore analogue), so the reference's pass-through SQL
    # surface (source `query`, pre/post_sql hooks like `truncate table
    # t` — etl/parent.py:137-138,180-181) needs name resolution here:
    # table-maintenance statements dispatch to the native ops, and
    # queries get known names rewritten to snapshot-backed temp views.
    def _execute_statement(self, stmt: str) -> DataFrame:
        handled = self._dispatch_statement(stmt)
        if handled is not None:
            return handled
        # transparent MV routing: a canonical aggregate SELECT over a
        # base table with a covering materialized view is served from
        # the maintained O(groups) state (refreshed if stale) instead
        # of scanning the fact table; anything not provably coverable
        # returns None and keeps the ordinary plan
        routed = self.mviews.route_select(stmt)
        if routed is not None:
            return routed
        return self.spark.sql(self._rewrite_query(stmt))

    @property
    def mviews(self):
        """Materialized-view registry + lifecycle (sources/mview.py):
        stateless accessor — everything durable lives in the registry
        file and the per-MV txlog aggregate tables."""
        from x_spark.sources.mview import MViewStore

        return MViewStore(self)

    def _dispatch_statement(self, stmt: str) -> DataFrame | None:
        """Route statements targeting a known txlog name to the
        transactional ops; None = not ours, pass to spark.sql.
        Dispatched verbs: CREATE TABLE ... USING txlog (incl. CTAS),
        INSERT INTO/OVERWRITE (VALUES and SELECT sources, PARTITION
        specs), full MERGE INTO (WHEN MATCHED / NOT MATCHED [BY
        SOURCE], multi-clause, WITH SCHEMA EVOLUTION — see
        :mod:`x_spark.sources.sql_dml`), TRUNCATE/DROP TABLE, DELETE,
        UPDATE,
        ALTER TABLE ADD/DROP CONSTRAINT, SET/DROP GENERATED ALWAYS AS,
        SET IDENTITY, ALTER COLUMN TYPE (widening), ADD COLUMN(S),
        RENAME/DROP COLUMN, SET TBLPROPERTIES, DESCRIBE HISTORY/DETAIL,
        SHOW TBLPROPERTIES, RESTORE TO VERSION|TIMESTAMP AS OF,
        OPTIMIZE [WHERE], REORG ... APPLY (PURGE), COPY INTO."""
        import re

        ident = r"((?:`[^`]+`|[A-Za-z_]\w*)(?:\s*\.\s*(?:`[^`]+`|[A-Za-z_]\w*))*)"
        done = self.spark.createDataFrame([], "result string")
        # DML verbs (CREATE TABLE ... USING txlog / INSERT / MERGE
        # INTO) — the reference drives every write through SQL
        # (tests/dbr_notebook/test_case.sql cmds 1,15-18 INSERT INTO;
        # update/upsert = Delta MERGE, datasource/delta.py:135-148).
        # The cheap target-name probe keeps statements aimed at Spark
        # catalog tables on the pass-through path; full parsing (and
        # its grammar errors) only engages for OUR tables.
        from x_spark.sources import sql_dml

        ct = sql_dml.parse_create_table(stmt)
        if ct is not None:
            sql_dml.execute_create(self, ct)
            return done
        m = re.match(
            rf"\s*insert\s+(?:into|overwrite)\s+(?:table\s+)?{ident}",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            parsed = sql_dml.parse_insert(stmt)
            assert parsed is not None
            sql_dml.execute_insert(self, parsed)
            return done
        m = re.match(
            rf"\s*merge\s+(?:with\s+schema\s+evolution\s+)?into\s+{ident}",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            mg = sql_dml.parse_merge(stmt)
            assert mg is not None
            sql_dml.execute_merge_into(self, mg)
            return done
        # CONVERT TO TXLOG parquet.`/path` | catalog_table
        #   [PARTITIONED BY (col type, ...)]  — Delta's CONVERT TO
        # DELTA shape; the verb exists only here, so it is always ours
        m = re.fullmatch(
            r"\s*convert\s+to\s+txlog\s+(?:parquet\s*\.\s*)?"
            rf"(`[^`]+`|{ident})"
            r"(?:\s+partitioned\s+by\s*\(([^)]*)\))?\s*",
            stmt, re.I,
        )
        if m:
            target = m.group(1)
            pb = m.group(3)
            if target.startswith("`"):
                ref = TableRef(path=target[1:-1])
            else:
                ref = TableRef(table=_normalize_ident(target))
            n = self.convert(ref, partition_by=pb.strip() if pb else None)
            return self.spark.createDataFrame(
                [(n,)], "files_converted bigint"
            )
        # CREATE TABLE [IF NOT EXISTS] dst [SHALLOW|DEEP] CLONE src
        #   [VERSION AS OF n | TIMESTAMP AS OF 'ts'] — Delta's CLONE
        # verb. Both flavors route to the hardlink clone (shallow
        # economics, deep safety — see :meth:`clone`); ours when the
        # SOURCE is a txlog name or a backticked txlog directory.
        m = re.fullmatch(
            r"\s*create\s+table\s+(if\s+not\s+exists\s+)?"
            rf"(`[^`]+`|{ident})\s+(?:(?:shallow|deep)\s+)?clone\s+"
            rf"(`[^`]+`|{ident})"
            r"(?:\s+version\s+as\s+of\s+(\d+)"
            r"|\s+timestamp\s+as\s+of\s+'([^']+)')?\s*",
            stmt, re.I,
        )
        if m:
            def tok_ref(tok: str) -> TableRef:
                if tok.startswith("`") and "/" in tok:
                    return TableRef(path=tok[1:-1])
                return TableRef(table=_normalize_ident(tok))

            # group map (ident embeds one capture group of its own):
            # 1 = IF NOT EXISTS, 2 = dst token, 4 = src token,
            # 6 = version, 7 = timestamp
            src_ref = tok_ref(m.group(4))
            ours = (src_ref.is_path and self.table_exists(src_ref)) or (
                not src_ref.is_path
                and src_ref.table in self._known_names()
            )
            if ours:
                dst_ref = tok_ref(m.group(2))
                if m.group(1) and self.table_exists(dst_ref):
                    return done  # IF NOT EXISTS: no-op
                v = self.clone(
                    src_ref, dst_ref,
                    version=int(m.group(6)) if m.group(6) else None,
                    timestamp=m.group(7),
                )
                return self.spark.createDataFrame(
                    [(v,)], "clone_version bigint"
                )
        # COPY INTO t FROM '/path' FILEFORMAT = PARQUET|CSV|JSON|ORC
        #   [PATTERN = 'glob'] [FORMAT_OPTIONS('k'='v',...)]
        #   [COPY_OPTIONS('force'='true'|'mergeSchema'='true')]
        # — Delta's idempotent bulk-ingestion verb
        m = re.fullmatch(
            rf"\s*copy\s+into\s+{ident}\s+from\s+'([^']+)'\s+"
            r"fileformat\s*=\s*(\w+)"
            r"(?:\s+pattern\s*=\s*'([^']+)')?"
            r"(?:\s+format_options\s*\(([^)]*)\))?"
            r"(?:\s+copy_options\s*\(([^)]*)\))?\s*",
            stmt, re.I | re.S,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            def kv(s: str | None) -> dict[str, str]:
                out: dict[str, str] = {}
                for k, v in re.findall(r"'([^']*)'\s*=\s*'([^']*)'", s or ""):
                    out[k] = v
                return out

            copts = {k.lower(): v for k, v in kv(m.group(6)).items()}
            files, rows = self.copy_into(
                TableRef(table=_normalize_ident(m.group(1))),
                source=m.group(2), file_format=m.group(3),
                pattern=m.group(4), format_options=kv(m.group(5)),
                force=copts.get("force", "").lower() == "true",
                merge_schema=copts.get("mergeschema", "").lower() == "true",
            )
            return self.spark.createDataFrame(
                [(files, rows)],
                "num_files_loaded bigint, num_inserted_rows bigint",
            )
        m = re.fullmatch(rf"\s*truncate\s+table\s+{ident}\s*", stmt, re.I)
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.truncate(TableRef(table=_normalize_ident(m.group(1))))
            return done
        m = re.fullmatch(
            rf"\s*drop\s+table\s+(if\s+exists\s+)?{ident}\s*", stmt, re.I
        )
        if m and _normalize_ident(m.group(2)) in self._known_names():
            self.drop_table(TableRef(table=_normalize_ident(m.group(2))),
                            if_exists=bool(m.group(1)))
            return done
        m = re.fullmatch(
            rf"\s*delete\s+from\s+{ident}(?:\s+where\s+(.*?))?\s*", stmt,
            re.I | re.S,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            ref = TableRef(table=_normalize_ident(m.group(1)))
            self.delete(ref, m.group(2) or "TRUE")
            return done
        parsed = _parse_update_statement(stmt)
        if parsed is not None and parsed[0] in self._known_names():
            self.update(TableRef(table=parsed[0]), parsed[1], parsed[2])
            return done
        # ALTER TABLE t ADD CONSTRAINT name CHECK (expr) — Delta's
        # constraint DDL, routed to the native invariant store
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+add\s+constraint\s+(\w+)\s+"
            r"check\s*\((.*)\)\s*",
            stmt, re.I | re.S,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.add_constraint(
                TableRef(table=_normalize_ident(m.group(1))),
                m.group(2), m.group(3).strip(),
            )
            return done
        # ALTER TABLE t ADD CONSTRAINT n PRIMARY KEY (cols)
        #   [NOT ENFORCED] [RELY|NORELY] — informational (Delta)
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+add\s+constraint\s+(\w+)\s+"
            r"primary\s+key\s*\(([^)]*)\)"
            r"(?:\s+not\s+enforced)?(?:\s+(rely|norely))?\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.add_primary_key(
                TableRef(table=_normalize_ident(m.group(1))), m.group(2),
                [c.strip().strip("`") for c in m.group(3).split(",")
                 if c.strip()],
                rely=(m.group(4) or "").lower() == "rely",
            )
            return done
        # ALTER TABLE t ADD CONSTRAINT n FOREIGN KEY (cols)
        #   REFERENCES parent [(cols)] [NOT ENFORCED] — informational
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+add\s+constraint\s+(\w+)\s+"
            rf"foreign\s+key\s*\(([^)]*)\)\s+references\s+{ident}"
            r"(?:\s*\(([^)]*)\))?(?:\s+not\s+enforced)?\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.add_foreign_key(
                TableRef(table=_normalize_ident(m.group(1))), m.group(2),
                [c.strip().strip("`") for c in m.group(3).split(",")
                 if c.strip()],
                TableRef(table=_normalize_ident(m.group(4))),
                parent_columns=(
                    [c.strip().strip("`") for c in m.group(5).split(",")
                     if c.strip()]
                    if m.group(5) else None
                ),
            )
            return done
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+drop\s+constraint\s+(\w+)\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.drop_constraint(
                TableRef(table=_normalize_ident(m.group(1))), m.group(2)
            )
            return done
        # ALTER TABLE t ALTER COLUMN c SET GENERATED ALWAYS AS (expr) —
        # Delta's generated-column DDL, routed to the metaData store
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+alter\s+column\s+(\w+)\s+"
            r"set\s+generated\s+always\s+as\s*\((.*)\)\s*",
            stmt, re.I | re.S,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.set_generated_column(
                TableRef(table=_normalize_ident(m.group(1))),
                m.group(2), m.group(3).strip(),
            )
            return done
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+alter\s+column\s+(\w+)\s+"
            r"drop\s+generated\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.drop_generated_column(
                TableRef(table=_normalize_ident(m.group(1))), m.group(2)
            )
            return done
        # Schema evolution DDL (metadata-only commits): ADD COLUMN(S),
        # RENAME COLUMN (mapping required), DROP COLUMN (mapping
        # required)
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+add\s+columns?\s+(.+?)\s*",
            stmt, re.I | re.S,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            cols = m.group(2).strip()
            if cols.startswith("(") and cols.endswith(")"):
                cols = cols[1:-1]
            self.add_columns(
                TableRef(table=_normalize_ident(m.group(1))), cols
            )
            return done
        # ALTER TABLE t ALTER COLUMN c SET IDENTITY [(START WITH s STEP st)]
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+alter\s+column\s+(\w+)\s+"
            r"set\s+identity"
            r"(?:\s*\(\s*start\s+with\s+(-?\d+)\s+step\s+(-?\d+)\s*\))?\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.set_identity_column(
                TableRef(table=_normalize_ident(m.group(1))), m.group(2),
                start=int(m.group(3)) if m.group(3) else 1,
                step=int(m.group(4)) if m.group(4) else 1,
            )
            return done
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+alter\s+column\s+(\w+)\s+"
            r"type\s+(.+?)\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.widen_column(
                TableRef(table=_normalize_ident(m.group(1))),
                m.group(2), m.group(3).strip(),
            )
            return done
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+alter\s+column\s+(\w+)\s+"
            r"set\s+default\s+(.+?)\s*",
            stmt, re.I | re.S,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.set_column_default(
                TableRef(table=_normalize_ident(m.group(1))),
                m.group(2), m.group(3).strip(),
            )
            return done
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+alter\s+column\s+(\w+)\s+"
            r"drop\s+default\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.drop_column_default(
                TableRef(table=_normalize_ident(m.group(1))), m.group(2)
            )
            return done
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+alter\s+column\s+(\w+)\s+"
            r"(set|drop)\s+not\s+null\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            fn = (self.set_not_null if m.group(3).lower() == "set"
                  else self.drop_not_null)
            fn(TableRef(table=_normalize_ident(m.group(1))), m.group(2))
            return done
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+rename\s+column\s+(\w+)\s+"
            r"to\s+(\w+)\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.rename_column(
                TableRef(table=_normalize_ident(m.group(1))),
                m.group(2), m.group(3),
            )
            return done
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+drop\s+column\s+(\w+)\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.drop_column(
                TableRef(table=_normalize_ident(m.group(1))), m.group(2)
            )
            return done
        # Metadata read-backs returning real relations: DESCRIBE
        # HISTORY / DESCRIBE DETAIL / SHOW TBLPROPERTIES
        m = re.fullmatch(rf"\s*describe\s+history\s+{ident}\s*", stmt, re.I)
        if m and _normalize_ident(m.group(1)) in self._known_names():
            ref = TableRef(table=_normalize_ident(m.group(1)))
            return self.spark.createDataFrame(
                [(h["version"], h["operation"], h["timestamp"])
                 for h in self.history(ref)],
                "version bigint, operation string, timestamp bigint",
            )
        m = re.fullmatch(rf"\s*describe\s+detail\s+{ident}\s*", stmt, re.I)
        if m and _normalize_ident(m.group(1)) in self._known_names():
            d = self.describe_detail(
                TableRef(table=_normalize_ident(m.group(1)))
            )
            return self.spark.createDataFrame(
                [tuple(json.dumps(v) if isinstance(v, (list, dict))
                       else v for v in d.values())],
                ", ".join(f"{k} string" if isinstance(v, (str, list, dict))
                          else f"{k} bigint" for k, v in d.items()),
            )
        m = re.fullmatch(rf"\s*show\s+tblproperties\s+{ident}\s*", stmt, re.I)
        if m and _normalize_ident(m.group(1)) in self._known_names():
            table = self._table_path(
                TableRef(table=_normalize_ident(m.group(1)))
            )
            snap = resolve_snapshot(table)
            rows = sorted(snap.configuration.items()) if snap else []
            return self.spark.createDataFrame(
                rows or [(None, None)], "key string, value string"
            ).filter(F.col("key").isNotNull())
        # RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts'
        m = re.fullmatch(
            rf"\s*restore\s+table\s+{ident}\s+to\s+version\s+as\s+of\s+"
            r"(\d+)\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.restore(TableRef(table=_normalize_ident(m.group(1))),
                         int(m.group(2)))
            return done
        m = re.fullmatch(
            rf"\s*restore\s+table\s+{ident}\s+to\s+timestamp\s+as\s+of\s+"
            r"'([^']+)'\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.restore_to_timestamp(
                TableRef(table=_normalize_ident(m.group(1))), m.group(2)
            )
            return done
        # OPTIMIZE t [WHERE <partition predicate>]
        #            [ZORDER BY (a, b)] — small-file bin-packing
        # scoped to matching partitions; with ZORDER BY the scoped
        # files also re-cluster through the space-filling curve
        m = re.fullmatch(
            rf"\s*optimize\s+{ident}(?:\s+where\s+(.*?))?"
            r"(?:\s+zorder\s+by\s*\(\s*([^)]+?)\s*\))?\s*",
            stmt, re.I | re.S,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            zcols = ([c.strip(" `") for c in m.group(3).split(",")]
                     if m.group(3) else None)
            self.optimize(TableRef(table=_normalize_ident(m.group(1))),
                          where=m.group(2), zorder_by=zcols)
            return done
        # REORG TABLE t APPLY (PURGE) — Delta's DV purge: physically
        # rewrite only the mask-carrying files, drop their dv refs
        m = re.fullmatch(
            rf"\s*reorg\s+table\s+{ident}\s+apply\s*\(\s*purge\s*\)\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.purge_dvs(TableRef(table=_normalize_ident(m.group(1))))
            return done
        # ALTER TABLE t RENAME TO u — O(1) names-file re-key
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+rename\s+to\s+{ident}\s*",
            stmt, re.I,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            self.rename_table(
                TableRef(table=_normalize_ident(m.group(1))), m.group(2)
            )
            return done
        # SHOW PARTITIONS t — one typed column per partition column
        # (reference D1 reads .columns off the result and sniffs 'not
        # partitioned' from the error, etl/overwrite.py:10-18)
        m = re.fullmatch(
            rf"\s*show\s+partitions\s+{ident}\s*", stmt, re.I
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            return self.show_partitions(
                TableRef(table=_normalize_ident(m.group(1)))
            )
        # MATERIALIZED VIEW verbs (sources/mview.py) — the verb family
        # exists only in our dialect (OSS Spark has no MATERIALIZED
        # VIEW), so every such statement is claimed; a non-txlog base
        # raises a clean typed error instead of a Spark parse error
        m = re.match(
            rf"\s*create\s+(or\s+replace\s+)?materialized\s+view\s+"
            rf"{ident}\s+as\s+(.+?)\s*$",
            stmt, re.I | re.S,
        )
        if m:
            self.mviews.create(m.group(2), m.group(3),
                               replace=bool(m.group(1)))
            return done
        m = re.fullmatch(
            rf"\s*refresh\s+materialized\s+view\s+{ident}\s*", stmt, re.I
        )
        if m:
            v = self.mviews.refresh(m.group(1))
            return self.spark.createDataFrame(
                [(v,)], "refreshed_to_version bigint"
            )
        m = re.fullmatch(
            rf"\s*drop\s+materialized\s+view\s+(if\s+exists\s+)?{ident}\s*",
            stmt, re.I,
        )
        if m:
            self.mviews.drop(m.group(2), if_exists=bool(m.group(1)))
            return done
        if re.fullmatch(r"\s*show\s+materialized\s+views\s*", stmt, re.I):
            return self.mviews.listing()
        m = re.fullmatch(
            rf"\s*desc(?:ribe)?\s+materialized\s+view\s+{ident}\s*",
            stmt, re.I,
        )
        if m:
            return self.mviews.describe(m.group(1))
        # CREATE [OR REPLACE] [TEMPORARY] VIEW v AS query — ours when
        # the body references a txlog table or registered view
        m = re.match(
            rf"\s*create\s+(or\s+replace\s+)?(temp(?:orary)?\s+)?view\s+"
            rf"{ident}\s+as\s+(.+?)\s*$",
            stmt, re.I | re.S,
        )
        if m and self._mentions_ours(m.group(4)):
            self.create_view(m.group(3), m.group(4),
                             replace=bool(m.group(1)),
                             temporary=bool(m.group(2)))
            return done
        # DROP VIEW [IF EXISTS] v — ours when v is a registered view
        m = re.fullmatch(
            rf"\s*drop\s+view\s+(if\s+exists\s+)?{ident}\s*", stmt, re.I
        )
        if m and _normalize_ident(m.group(2)) in {
            **self._known_views(), **self._temp_views()
        }:
            self.drop_view(m.group(2), if_exists=bool(m.group(1)))
            return done
        # SHOW VIEWS — spark catalog views + the txlog registries
        if re.fullmatch(r"\s*show\s+views\s*", stmt, re.I):
            return self.show_views()
        # DESCRIBE VIEW v — ours when v is a registered view
        m = re.fullmatch(
            rf"\s*desc(?:ribe)?\s+view\s+{ident}\s*", stmt, re.I
        )
        if m and _normalize_ident(m.group(1)) in {
            **self._known_views(), **self._temp_views()
        }:
            return self.describe_view(m.group(1))
        # ALTER TABLE t SET TBLPROPERTIES ('k'='v', ...) — the switch
        # that turns on e.g. deletion vectors (enableDeletionVectors)
        m = re.fullmatch(
            rf"\s*alter\s+table\s+{ident}\s+set\s+tblproperties\s*"
            r"\((.*)\)\s*",
            stmt, re.I | re.S,
        )
        if m and _normalize_ident(m.group(1)) in self._known_names():
            props = dict(re.findall(
                r"'([^']+)'\s*=\s*'([^']*)'", m.group(2)
            ))
            if not props:
                raise DataSourceException(
                    f"no 'key'='value' pairs in TBLPROPERTIES: {m.group(2)!r}"
                )
            self.set_properties(
                TableRef(table=_normalize_ident(m.group(1))), props
            )
            return done
        return None

    def _rewrite_table_changes(self, stmt: str) -> str:
        """Delta's ``table_changes('name_or_path', from_v[, to_v])``
        TVF on the pass-through SQL surface: each call materializes the
        CDF slice as a temp view and the call text is replaced by the
        view name, so the feed composes with ordinary SQL (GROUP BY,
        joins, filters). Bounds follow Delta exactly: BOTH versions
        inclusive (``:meth:`changes``` is exclusive-from, so the TVF
        shifts the lower bound by one — version 0 included via the
        empty-base form)."""
        import re

        pat = re.compile(
            r"table_changes\s*\(\s*'([^']+)'\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)",
            re.I,
        )

        def repl(m: "re.Match[str]") -> str:
            target, from_v, to_v = m.group(1), int(m.group(2)), m.group(3)
            if _normalize_ident(target) in self._known_names():
                ref = TableRef(table=_normalize_ident(target))
            else:
                ref = TableRef(path=target)
            df = self.changes(ref, from_v - 1, int(to_v) if to_v else None)
            view = (
                "__txlog_cdf_" + re.sub(r"\W", "_", target)
                + f"_{from_v}_{to_v or 'latest'}"
            )
            df.createOrReplaceTempView(view)
            return view

        return pat.sub(repl, stmt)

    def _rewrite_query(self, stmt: str,
                       _view_seen: frozenset = frozenset()) -> str:
        """Replace known txlog table names (outside single-quoted
        string literals) with snapshot-backed temp views. Views are
        mangled (``__txlog_<name>``) so they never shadow same-named
        Spark catalog tables for other sessions' SQL. Registered txlog
        VIEWS expand first — each referenced view re-materializes from
        its stored SQL at QUERY time, so views read the current
        snapshot."""
        import re

        stmt = self._rewrite_table_changes(stmt)
        stmt = self._expand_views(stmt, _view_seen)
        stmt = self._expand_mviews(stmt)

        names = [n for n in self._known_names()
                 if self.table_exists(TableRef(table=n))]
        if not names:
            return stmt
        segments = re.split(r"('(?:[^']|'')*')", stmt)
        for name in sorted(names, key=len, reverse=True):
            # lookahead allows a following '.' so column-qualifier uses
            # (`orders.o_custkey`) rewrite consistently with the FROM
            # occurrence; the lookbehind still blocks matching a SUFFIX
            # of a longer dotted name (longest-first ordering handles
            # registered prefix/suffix overlaps)
            name_src = (
                r"(?<![\w.`])"
                + r"\s*\.\s*".join(
                    rf"(?:`{re.escape(p)}`|{re.escape(p)})"
                    for p in name.split(".")
                )
            )
            pattern = re.compile(name_src + r"(?![\w`])")
            view = "__txlog_" + re.sub(r"\W", "_", name)
            # SQL time travel (Delta's SELECT ... VERSION AS OF n /
            # TIMESTAMP AS OF 'ts'): bind the phrase to a snapshot
            # view BEFORE the bare-name pass. VERSION AS OF is fully
            # inside one even segment; TIMESTAMP AS OF's literal is
            # the NEXT (odd) segment — the split put it there.
            # keywords are case-insensitive, the NAME is not — the
            # bare-name rewrite below is case-sensitive, and a
            # re.I name match here would hijack a same-spelled Spark
            # catalog table into inconsistent per-clause resolution
            ver_pat = re.compile(
                name_src + r"\s+(?i:version\s+as\s+of)\s+(\d+)"
            )
            ts_tail = re.compile(
                name_src + r"\s+(?i:timestamp\s+as\s+of)\s*$"
            )
            for i in range(0, len(segments), 2):
                def bind_version(m: re.Match) -> str:
                    vv = m.group(1)  # name_src has no capture groups
                    tv = f"{view}_v{vv}"
                    self.read(TableRef(
                        table=name, options={"versionAsOf": vv}
                    )).createOrReplaceTempView(tv)
                    return tv

                segments[i] = ver_pat.sub(bind_version, segments[i])
                m = ts_tail.search(segments[i])
                if m and i + 1 < len(segments):
                    lit = segments[i + 1][1:-1].replace("''", "'")
                    tv = f"{view}_ts{re.sub(r'[^0-9A-Za-z]', '_', lit)}"
                    self.read(TableRef(
                        table=name, options={"timestampAsOf": lit}
                    )).createOrReplaceTempView(tv)
                    segments[i] = segments[i][:m.start()] + tv
                    segments[i + 1] = ""
            replaced = False
            for i in range(0, len(segments), 2):  # even = outside literals
                if pattern.search(segments[i]):
                    segments[i] = pattern.sub(view, segments[i])
                    replaced = True
            if replaced:
                self.read(TableRef(table=name)).createOrReplaceTempView(view)
        return "".join(segments)

    def _mentions_ours(self, sql: str) -> bool:
        """Whether ``sql`` references a txlog table or registered view
        (outside string literals) — the claim probe for statements
        Spark could otherwise own (CREATE VIEW)."""
        import re

        names = (set(self._known_names()) | set(self._known_views())
                 | set(self._temp_views()))
        if not names:
            return False
        segments = re.split(r"('(?:[^']|'')*')", sql)
        for name in names:
            pattern = re.compile(
                rf"(?<![\w.`])(?:`{re.escape(name)}`|{re.escape(name)})"
                r"(?![\w`])"
            )
            if any(pattern.search(segments[i])
                   for i in range(0, len(segments), 2)):
                return True
        return False

    def _expand_views(self, stmt: str,
                      _seen: frozenset = frozenset()) -> str:
        """Re-materialize every registered txlog view the statement
        references as a MANGLED session temp view
        (``__txlog_view_<name>``) and substitute the mangled name into
        the statement — the same shadow-avoidance table rewrites use,
        so a user's same-named Spark temp view is never clobbered.
        Definitions rewrite recursively (views over views work, a
        cycle raises) and re-expand at QUERY time, so the view always
        reads the current snapshot."""
        import re

        views = {**self._known_views(), **self._temp_views()}
        if not views:
            return stmt
        segments = re.split(r"('(?:[^']|'')*')", stmt)
        for name in sorted(views, key=len, reverse=True):
            pattern = re.compile(
                rf"(?<![\w.`])(?:`{re.escape(name)}`|{re.escape(name)})"
                r"(?![\w`])"
            )
            if not any(pattern.search(segments[i])
                       for i in range(0, len(segments), 2)):
                continue
            if name in _seen:
                raise DataSourceException(
                    f"view definition cycle through {name!r}"
                )
            view = "__txlog_view_" + re.sub(r"\W", "_", name)
            self.spark.sql(
                self._rewrite_query(views[name], _seen | {name})
            ).createOrReplaceTempView(view)
            for i in range(0, len(segments), 2):
                segments[i] = pattern.sub(view, segments[i])
        return "".join(segments)

    def _expand_mviews(self, stmt: str) -> str:
        """Substitute referenced MATERIALIZED VIEW names with mangled
        temp views over their maintained state (as of last refresh —
        MV reads never trigger hidden base scans; REFRESH is the
        explicit freshness verb, transparent routing the automatic
        one)."""
        import re

        specs = self.mviews.specs()
        if not specs:
            return stmt
        segments = re.split(r"('(?:[^']|'')*')", stmt)
        for name in sorted(specs, key=len, reverse=True):
            pattern = re.compile(
                rf"(?<![\w.`])(?:`{re.escape(name)}`|{re.escape(name)})"
                r"(?![\w`])"
            )
            if not any(pattern.search(segments[i])
                       for i in range(0, len(segments), 2)):
                continue
            view = "__txlog_mv_" + re.sub(r"\W", "_", name)
            self.mviews.frame(name).createOrReplaceTempView(view)
            for i in range(0, len(segments), 2):
                segments[i] = pattern.sub(view, segments[i])
        return "".join(segments)

    def table_exists(self, ref: TableRef) -> bool:
        try:
            path = self._table_path(ref)
        except DataSourceException:
            return False
        commits, _ = _list_log(path)
        return bool(commits)

    def partition_columns(self, ref: TableRef) -> list[str]:
        snap = resolve_snapshot(self._table_path(ref))
        return snap.partition_cols if snap else list(ref.partition_by)

    # -- reads ---------------------------------------------------------
    def read(self, ref: TableRef) -> DataFrame:
        """Snapshot read. Time travel via ``ref.options``:
        ``versionAsOf`` (exact version) or ``timestampAsOf`` (latest
        version whose commit file mtime is <= the given ISO timestamp /
        epoch seconds, Delta's resolution rule)."""
        table = self._table_path(ref)
        version = ref.options.get("versionAsOf")
        if version is None and "timestampAsOf" in ref.options:
            version = self._version_at_timestamp(
                table, ref.options["timestampAsOf"]
            )
        snap = resolve_snapshot(table, int(version) if version is not None else None)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        return self._read_snapshot(table, snap)

    @staticmethod
    def _version_at_timestamp(table: str, ts) -> int:
        """Latest committed version at or before ``ts`` (ISO-8601
        string or epoch seconds). Commit time is the IN-COMMIT
        timestamp when the commit carries one (monotone by
        construction, survives file copies/restores-from-backup);
        the log file's mtime is the fallback for pre-ICT commits."""
        import datetime

        if isinstance(ts, (int, float)):
            epoch = float(ts)
        else:
            epoch = datetime.datetime.fromisoformat(str(ts)).timestamp()
        commits, _ = _list_log(table)
        best = None
        for fname in commits:
            full = os.path.join(_log_path(table), fname)
            ict = _commit_timestamp_ms(full)
            ctime = ict / 1000.0 if ict is not None \
                else os.path.getmtime(full)
            if ctime <= epoch:
                best = _version_of(fname)
        if best is None:
            raise DataSourceException(
                f"no commit of {table!r} at or before timestamp {ts!r}"
            )
        return best

    def _read_snapshot(self, table: str, snap: Snapshot,
                       paths: list[str] | None = None) -> DataFrame:
        """DataFrame over ``paths`` (default: all live files) of a
        snapshot. ``basePath`` keeps hive-style partition columns.

        Files whose add action carries a deletion vector are read
        through a left-anti join against their mask rows (merge-on-
        read); files without one take the plain scan — a table that
        never deletes pays zero overhead."""
        rel = sorted(snap.files) if paths is None else paths
        if not rel:
            return self.spark.createDataFrame([], snap.schema)
        cols = [f.name for f in snap.schema.fields]
        dvs = _files_dv(snap)
        masked = [p for p in rel if dvs.get(p)]
        plain = [p for p in rel if not dvs.get(p)]
        parts: list[DataFrame] = []
        if plain:
            # column mapping: files store physical names; scan with the
            # physical schema, alias back to logical (identity when off)
            parts.append(
                self.spark.read.schema(_physical_schema(snap.schema))
                .option("basePath", table)
                .parquet(*[os.path.join(table, p) for p in plain])
                .select(*[F.col(_physical_name(f)).alias(f.name)
                          for f in snap.schema.fields])
            )
        if masked:
            df = self._read_files_with_meta(table, snap.schema, masked)
            mask = self._dv_rows(table, snap, masked)
            parts.append(
                df.join(mask, ["__fn", "__ri"], "left_anti").select(*cols)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _read_files_with_meta(self, table: str, schema: StructType,
                              rels: list[str]) -> DataFrame:
        """Scan of specific files with the two DV join keys attached:
        ``__fn`` (the file's REL PATH — the table-wide identity key;
        basenames can collide in adopted layouts) and ``__ri``
        (parquet ``_metadata.row_index``)."""
        df = (
            self.spark.read.schema(_physical_schema(schema))
            .option("basePath", table)
            .parquet(*[os.path.join(table, p) for p in rels])
        )
        return df.select(
            *[F.col(_physical_name(f)).alias(f.name)
              for f in schema.fields],
            self._rel_path_col(table).alias("__fn"),
            F.col("_metadata.row_index").alias("__ri"),
        )

    def _dv_rows(self, table: str, snap: Snapshot,
                 rels: list[str]) -> DataFrame:
        """Mask rows (``__fn``, ``__ri``) for live files of a snapshot
        (see :meth:`_dv_rows_for`)."""
        dvs = _files_dv(snap)
        return self._dv_rows_for(table, [(p, dvs.get(p)) for p in rels])

    def _dv_rows_for(self, table: str,
                     pairs: list[tuple[str, dict | None]]) -> DataFrame:
        """Mask rows (``__fn``, ``__ri``) for (data file, dv dict)
        pairs, read from each file's OWN referenced sidecar directory
        (grouped by sidecar so a directory is scanned once). The
        per-sidecar file-name filter is load-bearing: after a RESTORE,
        two live files can reference sidecars from different points in
        history, and a blanket union would resurrect masks the restore
        rolled back."""
        by_dv: dict[str, list[str]] = {}
        for p, dv in pairs:
            if dv:
                by_dv.setdefault(dv["path"], []).append(p)
        parts = []
        for dv_path, names in sorted(by_dv.items()):
            parts.append(
                self.spark.read.parquet(os.path.join(table, dv_path))
                .filter(F.col("file_name").isin(names))
                .select(
                    F.col("file_name").alias("__fn"),
                    F.col("row_index").alias("__ri"),
                )
            )
        if not parts:
            return self.spark.createDataFrame(
                [], "__fn string, __ri bigint"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    @staticmethod
    def _rel_path_col(table: str):
        """``_metadata.file_path`` -> path RELATIVE to the table root —
        the per-file identity key. Relative paths (not basenames):
        adopted layouts (CONVERT TO TXLOG of a Spark partitionBy
        write) legitimately repeat basenames across partition dirs.
        Handles both ``file:/abs`` and ``file:///abs`` renderings;
        the table path is regex-quoted."""
        prefix = "^file:/*\\Q" + os.path.abspath(table).lstrip("/") \
            + "\\E/"
        return F.regexp_replace(F.col("_metadata.file_path"), prefix, "")

    @staticmethod
    def _row_tracking_on(configuration: dict[str, str]) -> bool:
        return str(configuration.get(ROW_TRACKING_KEY, "")).lower() == "true"

    def _read_rows_with_ids(self, table: str, snap: Snapshot,
                            paths: list[str] | None = None,
                            keep_meta: bool = False) -> DataFrame:
        """Live rows of ``paths`` with the two row-tracking carry
        columns attached: ``_x_row_id`` = COALESCE(materialized id,
        add.baseRowId + row_index) and ``_x_rcv`` = COALESCE(
        materialized version, add.defaultRowCommitVersion). The
        per-file (base id, default version) map is metadata-scale
        (O(#files), same bound as the snapshot itself) and joins
        broadcast. ``keep_meta=True`` also returns ``__fn``/``__ri``
        for callers that mask (DV paths)."""
        rel = sorted(snap.files) if paths is None else paths
        cols = [f.name for f in snap.schema.fields]
        meta_cols = ["__fn", "__ri"] if keep_meta else []
        if not rel:
            out_schema = (snap.schema
                          .add(ROW_ID_COL, "long").add(ROW_RCV_COL, "long"))
            if keep_meta:
                out_schema = out_schema.add("__fn", "string").add("__ri", "long")
            return self.spark.createDataFrame([], out_schema)
        pschema = (_physical_schema(snap.schema)
                   .add(ROW_ID_COL, "long").add(ROW_RCV_COL, "long"))
        raw = (
            self.spark.read.schema(pschema)
            .option("basePath", table)
            .parquet(*[os.path.join(table, p) for p in rel])
            .select(
                *[F.col(_physical_name(f)).alias(f.name)
                  for f in snap.schema.fields],
                F.col(ROW_ID_COL).alias("__mat_id"),
                F.col(ROW_RCV_COL).alias("__mat_rcv"),
                self._rel_path_col(table).alias("__fn"),
                F.col("_metadata.row_index").alias("__ri"),
            )
        )
        base_rows = [
            (p,
             snap.files[p].get("baseRowId"),
             snap.files[p].get("defaultRowCommitVersion"))
            for p in rel
        ]
        base_map = self.spark.createDataFrame(
            base_rows, "__fn string, __base long, __rcv0 long"
        )
        out = raw.join(F.broadcast(base_map), "__fn")
        masked = [p for p in rel if (snap.files.get(p) or {}).get("dv")]
        if masked:
            out = out.join(self._dv_rows(table, snap, masked),
                           ["__fn", "__ri"], "left_anti")
        return out.select(
            *cols,
            F.coalesce(F.col("__mat_id"),
                       F.col("__base") + F.col("__ri")).alias(ROW_ID_COL),
            F.coalesce(F.col("__mat_rcv"),
                       F.col("__rcv0")).alias(ROW_RCV_COL),
            *meta_cols,
        )

    def _read_for_rewrite(self, table: str, snap: Snapshot,
                          paths: list[str] | None = None) -> DataFrame:
        """The read every PRESERVING rewrite path (OPTIMIZE / CLUSTER /
        COMPACT / PURGE / CoW UPDATE / DELETE / MERGE target slice)
        uses: the plain snapshot scan, plus — when row tracking is on —
        the ``_x_row_id``/``_x_rcv`` carry columns, which ride through
        the rewrite into the new files so every surviving row keeps
        its stable id."""
        if not self._row_tracking_on(snap.configuration):
            return self._read_snapshot(table, snap, paths)
        return self._read_rows_with_ids(table, snap, paths)

    @staticmethod
    def _rewrite_cols(snap: Snapshot, df: DataFrame) -> list[str]:
        """Column list a rewrite writes: the table schema plus any
        row-tracking carry columns the read attached."""
        return [f.name for f in snap.schema.fields] + [
            c for c in (ROW_ID_COL, ROW_RCV_COL) if c in df.columns
        ]

    def with_row_ids(self, ref: TableRef) -> DataFrame:
        """Row-tracking read surface (Delta's ``_metadata.row_id`` /
        ``row_commit_version``): the table plus ``_row_id`` (stable,
        unique, survives OPTIMIZE/CLUSTER/PURGE/UPDATE/MERGE/RESTORE/
        CLONE) and ``_row_commit_version`` (the commit that last
        created or modified the row). Time travel via
        ``ref.options['versionAsOf']``."""
        table = self._table_path(ref)
        version = ref.options.get("versionAsOf")
        snap = resolve_snapshot(
            table, int(version) if version is not None else None
        )
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        if not self._row_tracking_on(snap.configuration):
            raise DataSourceException(
                f"row tracking is not enabled on {table!r} "
                f"(set {ROW_TRACKING_KEY}=true)"
            )
        df = self._read_rows_with_ids(table, snap)
        return df.select(
            *[f.name for f in snap.schema.fields],
            F.col(ROW_ID_COL).alias("_row_id"),
            F.col(ROW_RCV_COL).alias("_row_commit_version"),
        )

    # -- commit machinery ----------------------------------------------
    def _commit(self, table: str, expected_version: int, actions: list[dict],
                operation: str,
                txn: tuple[str, int] | list[tuple[str, int]] | None = None,
                ) -> int:
        """Write version ``expected_version`` atomically; raises
        ConcurrentWriteException if that version already exists.

        ``txn=(app_id, txn_version)`` stamps the commit with an
        application transaction id (Delta's txnAppId/txnVersion
        idempotent-writes pattern): :meth:`last_txn_version` reads it
        back so a replayed writer can skip work it already committed.
        A LIST of stamps records several application positions in the
        same atomic commit (Delta likewise allows multiple
        SetTransaction actions per commit) — the fused IVM join-view
        refresh lands both sides' applied positions with one state
        rewrite through this.

        The stamp is also VERIFIED here, inside the commit path
        (Delta's SetTransaction conflict check): if a commit with the
        same appId and version >= the incoming one already landed —
        including one that landed after the caller resolved its
        snapshot — :class:`TxnAlreadyCommittedException` is raised
        instead of double-applying the batch. The check scans the log
        state below ``expected_version``; any commit landing after the
        scan necessarily takes ``expected_version`` itself, which makes
        this commit's O_EXCL create fail — so check+stamp stay atomic
        with respect to the version race.
        """
        d = _log_path(table)
        os.makedirs(d, exist_ok=True)
        stamps: list[tuple[str, int]] = (
            [] if txn is None
            else [txn] if isinstance(txn, tuple) else list(txn)
        )
        if stamps:
            durable = self._txn_stamps(table, upto=expected_version - 1)
            for app, ver in stamps:
                if durable.get(app, -1) >= int(ver):
                    raise TxnAlreadyCommittedException(
                        f"txn appId={app!r} version {ver} already "
                        f"committed to {table!r} (latest stamp "
                        f"{durable[app]}) — replay detected"
                    )
        path = os.path.join(d, f"{expected_version:020d}.json")
        info: dict = {"operation": operation}
        # in-commit timestamp (Delta ICT): commit time rides IN the
        # commit payload, clamped monotone against the previous
        # version, so timestamp time travel survives file copies,
        # restores from backup, and clock skew — mtime is only the
        # fallback for pre-ICT commits
        import time

        ts_ms = int(time.time() * 1000)
        prev = os.path.join(d, f"{expected_version - 1:020d}.json")
        if expected_version > 0 and os.path.isfile(prev):
            prev_ts = _commit_timestamp_ms(prev)
            if prev_ts is not None:
                ts_ms = max(ts_ms, prev_ts + 1)
        info["timestamp"] = ts_ms
        if len(stamps) == 1:
            info["txn"] = {"appId": stamps[0][0],
                           "version": int(stamps[0][1])}
        elif stamps:
            info["txns"] = [
                {"appId": app, "version": int(ver)} for app, ver in stamps
            ]
        actions = self._assign_row_ids(table, expected_version, actions)
        actions, batch_side = self._maybe_batch_adds(
            table, expected_version, actions
        )
        payload = "".join(
            json.dumps(a, default=str) + "\n"
            for a in actions + [{"commitInfo": info}]
        )
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            if batch_side is not None:
                # lost the version race: this batch sidecar will never
                # be referenced — reap it now (the age-guarded orphan
                # sweep is the crash backstop)
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(_log_path(table), batch_side))
            raise ConcurrentWriteException(
                f"version {expected_version} of {table!r} was committed "
                f"concurrently (operation {operation})"
            ) from exc
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
        self._maybe_checkpoint(table, expected_version)
        return expected_version

    def _maybe_batch_adds(self, table: str, expected_version: int,
                          actions: list[dict],
                          ) -> tuple[list[dict], str | None]:
        """Convert a large commit's add actions into a TYPED parquet
        batch sidecar referenced by one ``addBatch`` action (Delta's
        multi-part-checkpoint idea applied to the tail): a 100k-file
        COPY INTO / RESTORE / DV sweep then replays — and serves the
        metadata plane — as a lazy columnar layer, never N driver-side
        json.loads. The sidecar lands BEFORE the O_EXCL commit that
        references it (uniquely named, so racing writers can't clobber
        each other); a loser's orphan is reaped immediately on the
        race, or age-guarded by clean_log after a crash."""
        n_adds = sum(1 for a in actions if "add" in a)
        if n_adds < COMMIT_PARQUET_MIN:
            return actions, None
        meta = next((a["metaData"] for a in actions if "metaData" in a),
                    None)
        if meta is not None:
            schema = StructType.fromJson(json.loads(meta["schemaJson"]))
            part_cols = meta["partitionColumns"]
        else:
            snap = resolve_snapshot(table)
            if snap is None:  # first commit without metaData: caller
                return actions, None  # bug, let the ordinary path error
            schema, part_cols = snap.schema, snap.partition_cols
        adds = [a["add"] for a in actions if "add" in a]
        side = (f"{expected_version:020d}.commit.adds-"
                f"{uuid.uuid4().hex[:8]}.parquet")
        _publish_adds_sidecar(
            os.path.join(_log_path(table), side), adds, schema, part_cols
        )
        batch = {"addBatch": {"parquet": side, "count": len(adds)}}
        out: list[dict] = []
        placed = False
        for a in actions:
            if "add" in a:
                if not placed:  # batch rides at the FIRST add's slot,
                    out.append(batch)  # preserving action order
                    placed = True
            else:
                out.append(a)
        return out, side

    def _assign_row_ids(self, table: str, expected_version: int,
                        actions: list[dict]) -> list[dict]:
        """Row tracking (Delta's ``rowTracking``): when enabled, every
        NEW file's add action gets a ``baseRowId`` (its rows' stable
        ids are ``baseRowId + row_index`` unless a preserving rewrite
        materialized older ids) and a ``defaultRowCommitVersion``;
        the table-wide high-water mark rides the same commit as a
        ``rowIdHighWaterMark`` action. Assignment happens HERE — the
        one choke point every commit funnels through — on COPIES of
        the caller's actions, so a lost version race reassigns from
        the fresh snapshot and two racing writers can never mint the
        same id range (the O_EXCL commit is the arbiter). Adds that
        already carry a baseRowId (RESTORE/CLONE re-emits, DV
        re-points, the enablement re-emission) keep it verbatim —
        Delta's rule that an id is frozen per physical file."""
        meta_cfg = next(
            (a["metaData"].get("configuration", {})
             for a in actions if "metaData" in a), None,
        )
        # fast path: tables that never enabled tracking pay ONE stat
        # call per commit, not a log replay — the marker is dropped at
        # first enablement and never removed (a later disable is read
        # from the resolved configuration)
        marker = os.path.join(_log_path(table), "_row_tracking_enabled")
        meta_on = (meta_cfg is not None and
                   str(meta_cfg.get(ROW_TRACKING_KEY, "")).lower()
                   == "true")
        if not meta_on and not os.path.exists(marker):
            return actions
        fresh = [a for a in actions
                 if "add" in a and "baseRowId" not in a["add"]]
        if not fresh and not meta_on:
            return actions
        snap = resolve_snapshot(table) if expected_version > 0 else None
        cfg = (meta_cfg if meta_cfg is not None
               else (snap.configuration if snap is not None else {}))
        if str(cfg.get(ROW_TRACKING_KEY, "")).lower() != "true":
            return actions
        if not os.path.exists(marker):
            with open(marker, "w") as fh:
                fh.write("1")
        if not fresh:
            return actions
        next_id = (snap.row_id_high if snap is not None else -1) + 1
        out: list[dict] = []
        for a in actions:
            if "add" in a and "baseRowId" not in a["add"]:
                add = dict(a["add"])
                add["baseRowId"] = next_id
                add["defaultRowCommitVersion"] = expected_version
                next_id += int(add.get("numRecords") or 0)
                out.append({**a, "add": add})
            else:
                out.append(a)
        out.append({"rowIdHighWaterMark": next_id - 1})
        return out

    def _replay_carried(self, table: str, ck_key: str, seed, fold,
                        upto: int | None = None):
        """Replay one piece of checkpoint-carried log state at version
        ``upto`` (default: latest): seed from the newest checkpoint at
        or below ``upto`` that carries ``ck_key`` (pre-feature
        checkpoints fall through to a full scan), then ``fold`` every
        commit line after it. Per-call cost is bounded by
        CHECKPOINT_INTERVAL, not table age, and because checkpoints
        carry the state forward it survives commit-file retention
        (clean_log refreshes its floor checkpoint through
        :meth:`_write_checkpoint` to retrofit new keys). Shared by txn
        stamps and COPY INTO ledger refs — add the next carried key
        here, not as another copy of this loop."""
        commits, checkpoints = _list_log(table)
        state = seed(None)
        start = 0
        usable = [
            c for c in checkpoints
            if upto is None or _version_of(c) <= upto
        ]
        for ck_name in reversed(usable):
            with open(os.path.join(_log_path(table), ck_name)) as fh:
                ck = json.load(fh)
            if ck_key in ck:
                state = seed(ck[ck_key])
                start = _version_of(ck_name) + 1
                break
        for fname in commits:
            v = _version_of(fname)
            if v < start or (upto is not None and v > upto):
                continue
            with open(os.path.join(_log_path(table), fname)) as fh:
                for line in fh:
                    fold(state, line)
        return state

    def _txn_stamps(self, table: str, upto: int | None = None) -> dict[str, int]:
        """appId -> highest committed txn version, at log state
        ``upto`` (default: latest) — replayed via
        :meth:`_replay_carried` (checkpoint ``txns`` map)."""
        def seed(v) -> dict[str, int]:
            return {} if v is None else {k: int(x) for k, x in v.items()}

        def fold(stamps: dict[str, int], line: str) -> None:
            # adds never deserialize; '"txns"' does NOT contain the
            # substring '"txn"' (the closing quote differs), so both
            # keys are checked
            if '"txn"' not in line and '"txns"' not in line:
                return
            info = json.loads(line).get("commitInfo")
            if not info:
                return
            multi = ([info["txn"]] if "txn" in info else [])
            multi += list(info.get("txns", []))
            for t in multi:
                stamps[t["appId"]] = max(
                    stamps.get(t["appId"], -1), int(t["version"])
                )

        return self._replay_carried(table, "txns", seed, fold, upto)

    def _copy_ledger_refs(self, table: str, upto: int | None = None) -> list[str]:
        """Relative paths of every COPY INTO loaded-file ledger
        referenced by a committed ``copyInto`` action at log state
        ``upto`` (default: latest) — replayed via
        :meth:`_replay_carried` (checkpoint ``copyLedgers`` list), so
        the refs survive commit-file retention."""
        def seed(v) -> list[str]:
            return [] if v is None else list(v)

        def fold(refs: list[str], line: str) -> None:
            if '"copyInto"' not in line:
                return
            action = json.loads(line)
            if "copyInto" in action:
                refs.append(action["copyInto"]["ledger"])

        return self._replay_carried(table, "copyLedgers", seed, fold, upto)

    def _copy_ledger_paths(self, table: str) -> list[str]:
        """Absolute paths of every REFERENCED COPY INTO ledger,
        existence-validated. Referenced ledgers are carried forward by
        every checkpoint and orphan reaping only removes UNreferenced
        ones, so a missing referenced ledger is log corruption —
        silently skipping it would degrade exactly-once into silent
        duplicate reloads, so it fails loudly instead (mirrors the
        missing-sidecar error in LazyAdds._read)."""
        out = []
        for rel in self._copy_ledger_refs(table):
            p = os.path.join(_log_path(table), rel)
            if not os.path.isfile(p):
                raise DataSourceException(
                    f"COPY INTO ledger {rel!r} referenced by the log of "
                    f"{table!r} is missing — log corruption; restore the "
                    "ledger or FORCE-reload after auditing for duplicates"
                )
            out.append(p)
        return out

    def _copy_loaded(self, table: str) -> set[str]:
        """Source-file identities (absolute paths) already ingested by
        COPY INTO — the union of every committed ledger, materialized
        on the driver (the small-ledger path; see
        :meth:`_copy_new_files` for the distributed form)."""
        import pyarrow.parquet as pq  # noqa: PLC0415

        loaded: set[str] = set()
        for p in self._copy_ledger_paths(table):
            loaded.update(
                pq.read_table(p, columns=["path"])
                .column("path").to_pylist()
            )
        return loaded

    def _copy_new_files(self, table: str,
                        discovered: list[tuple[str, int, int]],
                        ) -> list[tuple[str, int, int]]:
        """``discovered`` minus the files a committed COPY already
        loaded. Small ledgers resolve as a driver set-difference; once
        the accumulated ledger row count (footer metadata only — no
        data read on the sizing probe) passes COPY_LEDGER_DRIVER_MAX,
        the difference runs as a DISTRIBUTED left-anti join over the
        ledger parquet files: the candidate batch (O(batch)) comes
        back to the driver, the ledger (O(files ever copied)) never
        does — the 100-TB landing zone drip-fed for years stays
        ingestible by a driver of any size."""
        import pyarrow.parquet as pq  # noqa: PLC0415

        paths = self._copy_ledger_paths(table)
        total = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
        if total <= COPY_LEDGER_DRIVER_MAX:
            loaded = self._copy_loaded(table)
            return [t for t in discovered if t[0] not in loaded]
        disc = self.spark.createDataFrame(
            [(t[0],) for t in discovered], "path string"
        )
        led = self.spark.read.parquet(*paths).select("path")
        # left-anti with the huge ledger on the RIGHT: Spark shuffles
        # both sides on path (never broadcasts the ledger); the result
        # is bounded by the discovered batch
        fresh = {
            r["path"]
            for r in disc.join(led, "path", "left_anti").collect()
        }
        return [t for t in discovered if t[0] in fresh]

    def _maybe_checkpoint(self, table: str, version: int) -> None:
        if version == 0 or version % CHECKPOINT_INTERVAL != 0:
            return
        self._write_checkpoint(table, version)

    def _write_checkpoint(self, table: str, version: int) -> None:
        """Write (or refresh) the checkpoint at ``version`` from the
        replayed log — derived state, so overwriting is idempotent.
        clean_log refreshes its floor checkpoint through this before
        pruning, which retrofits keys older checkpoints predate
        (``txns``, ``copyLedgers``) while their commits still exist."""
        snap = resolve_snapshot(table, version)
        ck = {
            "version": version,
            "schemaJson": snap.schema_json,
            "partitionColumns": snap.partition_cols,
            "configuration": snap.configuration,
            "txns": self._txn_stamps(table, upto=version),
            "rowIdHighWaterMark": snap.row_id_high,
            "copyLedgers": self._copy_ledger_refs(table, upto=version),
        }
        files = snap.files
        n_live = len(files)  # path-column read on a lazy set, no JSON
        if n_live >= CHECKPOINT_PARQUET_MIN:
            # large live set: the adds go to a parquet sidecar (see
            # LazyAdds). Sidecar lands BEFORE the JSON that
            # references it, so a reader can never see a dangling
            # reference; an orphan from a failed JSON publish is inert
            # and reaped by clean_log.
            side = f"{version:020d}.checkpoint.adds.parquet"
            dest = os.path.join(_log_path(table), side)
            if isinstance(files, LazyAdds) and files.typed():
                # INCREMENTAL columnar refresh: previous sidecar rows
                # copy through arrow-side (kill-set filtered), only
                # tail delta adds serialize fresh — the checkpoint on
                # a million-file table never json.loads its live set
                ck["addCount"] = _refresh_typed_sidecar(
                    files, snap.schema, snap.partition_cols, dest
                )
            else:
                adds = [files[p] for p in sorted(files)]
                _publish_adds_sidecar(
                    dest, adds, snap.schema, snap.partition_cols
                )
                ck["addCount"] = len(adds)
            ck["addsParquet"] = side
        else:
            ck["adds"] = [files[p] for p in sorted(files)]
        path = os.path.join(_log_path(table), f"{version:020d}.checkpoint.json")
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(ck, fh, default=str)
        os.replace(tmp, path)  # atomic publish

    def _latest_version(self, table: str) -> int | None:
        commits, _ = _list_log(table)
        return _version_of(commits[-1]) if commits else None

    # -- data-file writing ---------------------------------------------
    @staticmethod
    def _mark_no_data_change(actions: list[dict]) -> list[dict]:
        """Stamp add/remove actions ``dataChange: false`` (Delta's flag
        on logically-no-op rewrites — compaction, clustering, OPTIMIZE,
        REORG PURGE): CDF surfaces skip them entirely and streams
        neither abort nor re-emit. At 100 TB this is what keeps an
        OPTIMIZE from making every incremental consumer re-read the
        compacted data as cancelling delete+insert pairs."""
        for a in actions:
            for k in ("add", "remove"):
                if k in a:
                    a[k]["dataChange"] = False
        return actions

    @staticmethod
    def _as_data_change(add: dict) -> dict:
        """Copy of an add action with any inherited ``dataChange:
        false`` dropped — for commits that re-emit a stored add as a
        REAL data change (RESTORE re-adds, DV mask re-points, CLONE's
        initial population): the flag describes the commit that writes
        the action, never the file's history."""
        return {k: v for k, v in add.items() if k != "dataChange"}

    def _write_files(self, df: DataFrame, table: str,
                     part_cols: list[str],
                     schema: StructType | None = None,
                     config_override: dict[str, str] | None = None,
                     ) -> list[dict]:
        """Materialize ``df`` as immutable parquet files inside the
        table directory (staged under a unique name, then moved — the
        files are invisible until an add action commits them). Returns
        add-actions with footer row counts and per-column min/max.

        CHECK constraints (``constraint.<name>`` configuration keys)
        are enforced HERE — the one choke point every write path
        (append/overwrite/dynamic/merge/compact/cluster/SCD) funnels
        through — before any file lands: a violating row aborts the
        whole transaction with the constraint name and an example row
        (Delta's InvariantViolationException shape). SQL semantics: a
        row violates only when the expression is FALSE (NULL passes,
        the standard CHECK rule); cost is one validation job per
        write, and only when constraints exist.

        Column mapping: constraints/generated columns validate on the
        LOGICAL df, then columns rename to their stable physical names
        for the parquet write. The add action's partitionValues and
        footer stats stay PHYSICAL-keyed — physical names never change,
        so this metadata survives any later RENAME COLUMN; consumers
        translate logical->physical at lookup (identity for unmapped
        tables). ``schema`` supplies the mapping.
        """
        self._enforce_constraints(df, table, config_override)
        phys = _physical_map(schema) if schema is not None else {}
        if any(phys.get(c, c) != c for c in df.columns):
            df = df.select(
                *[F.col(c).alias(phys.get(c, c)) for c in df.columns]
            )
        write_part_cols = [phys.get(c, c) for c in part_cols]
        staging = os.path.join(table, f"_staging-{uuid.uuid4().hex}")
        writer = df.write.mode("overwrite")
        if write_part_cols:
            writer = writer.partitionBy(*write_part_cols)
        writer.parquet(staging)
        adds: list[dict] = []
        try:
            staged: list[tuple[str, str]] = []  # (src, relpart)
            for root, _dirs, names in os.walk(staging):
                staged.extend(
                    (os.path.join(root, name),
                     os.path.relpath(root, staging))
                    for name in names if name.endswith(".parquet")
                )
            # one batched stats pass (executor-side past the
            # threshold) instead of a per-file read inside the loop:
            # a 100k-file publish must not serialize 100k footer
            # reads on one driver core
            stats_by_src = self._collect_footer_stats(
                [s for s, _ in staged]
            )
            for src, relpart in staged:
                part_values = self._parse_partition_values(
                    relpart, write_part_cols
                )
                fname = f"part-{uuid.uuid4().hex}.parquet"
                rel = fname if relpart == "." else os.path.join(relpart, fname)
                dst = os.path.join(table, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                num_rows, stats = stats_by_src[src]
                shutil.move(src, dst)
                # vacuum's retention guard measures age by mtime;
                # a move preserves the STAGING-write mtime, so a
                # long-running write could look old the moment it
                # publishes — restamp so age = time-since-publish
                os.utime(dst)
                adds.append(
                    {
                        "path": rel,
                        "partitionValues": part_values,
                        "numRecords": num_rows,
                        # published byte size (Delta's add.size):
                        # drives maxBytesPerTrigger admission and
                        # size-aware maintenance without a stat call
                        "size": os.path.getsize(dst),
                        "stats": stats,
                    }
                )
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        return adds

    def _collect_footer_stats(
            self, srcs: list[str]) -> dict[str, tuple[int, dict]]:
        """src path -> (row count, {minValues, maxValues}) for every
        staged file of a publish. Small batches read on the driver
        (one footer each); batches of FOOTER_STATS_DISTRIBUTED_MIN or
        more fan out EXECUTOR-side (``sc.parallelize`` +
        :func:`_footer_stats_of` per file) — workers read only
        FOOTERS, and each returns a few hundred bytes of bounds, so
        the collect is O(batch metadata), never data. Results are
        bit-identical to the driver loop (same function), pinned by
        ``tests/test_commit_batch.py`` parity."""
        if len(srcs) < FOOTER_STATS_DISTRIBUTED_MIN:
            return {p: _footer_stats_of(p) for p in srcs}
        sc = self.spark.sparkContext
        n_slices = min(len(srcs), max(2, sc.defaultParallelism))
        return dict(
            sc.parallelize(srcs, n_slices)
            .map(lambda p: (p, _footer_stats_of(p)))
            .collect()
        )

    def _enforce_constraints(self, df: DataFrame, table: str,
                             config: dict[str, str] | None = None) -> None:
        """``config`` overrides the snapshot configuration — needed by
        overwrite_schema, whose reconciled config (not the soon-to-be-
        replaced snapshot's) is what the NEW data must satisfy."""
        if config is None:
            snap = resolve_snapshot(table)
            config = snap.configuration if snap is not None else {}
        constraints = {
            k[len("constraint."):]: v for k, v in config.items()
            if k.startswith("constraint.")
        }
        # generated columns validate in the SAME single pass: a
        # caller-provided value that disagrees with the generation
        # expression is a violation (Delta's generated-column check;
        # values filled by _fill_generated match trivially)
        for k, expr in config.items():
            if k.startswith("generated."):
                col = k[len("generated."):]
                constraints[f"generated:{col}"] = f"{col} <=> ({expr})"
        if not constraints:
            return
        checks = [
            F.when(F.expr(expr) == F.lit(False), F.lit(name))
            for name, expr in sorted(constraints.items())
        ]
        bad = (
            df.withColumn("__violated", F.coalesce(*checks, F.lit(None)))
            .filter(F.col("__violated").isNotNull())
            .limit(1)
            .collect()
        )
        if bad:
            row = bad[0]
            name = row["__violated"]
            raise DataSourceException(
                f"CHECK constraint {name!r} "
                f"({constraints[name]}) violated by row: "
                f"{ {k: v for k, v in row.asDict().items() if k != '__violated'} }"
            )

    @staticmethod
    def _fill_generated(df: DataFrame, snap: Snapshot) -> DataFrame:
        """Compute generated columns the writer did not provide (Delta
        generated-column semantics: omitted -> computed from the
        expression; provided -> validated against it in the
        constraints pass). Runs before _conform so a generated column
        missing from the write is filled, not a hard error."""
        for col, expr in sorted(snap.generated.items()):
            if col not in df.columns:
                df = df.withColumn(col, F.expr(expr))
        return df

    @staticmethod
    def _fill_defaults(df: DataFrame, snap: Snapshot) -> DataFrame:
        """Fill columns the writer OMITTED with their DEFAULT
        expression (Delta's allowColumnDefaults): runs before
        _fill_generated (a generation expression may reference a
        defaulted column) and before _conform. A column the writer
        provides — even as NULL — is never touched, the SQL-standard
        rule."""
        types = {f.name: f.dataType for f in snap.schema.fields}
        for col, expr in sorted(snap.defaults.items()):
            if col not in df.columns and col in types:
                df = df.withColumn(col, F.expr(expr).cast(types[col]))
        return df

    def set_column_default(self, ref: TableRef, col: str, expr: str) -> None:
        """``ALTER TABLE ... ALTER COLUMN col SET DEFAULT expr``
        (Delta's allowColumnDefaults): subsequent insert-shaped writes
        that omit the column fill it with ``expr`` instead of NULL.
        The expression must be CONSTANT (no column references — the
        Delta/ANSI rule) and assignment-castable to the column's
        declared type, both validated here against an empty relation,
        so a widening or retyping conflict rejects at DDL time, not at
        some later write. Metadata-only: existing rows are untouched
        (they keep their stored values — also the SQL-standard rule)."""
        table, snap = self._require_snapshot(ref)
        by_name = {f.name: f for f in snap.schema.fields}
        if col not in by_name:
            raise DataSourceException(f"no column {col!r} on {table!r}")
        if col in snap.identity:
            raise DataSourceException(
                f"column {col!r} is GENERATED ALWAYS AS IDENTITY; "
                "it cannot also have a DEFAULT"
            )
        if col in snap.generated:
            raise DataSourceException(
                f"column {col!r} has a generation expression; "
                "it cannot also have a DEFAULT"
            )
        tname = by_name[col].dataType.simpleString()
        try:
            # constant-only + castable: resolves against NO columns
            probe = self.spark.sql(f"SELECT CAST(({expr}) AS {tname})")
            probe.collect()
        except Exception as exc:  # noqa: BLE001 - surface the cause
            raise DataSourceException(
                f"DEFAULT for {col!r} must be a constant expression "
                f"castable to {tname}: ({expr}) failed: {exc}"
            ) from None
        # constant means CONSTANT: the documented Delta/ANSI contract
        # is a value fixed at DDL time, but column-free expressions
        # like rand(), uuid() or current_timestamp() pass the probe
        # above and would then re-evaluate PER WRITE. Reject anything
        # non-deterministic or query-time-dependent (and subqueries)
        # via the analyzed plan, not string matching.
        analyzed = probe._jdf.queryExecution().analyzed()
        exprs = analyzed.expressions()
        nondet = any(
            not exprs.apply(i).deterministic()
            for i in range(exprs.size())
        )
        has_subq = not analyzed.subqueriesAll().isEmpty()
        # CurrentTimestamp/CurrentDate/Now report deterministic (they
        # constant-fold per QUERY) but differ per write — exactly the
        # divergence the contract forbids
        import re as _re

        timey = bool(_re.search(
            r"(?i)(?<!\w)(current_timestamp|current_date|current_timezone"
            r"|localtimestamp|now|unix_timestamp|current_user"
            r"|session_user|user)(?!\w)",
            _strip_sql_literals(expr),
        ))
        if nondet or has_subq or timey:
            raise DataSourceException(
                f"DEFAULT for {col!r} must be a deterministic constant "
                f"(no subqueries, no random or current-time functions): "
                f"({expr})"
            )
        config = {**snap.configuration, f"default.{col}": expr}
        self._commit(
            table, self._expect_unchanged(table, snap.version),
            [{
                "metaData": {
                    "schemaJson": snap.schema_json,
                    "partitionColumns": snap.partition_cols,
                    "configuration": config,
                }
            }],
            "SET DEFAULT",
        )

    def drop_column_default(self, ref: TableRef, col: str) -> None:
        """``ALTER TABLE ... ALTER COLUMN col DROP DEFAULT``."""
        table, snap = self._require_snapshot(ref)
        key = f"default.{col}"
        if key not in snap.configuration:
            raise DataSourceException(
                f"column {col!r} has no DEFAULT on {table!r}"
            )
        config = {k: v for k, v in snap.configuration.items() if k != key}
        self._commit(
            table, self._expect_unchanged(table, snap.version),
            [{
                "metaData": {
                    "schemaJson": snap.schema_json,
                    "partitionColumns": snap.partition_cols,
                    "configuration": config,
                }
            }],
            "DROP DEFAULT",
        )

    def set_generated_column(self, ref: TableRef, col: str, expr: str) -> None:
        """Declare ``col`` as GENERATED ALWAYS AS (<expr>) (Delta
        generated columns): subsequent writes through any path compute
        the column when omitted and reject provided values that
        disagree with the expression. Existing rows are validated
        first (one scan, like add_constraint). The column must already
        exist in the schema — typically declared at create() together
        with partitioning by it (the ingest-date pattern:
        ``day = date_format(ts, 'yyyy-MM-dd')``, partition_by day,
        writers only supply ts)."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        if col not in {f.name for f in snap.schema.fields}:
            raise DataSourceException(
                f"generated column {col!r} is not in the schema of {table!r}"
            )
        key = f"generated.{col}"
        if key in snap.configuration:
            raise DataSourceException(
                f"column {col!r} already has a generation expression"
            )
        bad = (
            self._read_snapshot(table, snap)
            .filter(F.expr(f"{col} <=> ({expr})") == F.lit(False))
            .limit(1)
            .collect()
        )
        if bad:
            raise DataSourceException(
                f"cannot set generated column {col!r} AS ({expr}): "
                f"existing row disagrees: {bad[0].asDict()}"
            )
        config = {**snap.configuration, key: expr}
        self._commit(
            table,
            self._expect_unchanged(table, snap.version),
            [{
                "metaData": {
                    "schemaJson": snap.schema_json,
                    "partitionColumns": snap.partition_cols,
                    "configuration": config,
                }
            }],
            "SET GENERATED COLUMN",
        )

    def drop_generated_column(self, ref: TableRef, col: str) -> None:
        """Remove the generation expression (the column stays, it just
        becomes an ordinary writable column)."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        key = f"generated.{col}"
        if key not in snap.configuration:
            raise DataSourceException(
                f"column {col!r} has no generation expression on {table!r}"
            )
        config = {k: v for k, v in snap.configuration.items() if k != key}
        self._commit(
            table,
            self._expect_unchanged(table, snap.version),
            [{
                "metaData": {
                    "schemaJson": snap.schema_json,
                    "partitionColumns": snap.partition_cols,
                    "configuration": config,
                }
            }],
            "DROP GENERATED COLUMN",
        )

    def set_properties(self, ref: TableRef, props: dict[str, str]) -> None:
        """ALTER TABLE SET TBLPROPERTIES: merge the given keys into the
        table configuration via one metaData commit. The reserved
        ``constraint.`` / ``generated.`` namespaces must go through
        their dedicated DDL (they validate data)."""
        reserved = [k for k in props
                    if k.startswith(("constraint.", "generated.",
                                     "identity.", "default."))]
        if reserved:
            raise DataSourceException(
                f"propert{'ies' if len(reserved) > 1 else 'y'} {reserved} "
                "use ADD CONSTRAINT / GENERATED ALWAYS AS / "
                "SET IDENTITY / SET DEFAULT DDL"
            )
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        if CLUSTER_BY_KEY in props or CLUSTER_STRATEGY_KEY in props:
            # validate and normalize at DDL time so the ingest-path
            # trigger never meets a malformed property
            merged = {**snap.configuration,
                      **{k: str(v) for k, v in props.items()}}
            cols, strategy = self._parse_cluster_property(merged) or ([], "")
            known = {f.name for f in snap.schema.fields}
            bad = [c for c in cols if c not in known]
            if not cols or bad:
                raise DataSourceException(
                    f"'{CLUSTER_BY_KEY}' must name existing columns "
                    f"(got {props.get(CLUSTER_BY_KEY)!r}"
                    + (f"; unknown: {bad}" if bad else "") + ")"
                )
            if strategy not in ("range", "zorder", "hilbert"):
                raise DataSourceException(
                    f"'{CLUSTER_STRATEGY_KEY}' must be range, zorder or "
                    f"hilbert (got {strategy!r})"
                )
            if CLUSTER_BY_KEY in props:
                props = {**props, CLUSTER_BY_KEY: json.dumps(cols)}
        config = {**snap.configuration,
                  **{k: str(v) for k, v in props.items()}}
        schema_json = snap.schema_json
        if COLUMN_MAPPING_KEY in props:
            mode = str(props[COLUMN_MAPPING_KEY])
            on = snap.configuration.get(COLUMN_MAPPING_KEY) == "name"
            if mode not in ("name",) or (on and mode != "name"):
                raise DataSourceException(
                    f"'{COLUMN_MAPPING_KEY}' only supports 'name', and "
                    "mapping cannot be disabled once enabled (files "
                    "already carry physical names)"
                )
            # enablement stamps physical = current logical on every
            # field, so every existing file keeps binding; idempotent
            # on re-enable (already-stamped fields keep their name)
            schema_json = _stamp_physical(
                snap.schema, snap.schema, {COLUMN_MAPPING_KEY: "name"}
            ).json()
        extra: list[dict] = []
        if (str(props.get(ROW_TRACKING_KEY, "")).lower() == "true"
                and str(snap.configuration.get(ROW_TRACKING_KEY, "")
                        ).lower() != "true"):
            # enabling row tracking on a table with history: re-emit
            # every live add lacking a baseRowId in the SAME commit —
            # _assign_row_ids stamps them, so existing rows get stable
            # ids atomically with the flag (Delta's ALTER TABLE
            # backfill, done metadata-only here). dataChange=false:
            # no CDF surface or stream re-sees the data.
            clash = [c for c in (ROW_ID_COL, ROW_RCV_COL)
                     if c in {f.name for f in snap.schema.fields}]
            if clash:
                raise DataSourceException(
                    f"cannot enable {ROW_TRACKING_KEY}: column name(s) "
                    f"{clash} are reserved for materialized row ids"
                )
            extra = [
                {"add": {**{k: v for k, v in snap.files[p].items()
                            if k != "baseRowId"},
                         "dataChange": False}}
                for p in sorted(snap.files)
                if "baseRowId" not in snap.files[p]
            ]
        self._commit(
            table,
            self._expect_unchanged(table, snap.version),
            [{
                "metaData": {
                    "schemaJson": schema_json,
                    "partitionColumns": snap.partition_cols,
                    "configuration": config,
                }
            }] + extra,
            "SET TBLPROPERTIES",
        )

    def set_not_null(self, ref: TableRef, col: str) -> None:
        """``ALTER TABLE ... ALTER COLUMN col SET NOT NULL`` (Delta's
        NOT NULL invariant): validates existing rows (one scan), then
        ONE metaData commit that both flips the field's nullable flag
        in the schema AND installs the enforcing CHECK constraint
        (``constraint.notnull_<col>``) every write path already
        honors — schema fidelity and enforcement can never diverge."""
        table, snap = self._require_snapshot(ref)
        by_name = {f.name: f for f in snap.schema.fields}
        if col not in by_name:
            raise DataSourceException(f"no column {col!r} on {table!r}")
        key = f"constraint.notnull_{col}"
        if key in snap.configuration or not by_name[col].nullable:
            raise DataSourceException(
                f"column {col!r} is already NOT NULL on {table!r}"
            )
        bad = (
            self._read_snapshot(table, snap)
            .filter(F.col(col).isNull()).limit(1).collect()
        )
        if bad:
            raise DataSourceException(
                f"cannot SET NOT NULL on {col!r}: existing row is NULL: "
                f"{bad[0].asDict()}"
            )
        fields = [
            StructField(f.name, f.dataType,
                        False if f.name == col else f.nullable,
                        f.metadata)
            for f in snap.schema.fields
        ]
        self._commit_schema(
            table, snap, StructType(fields), snap.partition_cols,
            "SET NOT NULL",
            configuration={**snap.configuration,
                           key: f"{col} IS NOT NULL"},
        )

    def drop_not_null(self, ref: TableRef, col: str) -> None:
        """``ALTER TABLE ... ALTER COLUMN col DROP NOT NULL``."""
        table, snap = self._require_snapshot(ref)
        by_name = {f.name: f for f in snap.schema.fields}
        if col not in by_name:
            raise DataSourceException(f"no column {col!r} on {table!r}")
        key = f"constraint.notnull_{col}"
        if key not in snap.configuration and by_name[col].nullable:
            raise DataSourceException(
                f"column {col!r} is not NOT NULL on {table!r}"
            )
        fields = [
            StructField(f.name, f.dataType,
                        True if f.name == col else f.nullable,
                        f.metadata)
            for f in snap.schema.fields
        ]
        self._commit_schema(
            table, snap, StructType(fields), snap.partition_cols,
            "DROP NOT NULL",
            configuration={k: v for k, v in snap.configuration.items()
                           if k != key},
        )

    def add_constraint(self, ref: TableRef, name: str, expr: str) -> None:
        """ALTER TABLE ADD CONSTRAINT <name> CHECK (<expr>): validates
        the EXISTING rows first (one scan, like Delta), then commits a
        metaData action whose configuration carries the constraint —
        every subsequent write through any path enforces it. NOT NULL
        is the special case ``col IS NOT NULL``."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        key = f"constraint.{name}"
        if key in snap.configuration:
            raise DataSourceException(
                f"constraint {name!r} already exists on {table!r}"
            )
        existing_bad = (
            self._read_snapshot(table, snap)
            .filter(F.expr(expr) == F.lit(False))
            .limit(1)
            .collect()
        )
        if existing_bad:
            raise DataSourceException(
                f"cannot add constraint {name!r} ({expr}): existing row "
                f"violates it: {existing_bad[0].asDict()}"
            )
        config = {**snap.configuration, key: expr}
        self._commit(
            table,
            self._expect_unchanged(table, snap.version),
            [{
                "metaData": {
                    "schemaJson": snap.schema_json,
                    "partitionColumns": snap.partition_cols,
                    "configuration": config,
                }
            }],
            "ADD CONSTRAINT",
        )

    def add_primary_key(self, ref: TableRef, name: str,
                        columns: list[str], rely: bool = False) -> None:
        """``ALTER TABLE ... ADD CONSTRAINT name PRIMARY KEY (cols)
        [RELY]`` — Delta/Databricks INFORMATIONAL constraint: never
        enforced on write (Delta's rule — PK/FK document intent for
        query layers and humans, CHECK constraints do the enforcing),
        but validated at DDL time the way Delta does: at most one
        primary key per table, and every key column must exist and be
        NOT NULL. ``rely`` records the RELY optimizer-hint flag.
        Stored as a ``pk.<name>`` configuration key (JSON payload), so
        it survives RESTORE/CLONE and reads back through SHOW
        TBLPROPERTIES; RENAME/DROP COLUMN refuse while a key column is
        referenced."""
        table, snap = self._require_snapshot(ref)
        self._check_constraint_name_free(table, snap, name)
        if not columns:
            raise DataSourceException(
                "PRIMARY KEY needs at least one column"
            )
        existing = [k for k in snap.configuration if k.startswith("pk.")]
        if existing:
            raise DataSourceException(
                f"{table!r} already has a primary key "
                f"({existing[0]}) — drop it first"
            )
        by_name = {f.name: f for f in snap.schema.fields}
        for c in columns:
            if c not in by_name:
                raise DataSourceException(f"no column {c!r} on {table!r}")
            if by_name[c].nullable:
                raise DataSourceException(
                    f"PRIMARY KEY column {c!r} must be NOT NULL "
                    "(ALTER COLUMN ... SET NOT NULL first — Delta's rule)"
                )
        config = {**snap.configuration, f"pk.{name}": json.dumps(
            {"columns": list(columns), "rely": bool(rely)}
        )}
        self._commit_schema(table, snap, snap.schema, snap.partition_cols,
                            "ADD CONSTRAINT", configuration=config)

    def add_foreign_key(self, ref: TableRef, name: str,
                        columns: list[str], parent: TableRef,
                        parent_columns: list[str] | None = None) -> None:
        """``ALTER TABLE ... ADD CONSTRAINT name FOREIGN KEY (cols)
        REFERENCES parent [(cols)]`` — informational, like the primary
        key. DDL-time validation: the local columns exist, the parent
        table exists, the referenced columns exist there with matching
        arity; referenced columns default to the parent's PRIMARY KEY.
        Stored as an ``fk.<name>`` configuration key (JSON payload
        naming the parent), no enforcement on either side."""
        table, snap = self._require_snapshot(ref)
        self._check_constraint_name_free(table, snap, name)
        if not columns:
            raise DataSourceException(
                "FOREIGN KEY needs at least one column"
            )
        local = {f.name for f in snap.schema.fields}
        for c in columns:
            if c not in local:
                raise DataSourceException(f"no column {c!r} on {table!r}")
        ptable, psnap = self._require_snapshot(parent)
        pcols = {f.name for f in psnap.schema.fields}
        if parent_columns is None:
            pks = [json.loads(v)["columns"] for k, v in
                   psnap.configuration.items() if k.startswith("pk.")]
            if not pks:
                raise DataSourceException(
                    f"parent {ptable!r} has no PRIMARY KEY — name the "
                    "referenced columns explicitly"
                )
            parent_columns = pks[0]
        for c in parent_columns:
            if c not in pcols:
                raise DataSourceException(
                    f"no column {c!r} on parent {ptable!r}"
                )
        if len(parent_columns) != len(columns):
            raise DataSourceException(
                f"FOREIGN KEY arity mismatch: {columns} vs "
                f"{parent_columns}"
            )
        parent_id = parent.path if parent.is_path else parent.table
        config = {**snap.configuration, f"fk.{name}": json.dumps({
            "columns": list(columns),
            "parent": parent_id,
            "parent_columns": list(parent_columns),
        })}
        self._commit_schema(table, snap, snap.schema, snap.partition_cols,
                            "ADD CONSTRAINT", configuration=config)

    @staticmethod
    def _check_constraint_name_free(table: str, snap: Snapshot,
                                    name: str) -> None:
        for prefix in ("constraint.", "pk.", "fk."):
            if f"{prefix}{name}" in snap.configuration:
                raise DataSourceException(
                    f"constraint {name!r} already exists on {table!r}"
                )

    def drop_constraint(self, ref: TableRef, name: str) -> None:
        """ALTER TABLE DROP CONSTRAINT — a metaData commit without the
        key (CHECK, PRIMARY KEY, and FOREIGN KEY namespaces all
        resolve); unknown names are a hard error (silent no-ops hide
        typos)."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        key = next(
            (f"{p}{name}" for p in ("constraint.", "pk.", "fk.")
             if f"{p}{name}" in snap.configuration),
            None,
        )
        if key is None:
            raise DataSourceException(
                f"constraint {name!r} does not exist on {table!r}"
            )
        config = {k: v for k, v in snap.configuration.items() if k != key}
        self._commit(
            table,
            self._expect_unchanged(table, snap.version),
            [{
                "metaData": {
                    "schemaJson": snap.schema_json,
                    "partitionColumns": snap.partition_cols,
                    "configuration": config,
                }
            }],
            "DROP CONSTRAINT",
        )

    # -- schema evolution DDL -------------------------------------------
    def _commit_schema(self, table: str, snap: Snapshot,
                       schema: StructType, partition_cols: list[str],
                       operation: str,
                       configuration: dict[str, str] | None = None) -> None:
        """One metaData commit replacing the schema — the shape every
        schema-evolution DDL shares. Metadata-only: no data file is
        read or written, O(1) at any table size."""
        self._commit(
            table,
            self._expect_unchanged(table, snap.version),
            [{
                "metaData": {
                    "schemaJson": schema.json(),
                    "partitionColumns": partition_cols,
                    "configuration": (snap.configuration
                                      if configuration is None
                                      else configuration),
                }
            }],
            operation,
        )

    def _require_snapshot(self, ref: TableRef) -> tuple[str, Snapshot]:
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        return table, snap

    def _column_refs(self, snap: Snapshot, col: str) -> list[str]:
        """Configuration entries (CHECK constraints, generated-column
        expressions) that reference ``col`` — renaming or dropping the
        column would silently break them, so the DDL refuses and names
        the blockers (Delta's dependency check)."""
        import re

        pat = re.compile(rf"(?i)(?<![\w`.]){re.escape(col)}(?![\w`])")
        refs = [
            k for k, v in snap.configuration.items()
            if k.startswith(("constraint.", "generated.")) and pat.search(v)
        ]
        # informational PK/FK: a renamed/dropped key column would
        # silently invalidate the declared key — refuse, like Delta
        refs += [
            k for k, v in snap.configuration.items()
            if k.startswith(("pk.", "fk."))
            and col in json.loads(v)["columns"]
        ]
        if f"generated.{col}" in snap.configuration:
            refs.append(f"generated.{col}")  # the column IS generated
        return sorted(set(refs))

    def add_columns(self, ref: TableRef, cols_ddl: str) -> None:
        """ALTER TABLE ... ADD COLUMNS ("c1 int, c2 string"): widen the
        schema by one metaData commit. Existing files surface NULL for
        the new columns through the pinned-schema reader — zero data
        movement. Under column mapping the new columns get FRESH
        physical names, so a re-added name never binds to a previously
        dropped column's bytes."""
        table, snap = self._require_snapshot(ref)
        new_fields = list(StructType.fromDDL(cols_ddl).fields)
        existing = {f.name for f in snap.schema.fields}
        dups = [f.name for f in new_fields if f.name in existing]
        if dups:
            raise DataSourceException(
                f"column(s) {dups} already exist on {table!r}"
            )
        if snap.configuration.get(COLUMN_MAPPING_KEY) == "name":
            new_fields = [
                StructField(f.name, f.dataType, f.nullable,
                            {**(f.metadata or {}),
                             PHYSICAL_NAME_KEY: _fresh_physical()})
                for f in new_fields
            ]
        merged = StructType(list(snap.schema.fields) + new_fields)
        self._commit_schema(table, snap, merged, snap.partition_cols,
                            "ADD COLUMNS")

    def set_identity_column(self, ref: TableRef, col: str,
                            start: int = 1, step: int = 1) -> None:
        """Declare ``col`` GENERATED ALWAYS AS IDENTITY (START WITH
        ``start`` STEP ``step``) — Delta identity columns: appends must
        OMIT the column; the engine allocates values that are unique
        and move strictly in the step's direction, and the
        high-water mark commits ATOMICALLY with the data (the
        ``identity.<col>`` configuration update rides in the same
        commit as the add actions). Values may have gaps, exactly like
        Delta. Declared on an EMPTY table (the create-time shape) so
        no existing value can collide."""
        table, snap = self._require_snapshot(ref)
        if step == 0:
            raise DataSourceException("identity STEP cannot be 0")
        by_name = {f.name: f for f in snap.schema.fields}
        if col not in by_name:
            raise DataSourceException(f"no column {col!r} on {table!r}")
        from pyspark.sql.types import LongType

        if not isinstance(by_name[col].dataType, LongType):
            raise DataSourceException(
                f"identity column {col!r} must be BIGINT, got "
                f"{by_name[col].dataType.simpleString()}"
            )
        if col in snap.partition_cols:
            raise DataSourceException(
                f"identity column {col!r} cannot be a partition column"
            )
        if col in snap.generated:
            raise DataSourceException(
                f"column {col!r} already has a generation expression"
            )
        if col in snap.defaults:
            # symmetric with set_column_default's identity guard: the
            # allocator always fills the column first, so a DEFAULT
            # would silently never apply again
            raise DataSourceException(
                f"column {col!r} has a DEFAULT; it cannot also be "
                "GENERATED ALWAYS AS IDENTITY"
            )
        if snap.files:
            raise DataSourceException(
                "identity columns are declared on an empty table "
                "(create-time shape); this table already has data"
            )
        key = f"identity.{col}"
        if key in snap.configuration:
            raise DataSourceException(
                f"column {col!r} is already an identity column"
            )
        config = {**snap.configuration,
                  key: json.dumps({"start": int(start), "step": int(step),
                                   "high": int(start) - int(step)})}
        self._commit(
            table, self._expect_unchanged(table, snap.version),
            [{
                "metaData": {
                    "schemaJson": snap.schema_json,
                    "partitionColumns": snap.partition_cols,
                    "configuration": config,
                }
            }],
            "SET IDENTITY",
        )

    def widen_column(self, ref: TableRef, col: str, type_ddl: str) -> None:
        """ALTER TABLE ... ALTER COLUMN c TYPE <wider> (Delta's type
        widening): one metaData commit; existing files keep their
        narrow values and upcast through the pinned-schema read —
        no rewrite at any table size. Only the verified widening
        matrix is allowed (``_is_widening``); anything lossy or
        incompatible is refused."""
        table, snap = self._require_snapshot(ref)
        by_name = {f.name: f for f in snap.schema.fields}
        if col not in by_name:
            raise DataSourceException(f"no column {col!r} on {table!r}")
        new_type = StructType.fromDDL(f"c {type_ddl}").fields[0].dataType
        cur = by_name[col].dataType
        if not _is_widening(cur, new_type):
            raise DataSourceException(
                f"cannot change column {col!r} from {cur.simpleString()} "
                f"to {new_type.simpleString()}: not a supported widening"
            )
        fields = [
            StructField(f.name, new_type if f.name == col else f.dataType,
                        f.nullable, f.metadata)  # physical name survives
            for f in snap.schema.fields
        ]
        self._commit_schema(table, snap, StructType(fields),
                            snap.partition_cols, "ALTER COLUMN TYPE")

    def rename_column(self, ref: TableRef, old: str, new: str) -> None:
        """ALTER TABLE ... RENAME COLUMN old TO new — metadata-only:
        the logical field name changes, the stable PHYSICAL name the
        data files carry does not, so a 100-TB table renames in one
        commit. Requires ``columnMapping.mode = 'name'`` (without the
        mapping, files store logical names and a rename would orphan
        every existing file — the same reason Delta requires it)."""
        table, snap = self._require_snapshot(ref)
        if snap.configuration.get(COLUMN_MAPPING_KEY) != "name":
            raise DataSourceException(
                f"RENAME COLUMN requires '{COLUMN_MAPPING_KEY}'='name' "
                f"(ALTER TABLE ... SET TBLPROPERTIES) on {table!r}"
            )
        names = [f.name for f in snap.schema.fields]
        if old not in names:
            raise DataSourceException(f"no column {old!r} on {table!r}")
        if new in names:
            raise DataSourceException(f"column {new!r} already exists")
        refs = self._column_refs(snap, old)
        if refs:
            raise DataSourceException(
                f"cannot rename {old!r}: referenced by {refs} — drop the "
                "constraint / generation expression first"
            )
        fields = [
            StructField(new if f.name == old else f.name, f.dataType,
                        f.nullable, f.metadata)
            for f in snap.schema.fields
        ]
        part_cols = [new if c == old else c for c in snap.partition_cols]
        # per-column metadata (DEFAULT, IDENTITY spec incl. its
        # high-water mark) follows its column's new name — an orphaned
        # identity.<old> key would brick every later write (allocation
        # would inject a column the schema no longer has)
        moves = {f"default.{old}": f"default.{new}",
                 f"identity.{old}": f"identity.{new}"}
        config = {
            moves.get(k, k): v
            for k, v in snap.configuration.items()
        }
        self._commit_schema(table, snap, StructType(fields), part_cols,
                            "RENAME COLUMN", configuration=config)

    def drop_column(self, ref: TableRef, col: str) -> None:
        """ALTER TABLE ... DROP COLUMN — metadata-only soft drop: the
        field leaves the schema, the bytes stay in the files but no
        reader can ever bind them again (fresh physical names on
        re-add). Requires column mapping, like Delta; refuses partition
        columns and columns referenced by constraints / generation
        expressions."""
        table, snap = self._require_snapshot(ref)
        if snap.configuration.get(COLUMN_MAPPING_KEY) != "name":
            raise DataSourceException(
                f"DROP COLUMN requires '{COLUMN_MAPPING_KEY}'='name' "
                f"(ALTER TABLE ... SET TBLPROPERTIES) on {table!r}"
            )
        names = [f.name for f in snap.schema.fields]
        if col not in names:
            raise DataSourceException(f"no column {col!r} on {table!r}")
        if len(names) == 1:
            raise DataSourceException("cannot drop the only column")
        if col in snap.partition_cols:
            raise DataSourceException(
                f"cannot drop partition column {col!r}"
            )
        refs = self._column_refs(snap, col)
        if refs:
            raise DataSourceException(
                f"cannot drop {col!r}: referenced by {refs} — drop the "
                "constraint / generation expression first"
            )
        fields = [f for f in snap.schema.fields if f.name != col]
        # a dropped column's per-column metadata (DEFAULT, IDENTITY
        # spec) leaves with it — a poisoned identity key would reject
        # any future write that re-adds the name
        config = {k: v for k, v in snap.configuration.items()
                  if k not in (f"default.{col}", f"identity.{col}")}
        self._commit_schema(table, snap, StructType(fields),
                            snap.partition_cols, "DROP COLUMN",
                            configuration=config)

    @staticmethod
    def _parse_partition_values(relpart: str, part_cols: list[str]) -> dict:
        values: dict[str, str | None] = {}
        if relpart == ".":
            return values
        from urllib.parse import unquote

        for seg in relpart.split(os.sep):
            if "=" in seg:
                k, _, v = seg.partition("=")
                values[k] = None if v == HIVE_NULL else unquote(v)
        return {c: values.get(c) for c in part_cols}

    @staticmethod
    def _footer_stats(path: str) -> tuple[int, dict]:
        """(row count, {minValues, maxValues}) from the parquet footer
        — see :func:`_footer_stats_of` (module-level so the publish
        path can ship it to executors)."""
        return _footer_stats_of(path)

    # -- operations ----------------------------------------------------
    def _register_name(self, name: str, path: str) -> None:
        """Bind a catalog name to an EXISTING directory (the convert
        on-ramp); atomic names-file republish, same as
        :meth:`_resolve_name`'s allocation."""
        nf = self._names_file()
        names = self._known_names()
        if name in names:
            if names[name] != path:
                raise DataSourceException(
                    f"txlog name {name!r} already maps to {names[name]!r}"
                )
            return
        names[name] = path
        os.makedirs(os.path.dirname(nf), exist_ok=True)
        tmp = nf + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(names, fh)
        os.replace(tmp, nf)

    def convert(self, ref: TableRef,
                partition_by: str | list[str] | None = None) -> int:
        """``CONVERT TO TXLOG`` (Delta's ``CONVERT TO DELTA`` parity):
        ONE atomic commit — metaData plus every discovered parquet
        file's add action, footer row counts and min/max stats
        included — turns an existing plain parquet directory (or a
        catalog parquet table) into a txlog table IN PLACE. No data
        file is rewritten or moved; afterwards every txlog surface
        (DML, time travel from the conversion point, OPTIMIZE,
        constraints, CDF) runs on the same bytes. Returns the number
        of files converted.

        ``partition_by`` declares the hive partition layout — a DDL
        string (``"g string, d date"``) carrying types, or a list of
        names (string-typed). Delta's rule: the CALLER declares the
        partition schema, because directory names alone cannot carry
        types. The data schema comes from a file footer via Spark's
        reader (files must agree, as in Delta's convert).

        After converting a catalog table, the original parquet table
        definition must not be written through again: txlog DML
        logically removes files that stay physically present until
        vacuum, and a direct listing would read them (Delta documents
        the same caveat).

        Scale: discovery + footer stats are a driver-side walk (one
        footer read per file — the same publish-walk shape as
        ``_write_files``); the commit itself is one O_EXCL log file
        regardless of table size. At 100 TB the walk would distribute
        over executors; the single-commit atomicity is unchanged.
        """
        if ref.is_path:
            table = ref.path
        else:
            # catalog table: adopt its location under the txlog name
            # (registered only AFTER the conversion commit succeeds —
            # a failed validation must not leave a stale binding)
            loc = None
            for row in self.spark.sql(
                f"DESCRIBE TABLE EXTENDED {ref.table}"
            ).collect():
                if (row["col_name"] or "").strip() == "Location":
                    loc = row["data_type"]
                    break
            if not loc:
                raise DataSourceException(
                    f"cannot resolve a filesystem location for catalog "
                    f"table {ref.table!r}"
                )
            table = loc.removeprefix("file:")
        commits, _ = _list_log(table)
        if commits:
            raise DataSourceException(
                f"{table!r} is already a txlog table (version "
                f"{_version_of(commits[-1])})"
            )
        if partition_by is None:
            part_fields: list[StructField] = []
        elif isinstance(partition_by, str):
            part_fields = list(StructType.fromDDL(partition_by).fields)
        else:
            from pyspark.sql.types import StringType

            part_fields = [StructField(c, StringType()) for c in partition_by]
        part_names = [f.name for f in part_fields]
        rels: list[str] = []
        for root, dirs, names in os.walk(table):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for name in names:
                if name.endswith(".parquet") and not name.startswith(
                        ("_", ".")):
                    rels.append(
                        os.path.relpath(os.path.join(root, name), table)
                    )
        if not rels:
            raise DataSourceException(
                f"no parquet files to convert under {table!r}"
            )
        adds: list[dict] = []
        for rel in sorted(rels):
            relpart = os.path.dirname(rel) or "."
            seen = {seg.partition("=")[0]
                    for seg in relpart.split(os.sep) if "=" in seg}
            if set(part_names) != seen:
                raise DataSourceException(
                    f"file {rel!r} does not sit under the declared "
                    f"partition layout {part_names} (found {sorted(seen)}; "
                    "pass partition_by matching the directory structure)"
                )
            full = os.path.join(table, rel)
            num_rows, stats = self._footer_stats(full)
            adds.append({
                "path": rel,
                "partitionValues": self._parse_partition_values(
                    relpart, part_names),
                "numRecords": num_rows,
                "size": os.path.getsize(full),
                "stats": stats,
            })
        data_schema = self.spark.read.parquet(
            os.path.join(table, adds[0]["path"])
        ).schema
        schema = StructType(
            [f for f in data_schema.fields if f.name not in part_names]
            + part_fields
        )
        meta = {
            "metaData": {
                "schemaJson": schema.json(),
                "partitionColumns": part_names,
            }
        }
        self._commit(table, 0, [meta] + [{"add": a} for a in adds],
                     "CONVERT")
        if not ref.is_path:
            self._register_name(ref.table, table)  # type: ignore[arg-type]
        return len(adds)

    def create(self, ref: TableRef, schema: StructType,
               partition_by: list[str] | None = None) -> None:
        """Commit version 0: metaData only (an empty table)."""
        table = self._table_path(ref, create=True)
        if self.table_exists(ref):
            raise DataSourceException(f"txlog table {table!r} already exists")
        os.makedirs(table, exist_ok=True)
        meta = {
            "metaData": {
                "schemaJson": schema.json(),
                "partitionColumns": partition_by or list(ref.partition_by),
            }
        }
        self._commit(table, 0, [meta], "CREATE")

    def _schema_evolution_actions(self, src_schema: StructType,
                                  current: Snapshot) -> list[dict]:
        """metaData action widening ``current`` with ``src_schema``'s
        new columns and/or wider types ([] when nothing to widen) —
        the ONE schema-evolution fold shared by mergeSchema append and
        MERGE WITH SCHEMA EVOLUTION, so both evolve identically and
        the metaData action always rides in the same atomic commit as
        the data it describes."""
        existing = {f.name: f.dataType for f in current.schema.fields}
        widened: dict[str, object] = {}
        for f in src_schema.fields:
            if f.name not in existing or f.dataType == existing[f.name]:
                continue
            if _is_widening(existing[f.name], f.dataType):
                # type widening: the merged schema adopts the wider
                # type; OLD files upcast through the pinned-schema
                # read (verified reader matrix) — no rewrite
                widened[f.name] = f.dataType
            elif _is_widening(f.dataType, existing[f.name]):
                pass  # narrower incoming: assignment-cast on write
            else:
                raise DataSourceException(
                    f"mergeSchema cannot change column {f.name!r} from "
                    f"{existing[f.name].simpleString()} to "
                    f"{f.dataType.simpleString()}"
                )
        new_fields = [f for f in src_schema.fields if f.name not in existing]
        if not new_fields and not widened:
            return []
        if current.configuration.get(COLUMN_MAPPING_KEY) == "name":
            # fresh physical names: a re-added column never binds
            # to a dropped column's data
            new_fields = [
                StructField(f.name, f.dataType, f.nullable,
                            {**(f.metadata or {}),
                             PHYSICAL_NAME_KEY: _fresh_physical()})
                for f in new_fields
            ]
        merged = StructType([
            # widened fields keep name/metadata (physical name!)
            StructField(f.name, widened.get(f.name, f.dataType),
                        f.nullable, f.metadata)
            for f in current.schema.fields
        ] + new_fields)
        return [{
            "metaData": {
                "schemaJson": merged.json(),
                "partitionColumns": current.partition_cols,
                # constraints survive schema evolution
                "configuration": current.configuration,
            }
        }]

    @staticmethod
    def _widen_frame(df: DataFrame, schema: StructType) -> DataFrame:
        """Project ``df`` onto ``schema``'s (logical) columns:
        assignment-cast where present, NULL-fill where absent. Extra
        non-schema columns (e.g. threaded row-position metadata) pass
        through untouched."""
        names = {f.name for f in schema.fields}
        return df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ],
            *[F.col(c) for c in df.columns if c not in names],
        )

    def _allocate_identity(self, df: DataFrame, snap: Snapshot) -> DataFrame:
        """Reject caller-provided identity values (GENERATED ALWAYS AS
        IDENTITY) and allocate fresh ones above the committed
        high-water mark — the ONE allocator shared by every
        insert-shaped write (append, overwrite, replaceWhere source
        rows, dynamic-partition overwrite).

        Allocation is DENSE and overflow-safe at any partition count:
        the naive ``high + step * (monotonically_increasing_id() + 1)``
        stride embeds ``partition_id << 33``, so tens of thousands of
        partitions with a large step exceed 2^63 and fail the write
        under ANSI mode. Instead the two-stage ``global_positions``
        pattern (minus the ordering): pin the frame once
        (localCheckpoint — the count job and the write job MUST see
        the same physical partitions), collect per-partition row
        counts (a few longs on the driver), prefix-sum them into
        per-partition offsets, and assign
        ``high + step * (offset[p] + row_in_partition + 1)`` where
        ``row_in_partition`` is the dense low-33-bit counter of
        ``monotonically_increasing_id``. Values span exactly
        ``high + step .. high + step * N`` — unique, strictly beyond
        the mark in the step's direction, and within ``step * N`` of
        it regardless of partitioning."""
        ident = snap.identity
        if not ident:
            return df, []
        provided = [c for c in sorted(ident) if c in df.columns]
        if provided:
            raise DataSourceException(
                f"column(s) {provided} are GENERATED ALWAYS AS "
                "IDENTITY; values cannot be provided"
            )
        pinned, pos, ckpt_ids = self._dense_positions(df)
        for col in sorted(ident):
            spec = ident[col]
            pinned = pinned.withColumn(
                col,
                (F.lit(int(spec["high"]))
                 + F.lit(int(spec["step"])) * pos).cast("long"),
            )
        return pinned, ckpt_ids

    @staticmethod
    def _tracked_local_ckpt(df: DataFrame) -> tuple[DataFrame, list]:
        """Shared deterministic-free contract
        (:mod:`x_spark.checkpoints`): pin + return the block ids so
        the write path frees them after the last consuming job. Ids
        are LOCAL to the call: concurrent writers never free each
        other's blocks."""
        from x_spark.checkpoints import tracked_ckpt

        return tracked_ckpt(df)

    @staticmethod
    def _free_ckpts(spark, ids: list) -> None:
        from x_spark.checkpoints import free_ckpts

        free_ckpts(spark, ids)

    def _dense_positions(
            self, df: DataFrame) -> tuple[DataFrame, F.Column, list]:
        """Pin ``df`` and return (pinned frame, 1-based dense global
        position column): per-partition row counts collected (a few
        longs on the driver), prefix-summed into offsets, added to the
        dense low-33-bit counter of ``monotonically_increasing_id``.
        The shared kernel of every identity allocation — overflow-safe
        at any partition count because positions are DENSE, unlike the
        raw ``partition_id << 33`` stride."""
        pinned, ckpt_ids = self._tracked_local_ckpt(df)
        counts = {
            r["_p"]: r["n"]
            for r in pinned.groupBy(
                F.spark_partition_id().alias("_p")
            ).agg(F.count("*").alias("n")).collect()
        }
        offsets, acc = {}, 0
        for p in sorted(counts):
            offsets[p] = acc
            acc += counts[p]
        row_in_part = F.monotonically_increasing_id().bitwiseAND(
            F.lit((1 << 33) - 1)
        )
        if not offsets:
            # empty frame: no offsets to look up — and a bare
            # F.create_map() is typed map<void,void>, which ANSI
            # rejects at the int lookup even though no row evaluates
            return pinned, row_in_part + F.lit(1), ckpt_ids
        omap = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        pos = (F.coalesce(omap[F.spark_partition_id()], F.lit(0))
               + row_in_part + F.lit(1))
        return pinned, pos, ckpt_ids

    def _allocate_identity_for_nulls(self, df: DataFrame,
                                     snap: Snapshot) -> DataFrame:
        """Allocate identity values for exactly the rows whose identity
        column is NULL — the MERGE-insert shape (Delta allocates for
        rows a MERGE inserts; matched rows keep their existing values,
        which are never NULL because allocation is total on every
        insert path and identity declares on an empty table). The NULL
        slice runs through the same dense kernel; non-NULL rows pass
        untouched."""
        ident = snap.identity
        if not ident:
            return df, []
        # pin the input ONCE: the NULL/non-NULL split feeds multiple
        # jobs (the table write, the cdc insert-id join) and the
        # upstream lineage is typically the expensive merge join —
        # without the checkpoint the keep branch would re-execute it
        out, ckpt_ids = self._tracked_local_ckpt(df)
        for col in sorted(ident):
            spec = ident[col]
            keep = out.filter(F.col(col).isNotNull())
            nulls, pos, ids = self._dense_positions(
                out.filter(F.col(col).isNull()).drop(col)
            )
            ckpt_ids = ckpt_ids + ids
            allocated = nulls.withColumn(
                col,
                (F.lit(int(spec["high"]))
                 + F.lit(int(spec["step"])) * pos).cast("long"),
            )
            out = keep.unionByName(allocated)
        return out, ckpt_ids

    @staticmethod
    def _advanced_identity_config(snap: Snapshot, adds: list[dict],
                                  write_schema: StructType) -> dict | None:
        """Configuration dict with the identity high-water marks
        advanced to the written files' footer extremes (read back from
        the add actions — no second evaluation of the data), or None
        when nothing advanced. The mark only ever moves in the step's
        direction: a write whose values sit at or behind the committed
        mark (e.g. replaceWhere survivors rewritten into new files)
        never regresses it."""
        ident = snap.identity
        if not ident:
            return None
        pmap = _physical_map(write_schema)
        new_config = dict(snap.configuration)
        advanced = False
        for col, spec in sorted(ident.items()):
            kind = "maxValues" if int(spec["step"]) > 0 else "minValues"
            pick = max if int(spec["step"]) > 0 else min
            vals = [
                (a.get("stats") or {}).get(kind, {}).get(
                    pmap.get(col, col))
                for a in adds
            ]
            vals = [int(v) for v in vals if v is not None]
            new_high = pick(vals + [int(spec["high"])]) if vals else None
            if new_high is not None and new_high != int(spec["high"]):
                new_config[f"identity.{col}"] = json.dumps(
                    {**spec, "high": new_high}
                )
                advanced = True
        return new_config if advanced else None

    def append(self, df: DataFrame, ref: TableRef,
               merge_schema: bool = False,
               txn: tuple[str, int] | None = None,
               extra_actions: list[dict] | None = None,
               operation: str = "APPEND") -> list[dict]:
        """Add-only commit. On version collision the append re-resolves
        and retries — blind adds commute with any concurrent commit.
        Returns the committed add actions (footer row counts and stats
        included) so callers can report metrics without a second scan.

        ``extra_actions`` ride verbatim in the SAME commit as the adds
        (after meta/add actions) — the hook :meth:`copy_into` uses to
        make its loaded-file ledger reference atomic with the data.

        ``txn=(app_id, version)`` stamps the commit for idempotent
        replay (Delta's txnAppId/txnVersion writer options on append) —
        see :meth:`last_txn_version`; a detected replay raises
        :class:`TxnAlreadyCommittedException` BEFORE any file lands in
        the log, so streaming foreachBatch ingest can be exactly-once
        without a merge.

        ``merge_schema=True`` is Delta's mergeSchema append: columns in
        ``df`` missing from the table widen the schema (one metaData
        action in the same atomic commit — schema and data can never
        diverge), and columns the table has but ``df`` lacks fill with
        NULL. Old files are untouched; the pinned-schema reader
        surfaces the new column as NULL for their rows. Without the
        flag, a schema mismatch stays a hard error."""
        table = self._table_path(ref, create=True)
        snap = resolve_snapshot(table)
        if snap is None:
            self.create(ref, df.schema)
            snap = resolve_snapshot(table)

        ident = snap.identity
        df, _ckpt_ids = self._allocate_identity(df, snap)

        def schema_actions(current: Snapshot) -> list[dict]:
            return self._schema_evolution_actions(df.schema, current)

        if merge_schema:
            meta_actions = schema_actions(snap)
            if meta_actions:
                write_schema = StructType.fromJson(
                    json.loads(meta_actions[0]["metaData"]["schemaJson"])
                )
            else:
                write_schema = snap.schema
            # generated columns compute when omitted, same as the
            # plain-append branch (NULL-fill would fail their check)
            df = self._fill_generated(self._fill_defaults(df, snap), snap)
            df = df.select(*[
                # assignment cast to the (possibly widened) table type
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in write_schema.fields
            ])
        else:
            meta_actions = []
            write_schema = snap.schema
            df = _conform(self._fill_generated(self._fill_defaults(df, snap), snap), snap.schema)  # by-name + assignment cast, like Delta
        try:
            adds = self._write_files(df, table, snap.partition_cols,
                                     schema=write_schema)
        finally:
            # the allocation checkpoint's one consumer (the write job)
            # is done: free on success AND on an aborted write
            self._free_ckpts(self.spark, _ckpt_ids)
        add_actions = [{"add": a} for a in adds]
        if ident:
            # fold the advanced high-water marks into ONE metaData
            # action (log replay keeps only the last) riding in the
            # SAME commit as the adds — allocation is atomic with the
            # data, and the commit is read-modify-write (version-
            # checked below), so concurrent allocators can never both
            # land on the same range
            new_config = self._advanced_identity_config(
                snap, adds, write_schema
            )
            if new_config is not None:
                if meta_actions:
                    meta_actions[0]["metaData"]["configuration"] = new_config
                else:
                    meta_actions = [{
                        "metaData": {
                            "schemaJson": write_schema.json(),
                            "partitionColumns": snap.partition_cols,
                            "configuration": new_config,
                        }
                    }]
            self._commit(
                table, self._expect_unchanged(table, snap.version),
                meta_actions + add_actions + list(extra_actions or []),
                operation, txn=txn,
            )
            self._maybe_auto_compact(ref, snap.configuration)
            return adds
        for _ in range(10):
            try:
                self._commit(table, (self._latest_version(table) or 0) + 1,
                             meta_actions + add_actions
                             + list(extra_actions or []),
                             operation, txn=txn)
                self._maybe_auto_compact(ref, snap.configuration)
                return adds
            except TxnAlreadyCommittedException:
                # replay detected: the epoch is already durable — this
                # must surface to the caller, NOT be retried as a
                # version race (it subclasses ConcurrentWriteException)
                raise
            except ConcurrentWriteException:
                # Blind adds commute with any concurrent commit, but a
                # metaData action does NOT (log replay keeps only the
                # last one — re-committing a stale merged schema would
                # silently drop a column a concurrent schema-evolving
                # append just added). Recompute the merge against the
                # fresh snapshot before retrying. Data files written
                # above stay valid: the pinned-schema reader fills
                # columns missing from a file with NULL.
                if merge_schema:
                    fresh = resolve_snapshot(table)
                    meta_actions = schema_actions(fresh)
                continue
        raise ConcurrentWriteException(
            f"append to {table!r} lost 10 straight version races"
        )

    COPY_APP_ID = "copy-into"

    def copy_into(self, ref: TableRef, source: str,
                  file_format: str = "parquet",
                  pattern: str | None = None,
                  format_options: dict[str, str] | None = None,
                  force: bool = False,
                  merge_schema: bool = False) -> tuple[int, int]:
        """Idempotent bulk file ingestion (Delta's ``COPY INTO``): load
        the files under ``source`` into an existing table, skipping
        every file a previous COPY already loaded. Returns
        ``(files_loaded, rows_loaded)``.

        Retried and scheduled ingestion becomes exactly-once with no
        bookkeeping on the caller's side — the property that matters
        when a 100-TB landing zone is drip-fed by thousands of upstream
        jobs: re-running the COPY after a partial failure loads only
        what is missing. File identity is the absolute path (Delta's
        rule — a file overwritten in place is NOT reloaded; pass
        ``force=True`` to reload unconditionally). Size and mtime are
        recorded per file for audit.

        The loaded-file ledger is a parquet file per COPY run under the
        log directory; its REFERENCE rides in the same atomic commit as
        the data (a ``copyInto`` action), so ledger and data can never
        diverge, and checkpoints carry the accumulated reference list
        forward (see :meth:`_copy_ledger_refs`) so idempotency survives
        log retention. Concurrent COPYs of one table serialize through
        the txn stamp (appId ``copy-into``): the loser re-resolves the
        ledger and loads only what the winner left.

        ``pattern`` is a glob matched against the source-relative path.
        ``format_options`` pass through to the Spark reader; csv/json
        default to the table's writable schema (identity and generated
        columns excluded — both are engine-filled). ``merge_schema``
        is mergeSchema append semantics for evolving sources.

        Reference parity: the reference ingests files through its
        source scan + table sink (etl/parent.py write verbs); COPY INTO
        is the idempotent SQL-native form of that ingestion loop.
        """
        import fnmatch  # noqa: PLC0415

        table = self._table_path(ref)
        if resolve_snapshot(table) is None:
            raise DataSourceException(
                f"COPY INTO target {table!r} does not exist"
            )
        fmt = file_format.lower()
        if fmt not in ("parquet", "csv", "json", "orc"):
            raise DataSourceException(
                f"COPY INTO FILEFORMAT {file_format!r} not supported "
                "(parquet, csv, json, orc)"
            )
        src_root = os.path.abspath(source)
        discovered: list[tuple[str, int, int]] = []
        if os.path.isfile(src_root):
            # same filtering contract as the directory walk: hidden /
            # underscore names are never candidates, and the glob (the
            # relative path of a file source is its basename) applies
            base = os.path.basename(src_root)
            if (not base.startswith(("_", "."))
                    and not base.endswith(".crc")
                    and (pattern is None or fnmatch.fnmatch(base, pattern))):
                st = os.stat(src_root)
                discovered.append((src_root, st.st_size,
                                   int(st.st_mtime * 1000)))
        else:
            for root, dirs, names in os.walk(src_root):
                dirs[:] = [d for d in dirs
                           if not d.startswith(("_", "."))]
                for name in sorted(names):
                    if name.startswith(("_", ".")) or name.endswith(".crc"):
                        continue
                    full = os.path.join(root, name)
                    rel = os.path.relpath(full, src_root)
                    if pattern and not fnmatch.fnmatch(rel, pattern):
                        continue
                    st = os.stat(full)
                    discovered.append((full, st.st_size,
                                       int(st.st_mtime * 1000)))
        for _ in range(10):
            # Epoch FIRST, ledger second. The commit gate rejects any
            # txn whose epoch a concurrent COPY already durably
            # committed (durable >= txn[1] in _commit), so pinning the
            # epoch before resolving the ledger makes staleness
            # detectable: a COPY that lands between these two reads
            # (or any time before our commit) trips
            # TxnAlreadyCommittedException and we retry with a fresh
            # ledger. Ledger-before-epoch had a silent-duplicate
            # window — the winner's stamp would satisfy the freshly
            # read epoch while the stale ledger omitted its files.
            epoch = self._txn_stamps(table).get(self.COPY_APP_ID, -1) + 1
            new = (list(discovered) if force
                   else self._copy_new_files(table, discovered))
            if not new:
                return (0, 0)
            df = self._read_copy_source(table, fmt, [t[0] for t in new],
                                        format_options,
                                        merge_schema=merge_schema)
            ledger_rel = self._write_copy_ledger(table, new)
            action = {"copyInto": {
                "ledger": ledger_rel,
                "source": src_root,
                "count": len(new),
            }}
            try:
                adds = self.append(df, ref, merge_schema=merge_schema,
                                   txn=(self.COPY_APP_ID, epoch),
                                   extra_actions=[action],
                                   operation="COPY INTO")
            except TxnAlreadyCommittedException:
                # a concurrent COPY won the epoch: its ledger may cover
                # (some of) our files — re-resolve and load the rest
                with contextlib.suppress(FileNotFoundError):
                    os.remove(os.path.join(_log_path(table), ledger_rel))
                continue
            return (len(new),
                    sum(int(a.get("numRecords") or 0) for a in adds))
        raise ConcurrentWriteException(
            f"COPY INTO {table!r} lost 10 straight txn epochs"
        )

    def _read_copy_source(self, table: str, fmt: str, paths: list[str],
                          format_options: dict[str, str] | None,
                          merge_schema: bool = False) -> DataFrame:
        """Reader for COPY INTO source files. Self-describing formats
        (parquet/orc) read as-is — with the reader-side ``mergeSchema``
        when the COPY is schema-evolving, so a batch whose files
        themselves have evolving schemas unions them instead of taking
        one footer's schema and silently dropping the new column;
        csv/json bind to the table's writable schema — identity and
        generated columns excluded, both are filled by the write path —
        unless the caller supplies ``inferSchema``. Column
        reconciliation (by-name cast, DEFAULT fill) happens in the
        shared append flow."""
        opts = dict(format_options or {})
        if merge_schema and fmt in ("parquet", "orc"):
            opts.setdefault("mergeSchema", "true")
        reader = self.spark.read.options(**opts)
        if fmt in ("csv", "json") and "inferschema" not in {
            k.lower() for k in opts
        }:
            snap = resolve_snapshot(table)
            skip = {
                k.split(".", 1)[1] for k in snap.configuration
                if k.startswith(("identity.", "generated."))
            }
            reader = reader.schema(StructType(
                [f for f in snap.schema.fields if f.name not in skip]
            ))
        return reader.format(fmt).load(paths)

    def _write_copy_ledger(self, table: str,
                           files: list[tuple[str, int, int]]) -> str:
        """Persist one COPY run's loaded-file identities as a parquet
        ledger under the log directory (staged, atomic rename). Only
        the commit that references it makes it count — an orphan from a
        failed attempt is inert and reaped by clean_log."""
        import pyarrow as pa  # noqa: PLC0415
        import pyarrow.parquet as pq  # noqa: PLC0415

        led_dir = os.path.join(_log_path(table), "copy_ledger")
        os.makedirs(led_dir, exist_ok=True)
        rel = os.path.join("copy_ledger", f"{uuid.uuid4().hex}.parquet")
        full = os.path.join(_log_path(table), rel)
        t = pa.table({
            "path": [f[0] for f in files],
            "size": [f[1] for f in files],
            "mtime_ms": [f[2] for f in files],
        })
        tmp = full + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(t, tmp)
        os.replace(tmp, full)
        return rel

    def overwrite(self, df: DataFrame, ref: TableRef,
                  replace_where: str | None = None,
                  txn: tuple[str, int] | list[tuple[str, int]] | None = None,
                  overwrite_schema: bool = False,
                  partition_by: list[str] | None = None) -> None:
        """Full overwrite, or Delta replaceWhere: source rows violating
        the predicate abort; target rows where it is TRUE are replaced,
        FALSE or NULL survive. Partition-only predicates touch only
        matching partitions' files (data skipping); general predicates
        rewrite files that may hold surviving rows.

        ``overwrite_schema`` (Delta's ``overwriteSchema=true``): the
        full-overwrite commit also replaces the table's schema with
        ``df``'s — including a new ``partition_by`` layout — in the
        SAME atomic commit (metaData action + removes + adds). Time
        travel to earlier versions still reads the schema that was
        current then (log replay keeps the last metaData <= version).
        Only valid for full overwrites: a replaceWhere keeps rows
        written under the old schema live, so the two cannot compose.

        ``txn`` stamps the commit for idempotent replay (see
        :meth:`last_txn_version`)."""
        if (overwrite_schema or partition_by is not None) and \
                replace_where not in (None, "", "1=1"):
            raise DataSourceException(
                "overwrite_schema/partition_by require a full overwrite, "
                "not replaceWhere"
            )
        if partition_by is not None and not overwrite_schema:
            raise DataSourceException(
                "partition_by on overwrite requires overwrite_schema=True"
            )
        table = self._table_path(ref, create=True)
        if not self.table_exists(ref):
            self.create(ref, df.schema, partition_by=partition_by)
        snap = resolve_snapshot(table)
        base = snap.version
        if overwrite_schema:
            part_cols = (list(partition_by) if partition_by is not None
                         else snap.partition_cols)
            missing = [c for c in part_cols if c not in df.columns]
            if missing:
                raise DataSourceException(
                    f"partition column(s) {missing} not in overwrite frame"
                )
            stamped = _stamp_physical(df.schema, snap.schema,
                                      snap.configuration)
            # reconcile configuration with the REPLACED schema:
            # per-column metadata (generated./identity.) of dropped
            # columns leaves with them; a CHECK constraint or a
            # surviving generated expression that references a dropped
            # column refuses with its name (drop it first — the Delta
            # rule), instead of crashing unresolved at validation
            new_cols = {f.name for f in df.schema.fields}
            import re as _re

            def references_dropped(expr: str) -> list[str]:
                old_cols = {f.name for f in snap.schema.fields}
                return sorted(
                    c for c in old_cols - new_cols
                    if _re.search(rf"(?i)(?<![\w`.]){_re.escape(c)}(?![\w`])",
                                  expr)
                )

            config = {}
            for k, v in snap.configuration.items():
                if (k.startswith(("generated.", "identity.", "default."))
                        and k.split(".", 1)[1] not in new_cols):
                    continue  # column left; its metadata leaves too
                if k.startswith(("constraint.", "generated.")):
                    gone = references_dropped(v)
                    if gone:
                        raise DataSourceException(
                            f"overwrite_schema drops column(s) {gone} "
                            f"referenced by {k!r} ({v}) — drop the "
                            "constraint / generation expression first"
                        )
                config[k] = v
            surviving_ident = sorted(
                k[len("identity."):] for k in config
                if k.startswith("identity.")
            )
            if surviving_ident:
                # the replacement frame necessarily CONTAINS the
                # surviving identity column — caller-provided values
                # violate GENERATED ALWAYS AS IDENTITY, and no footer
                # readback could make externally-chosen values honor
                # the start/step contract. Delta's rule: drop the
                # identity property (or the column) first.
                raise DataSourceException(
                    f"overwrite_schema would provide values for "
                    f"GENERATED ALWAYS AS IDENTITY column(s) "
                    f"{surviving_ident}; drop the identity property "
                    "first"
                )
            adds = self._write_files(df, table, part_cols, schema=stamped,
                                     config_override=config)
            actions: list[dict] = [{
                "metaData": {
                    "schemaJson": stamped.json(),
                    "partitionColumns": part_cols,
                    "configuration": config,
                }
            }]
            actions += [{"remove": {"path": p}} for p in sorted(snap.files)]
            actions += [{"add": a} for a in adds]
            self._commit(table, self._expect_unchanged(table, base), actions,
                         "OVERWRITE", txn=txn)
            return
        # identity parity with append: overwritten-in rows are inserts,
        # so provided values reject and fresh ones allocate ABOVE the
        # committed mark (never reused from overwritten rows); the
        # advanced mark rides the same commit via _advanced_identity_config
        df, _ckpt_ids = self._allocate_identity(df, snap)
        df = _conform(self._fill_generated(self._fill_defaults(df, snap), snap), snap.schema)

        def identity_actions(adds: list[dict]) -> list[dict]:
            new_config = self._advanced_identity_config(
                snap, adds, snap.schema
            )
            if new_config is None:
                return []
            return [{
                "metaData": {
                    "schemaJson": snap.schema_json,
                    "partitionColumns": snap.partition_cols,
                    "configuration": new_config,
                }
            }]

        if replace_where in (None, "", "1=1"):
            try:
                adds = self._write_files(df, table, snap.partition_cols,
                                         schema=snap.schema)
            finally:
                self._free_ckpts(self.spark, _ckpt_ids)
            actions = identity_actions(adds)
            actions += [{"remove": {"path": p}} for p in sorted(snap.files)]
            actions += [{"add": a} for a in adds]
            # RMW commit: a concurrent append's files are not in the
            # remove set, so replacing "the table" requires the snapshot
            # to still be the latest version
            self._commit(table, self._expect_unchanged(table, base), actions,
                         "OVERWRITE", txn=txn)
            return
        pred = F.coalesce(F.expr(replace_where), F.lit(False))
        checked = df.filter(
            pred
            | F.raise_error(
                F.lit(f"source rows violate replaceWhere predicate {replace_where!r}")
            ).cast("boolean")
        )
        candidates = self._files_matching_predicate(table, snap, replace_where)
        survivors = self._read_snapshot(table, snap, candidates).filter(~pred)
        new_data = survivors.unionByName(checked)
        try:
            adds = self._write_files(new_data, table, snap.partition_cols,
                                     schema=snap.schema)
        finally:
            self._free_ckpts(self.spark, _ckpt_ids)
        actions = identity_actions(adds)
        actions += [{"remove": {"path": p}} for p in candidates]
        actions += [{"add": a} for a in adds]
        self._commit(table, self._expect_unchanged(table, base), actions,
                     "OVERWRITE_WHERE", txn=txn)

    def overwrite_dynamic(self, df: DataFrame, ref: TableRef,
                          txn: tuple[str, int] | list[tuple[str, int]]
                          | None = None) -> None:
        """Replace exactly the partitions present in ``df`` (whole table
        when unpartitioned): remove those partitions' files, add the new
        ones, one atomic commit. Untouched partitions' files are never
        read or written. ``txn`` stamps the commit for idempotent
        replay (see :meth:`last_txn_version`) — the partition-scoped
        IVM refresh lands state + position atomically through this."""
        table = self._table_path(ref, create=True)
        if not self.table_exists(ref):
            self.create(ref, df.schema)
        snap = resolve_snapshot(table)
        base = snap.version
        if not snap.partition_cols:
            self.overwrite(df, ref, txn=txn)
            return
        # identity parity with append (see overwrite): allocate fresh,
        # advance the mark in the same commit
        df, _ckpt_ids = self._allocate_identity(df, snap)
        df = _conform(self._fill_generated(self._fill_defaults(df, snap), snap), snap.schema)
        def render(v):
            # match hive dir encoding: booleans lowercase, rest via str()
            if v is None:
                return None
            if isinstance(v, bool):
                return str(v).lower()
            return str(v)

        incoming = {
            tuple(render(row[c]) for c in snap.partition_cols)
            for row in df.select(*snap.partition_cols).distinct().collect()
        }
        pmap = _physical_map(snap.schema)  # pv keys are PHYSICAL
        removes = [
            rel
            for rel in sorted(snap.files)
            if tuple(
                (snap.files[rel].get("partitionValues") or {})
                .get(pmap.get(c, c))
                for c in snap.partition_cols
            )
            in incoming
        ]
        try:
            adds = self._write_files(df, table, snap.partition_cols,
                                     schema=snap.schema)
        finally:
            self._free_ckpts(self.spark, _ckpt_ids)
        new_config = self._advanced_identity_config(snap, adds, snap.schema)
        actions = [] if new_config is None else [{
            "metaData": {
                "schemaJson": snap.schema_json,
                "partitionColumns": snap.partition_cols,
                "configuration": new_config,
            }
        }]
        actions += [{"remove": {"path": p}} for p in removes]
        actions += [{"add": a} for a in adds]
        self._commit(table, self._expect_unchanged(table, base), actions,
                     "OVERWRITE_DYNAMIC", txn=txn)

    def merge(self, df: DataFrame, ref: TableRef, spec: MergeSpec,
              txn: tuple[str, int] | None = None,
              merge_schema: bool = False) -> None:
        """Join-based MERGE over ONLY the files whose primary-key
        min/max range overlaps the source's (footer stats collected at
        write time) — Delta MERGE's data-skipping shape. Pruned files
        are never read; matched/inserted rows land in new files.

        ``txn`` stamps the commit for idempotent replay (see
        :meth:`last_txn_version`).

        ``merge_schema=True`` is MERGE WITH SCHEMA EVOLUTION (Delta's
        ``schema.autoMerge``): source columns missing from the table
        widen the schema through the same fold as mergeSchema append —
        ONE commit carries the metaData action, the removes/re-points
        and the adds, so schema and data can never diverge. The target
        slice is widened (NULL-fill + upcast) before the join, which
        lets the spec's set columns include the brand-new columns.

        A lost version race re-resolves the snapshot and RECOMPUTES
        the whole merge (candidates, join, evolution fold) — the retry
        is serializable because it re-runs as-if after the winning
        commit; a replayed ``txn`` epoch still surfaces immediately."""
        from x_spark.sources.sql_dml import (
            _merge_into_once, merge_spec_into,
        )

        table = self._table_path(ref)
        last: ConcurrentWriteException | None = None
        missing = None
        key_bounds = None
        for _ in range(5):
            snap = resolve_snapshot(table)
            if snap is None:
                raise DataSourceException(
                    f"txlog table {table!r} does not exist"
                )
            ident_set = sorted(set(snap.identity)
                               & (set(spec.update_columns)
                                  | set(spec.primary_key_columns)))
            if ident_set:
                raise DataSourceException(
                    f"column(s) {ident_set} are GENERATED ALWAYS AS "
                    "IDENTITY; MERGE cannot set or key on them"
                )
            if missing is None:  # once, not per retry
                tgt_names = {f.name for f in snap.schema.fields} | (
                    set(df.columns) if merge_schema else set()
                )
                missing = [c for c in spec.all_set_columns
                           if c not in tgt_names]
                if missing:
                    raise ETLJobException(
                        f"merge columns {missing} not present in target"
                    )
                if spec.validate_unique_source_keys:
                    # fused source pass: the uniqueness probe (dup
                    # keys exist iff rows > distinct key tuples — the
                    # struct makes NULL key fields compare like the
                    # groupBy they replace) AND the leading-key range
                    # the candidate pruning needs, in ONE job instead
                    # of two source-plan executions (the source does
                    # not change across version-race retries, so the
                    # bounds are computed once and reused)
                    lead = spec.primary_key_columns[0]
                    srow = df.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.countDistinct(F.struct(
                            *[F.col(c) for c in spec.primary_key_columns]
                        )).alias("nd"),
                        F.min(lead).alias("lo"),
                        F.max(lead).alias("hi"),
                    ).first()
                    if srow["n"] > srow["nd"]:
                        raise ETLJobException(
                            "merge source has duplicate rows per "
                            f"primary key {spec.primary_key_columns}; "
                            "Delta MERGE would abort"
                        )
                    key_bounds = (lead, srow["lo"], srow["hi"])
                    # checked once here — don't re-run per retry or
                    # inside the split-join path
                    import dataclasses as _dc

                    spec = _dc.replace(
                        spec, validate_unique_source_keys=False)
            meta_actions = (
                self._schema_evolution_actions(df.schema, snap)
                if merge_schema else []
            )
            if meta_actions:
                write_schema = StructType.fromJson(
                    json.loads(meta_actions[0]["metaData"]["schemaJson"])
                )
            else:
                write_schema = snap.schema
            try:
                if snap.configuration.get(DV_ENABLE_KEY, "").lower() == "true":
                    self._merge_with_dv(table, snap, df, spec, txn,
                                        write_schema, meta_actions,
                                        src_key_bounds=key_bounds)
                else:
                    # copy-on-write MERGE runs through the shared
                    # single-join engine (sql_dml): one pinned
                    # target-slice x source join feeds the write AND
                    # the cdc rows; unique source keys are already
                    # guaranteed above, so the multiple-match guard
                    # and residue dedup shuffles are skipped
                    _merge_into_once(
                        self, merge_spec_into(spec), table, txn=txn,
                        src_df=df, snap=snap, merge_schema=merge_schema,
                        skip_match_checks=True,
                        meta_actions=meta_actions,
                        write_schema=write_schema,
                        src_key_bounds=key_bounds,
                    )
                return
            except TxnAlreadyCommittedException:
                # replay detected: the epoch is already durable — this
                # must surface, not retry as a version race
                raise
            except ConcurrentWriteException as exc:
                last = exc
                continue
        raise ConcurrentWriteException(
            f"merge to {table!r} lost 5 straight version races"
        ) from last

    def _fold_identity_meta(self, snap: Snapshot, adds: list[dict],
                            write_schema: StructType,
                            meta_actions: list[dict]) -> list[dict]:
        """Fold advanced identity high-water marks into the commit's
        (single) metaData action — reusing the schema-evolution action
        when one is already riding, else minting a config-only one.
        Returns ``meta_actions`` unchanged when nothing advanced."""
        new_config = self._advanced_identity_config(snap, adds,
                                                    write_schema)
        if new_config is None:
            return meta_actions
        if meta_actions:
            meta_actions[0]["metaData"]["configuration"] = new_config
            return meta_actions
        return [{
            "metaData": {
                "schemaJson": write_schema.json(),
                "partitionColumns": snap.partition_cols,
                "configuration": new_config,
            }
        }]

    def _merge_with_dv(self, table: str, snap: Snapshot, src: DataFrame,
                       spec: MergeSpec, txn: tuple[str, int] | None,
                       write_schema: StructType | None = None,
                       meta_actions: list[dict] | None = None,
                       src_key_bounds: tuple | None = None) -> None:
        """Merge-on-read MERGE: matched target rows are MASKED (their
        new images plus upsert inserts land in fresh files) and
        untouched rows co-located in candidate files are never
        rewritten — write cost tracks the CHANGED rows, not the
        candidate files. One atomic commit carries the sidecar
        re-points and the new adds. The split join is pinned ONCE and
        feeds the mask write, the data write, AND (when the change
        feed is on) the update_preimage/postimage/insert cdc rows —
        no second target x source join anywhere."""
        from x_spark.operators.merge import merge_split_frames

        if write_schema is None:
            write_schema = snap.schema
        meta_actions = meta_actions or []
        base = snap.version
        candidates = self._files_overlapping_keys(
            src, snap, spec.primary_key_columns[0],
            bounds=(src_key_bounds[1], src_key_bounds[2])
            if src_key_bounds is not None
            and src_key_bounds[0] == spec.primary_key_columns[0] else None,
        )
        if candidates:
            if self._row_tracking_on(snap.configuration):
                # id-aware scan (masks applied inside): matched
                # postimages carry their stable _x_row_id into the new
                # files; _x_rcv resets below (the rows ARE modified)
                tgt = self._read_rows_with_ids(table, snap, candidates,
                                               keep_meta=True)
            else:
                tgt = self._read_files_with_meta(table, snap.schema,
                                                 candidates)
                tgt = tgt.join(self._dv_rows(table, snap, candidates),
                               ["__fn", "__ri"], "left_anti")
        else:
            tgt = self.spark.createDataFrame(
                [], snap.schema.add("__fn", "string").add("__ri", "long")
            )
        if meta_actions:
            # schema evolution: widen the target slice (NULL-fill new
            # columns, upcast widened ones); __fn/__ri pass through
            tgt = self._widen_frame(tgt, write_schema)
        matched_meta, matched_pre, matched_post, inserts = \
            merge_split_frames(tgt, src, spec, ["__fn", "__ri"],
                               insert_defaults=snap.defaults)
        carry = [c for c in (ROW_ID_COL, ROW_RCV_COL)
                 if c in matched_post.columns]
        if ROW_RCV_COL in carry:
            # matched postimages are MODIFIED rows: their commit
            # version falls back to the new file's default
            matched_post = matched_post.withColumn(
                ROW_RCV_COL, F.lit(None).cast("long"))

        # generated columns on MERGE: NULL-filled columns mean "not
        # set" — compute the expression there (matched postimages and
        # inserts alike; explicit disagreeing values still fail the
        # generated:<col> check at the write choke point)
        def fill_generated(frame: DataFrame) -> DataFrame:
            for col, expr in sorted(snap.generated.items()):
                if col in frame.columns:
                    frame = frame.withColumn(
                        col,
                        F.when(F.col(col).isNull(), F.expr(expr))
                        .otherwise(F.col(col)),
                    )
            return frame

        matched_post = fill_generated(matched_post)
        mask = matched_meta.select(
            F.col("__fn").alias("file_name"),
            F.col("__ri").alias("row_index"),
        )
        _ckpt_ids: list = []
        if inserts is not None:
            inserts = fill_generated(inserts)
            if snap.identity:
                # Delta allocates identity for MERGE-inserted rows;
                # matched postimages keep their target values. The
                # allocated frame is pinned, so the cdc insert rows
                # below carry the very ids the table holds.
                inserts, _ckpt_ids = self._allocate_identity_for_nulls(
                    inserts, snap)
        new_rows = (matched_post if inserts is None
                    else matched_post.unionByName(inserts))
        try:
            adds = self._write_files(new_rows, table, snap.partition_cols,
                                     schema=write_schema)
            actions = list(self._fold_identity_meta(
                snap, adds, write_schema, meta_actions))
            actions += self._mask_actions(table, snap, candidates, mask)
            actions += [{"add": a} for a in adds]
            if self._cdf_enabled(snap.configuration):
                cdc = matched_pre.drop(*carry).withColumn(
                    "_change_type", F.lit("update_preimage")
                ).unionByName(matched_post.drop(*carry).withColumn(
                    "_change_type", F.lit("update_postimage")
                ))
                if inserts is not None:
                    cdc = cdc.unionByName(inserts.drop(*carry).withColumn(
                        "_change_type", F.lit("insert")
                    ))
                actions += self._write_cdc_files(cdc, table, write_schema,
                                                 snap.partition_cols)
        finally:
            self._free_ckpts(self.spark, _ckpt_ids)
        self._commit(table, self._expect_unchanged(table, base), actions,
                     "MERGE", txn=txn)

    def last_txn_version(self, ref: TableRef, app_id: str) -> int:
        """Highest committed transaction version for ``app_id``
        (-1 if none) — the read side of the txnAppId/txnVersion
        idempotent-writes pattern: a replayed writer (a restarted
        streaming query re-running a foreachBatch epoch) checks this
        before writing and skips batches it already committed.

        Stamps are carried forward through checkpoint ``txns`` maps, so
        the lookup scans at most CHECKPOINT_INTERVAL commit files and
        the guarantee survives commit-file retention.

        This read-side check is the cheap fast path; the authoritative
        check lives INSIDE :meth:`_commit` (SetTransaction conflict),
        which a concurrent commit cannot slip past.
        """
        table = self._table_path(ref)
        return self._txn_stamps(table).get(app_id, -1)

    def delete(self, ref: TableRef, predicate: str) -> None:
        """ANSI DELETE: drop rows where the predicate is TRUE; FALSE or
        NULL survive. Partition-only predicates rewrite only matching
        partitions' files.

        With ``enableDeletionVectors=true`` in the table configuration
        the delete is merge-on-read: matched rows are masked by a DV
        sidecar instead of rewriting their files — a delete of k rows
        costs O(k) writes, not O(files-containing-k-rows) rewrites.
        The copy-on-write path below stays the default."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        if snap.configuration.get(DV_ENABLE_KEY, "").lower() == "true":
            self._delete_with_dv(table, snap, predicate)
            return
        base = snap.version
        candidates = self._files_matching_predicate(table, snap, predicate)
        if not candidates:
            # stats/partition pruning proved zero matches — still
            # analyze the predicate so typos error like a full scan
            self._validate_predicate(snap, predicate)
            return
        cdc_actions: list[dict] = []
        if self._cdf_enabled(snap.configuration):
            # copy-on-write rewrites whole candidate files, so the
            # derived (add/remove) feed would emit delete+insert noise
            # pairs for every surviving co-located row; the cdc files
            # carry exactly the deleted rows instead. One extra scan
            # of the candidates, only when CDF is on (Delta pays the
            # same to fill _change_data). Written FIRST: when the
            # stats-pruned candidates turn out to hold ZERO matching
            # rows, Spark may emit no cdc part files at all — the
            # commit would then serve the feed from the derived pairs,
            # violating the row-exact contract. An empty cdc write is
            # the logical-no-op signal: skip the rewrite and the
            # commit entirely.
            deleted = self._read_snapshot(table, snap, candidates).filter(
                F.coalesce(F.expr(predicate), F.lit(False))
            )
            if deleted.limit(1).count() == 0:
                return
            cdc_actions = self._write_cdc_files(
                deleted.withColumn("_change_type", F.lit("delete")),
                table, snap.schema, snap.partition_cols,
            )
            if not cdc_actions:
                return  # belt-and-braces: never commit cdc-less
        survivors = self._read_for_rewrite(table, snap, candidates).filter(
            ~F.coalesce(F.expr(predicate), F.lit(False))
        )
        adds = self._write_files(survivors, table, snap.partition_cols,
                                 schema=snap.schema)
        actions = [{"remove": {"path": p}} for p in candidates]
        actions += [{"add": a} for a in adds]
        actions += cdc_actions
        self._commit(table, self._expect_unchanged(table, base), actions, "DELETE")

    @staticmethod
    def _published_parquets(staging: str) -> list[str]:
        """Strip _SUCCESS / hidden .crc companions from a staging dir
        and return the absolute paths of its parquet files — the one
        publish-walk shared by the DV sidecar and cdc writers (a dir
        must hold ONLY parquet so vacuum can account for every byte)."""
        out: list[str] = []
        for root, _dirs, names in os.walk(staging):
            for name in names:
                full = os.path.join(root, name)
                if name.startswith((".", "_")):
                    try:
                        os.remove(full)
                    except OSError:
                        pass
                elif name.endswith(".parquet"):
                    out.append(full)
        return out

    def _write_dv_dir(self, table: str, mask: DataFrame) -> tuple[str, dict]:
        """Materialize mask rows (file_name, row_index) as an immutable
        parquet DIRECTORY under the table root (staged, then moved —
        invisible until an add action references it). A directory, not
        a single file, so a 100-TB delete's mask writes stay
        distributed. Returns (rel dir, {file_name: cardinality})."""
        rel = f"dv-{uuid.uuid4().hex}"
        staging = os.path.join(table, f"_staging-{uuid.uuid4().hex}")
        (
            mask.select("file_name", "row_index")
            .write.mode("overwrite").parquet(staging)
        )
        if not self._published_parquets(staging):
            shutil.rmtree(staging, ignore_errors=True)
            return rel, {}  # nothing matched: no sidecar, no re-points
        counts = {
            r["file_name"]: r["n"]
            for r in self.spark.read.parquet(staging)
            .groupBy("file_name").agg(F.count("*").alias("n")).collect()
        }
        shutil.move(staging, os.path.join(table, rel))
        # vacuum ages by mtime; restamp like _write_files does
        now = None
        for root, _dirs, names in os.walk(os.path.join(table, rel)):
            for name in names:
                os.utime(os.path.join(root, name), now)
        return rel, counts

    @staticmethod
    def _cdf_enabled(configuration: dict[str, str]) -> bool:
        return configuration.get(CDF_ENABLE_KEY, "").lower() == "true"

    def _write_cdc_files(self, df: DataFrame, table: str,
                         schema: StructType,
                         part_cols: list[str] | None = None) -> list[dict]:
        """Materialize change rows (logical data columns plus
        ``_change_type``) as immutable parquet under ``_change_data/``
        and return the ``cdc`` actions referencing them. Columns are
        stored under their PHYSICAL names (same rule as
        :meth:`_write_files`) so the files survive later RENAME
        COLUMN; ``_change_type`` passes through untouched. The write
        is distributed — change volume at 100 TB tracks the changed
        rows, never the table.

        ``part_cols``: the TABLE's partition columns — cdc files lay
        out hive-partitioned exactly like the data (Delta partitions
        ``_change_data`` the same way), and each cdc action records
        its physical-keyed ``partitionValues`` so a partition-scoped
        feed consumer reads only its partitions' change files. Readers
        re-attach the values (the column is absent from the file);
        actions without the key (pre-partitioning history) read the
        old full-column layout unchanged."""
        phys = _physical_map(schema)
        if any(phys.get(c, c) != c for c in df.columns):
            df = df.select(
                *[F.col(c).alias(phys.get(c, c)) for c in df.columns]
            )
        wpc = [phys.get(c, c) for c in (part_cols or [])]
        dest = os.path.join(table, CDC_DIR, f"cdc-{uuid.uuid4().hex}")
        writer = df.write.mode("overwrite")
        if wpc:
            writer = writer.partitionBy(*wpc)
        writer.parquet(dest)
        actions = []
        for full in self._published_parquets(dest):
            relpart = os.path.relpath(os.path.dirname(full), dest)
            actions.append({"cdc": {
                "path": os.path.relpath(full, table),
                "partitionValues": self._parse_partition_values(
                    relpart, wpc),
            }})
        return actions

    def _mask_actions(self, table: str, snap: Snapshot,
                      candidates: list[str],
                      new_mask: DataFrame) -> list[dict]:
        """Actions re-pointing candidate files at a fresh sidecar
        holding (old mask UNION ``new_mask``). ``new_mask`` is
        (file_name, row_index) rows that must reference only candidate
        files and rows not already masked. Files with no new mask rows
        keep their adds verbatim; a file whose every row is now masked
        is plainly removed (fully-deleted files never linger as
        all-mask scans). The change feed sees each remove+re-add pair
        and emits exactly the newly masked rows as deletes."""
        old_mask_all = self._dv_rows(table, snap, candidates)
        # only files with NEW mask rows re-point; their old mask rows
        # must ride into the new sidecar (an add references exactly one
        # sidecar)
        touched = new_mask.select("file_name").distinct()
        carried = old_mask_all.select(
            F.col("__fn").alias("file_name"),
            F.col("__ri").alias("row_index"),
        ).join(touched, "file_name", "left_semi")
        rel_dv, counts = self._write_dv_dir(
            table, new_mask.unionByName(carried)
        )
        actions: list[dict] = []
        for p, n in sorted(counts.items()):
            add = snap.files[p]
            total = add.get("numRecords")
            if total is None:  # foreign add without footer stats
                total, _ = self._footer_stats(os.path.join(table, p))
            total = int(total)
            actions.append({"remove": {"path": p}})
            if n < total:
                actions.append({"add": {
                    **self._as_data_change(add),
                    "dv": {"path": rel_dv, "cardinality": int(n)},
                }})
            # n == total: fully masked -> plain remove, file dropped
        return actions

    def _delete_with_dv(self, table: str, snap: Snapshot,
                        predicate: str) -> None:
        """Merge-on-read DELETE: one commit of :meth:`_mask_actions`
        over the matched rows — no data file is read beyond the
        predicate scan, none is rewritten."""
        base = snap.version
        candidates = self._files_matching_predicate(table, snap, predicate)
        if not candidates:
            # stats/partition pruning proved zero matches — still
            # analyze the predicate so typos error like a full scan
            self._validate_predicate(snap, predicate)
            return
        live = self._read_files_with_meta(table, snap.schema, candidates)
        live = live.join(self._dv_rows(table, snap, candidates),
                         ["__fn", "__ri"], "left_anti")
        matched = live.filter(
            F.coalesce(F.expr(predicate), F.lit(False))
        ).select(
            F.col("__fn").alias("file_name"),
            F.col("__ri").alias("row_index"),
        )
        actions = self._mask_actions(table, snap, candidates, matched)
        self._commit(table, self._expect_unchanged(table, base), actions,
                     "DELETE")

    def update(self, ref: TableRef, assignments: dict[str, str],
               predicate: str = "TRUE") -> None:
        """ANSI UPDATE: for rows where the predicate is TRUE, assign
        each column its expression — ALL expressions evaluate against
        the OLD row image (one select, not sequential withColumns), the
        standard that makes ``SET a = b, b = a`` a swap. Generated
        columns not explicitly assigned are recomputed from the
        post-assignment values for updated rows; explicitly assigned
        ones are validated by the generated:<col> constraint like any
        write.

        Copy-on-write by default (rewrite candidate files, Delta's
        UPDATE shape, partition-pruned). With ``enableDeletionVectors``
        the update is merge-on-read: old images are masked and only the
        NEW images are written — cost tracks the updated rows."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        unknown = [c for c in assignments
                   if c not in {f.name for f in snap.schema.fields}]
        if unknown:
            raise DataSourceException(
                f"UPDATE assigns unknown column(s) {unknown}"
            )
        ident_assigned = sorted(set(assignments) & set(snap.identity))
        if ident_assigned:
            raise DataSourceException(
                f"column(s) {ident_assigned} are GENERATED ALWAYS AS "
                "IDENTITY; values cannot be assigned"
            )
        # assignment cast to the DECLARED column type (same rule every
        # other write path gets via _conform) — without it an
        # expression of a different type commits parquet files whose
        # physical type diverges from the pinned schema, and the table
        # stops being readable
        types = {f.name: f.dataType for f in snap.schema.fields}
        if self._row_tracking_on(snap.configuration):
            # row tracking: updated rows' commit version falls back to
            # the NEW file's defaultRowCommitVersion (materialize NULL);
            # untouched co-located rows carry their old version — the
            # per-row assignment machinery below does both in one pass.
            # _x_row_id needs no entry: it is a pure passthrough.
            from pyspark.sql.types import LongType

            assignments = {**assignments,
                           ROW_RCV_COL: "CAST(NULL AS BIGINT)"}
            types = {**types, ROW_RCV_COL: LongType()}
        pred = F.coalesce(F.expr(predicate), F.lit(False))

        def new_image(df: DataFrame, only_matched: bool) -> DataFrame:
            """Post-update image. ``only_matched``: df holds matched
            rows only, so assignments apply unconditionally. Otherwise
            the match flag is computed ONCE from the old row image —
            the predicate must not be re-evaluated against updated
            values (SET v = v + 1 WHERE v < 5 would misfire)."""
            cols = [f.name for f in snap.schema.fields]
            regen = {c: e for c, e in snap.generated.items()
                     if c in cols and c not in assignments}
            if only_matched:
                out = df.select(*[
                    F.expr(assignments[c]).cast(types[c]).alias(c)
                    if c in assignments else F.col(c)
                    for c in df.columns
                ])
                for c, e in sorted(regen.items()):
                    out = out.withColumn(c, F.expr(e).cast(types[c]))
                return out
            marked = df.withColumn("__upd", pred)
            out = marked.select(
                "__upd",
                *[
                    F.when(F.col("__upd"),
                           F.expr(assignments[c]).cast(types[c]))
                    .otherwise(F.col(c)).alias(c)
                    if c in assignments else F.col(c)
                    for c in df.columns
                ],
            )
            # recompute unassigned generated columns from the NEW values
            for c, e in sorted(regen.items()):
                out = out.withColumn(
                    c,
                    F.when(F.col("__upd"), F.expr(e).cast(types[c]))
                    .otherwise(F.col(c)),
                )
            return out.drop("__upd")

        if snap.configuration.get(DV_ENABLE_KEY, "").lower() == "true":
            base = snap.version
            candidates = self._files_matching_predicate(
                table, snap, predicate
            )
            if not candidates:
                self._validate_predicate(snap, predicate)
                return  # pruning proved zero matches: logical no-op
            if self._row_tracking_on(snap.configuration):
                # id-aware scan (masks applied inside): new images
                # carry each row's stable id into the new files
                live = self._read_rows_with_ids(
                    table, snap, candidates, keep_meta=True)
            else:
                live = self._read_files_with_meta(
                    table, snap.schema, candidates
                ).join(self._dv_rows(table, snap, candidates),
                       ["__fn", "__ri"], "left_anti")
            matched, _ckpt_ids = self._tracked_local_ckpt(
                live.filter(pred)
            )
            try:
                mask = matched.select(
                    F.col("__fn").alias("file_name"),
                    F.col("__ri").alias("row_index"),
                )
                actions = self._mask_actions(table, snap, candidates,
                                             mask)
                adds = self._write_files(
                    new_image(matched.drop("__fn", "__ri"), True),
                    table, snap.partition_cols, schema=snap.schema,
                )
                if self._cdf_enabled(snap.configuration):
                    old = matched.drop("__fn", "__ri",
                                       ROW_ID_COL, ROW_RCV_COL)
                    cdc = old.withColumn(
                        "_change_type", F.lit("update_preimage")
                    ).unionByName(new_image(old, True).withColumn(
                        "_change_type", F.lit("update_postimage")
                    ))
                    actions += self._write_cdc_files(
                        cdc, table, snap.schema, snap.partition_cols)
            finally:
                # mask + data + cdc jobs all consumed the pin
                self._free_ckpts(self.spark, _ckpt_ids)
            self._commit(
                table, self._expect_unchanged(table, base),
                actions + [{"add": a} for a in adds], "UPDATE",
            )
            return
        base = snap.version
        candidates = self._files_matching_predicate(table, snap, predicate)
        if not candidates:
            # stats/partition pruning proved zero matches — still
            # analyze the predicate so typos error like a full scan
            self._validate_predicate(snap, predicate)
            return
        cdc_actions: list[dict] = []
        if self._cdf_enabled(snap.configuration):
            # exact change rows: one extra matched-rows scan, only
            # when CDF is on (the derived feed would otherwise emit
            # rewrite noise pairs for co-located untouched rows).
            # Written FIRST: stats-pruned candidates that hold zero
            # matching rows may produce NO cdc part files — committing
            # the rewrite then would serve the feed from the derived
            # pairs (spurious delete+insert for every surviving
            # co-located row). An empty cdc write means the UPDATE is
            # a logical no-op: skip the rewrite and the commit.
            old = self._read_snapshot(table, snap, candidates).filter(pred)
            if old.limit(1).count() == 0:
                return
            cdc = old.withColumn(
                "_change_type", F.lit("update_preimage")
            ).unionByName(new_image(old, True).withColumn(
                "_change_type", F.lit("update_postimage")
            ))
            cdc_actions = self._write_cdc_files(cdc, table, snap.schema,
                                                snap.partition_cols)
            if not cdc_actions:
                return  # belt-and-braces: never commit cdc-less
        rewritten = new_image(
            self._read_for_rewrite(table, snap, candidates), False
        )
        adds = self._write_files(rewritten, table, snap.partition_cols,
                                 schema=snap.schema)
        actions = [{"remove": {"path": p}} for p in candidates]
        actions += [{"add": a} for a in adds]
        actions += cdc_actions
        self._commit(table, self._expect_unchanged(table, base), actions,
                     "UPDATE")

    def truncate(self, ref: TableRef) -> None:
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            return
        actions = [{"remove": {"path": p}} for p in sorted(snap.files)]
        self._commit(table, snap.version + 1, actions, "TRUNCATE")

    def purge_dvs(self, ref: TableRef) -> int:
        """``REORG TABLE ... APPLY (PURGE)`` (Delta parity): physically
        rewrite ONLY the files carrying deletion vectors — masks
        applied, dv references dropped — in one atomic, logically-no-op
        commit. Unmasked files are never read or written, which is the
        difference from a full compact when 1% of a 100-TB table is
        masked. Superseded sidecars age out via vacuum. Returns the
        number of files purged."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        masked = sorted(p for p, a in snap.files.items() if a.get("dv"))
        if not masked:
            return 0
        df = self._read_for_rewrite(table, snap, masked)  # mask-applied
        adds = self._write_files(df, table, snap.partition_cols,
                                 schema=snap.schema)
        actions = [{"remove": {"path": p}} for p in masked]
        actions += [{"add": a} for a in adds]
        self._commit(table, self._expect_unchanged(table, snap.version),
                     self._mark_no_data_change(actions), "PURGE")
        return len(masked)

    AUTO_COMPACT_KEY = "autoCompact"
    AUTO_COMPACT_MIN_FILES = 16
    AUTO_CLUSTER_MIN_FILES = 8

    def _maybe_auto_compact(self, ref: TableRef,
                            configuration: dict[str, str]) -> None:
        """Delta's autoOptimize.autoCompact: after a successful append
        on a table with ``autoCompact=true``, bin-pack opportunistically
        once the small-file debt reaches AUTO_COMPACT_MIN_FILES.
        Best-effort by design — a concurrent writer winning the version
        race just means compaction happens on a later write; the append
        that triggered it has already durably committed."""
        if configuration.get(self.AUTO_COMPACT_KEY, "").lower() == "true":
            try:
                self.optimize(ref, min_files=self.AUTO_COMPACT_MIN_FILES)
            except ConcurrentWriteException:
                pass
        self._maybe_auto_cluster(ref, configuration)

    @staticmethod
    def _parse_cluster_property(configuration: dict[str, str],
                                ) -> tuple[list[str], str] | None:
        """(columns, strategy) from the ``clusterBy`` /
        ``clusterBy.strategy`` table properties — JSON list or
        comma-separated names; None when unset."""
        raw = configuration.get(CLUSTER_BY_KEY)
        if not raw:
            return None
        try:
            cols = json.loads(raw)
        except ValueError:
            cols = [c.strip() for c in raw.split(",") if c.strip()]
        if not isinstance(cols, list):
            cols = [cols]
        return ([str(c) for c in cols],
                configuration.get(CLUSTER_STRATEGY_KEY, "range"))

    def _maybe_auto_cluster(self, ref: TableRef,
                            configuration: dict[str, str]) -> None:
        """Liquid-clustering auto-maintenance (Delta's clustered-table
        ingest behavior): a table whose ``clusterBy`` property names
        layout columns keeps its layout fresh WITHOUT an operator
        invoking `cluster` — after a successful append, once the
        unclustered debt (files without the current stamp, counted
        from the typed metadata plane — no add deserialization)
        reaches AUTO_CLUSTER_MIN_FILES, an incremental pass re-lays-out
        exactly those files. Cost is O(new data) per trigger, never
        O(table); best-effort like autoCompact (a lost version race
        just defers the pass to a later write)."""
        parsed = self._parse_cluster_property(configuration)
        if parsed is None:
            return
        cluster_by, strategy = parsed
        snap = resolve_snapshot(self._table_path(ref))
        if snap is None:
            return
        stamp = self._cluster_stamp(cluster_by, strategy)
        stamps = _files_field(snap, "clustered_by", "clusteredBy",
                              decode=True)
        if not snap.partition_cols:
            debt = sum(1 for s in stamps.values() if s != stamp)
            if debt < self.AUTO_CLUSTER_MIN_FILES:
                return
            scope_parts = None
        else:
            # PER-PARTITION convergence: debt is counted per partition
            # tuple (typed metadata plane — pv columns + stamps, no
            # add deserialization), and only partitions whose OWN debt
            # crossed the threshold re-layout. One hot partition's
            # churn therefore converges without ever re-reading the
            # table's cold partitions — crucial when clusterBy lands
            # on a pre-existing table whose old partitions are
            # unstamped: ingest must never trigger an O(table) rewrite.
            pmap = _physical_map(snap.schema)
            pv_phys = [pmap.get(c, c) for c in snap.partition_cols]
            paths, _stats, pvs = _files_meta(snap, {}, pv_phys)
            debt_by_part: dict[tuple, int] = {}
            for i, p in enumerate(paths):
                if stamps.get(p) == stamp:
                    continue
                key = tuple(pvs[c][i] for c in pv_phys)
                debt_by_part[key] = debt_by_part.get(key, 0) + 1
            scope_parts = [
                k for k, n in debt_by_part.items()
                if n >= self.AUTO_CLUSTER_MIN_FILES
            ]
            if not scope_parts:
                return
        try:
            self.cluster(ref, cluster_by, strategy=strategy,
                         incremental=True, partition_scope=scope_parts)
        except ConcurrentWriteException:
            pass

    def optimize(self, ref: TableRef, where: str | None = None,
                 target_size_mb: int = 128, min_files: int = 2,
                 zorder_by: list[str] | None = None,
                 strategy: str = "zorder") -> dict:
        """OPTIMIZE [WHERE <partition predicate>] [ZORDER BY (...)] —
        one atomic, logically no-op commit.

        Without ``zorder_by``: bin-pack ONLY the files below the
        target size, scoped to the matching partitions, into
        ~target-sized files. Already-compacted (large) files and
        out-of-scope partitions are never read or rewritten — at
        100 TB the cost tracks the small-file debt in the scoped
        partitions, never the table (``compact`` stays the
        whole-table rewrite). ``where`` must resolve against
        partition columns alone (Delta's OPTIMIZE WHERE rule).
        Deletion-vector masks on rewritten files purge as a side
        effect (the rewrite applies them). Returns
        {"rewritten", "new_files"}; fewer than ``min_files`` small
        files in scope is a no-op that burns no commit.

        With ``zorder_by`` (Delta's combined ``OPTIMIZE ... ZORDER
        BY``): ALL in-scope files rewrite through the space-filling
        curve layout (``strategy`` picks 'zorder'/'hilbert'/'range',
        same engine as :meth:`cluster`) into ~target-sized files —
        small-file debt and clustering debt retire in the same
        commit, while out-of-scope files stay byte-identical. Scoped
        re-clustering is what keeps this 100-TB-shaped: cluster ONE
        hot partition's churn without touching the other 10,000."""
        table, snap = self._require_snapshot(ref)
        if where is not None:
            if not snap.partition_cols:
                raise DataSourceException(
                    "OPTIMIZE WHERE requires a partitioned table"
                )
            in_scope = set(self._files_matching_predicate(
                table, snap, where))
            # strict rule: a predicate that cannot be evaluated on the
            # partition tuple alone falls back to all-files — reject it
            part_cols = ", ".join(snap.partition_cols)
            probe = self._files_matching_predicate(
                table, snap, f"({where}) AND 1=0")
            if probe:
                raise DataSourceException(
                    f"OPTIMIZE WHERE must reference only partition "
                    f"columns ({part_cols}): {where!r}"
                )
        else:
            in_scope = set(snap.files)
        threshold = int(target_size_mb) << 20
        sizes = {
            p: (int(snap.files[p]["size"])
                if snap.files[p].get("size") is not None
                else os.path.getsize(os.path.join(table, p)))
            for p in sorted(in_scope)
        }  # published add.size when recorded: no per-file stat storm
        import math

        if zorder_by:
            rewrite = sorted(in_scope)
            if not rewrite:
                return {"rewritten": 0, "new_files": 0}
            n_out = max(
                1, math.ceil(sum(sizes[p] for p in rewrite) / threshold)
            )
            df = self._curve_layout(
                self._read_for_rewrite(table, snap, rewrite),
                list(zorder_by), n_out, strategy,
            )
            operation = "OPTIMIZE ZORDER"
        else:
            rewrite = [p for p, sz in sizes.items()
                       if sz < threshold or snap.files[p].get("dv")]
            if len(rewrite) < max(2, int(min_files)):
                return {"rewritten": 0, "new_files": 0}
            n_out = max(
                1, math.ceil(sum(sizes[p] for p in rewrite) / threshold)
            )
            df = self._read_for_rewrite(table, snap,
                                        rewrite).repartition(n_out)
            operation = "OPTIMIZE"
        adds = self._write_files(
            df.select(*self._rewrite_cols(snap, df)), table,
            snap.partition_cols, schema=snap.schema,
        )
        if zorder_by:
            # same stamp cluster(incremental=True) honors: files this
            # pass lays out never re-cluster until cols/strategy change
            for a in adds:
                a["clusteredBy"] = self._cluster_stamp(
                    list(zorder_by), strategy)
        actions = [{"remove": {"path": p}} for p in rewrite]
        actions += [{"add": a} for a in adds]
        self._commit(table, self._expect_unchanged(table, snap.version),
                     self._mark_no_data_change(actions), operation)
        return {"rewritten": len(rewrite), "new_files": len(adds)}

    def _compact_rewrite(self, df: DataFrame, ref: TableRef) -> None:
        """Compaction commit: logically a no-op (remove small files, add
        their coalesced rewrite atomically). With row tracking the
        plain read the base class handed in is re-done id-aware so the
        compacted files keep every row's stable id."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if self._row_tracking_on(snap.configuration):
            n = df.rdd.getNumPartitions()
            df = self._read_for_rewrite(table, snap).repartition(n)
        adds = self._write_files(
            df.select(*self._rewrite_cols(snap, df)), table,
            snap.partition_cols, schema=snap.schema,
        )
        actions = [{"remove": {"path": p}} for p in sorted(snap.files)]
        actions += [{"add": a} for a in adds]
        self._commit(table, self._expect_unchanged(table, snap.version), self._mark_no_data_change(actions),
                     "COMPACT")

    @staticmethod
    def _curve_layout(df: DataFrame, cluster_by: list[str],
                      target_files: int, strategy: str) -> DataFrame:
        """Range-partition + sort ``df`` on the clustering key — the
        layout engine shared by :meth:`cluster` (whole table) and
        :meth:`optimize` with ``zorder_by`` (scoped). 'range' sorts
        lexicographically; 'zorder'/'hilbert' sort by the
        space-filling curve value so EVERY clustered column gets
        narrow per-file min/max ranges."""
        if strategy in ("zorder", "hilbert"):
            from x_spark.operators.zorder import hilbert_value, zorder_value

            curve = zorder_value if strategy == "zorder" else hilbert_value
            zv = curve(df, cluster_by)
            return (
                df.withColumn("__zv", zv)
                .repartitionByRange(target_files, F.col("__zv"))
                .sortWithinPartitions("__zv")
                .drop("__zv")
            )
        if strategy == "range":
            cols = [F.col(c) for c in cluster_by]
            return df.repartitionByRange(
                target_files, *cols
            ).sortWithinPartitions(*cols)
        raise DataSourceException(
            f"cluster strategy {strategy!r} not in "
            f"('range', 'zorder', 'hilbert')"
        )

    @staticmethod
    def _cluster_stamp(cluster_by: list[str], strategy: str) -> dict:
        return {"cols": list(cluster_by), "strategy": strategy}

    def cluster(self, ref: TableRef, cluster_by: list[str],
                target_files: int | None = None,
                strategy: str = "range",
                incremental: bool = False,
                partition_scope: list[tuple] | None = None) -> int:
        """Layout management (the OPTIMIZE ... ZORDER analogue): rewrite
        the table range-partitioned and sorted on ``cluster_by``, one
        atomic commit. Afterwards each file covers a narrow key range,
        so the footer min/max stats actually prune — MERGE/DELETE on a
        clustered key touch ~1/n_files of the data instead of all of
        it (proven by ``test_txlog.py::test_clustering_tightens_
        file_skipping``). Logically a no-op, like compact.

        ``strategy="range"`` (default) sorts lexicographically — tight
        file ranges for the LEADING column. ``strategy="zorder"``
        interleaves the bits of all ``cluster_by`` columns (Morton
        order, ``x_spark.operators.zorder``) so every clustered column
        gets narrow per-file ranges — predicates on the second/third
        column prune too. ``strategy="hilbert"`` sorts by the Hilbert
        index over the same buckets — no Morton seam jumps, tighter
        average file ranges at the same bit budget.

        ``incremental=True`` (the liquid-clustering shape): every add
        a cluster pass writes is stamped ``clusteredBy`` (cols +
        strategy); an incremental pass re-lays-out ONLY the files
        without a matching stamp — the data appended since the last
        pass — into a fresh internally-sorted cube, leaving every
        already-clustered file byte-identical. Maintenance cost is
        O(new data), never O(table): clustering one day's ingest into
        a 100-TB table touches one day's files. Pruning stays
        equivalent — each cube's files carry tight per-file min/max
        ranges, so a reader unions per-cube candidates. A pass with
        nothing unclustered burns no commit. Changing columns or
        strategy invalidates the stamps, so the next pass (full or
        incremental) re-lays-out everything — Delta's ALTER CLUSTER
        BY semantics.

        ``partition_scope`` (incremental only; list of partition-value
        tuples aligned with the table's partition columns, string-
        typed as the log stores them) additionally bounds the pass to
        those partitions — the per-partition convergence unit
        auto-clustering uses so a hot partition's churn never drags
        unstamped files of COLD partitions into its rewrite; files
        outside the scope stay byte-identical."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        stamp = self._cluster_stamp(cluster_by, strategy)
        if incremental:
            stamps = _files_field(snap, "clustered_by", "clusteredBy",
                                  decode=True)
            scope = sorted(p for p, s in stamps.items() if s != stamp)
            if partition_scope is not None and snap.partition_cols:
                pmap = _physical_map(snap.schema)
                pv_phys = [pmap.get(c, c) for c in snap.partition_cols]
                paths, _st, pvs = _files_meta(snap, {}, pv_phys)
                tuple_of = {
                    p: tuple(pvs[c][i] for c in pv_phys)
                    for i, p in enumerate(paths)
                }
                allowed = set(partition_scope)
                scope = [p for p in scope if tuple_of.get(p) in allowed]
            if not scope:
                return 0  # converged: no commit
        else:
            scope = sorted(snap.files)
        df = self._read_for_rewrite(table, snap, scope)
        if target_files is None:
            target_files = max(1, len(scope))
        clustered = self._curve_layout(df, cluster_by, target_files,
                                       strategy)
        adds = self._write_files(
            clustered.select(*self._rewrite_cols(snap, clustered)), table,
            snap.partition_cols, schema=snap.schema,
        )
        for a in adds:
            a["clusteredBy"] = stamp
        actions = [{"remove": {"path": p}} for p in scope]
        actions += [{"add": a} for a in adds]
        self._commit(table, self._expect_unchanged(table, snap.version), self._mark_no_data_change(actions),
                     "CLUSTER")
        return len(adds)

    def clean_log(self, ref: TableRef, keep_last: int = 0,
                  min_age_sec: float = 600.0) -> list[str]:
        """Bound the transaction LOG itself (Delta's
        logRetentionDuration analogue): at millions of commits the log
        listing, not the data, becomes the metadata bottleneck.

        Picks the newest checkpoint that keeps the last ``keep_last``
        versions fully replayable — the replay FLOOR — and deletes
        commit files strictly below it and checkpoints superseded by it
        (only ones older than ``min_age_sec``, the same concurrency
        guard as vacuum). The floor checkpoint carries schema, live
        files, configuration, and txn stamps, so latest-state reads,
        exactly-once replay detection, CDF above the floor, and
        ICT/mtime timestamp travel to surviving versions are all
        unaffected. Time travel BELOW the floor raises the ordinary
        version-does-not-exist error — the bounded-history trade Delta
        documents for log retention. Returns the deleted file names."""
        import time as _time

        table = self._table_path(ref)
        commits, checkpoints = _list_log(table)
        now = _time.time()
        deleted: list[str] = []
        # publish debris is reaped INDEPENDENT of the floor (it needs
        # none): tmp files a crashed publish left behind (sidecars,
        # checkpoint JSONs, copy ledgers — every atomic publish stages
        # as *.tmp-<hex>), age-guarded like everything else
        for sub in ("", "copy_ledger"):
            d = os.path.join(_log_path(table), sub)
            if not os.path.isdir(d):
                continue
            for fname in os.listdir(d):
                if ".tmp-" not in fname:
                    continue
                full = os.path.join(d, fname)
                if now - os.path.getmtime(full) < min_age_sec:
                    continue
                with contextlib.suppress(FileNotFoundError):
                    os.remove(full)
                    deleted.append(os.path.join(sub, fname)
                                   if sub else fname)
        if not commits or not checkpoints:
            self._reap_log_orphans(table, now, min_age_sec, deleted)
            return deleted
        keep_from = _version_of(commits[-1]) - max(0, int(keep_last))
        usable = [c for c in checkpoints if _version_of(c) <= keep_from]
        if not usable:
            self._reap_log_orphans(table, now, min_age_sec, deleted)
            return deleted
        floor = _version_of(usable[-1])
        # refresh the floor checkpoint from the still-complete log
        # BEFORE pruning: retrofits replay-carried keys the stored
        # checkpoint may predate (txns, copyLedgers) — without this a
        # pre-feature floor would silently lose exactly-once stamps or
        # COPY INTO idempotency below it. Skipped when the stored
        # floor already carries every current key: a scheduled
        # clean_log on a huge table must not re-serialize a
        # multi-hundred-MB adds sidecar on every run.
        with open(os.path.join(_log_path(table), usable[-1])) as fh:
            stored = json.load(fh)
        carried = ("txns", "copyLedgers", "rowIdHighWaterMark")
        if (any(k not in stored for k in carried)
                or ("adds" not in stored and "addsParquet" not in stored)
                or self._sidecar_needs_upgrade(table, stored)):
            self._write_checkpoint(table, floor)
        for fname in commits + checkpoints:
            v = _version_of(fname)
            if v >= floor:
                continue  # the floor checkpoint + everything after stays
            path = os.path.join(_log_path(table), fname)
            if now - os.path.getmtime(path) < min_age_sec:
                continue
            os.remove(path)
            deleted.append(fname)
        self._reap_log_orphans(table, now, min_age_sec, deleted)
        return deleted

    @staticmethod
    def _sidecar_needs_upgrade(table: str, stored: dict) -> bool:
        """True when the floor checkpoint references a PRE-TYPED adds
        sidecar (add_json only, no ``path``/``min::``/``max::``
        columns) — the floor refresh then rewrites it in the typed
        layout so the columnar metadata plane covers old tables too.
        Footer-only read; a missing sidecar is left for the ordinary
        resolution error to surface."""
        if "addsParquet" not in stored:
            return False
        import pyarrow.parquet as pq  # noqa: PLC0415

        p = os.path.join(_log_path(table), stored["addsParquet"])
        try:
            return "path" not in pq.ParquetFile(p).schema_arrow.names
        except OSError:
            return False

    def _reap_log_orphans(self, table: str, now: float,
                          min_age_sec: float, deleted: list[str]) -> None:
        """Reap unreferenced log artifacts (age-guarded): checkpoint
        adds-sidecars whose owner JSON is gone — covering pruned
        checkpoints and failed publishes in one rule — and copy
        ledgers outside the carried reference list. Needs no floor, so
        clean_log runs it even when there is nothing to prune.

        The ``min_age_sec`` guard doubles as the LazyAdds snapshot-
        lifetime contract: a resolved snapshot keeps reading its
        (possibly superseded) sidecar safely for at least that long —
        see the LazyAdds class docstring."""
        for fname in os.listdir(_log_path(table)):
            is_ck_side = fname.endswith(".checkpoint.adds.parquet")
            is_batch_side = (".commit.adds-" in fname
                             and fname.endswith(".parquet"))
            if not is_ck_side and not is_batch_side:
                continue
            full = os.path.join(_log_path(table), fname)
            if is_ck_side:
                owner = f"{_version_of(fname):020d}.checkpoint.json"
            else:
                # commit batch sidecar: owner is the commit JSON; a
                # loser of the version race or a crashed writer left
                # one the (immutable) owner never references
                owner = f"{_version_of(fname):020d}.json"
            owner_full = os.path.join(_log_path(table), owner)
            if os.path.isfile(owner_full):
                # Owner exists — but a checkpoint owner may have been
                # REWRITTEN by clean_log's floor refresh with inline
                # adds (table shrank below CHECKPOINT_PARQUET_MIN),
                # and a commit owner may reference a DIFFERENT batch
                # (race loser). With its owner alive such a sidecar
                # would never age out: a permanent log-dir leak. Reap
                # unless the owner still names this sidecar.
                try:
                    with open(owner_full) as fh:
                        if is_ck_side:
                            if json.load(fh).get("addsParquet") == fname:
                                continue
                        elif any(
                            json.loads(line).get(
                                "addBatch", {}).get("parquet") == fname
                            for line in fh if '"addBatch"' in line
                        ):
                            continue
                except (OSError, ValueError):
                    continue  # unreadable owner: keep the sidecar
            if now - os.path.getmtime(full) < min_age_sec:
                continue
            with contextlib.suppress(FileNotFoundError):
                os.remove(full)
                deleted.append(fname)
        # ORPHANED copy ledgers (written by a COPY attempt whose
        # commit never landed): referenced ledgers are carried forward
        # by checkpoints forever, so anything outside the reference
        # list — and past the same age guard — is dead weight
        led_dir = os.path.join(_log_path(table), "copy_ledger")
        if os.path.isdir(led_dir):
            live = set(self._copy_ledger_refs(table))
            for name in os.listdir(led_dir):
                rel = os.path.join("copy_ledger", name)
                full = os.path.join(led_dir, name)
                if rel in live:
                    continue
                if now - os.path.getmtime(full) < min_age_sec:
                    continue
                with contextlib.suppress(FileNotFoundError):
                    os.remove(full)
                    deleted.append(rel)

    @staticmethod
    def _batch_dv_dirs(table: str, action: dict) -> set[str]:
        """Deletion-vector directory paths referenced by one commit
        batch's adds — read from the batch sidecar's ``dv_json``
        column (columnar, no add deserialization), for vacuum-lite
        candidate discovery."""
        import pyarrow.parquet as pq  # noqa: PLC0415

        p = os.path.join(_log_path(table), action["addBatch"]["parquet"])
        try:
            col = pq.read_table(p, columns=["dv_json"]).column("dv_json")
        except FileNotFoundError as exc:
            raise DataSourceException(
                f"commit batch sidecar "
                f"{action['addBatch']['parquet']!r} missing for "
                f"{table!r} — the log directory was partially copied "
                "or externally modified"
            ) from exc
        return {json.loads(v)["path"] for v in col.to_pylist() if v}

    def vacuum(self, ref: TableRef, keep_last: int | None = None,
               min_age_sec: float = 600.0,
               dry_run: bool = False,
               lite: bool = False) -> list[str]:
        """Physically delete data files no longer reachable.
        ``dry_run=True`` (Delta's VACUUM ... DRY RUN) returns the
        would-be-deleted paths without touching a file.

        Default (``keep_last=None``): remove only ORPHANS — files no
        log version references (crashed writers) — so every historical
        version stays time-travelable. ``keep_last=N`` additionally
        drops files referenced only by versions older than the last N
        (time travel below that horizon then fails with a missing-file
        error, as documented). Returns the deleted relative paths.

        ``lite=True`` (Delta's VACUUM ... LITE): candidates come from
        the transaction LOG's remove/cdc/dv actions instead of a full
        directory listing — at 100 TB the recursive listing, not the
        deleting, is the vacuum bottleneck, and the log already names
        every file an operation stopped referencing. The documented
        trades: orphans from crashed writers are invisible to LITE
        (they were never committed — run a full vacuum occasionally to
        sweep them), candidates named only by commits clean_log already
        pruned are likewise gone from view, and with ``keep_last=None``
        LITE is a no-op (every committed file is still horizon-
        referenced; only orphans would qualify, and LITE cannot see
        them).

        ``min_age_sec`` is the concurrency guard (Delta's VACUUM
        retention): a writer moves data files into place BEFORE its
        commit file lands, so a file that merely LOOKS unreferenced may
        belong to an in-flight commit. Only unreferenced files older
        than ``min_age_sec`` are deleted — age must exceed the longest
        plausible write-to-commit window. 0 is safe only when no writer
        is running (tests, offline maintenance)."""
        import time as _time

        table = self._table_path(ref)
        latest = self._latest_version(table)
        if latest is None:
            return []
        commits, _ = _list_log(table)
        if keep_last is None:
            horizon_versions = [_version_of(c) for c in commits]
        else:
            horizon_versions = [
                v for v in (_version_of(c) for c in commits)
                if v > latest - keep_last
            ] or [latest]
        referenced: set[str] = set()
        dv_dirs: set[str] = set()
        horizon = set(horizon_versions)
        # change-data files are referenced by the COMMIT that wrote
        # them (cdc actions), not by any snapshot: keep those of
        # horizon versions so their change feed stays readable; older
        # ones age out with the versions that referenced them
        for fname in commits:
            if _version_of(fname) not in horizon:
                continue
            with open(os.path.join(_log_path(table), fname)) as fh:
                for line in fh:
                    if '"cdc"' not in line:
                        continue
                    action = json.loads(line)
                    if "cdc" in action:
                        referenced.add(action["cdc"]["path"])
        for v in horizon_versions:
            snap = resolve_snapshot(table, v)
            referenced.update(snap.files)
            dv_dirs.update(
                add["dv"]["path"] for add in snap.files.values()
                if add.get("dv")
            )
        # a referenced deletion-vector sidecar directory keeps every
        # file inside it alive; superseded sidecars age out with the
        # versions that referenced them
        for dv in dv_dirs:
            for root, _dirs, names in os.walk(os.path.join(table, dv)):
                for name in names:
                    referenced.add(
                        os.path.relpath(os.path.join(root, name), table)
                    )
        if lite:
            # candidates straight from the log: remove-action paths,
            # cdc files, and files inside dv sidecar directories the
            # horizon no longer references — O(log size + churn), no
            # directory listing of the data tree
            candidates: set[str] = set()
            seen_dv_dirs: set[str] = set()
            for fname in commits:
                with open(os.path.join(_log_path(table), fname)) as fh:
                    for line in fh:
                        # cheap substring prefilter: add actions (the
                        # bulk of the log, stats payloads included)
                        # never deserialize unless they carry a dv;
                        # addBatch lines are tiny references whose dv
                        # pointers live in the batch's dv_json column
                        if ('"remove"' not in line and '"cdc"' not in line
                                and '"dv"' not in line
                                and '"addBatch"' not in line):
                            continue
                        action = json.loads(line)
                        if "remove" in action:
                            candidates.add(action["remove"]["path"])
                        elif "cdc" in action:
                            candidates.add(action["cdc"]["path"])
                        elif "add" in action and action["add"].get("dv"):
                            seen_dv_dirs.add(action["add"]["dv"]["path"])
                        elif "addBatch" in action:
                            # columnar dv pointer read — no add parse
                            seen_dv_dirs.update(
                                self._batch_dv_dirs(table, action)
                            )
            for dv in seen_dv_dirs - dv_dirs:
                for root, _dirs, names in os.walk(os.path.join(table, dv)):
                    for name in names:
                        candidates.add(os.path.relpath(
                            os.path.join(root, name), table
                        ))
            rels = sorted(candidates)
        else:
            walked: list[str] = []
            for root, dirs, names in os.walk(table):
                dirs[:] = [
                    d for d in dirs
                    if d != LOG_DIR and not d.startswith("_staging-")
                ]
                walked.extend(
                    os.path.relpath(os.path.join(root, name), table)
                    for name in names if name.endswith(".parquet")
                )
            rels = sorted(walked)
        deleted: list[str] = []
        cutoff = _time.time() - min_age_sec
        for rel in rels:
            if rel in referenced:
                continue
            full = os.path.join(table, rel)
            try:
                if os.path.getmtime(full) > cutoff:
                    continue  # possibly an in-flight commit's file
                if not dry_run:
                    os.remove(full)
            except FileNotFoundError:
                continue  # another vacuum won the race (or a lite
                # candidate a previous vacuum already deleted)
            deleted.append(rel)
        return sorted(deleted)

    def interval_is_add_only(self, ref: TableRef, from_version: int,
                             to_version: int) -> bool:
        """True when every commit in (``from_version``, ``to_version``]
        contains ONLY row additions — no data-changing ``remove``
        action and no ``cdc`` action — so the CDF over that interval
        provably carries no delete / update_preimage rows. A metadata-
        only probe (the small commit JSONs, never data files): an
        incremental consumer that special-cases deletes (e.g. the
        MIN/MAX view rescan) can skip its delete machinery without
        scanning the feed. Conservative: any unrecognized shape counts
        as not-add-only."""
        table = self._table_path(ref)
        commits, _ = _list_log(table)
        for fname in commits:
            v = _version_of(fname)
            if v <= from_version or v > to_version:
                continue
            with open(os.path.join(_log_path(table), fname)) as fh:
                for line in fh:
                    # substring fast-path like _txn_stamps: adds /
                    # addBatch / commitInfo lines never parse
                    if '"remove"' not in line and '"cdc"' not in line:
                        continue
                    action = json.loads(line)
                    if "cdc" in action:
                        return False
                    if "remove" in action and action["remove"].get(
                            "dataChange", True):
                        return False
        return True

    def changes(self, ref: TableRef, from_version: int,
                to_version: int | None = None) -> DataFrame:
        """Change data feed: row-level changes between two versions
        (exclusive ``from_version``, inclusive ``to_version``; default
        latest; ``from_version=-1`` = empty base, so version 0's adds
        are included), as the LATEST table schema plus ``_change_type``
        and ``_commit_version``.

        Commits carrying ``cdc`` actions (UPDATE/MERGE/CoW DELETE on a
        table with ``enableChangeDataFeed``) are served row-exactly
        from their ``_change_data`` files with Delta's 4-type contract
        — update_preimage / update_postimage / insert / delete. Other
        commits fall back to the file-granular derivation: only files
        added or removed in the interval are read — an incremental
        consumer of an append-mostly table reads exactly the new data,
        never the table — and an updated row appears as a delete (old
        image) plus an insert (new image), the MERGE-rewrite
        decomposition."""
        table = self._table_path(ref)
        latest = self._latest_version(table)
        if latest is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        to_version = latest if to_version is None else to_version
        # from_version=-1 means "empty base": every live file of the
        # interval counts as inserted from version 0 up — the inclusive
        # lower bound the table_changes TVF needs.
        live = (
            dict(resolve_snapshot(table, from_version).files)
            if from_version >= 0 else {}
        )
        # ONE schema convention across every CDF surface (the DSv2
        # batch/streaming readers pin the same): the LATEST snapshot
        # schema, Delta's rule. Files predating an ADD COLUMN surface
        # it as NULL; renames bind through stable physical names; an
        # incompatible in-interval type replacement errors at read —
        # also Delta's behavior.
        sch = resolve_snapshot(table)
        commits, _ = _list_log(table)
        out: DataFrame | None = None
        cols = [f.name for f in sch.schema.fields]

        def collect(part: DataFrame, kind: str | None, v: int) -> None:
            nonlocal out
            # kind=None: the rows carry their own _change_type (cdc)
            ct = F.lit(kind) if kind is not None else F.col("_change_type")
            part = part.select(
                *cols,
                ct.alias("_change_type"),
                F.lit(v).cast("bigint").alias("_commit_version"),
            )
            out = part if out is None else out.unionByName(part)

        for fname in commits:
            v = _version_of(fname)
            if v <= from_version or v > to_version:
                continue
            added: dict[str, dict] = {}
            removed: dict[str, dict] = {}
            cdc_paths: list[str] = []
            # iter_commit_actions expands addBatch parquet references
            # (large commits) back into their add actions
            for action in iter_commit_actions(table, fname):
                if "add" in action:
                    a = action["add"]
                    live[a["path"]] = a
                    # dataChange=false (compaction/cluster/purge):
                    # live bookkeeping only, no row emission
                    if a.get("dataChange", True):
                        added[a["path"]] = a
                elif "remove" in action:
                    # only files that were live count as deletes;
                    # the popped add dict carries the file's mask
                    # AT REMOVAL TIME, so already-masked rows are
                    # not re-emitted as deletes
                    popped = live.pop(action["remove"]["path"], None)
                    if popped is not None and action["remove"].get(
                            "dataChange", True):
                        removed[action["remove"]["path"]] = popped
                elif "cdc" in action:
                    cdc_paths.append(
                        (action["cdc"]["path"],
                         action["cdc"].get("partitionValues") or {})
                    )
            if cdc_paths:
                # Delta's rule: a commit carrying cdc actions is served
                # FROM them (row-exact 4-type change rows written by
                # the operation itself) — never from its add/remove
                # derivation, which would double-count and add rewrite
                # noise. The live map above still advanced, so later
                # derived commits stay correct. cdc files lay out
                # hive-partitioned like the table (their partition
                # columns live in the action's partitionValues, not in
                # the file): group per partition tuple, re-attach the
                # constants. Actions without partitionValues are the
                # pre-partitioning full-column layout — the explicit
                # schema read finds every column in the file.
                by_pv: dict[tuple, list[str]] = {}
                for p, pv in cdc_paths:
                    by_pv.setdefault(tuple(sorted(pv.items())), []).append(p)
                pschema = _physical_schema(sch.schema)
                ptypes = {f.name: f.dataType for f in pschema.fields}
                for key, paths in sorted(by_pv.items(), key=str):
                    pv = dict(key)
                    present = StructType(
                        [f for f in pschema.fields if f.name not in pv]
                    ).add("_change_type", "string")
                    df = (self.spark.read.schema(present)
                          .parquet(*[os.path.join(table, p)
                                     for p in paths]))
                    for pname, val in sorted(pv.items()):
                        if pname in ptypes:
                            df = df.withColumn(
                                pname, F.lit(val).cast(ptypes[pname])
                            )
                    collect(
                        df.select(
                            *[F.col(_physical_name(f)).alias(f.name)
                              for f in sch.schema.fields],
                            "_change_type",
                        ),
                        None, v,
                    )
                continue
            # a path removed AND re-added in one commit is a deletion-
            # vector re-point (DELETE with DVs, or a RESTORE
            # re-asserting earlier mask state): the row-level change is
            # exactly the mask DELTA, in both directions
            pure_add = [added[p] for p in added if p not in removed]
            pure_rem = [removed[p] for p in removed if p not in added]
            # Row tracking upgrades the file-granular derivation to a
            # ROW-EXACT one (Delta: row tracking improves CDF): a CoW
            # rewrite commit pairs removed and added rows on their
            # stable row id — an unchanged co-located row pairs with
            # itself and emits NOTHING (the delete+insert noise the
            # plain derivation documents), a changed pair emits
            # update_preimage/update_postimage, and unpaired ids are
            # real inserts/deletes. Engaged only when both sides exist,
            # every involved file carries ids, and no deletion vectors
            # are in play (DV re-points take the mask-delta path
            # below); anything else falls back to the plain derivation.
            pairable = (
                pure_add and pure_rem
                and self._row_tracking_on(sch.configuration)
                # eqNullSafe cannot order MapType — a map column
                # anywhere in the schema keeps the plain derivation
                and not _contains_map(sch.schema)
                and all(e.get("baseRowId") is not None and not e.get("dv")
                        for e in pure_add + pure_rem)
            )
            if pairable:
                def side(entries: list[dict], marker: str) -> DataFrame:
                    s = Snapshot(
                        v, sch.schema_json, sch.partition_cols,
                        {e["path"]: e for e in entries},
                        sch.configuration,
                    )
                    return (
                        self._read_rows_with_ids(
                            table, s, sorted(e["path"] for e in entries)
                        )
                        .select(
                            F.struct(*cols).alias(f"__{marker}img"),
                            F.col(ROW_ID_COL).alias("__rid"),
                            F.lit(True).alias(f"__{marker}p"),
                        )
                    )

                j = side(pure_rem, "o").join(
                    side(pure_add, "n"), "__rid", "full_outer"
                )
                both = F.col("__op").isNotNull() & F.col("__np").isNotNull()
                changed = both & ~F.col("__oimg").eqNullSafe(F.col("__nimg"))
                parts = [
                    (F.col("__np").isNull(), "__oimg", "delete"),
                    (F.col("__op").isNull(), "__nimg", "insert"),
                    (changed, "__oimg", "update_preimage"),
                    (changed, "__nimg", "update_postimage"),
                ]
                paired: DataFrame | None = None
                for cond, img, ct in parts:
                    part = j.filter(cond).select(
                        *[F.col(img).getField(c).alias(c) for c in cols],
                        F.lit(ct).alias("_change_type"),
                    )
                    paired = part if paired is None \
                        else paired.unionByName(part)
                collect(paired, None, v)
                pure_add = pure_rem = []
            for entries, kind in ((pure_add, "insert"), (pure_rem, "delete")):
                plain = [e["path"] for e in entries if not e.get("dv")]
                masked = [e for e in entries if e.get("dv")]
                if plain:
                    collect(
                        self.spark.read
                        .schema(_physical_schema(sch.schema))
                        .option("basePath", table)
                        .parquet(*[os.path.join(table, p) for p in plain])
                        .select(*[F.col(_physical_name(f)).alias(f.name)
                                  for f in sch.schema.fields]),
                        kind, v,
                    )
                if masked:
                    rows = self._read_files_with_meta(
                        table, sch.schema, [e["path"] for e in masked]
                    )
                    mask = self._dv_rows_for(
                        table, [(e["path"], e["dv"]) for e in masked]
                    )
                    collect(rows.join(mask, ["__fn", "__ri"], "left_anti"),
                            kind, v)
            groups: dict[tuple, list[str]] = {}
            for p in added:
                if p not in removed or added[p] == removed[p]:
                    continue
                old_dv, new_dv = removed[p].get("dv"), added[p].get("dv")
                if old_dv == new_dv:
                    continue  # re-assert with no mask change: no rows
                key = (
                    old_dv["path"] if old_dv else None,
                    new_dv["path"] if new_dv else None,
                )
                groups.setdefault(key, []).append(p)
            for (old_dir, new_dir), paths in sorted(groups.items()):
                old_mask = self._dv_rows_for(
                    table,
                    [(p, {"path": old_dir} if old_dir else None)
                     for p in paths],
                )
                new_mask = self._dv_rows_for(
                    table,
                    [(p, {"path": new_dir} if new_dir else None)
                     for p in paths],
                )
                rows = self._read_files_with_meta(table, sch.schema, paths)
                newly_masked = new_mask.exceptAll(old_mask)
                newly_unmasked = old_mask.exceptAll(new_mask)
                collect(rows.join(newly_masked, ["__fn", "__ri"],
                                  "left_semi"), "delete", v)
                collect(rows.join(newly_unmasked, ["__fn", "__ri"],
                                  "left_semi"), "insert", v)
        if out is None:
            schema = sch.schema.add("_change_type", "string").add(
                "_commit_version", "long"
            )
            return self.spark.createDataFrame([], schema)
        return out

    def semantic_diff(self, ref: TableRef, from_version: int,
                      to_version: int | None = None) -> DataFrame:
        """ROW-LEVEL snapshot diff between two versions: the multiset
        difference ``snapshot(to) - snapshot(from)`` as one row per
        distinct row image with a signed ``net`` count (+k appeared,
        -k disappeared).

        The raw change feed (:meth:`changes`) is file-granular — a
        MERGE or DELETE that rewrites a file emits delete+insert pairs
        for every UNTOUCHED row co-located in that file, so its row
        set depends on physical layout. This operator cancels that
        noise: group by the full row image and sum +1/-1 per
        insert/delete — identical rewrite pairs net to zero, leaving
        exactly the semantic difference, independent of file layout,
        compaction, or Z-ordering in the interval. (Logical-no-op
        commits like OPTIMIZE therefore contribute nothing.)

        One distributed groupBy over only the files touched in the
        interval — never a scan of either full snapshot; at 100 TB the
        cost tracks the churn, not the table.
        """
        ch = self.changes(ref, from_version, to_version)
        data_cols = [c for c in ch.columns
                     if c not in ("_change_type", "_commit_version")]
        # 4-type folding: postimage rows appear, preimage rows vanish
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        return (
            ch.groupBy(*data_cols)
            .agg(F.sum(sign).cast("bigint").alias("net"))
            .filter(F.col("net") != 0)
        )

    def restore_to_timestamp(self, ref: TableRef, ts) -> int:
        """RESTORE TABLE ... TO TIMESTAMP AS OF — resolves the target
        version by in-commit timestamp (mtime fallback, the same rule
        as read-side time travel) and delegates to :meth:`restore`."""
        table = self._table_path(ref)
        if resolve_snapshot(table) is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        return self.restore(ref, self._version_at_timestamp(table, ts))

    def restore(self, ref: TableRef, version: int) -> int:
        """RESTORE TABLE ... TO VERSION AS OF — Delta's rollback shape:
        ONE metadata-only commit whose state re-references the target
        version's files (no data is copied; the restore itself becomes
        a new version, so history is preserved and the restore can be
        time-traveled past or restored again).

        The commit removes every currently-live file not in the target
        snapshot, re-adds target files that are no longer live, and
        re-asserts the target's schema/partitioning via a metaData
        action (so a restore across a mergeSchema append rolls the
        schema back too). Fails cleanly when a target data file has
        been vacuumed away (the guard every lakehouse RESTORE has) —
        nothing is committed in that case.

        Returns the new version number."""
        table = self._table_path(ref)
        current = resolve_snapshot(table)
        if current is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        target = resolve_snapshot(table, version)
        if target is None:
            raise DataSourceException(
                f"version {version} of {table!r} does not exist"
            )
        missing = [
            rel for rel in sorted(target.files)
            if not os.path.exists(os.path.join(table, rel))
        ]
        missing += [
            dv["path"]
            for rel in sorted(target.files)
            if (dv := target.files[rel].get("dv"))
            and not os.path.exists(os.path.join(table, dv["path"]))
        ]
        if missing:
            raise DataSourceException(
                f"cannot restore {table!r} to v{version}: {len(missing)} "
                f"referenced data file(s) were vacuumed (first: {missing[0]})"
            )
        actions: list[dict] = [
            {
                "metaData": {
                    "schemaJson": target.schema_json,
                    "partitionColumns": target.partition_cols,
                    "configuration": target.configuration,
                }
            }
        ]
        # a path live at BOTH versions whose add action differs (e.g. a
        # deletion-vector change) must be re-asserted too: remove+add in
        # this same commit re-points it at the target's state, and the
        # change feed's pair logic turns the mask delta into row events
        changed = [
            p for p in sorted(set(current.files) & set(target.files))
            if current.files[p] != target.files[p]
        ]
        actions += [
            {"remove": {"path": p}}
            for p in sorted(set(current.files) - set(target.files)) + changed
        ]
        actions += [
            {"add": self._as_data_change(target.files[p])}
            for p in sorted(set(target.files) - set(current.files)) + changed
        ]
        return self._commit(
            table,
            self._expect_unchanged(table, current.version),
            actions,
            "RESTORE",
        )

    def count_rows(self, ref: TableRef, version: int | None = None) -> int:
        """EXACT row count from log metadata alone — sum of the live
        add-actions' ``numRecords`` (every add carries its footer row
        count). O(log), zero data bytes read: Delta's count-from-stats
        optimization surfaced as an explicit API (``SELECT COUNT(*)``
        through the generic reader would still scan). Files whose add
        action predates the stats field (foreign logs) fall back to a
        single parquet-footer read each — still no data pages."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table, version)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        total = 0
        for rel, add in snap.files.items():
            n = add.get("numRecords")
            if n is None:
                n, _ = self._footer_stats(os.path.join(table, rel))
            total += int(n) - int((add.get("dv") or {}).get("cardinality", 0))
        return total

    def partition_counts(self, ref: TableRef,
                         version: int | None = None) -> list[dict]:
        """Per-partition row/file counts from log metadata (no data
        read): ``[{<part col>: value, ..., n_files, n_rows}, ...]`` —
        the D1 partition-metadata surface with exact sizes attached."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table, version)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        acc: dict[tuple, dict] = {}
        # pv keys are PHYSICAL (rename-stable); present them logical
        back = {_physical_name(f): f.name for f in snap.schema.fields}
        for rel, add in snap.files.items():
            pv = {
                back.get(k, k): v
                for k, v in (add.get("partitionValues") or {}).items()
            }
            key = tuple(sorted(pv.items()))
            slot = acc.setdefault(key, {"n_files": 0, "n_rows": 0})
            slot["n_files"] += 1
            n = add.get("numRecords")
            if n is None:
                n, _ = self._footer_stats(os.path.join(table, rel))
            slot["n_rows"] += (
                int(n) - int((add.get("dv") or {}).get("cardinality", 0))
            )
        return [
            {**dict(key), "n_files": v["n_files"], "n_rows": v["n_rows"]}
            for key, v in sorted(acc.items())
        ]

    def clone(self, src_ref: TableRef, dst_ref: TableRef,
              version: int | None = None, timestamp=None) -> int:
        """CLONE (Delta parity): create ``dst_ref`` as an independent
        table holding the (optionally time-traveled) snapshot of
        ``src_ref`` — schema, partitioning, CHECK constraints, and the
        full add-action set (stats included, nothing recomputed or
        rescanned).

        Data files are HARDLINKED into the clone's directory (copy is
        the cross-device fallback), which keeps the zero-copy economics
        of Delta's shallow clone while fixing its sharpest edge: the
        source can be vacuumed, truncated, or dropped and the clone
        stays readable, because links keep the inodes alive — and both
        tables keep ordinary RELATIVE paths, so every existing code
        path (partitioned reads via basePath, vacuum's directory
        listing, merge/delete rewrites) works on the clone unchanged.
        Writes to either table never touch the other: data files are
        immutable by construction (rewrites create new files and only
        drop log references), so shared inodes are never mutated.

        Returns the clone's committed version (0 — metaData + adds in
        one atomic commit). ``timestamp`` addresses the source by
        commit time instead of version (ICT resolution, mtime
        fallback — the TIMESTAMP AS OF clone flavor)."""
        src = self._table_path(src_ref)
        if timestamp is not None:
            if version is not None:
                raise DataSourceException(
                    "clone takes version OR timestamp, not both"
                )
            version = self._version_at_timestamp(src, timestamp)
        snap = resolve_snapshot(src, version)
        if snap is None:
            raise DataSourceException(f"txlog table {src!r} does not exist")
        dst = self._table_path(dst_ref, create=True)
        if os.path.abspath(dst) == os.path.abspath(src):
            raise DataSourceException("cannot clone a table onto itself")
        if self.table_exists(dst_ref):
            raise DataSourceException(f"clone destination {dst!r} already exists")
        os.makedirs(dst, exist_ok=True)
        actions: list[dict] = [{
            "metaData": {
                "schemaJson": snap.schema_json,
                "partitionColumns": list(snap.partition_cols),
                "configuration": dict(snap.configuration),
            }
        }]
        def link(rel_file: str) -> None:
            s, d = os.path.join(src, rel_file), os.path.join(dst, rel_file)
            if os.path.exists(d):
                return
            os.makedirs(os.path.dirname(d), exist_ok=True)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)

        linked_dvs: set[str] = set()
        for rel in sorted(snap.files):
            link(rel)
            dv = snap.files[rel].get("dv")
            if dv and dv["path"] not in linked_dvs:
                # deletion-vector sidecar directories travel with their
                # referencing adds (relative paths stay valid)
                for root, _dirs, names in os.walk(os.path.join(src, dv["path"])):
                    for name in names:
                        link(os.path.relpath(os.path.join(root, name), src))
                linked_dvs.add(dv["path"])
            actions.append({"add": self._as_data_change(snap.files[rel])})
        return self._commit(dst, 0, actions, "CLONE")

    def generate_manifest(self, ref: TableRef,
                          version: int | None = None) -> str:
        """Delta's ``GENERATE symlink_format_manifest`` parity: write
        ``_symlink_format_manifest/manifest`` listing the ABSOLUTE path
        of every live data file of the (optionally time-traveled)
        snapshot, one per line — the handshake that lets external
        engines (Trino/Presto/Hive/DuckDB) read a CONSISTENT snapshot
        of the table without understanding the log: they scan exactly
        the listed files, never a half-committed write (new files land
        before their commit and would be invisible to the log; the
        manifest, generated FROM the log, never lists them).

        Replaced atomically (tmp + rename), so a concurrent external
        reader sees either the old snapshot's file list or the new one,
        never a torn mix. Like Delta, the manifest is a point-in-time
        export: regenerate after writes (or pin ``version``), and keep
        ``vacuum(keep_last=...)`` horizons wider than the oldest
        manifest still in use. Returns the manifest file path."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table, version)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        dv_files = [p for p in sorted(snap.files) if snap.files[p].get("dv")]
        if dv_files:
            # Delta parity: external engines read listed files verbatim
            # and would resurrect masked rows — purge (compact) first
            raise DataSourceException(
                f"cannot generate a manifest for {table!r}: "
                f"{len(dv_files)} live file(s) carry deletion vectors; "
                "compact the table to purge them first"
            )
        d = os.path.join(table, "_symlink_format_manifest")
        os.makedirs(d, exist_ok=True)
        out = os.path.join(d, "manifest")
        tmp = out + ".tmp"
        with open(tmp, "w") as fh:
            for rel in sorted(snap.files):
                fh.write(os.path.abspath(os.path.join(table, rel)) + "\n")
        os.replace(tmp, out)
        return out

    def describe_detail(self, ref: TableRef) -> dict:
        """DESCRIBE DETAIL: current version, schema, partitioning, file
        count, exact row count (metadata), and live-file bytes — read
        from the adds' published ``size`` field (zero I/O; stat() only
        for pre-size adds). Every field comes from ONE snapshot
        resolve, so the report is internally consistent under
        concurrent commits."""
        table = self._table_path(ref)
        snap = resolve_snapshot(table)
        if snap is None:
            raise DataSourceException(f"txlog table {table!r} does not exist")
        size = 0
        n_rows = 0
        for rel, add in snap.files.items():
            n = add.get("numRecords")
            if n is None:
                n, _ = self._footer_stats(os.path.join(table, rel))
            n_rows += int(n) - int((add.get("dv") or {}).get("cardinality", 0))
            if add.get("size") is not None:
                size += int(add["size"])  # recorded at publish: no stat
            else:
                try:
                    size += os.path.getsize(os.path.join(table, rel))
                except OSError:
                    pass  # vacuumed out from under: size is best-effort
        return {
            "path": table,
            "version": snap.version,
            "num_files": len(snap.files),
            "num_rows": n_rows,
            "size_bytes": size,
            "partition_columns": list(snap.partition_cols),
            "schema": snap.schema.simpleString(),
        }

    def history(self, ref: TableRef) -> list[dict]:
        """(version, operation, timestamp) for every commit — DESCRIBE
        HISTORY. ``timestamp`` is the in-commit epoch-ms value (None
        for pre-ICT commits)."""
        table = self._table_path(ref)
        commits, _ = _list_log(table)
        out = []
        for fname in commits:
            op = None
            ts = None
            with open(os.path.join(_log_path(table), fname)) as fh:
                for line in fh:
                    action = json.loads(line)
                    if "commitInfo" in action:
                        op = action["commitInfo"].get("operation")
                        ts = action["commitInfo"].get("timestamp")
            out.append({"version": _version_of(fname), "operation": op,
                        "timestamp": ts})
        return out

    # -- pruning -------------------------------------------------------
    def _expect_unchanged(self, table: str, base_version: int) -> int:
        """Target version for a read-modify-write commit; aborts if the
        snapshot the writer read is no longer the latest."""
        latest = self._latest_version(table)
        if latest != base_version:
            raise ConcurrentWriteException(
                f"table {table!r} advanced from v{base_version} to v{latest} "
                "during a read-modify-write operation"
            )
        return base_version + 1

    def _files_overlapping_keys(self, src: DataFrame, snap: Snapshot,
                                key: str,
                                bounds: tuple | None = None) -> list[str]:
        """Files whose footer min/max range on ``key`` (the leading
        merge primary-key column) overlaps the source's key range —
        read-free data skipping; a pruned file provably holds no row a
        source key can match. Missing stats => candidate (safe).

        ``bounds`` is the already-collected (min, max) of the source
        key when the caller fused that aggregate into another source
        pass (``merge``'s uniqueness check) — one fewer Spark job;
        omitted, the range is measured here.

        Bounds come from the columnar metadata plane (typed sidecar
        columns when the snapshot is sidecar-backed — no add-action
        deserialization) and the disjointness test is vectorized: the
        kind rules mirror the scalar ones exactly (ints/floats compare
        natively, string-serialized date/timestamp lexicographically —
        ISO shapes order chronologically — Decimal by exact re-parse;
        a kind that cannot soundly compare keeps the file)."""
        import datetime  # noqa: PLC0415
        from decimal import Decimal, InvalidOperation  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415

        if bounds is not None:
            lo, hi = bounds
        else:
            row = src.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
            lo, hi = row["lo"], row["hi"]
        if lo is None:
            return []  # empty source: no file can match
        field = next(
            (f for f in snap.schema.fields if f.name == key), None
        )
        kind = _stat_sidecar_kind(field.dataType) if field else None
        if kind is None or isinstance(lo, bool):
            return sorted(snap.files)  # un-prunable kind: all candidates
        pkey = _physical_map(snap.schema).get(key, key)  # stats keys are PHYSICAL
        paths, stats, _ = _files_meta(snap, {pkey: kind}, [])
        mins, maxs = stats[pkey]
        fmin, vmin = _np_bounds(mins, kind)
        fmax, vmax = _np_bounds(maxs, kind)
        valid = vmin & vmax
        exclude = np.zeros(len(paths), dtype=bool)
        if kind in ("int", "float") and isinstance(lo, (int, float)):
            exclude = valid & ((fmin > hi) | (fmax < lo))
        elif kind == "str":
            if isinstance(lo, str):
                exclude = valid & (
                    (fmin > hi).astype(bool) | (fmax < lo).astype(bool)
                )
            elif isinstance(lo, Decimal):
                def _dis(mn, mx):
                    if mn is None or mx is None:
                        return False
                    try:
                        return Decimal(mn) > hi or Decimal(mx) < lo
                    except InvalidOperation:
                        return False

                exclude = np.fromiter(
                    (_dis(mn, mx) for mn, mx in zip(mins, maxs)),
                    dtype=bool, count=len(paths),
                )
            elif isinstance(lo, (datetime.date, datetime.datetime)):
                slo, shi = str(lo), str(hi)
                exclude = valid & (
                    (fmin > shi).astype(bool) | (fmax < slo).astype(bool)
                )
        return sorted(p for p, e in zip(paths, exclude) if not e)

    _PRUNE_LIT = r"(?:'((?:[^']|'')*)'|(-?\d+(?:\.\d+)?))"

    @classmethod
    def _parse_conjunct(cls, part: str):
        """One predicate fragment parsed to ``(col, op, literals)``
        when it has the shape footer min/max stats can prune on —
        ``col <op> literal`` (op in = < <= > >=) or ``col IN
        (literals)`` — else None. Anything unparseable (NOT,
        functions, column-column, flipped operands, nested boolean
        structure) contributes no pruning, which is always safe
        inside an AND: ONE provably-false required conjunct excludes
        the file regardless of the rest."""
        import re

        from x_spark.sources.sql_dml import split_top_level

        m = re.fullmatch(
            rf"\s*`?([A-Za-z_]\w*)`?\s*(<=|>=|=|<|>)\s*"
            rf"{cls._PRUNE_LIT}\s*", part,
        )
        if m:
            quoted = m.group(3) is not None
            lit = m.group(3) if quoted else m.group(4)
            return (m.group(1), m.group(2),
                    [(lit.replace("''", "'"), quoted)])
        m = re.fullmatch(
            rf"\s*`?([A-Za-z_]\w*)`?\s+in\s*\(([^()]*)\)\s*",
            part, re.I,
        )
        if m:
            # EVERY comma-separated element must be a bare literal —
            # harvesting digit/string fragments out of column
            # references or arithmetic (``IN (2, id2)``, ``IN (1+1)``)
            # would prune on values that are not the IN-list's values
            lits: list[tuple[str, bool]] = []
            for el in split_top_level(m.group(2)):
                lm = re.fullmatch(rf"\s*{cls._PRUNE_LIT}\s*", el)
                if lm is None:
                    return None
                quoted = lm.group(1) is not None
                lits.append((
                    (lm.group(1) if quoted else lm.group(2))
                    .replace("''", "'"),
                    quoted,
                ))
            if lits:
                return (m.group(1), "in", lits)
        return None

    @classmethod
    def _simple_conjuncts(cls, predicate: str) -> list[tuple[str, str, list]]:
        """Parsed ``(col, op, literals)`` conjuncts of a single
        AND-only fragment (unparseable conjuncts dropped — safe, see
        _parse_conjunct)."""
        from x_spark.sources.sql_dml import _split_top_and

        out = []
        for part in _split_top_and(predicate):
            parsed = cls._parse_conjunct(part)
            if parsed is not None:
                out.append(parsed)
        return out

    @classmethod
    def _pruning_disjuncts(cls, predicate: str,
                           ) -> list[list[tuple[str, str, list]]]:
        """The predicate's OR-of-conjuncts pruning structure (Delta's
        data-skipping rule for disjunctions): recursively split on
        top-level OR (stripping redundant outer parens, which can
        expose further ORs), parse each disjunct's top-level AND
        conjuncts. A file may be excluded only when EVERY disjunct has
        some conjunct its stats prove false, so a disjunct yielding no
        parseable conjunct makes the whole predicate unprunable —
        returns ``[]``.

        This is what lets the reference's own generated replaceWhere
        shape — OR-of-partition-tuples, ``(pk2='a') OR (pk2='b')``
        (etl/overwrite.py:27-33) — skip files on footer stats instead
        of degrading to a full candidate set."""
        from x_spark.sources.sql_dml import (
            _split_top_or, strip_outer_parens,
        )

        s = strip_outer_parens(predicate)
        parts = _split_top_or(s)
        if len(parts) > 1:
            out: list[list] = []
            for p in parts:
                sub = cls._pruning_disjuncts(p)
                if not sub:
                    return []  # an unprunable branch poisons the OR
                out.extend(sub)
            return out
        conjs = cls._simple_conjuncts(s)
        return [conjs] if conjs else []

    @staticmethod
    def _exclude_mask(mins: list, maxs: list, kind: str, op: str,
                      lits: list[tuple[str, bool]]):
        """Vectorized footer-stats exclusion: a True element means the
        file's [min,max] proves NO row satisfies ``col <op> lit``.
        ``mins``/``maxs`` are kind-conformed bound columns (mismatched
        stored kinds already nulled by _typed_stat — null never
        prunes); literal parse failure onto the carrier kind (e.g. a
        fractional literal against an integral column) excludes
        nothing, exactly like the scalar rule it replaces."""
        import numpy as np  # noqa: PLC0415

        n = len(mins)
        none = np.zeros(n, dtype=bool)
        try:
            if kind == "int":
                vals = [int(str(v)) for v, _ in lits]
            elif kind == "float":
                vals = [float(str(v)) for v, _ in lits]
            else:
                vals = [str(v) for v, _ in lits]
        except (TypeError, ValueError):
            return none
        fmin, vmin = _np_bounds(mins, kind)
        fmax, vmax = _np_bounds(maxs, kind)
        valid = vmin & vmax

        def lt(a, b):  # elementwise, object-array safe
            return (a < b).astype(bool) if kind == "str" else a < b

        def gt(a, b):
            return (a > b).astype(bool) if kind == "str" else a > b

        def le(a, b):
            return (a <= b).astype(bool) if kind == "str" else a <= b

        def ge(a, b):
            return (a >= b).astype(bool) if kind == "str" else a >= b

        if op == "=":
            return valid & (gt(fmin, vals[0]) | lt(fmax, vals[0]))
        if op == "in":
            out = np.ones(n, dtype=bool)
            for v in vals:
                out &= gt(fmin, v) | lt(fmax, v)
            return valid & out
        if op == "<":
            return valid & ge(fmin, vals[0])
        if op == "<=":
            return valid & gt(fmin, vals[0])
        if op == ">":
            return valid & le(fmax, vals[0])
        if op == ">=":
            return valid & lt(fmax, vals[0])
        return none

    def _validate_predicate(self, snap: Snapshot, predicate: str) -> None:
        """Analyze ``predicate`` against the table schema (no job runs:
        DataFrame transformations analyze eagerly). Called on the
        zero-candidate no-op paths so a typo'd column or bad function
        still errors the way a full scan would — Delta analyzes the
        predicate BEFORE file skipping for the same reason."""
        self.spark.createDataFrame([], snap.schema).filter(predicate)

    def _files_matching_predicate(self, table: str, snap: Snapshot,
                                  predicate: str) -> list[str]:
        """Files that may hold rows where ``predicate`` is TRUE —
        Delta's data skipping, applied to every predicate-scoped
        rewrite (DELETE/UPDATE candidates, replaceWhere). Two
        read-free passes over the COLUMNAR metadata plane (typed
        sidecar columns when the snapshot is sidecar-backed — no
        add-action deserialization, column-pruned IO): footer min/max
        stats prune files whose range provably excludes a simple
        conjunct (``col <op> literal`` / ``col IN``), then partition
        values prune files of non-matching partitions. A pruned file's
        rows all evaluate FALSE/NULL and survive untouched; at 100 TB
        this is what makes ``DELETE WHERE id = k`` on a clustered
        table touch one file, not every file — and at millions of
        files, what keeps candidate selection itself from becoming a
        driver-side JSON-parsing bottleneck."""
        import numpy as np  # noqa: PLC0415

        from pyspark.sql.types import StringType  # noqa: PLC0415

        if not snap.files:
            return []
        pmap = _physical_map(snap.schema)
        types = {f.name: f.dataType for f in snap.schema.fields}

        def gate(conjs: list) -> list:
            """Type-resolved, literal-kind-gated conjuncts: numeric
            literals prune numeric columns, quoted literals prune
            StringType columns ONLY — a quoted literal
            lexicographically compared against a timestamp column's
            string-serialized stats could prune a semantically equal
            value ('2024-01-01' vs '2024-01-01 00:00:00'), so those
            never prune."""
            out = []
            for c, op, lits in conjs:
                if c not in types:
                    continue
                declared = types[c]
                kind = _stat_sidecar_kind(declared)
                quoted_ok = isinstance(declared, StringType)
                numeric_ok = kind in ("int", "float")
                if not all((q and quoted_ok) or (not q and numeric_ok)
                           for _, q in lits):
                    continue
                out.append((pmap.get(c, c), kind, op, lits))
            return out

        # OR-of-conjuncts skipping: a file is excluded iff EVERY
        # disjunct has a gated conjunct its stats prove false; a
        # disjunct left with no gated conjunct disables skipping
        disjuncts = [gate(d) for d in self._pruning_disjuncts(predicate)]
        if any(not d for d in disjuncts):
            disjuncts = []
        stat_kinds = {c: k for d in disjuncts for c, k, _, _ in d}
        pv_phys = [pmap.get(c, c) for c in snap.partition_cols]
        paths, stats, pvs = _files_meta(snap, stat_kinds, pv_phys)
        keep = np.ones(len(paths), dtype=bool)
        if disjuncts:
            excl_all = np.ones(len(paths), dtype=bool)
            for d in disjuncts:
                excl_d = np.zeros(len(paths), dtype=bool)
                for cphys, kind, op, lits in d:
                    mins, maxs = stats[cphys]
                    excl_d |= self._exclude_mask(mins, maxs, kind, op,
                                                 lits)
                excl_all &= excl_d
            keep = ~excl_all
        idx = np.flatnonzero(keep)
        order = sorted(range(len(idx)), key=lambda j: paths[idx[j]])
        idx = [idx[j] for j in order]
        rels = [paths[i] for i in idx]
        if not snap.partition_cols or not rels:
            return rels
        if not _partition_only_predicate(predicate, snap.partition_cols):
            return rels  # references non-partition columns: no pruning
        by_name = {f.name: f for f in snap.schema.fields}
        part_fields = [by_name[c] for c in snap.partition_cols]
        rows = [
            tuple(pvs[pmap.get(c, c)][i] for c in snap.partition_cols)
            for i in idx
        ]
        # partition values travel as strings in the log: build a string
        # frame, cast to the declared types, evaluate the predicate
        # once per file's partition tuple (metadata scale)
        str_schema = ", ".join(f"{c} string" for c in snap.partition_cols)
        typed = self.spark.createDataFrame(rows, str_schema).select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in part_fields
            ]
        )
        try:
            flags = typed.withColumn(
                "_match", F.coalesce(F.expr(predicate), F.lit(False))
            ).collect()
        except Exception:
            # backstop for shapes the pre-check above can't see (e.g.
            # a partition-named lambda variable): no pruning, correct
            # by the same rule
            return rels
        return [rel for rel, row in zip(rels, flags) if row["_match"]]


# ---------------------------------------------------------------------------
# delta resolution without delta-spark


class DeltaFallbackDataSource(TxLogDataSource):
    """What ``init_datasource("delta", ...)`` returns when delta-spark
    is not importable: the txlog transactional store, deferring to the
    Spark catalog for table NAMES that already exist there.

    The deferral mirrors Delta-on-Databricks reality (Delta tables live
    in the metastore) and prevents split-brain: a config targeting a
    pre-existing catalog table must keep writing that table, not grow a
    shadow txlog table under the same name. New names (in neither
    catalog) and all path refs get full transactional semantics.
    """

    format_name = "delta"

    def _catalog_delegate(self, ref: TableRef):
        if ref.is_path or ref.table in self._known_names():
            return None
        # PERSISTENT catalog tables only: tableExists also answers True
        # for session temp views, and a temp view must not hijack a
        # transactional write target (a query helper registering a view
        # named like a table would silently reroute delta writes)
        try:
            t = self.spark.catalog.getTable(ref.table)  # type: ignore[arg-type]
        except Exception:
            return None
        if (t.tableType or "").upper() == "TEMPORARY" or t.isTemporary:
            return None
        from x_spark.sources.parquet_catalog import ParquetCatalogDataSource

        return ParquetCatalogDataSource(self.spark)

    def read(self, ref: TableRef) -> DataFrame:
        d = self._catalog_delegate(ref)
        return d.read(ref) if d else super().read(ref)

    @staticmethod
    def _reject_kwargs(op: str, kw: dict) -> None:
        if kw:
            raise DataSourceException(
                f"{op} option(s) {sorted(kw)} are transactional-store "
                "features; this table name routes to the Spark catalog "
                "connector which does not support them"
            )

    def append(self, df: DataFrame, ref: TableRef, **kw) -> None:
        d = self._catalog_delegate(ref)
        if d:
            self._reject_kwargs("append", kw)
            d.append(df, ref)
        else:
            super().append(df, ref, **kw)

    def overwrite(self, df: DataFrame, ref: TableRef,
                  replace_where: str | None = None, **kw) -> None:
        d = self._catalog_delegate(ref)
        if d:
            self._reject_kwargs("overwrite", kw)
            d.overwrite(df, ref, replace_where)
        else:
            super().overwrite(df, ref, replace_where, **kw)

    def overwrite_dynamic(self, df: DataFrame, ref: TableRef) -> None:
        d = self._catalog_delegate(ref)
        if d:
            d.overwrite_dynamic(df, ref)
        else:
            super().overwrite_dynamic(df, ref)

    def merge(self, df: DataFrame, ref: TableRef, spec: MergeSpec, **kw) -> None:
        d = self._catalog_delegate(ref)
        if d:
            self._reject_kwargs("merge", kw)
            d.merge(df, ref, spec)
        else:
            super().merge(df, ref, spec, **kw)

    def truncate(self, ref: TableRef) -> None:
        d = self._catalog_delegate(ref)
        if d:
            d.truncate(ref)
        else:
            super().truncate(ref)

    def delete(self, ref: TableRef, predicate: str) -> None:
        d = self._catalog_delegate(ref)
        if d:
            d.delete(ref, predicate)
        else:
            super().delete(ref, predicate)

    def update(self, ref: TableRef, assignments: dict[str, str],
               predicate: str = "TRUE") -> None:
        d = self._catalog_delegate(ref)
        if d:
            raise DataSourceException(
                "UPDATE routes to the Spark catalog connector for this "
                "table name, which has no predicate-update surface; use "
                "merge or overwrite, or address the transactional store "
                "by path"
            )
        super().update(ref, assignments, predicate)

    def _compact_rewrite(self, df: DataFrame, ref: TableRef) -> None:
        d = self._catalog_delegate(ref)
        if d:
            d._compact_rewrite(df, ref)
        else:
            super()._compact_rewrite(df, ref)

    def partition_columns(self, ref: TableRef) -> list[str]:
        d = self._catalog_delegate(ref)
        return d.partition_columns(ref) if d else super().partition_columns(ref)

    def table_exists(self, ref: TableRef) -> bool:
        if self._catalog_delegate(ref) is not None:
            return True
        return super().table_exists(ref)
