"""Command-line entry point: ``python -m x_spark <cmd> ...``.

The working replacement for the reference's stale ADF entry point
(execute_job.py, which calls APIs that no longer exist — SURVEY §3.3,
§8.11):

    python -m x_spark run job.yaml --param name=value ...
    python -m x_spark run job.yaml --dry-run        # print SQL, no exec
    python -m x_spark explain job.yaml              # source plan
    python -m x_spark recon recon.yaml [--param k=v]

Params mirror the reference's ``k=v`` argv convention
(execute_job.py:12-16) behind an explicit ``--param`` flag.
"""

from __future__ import annotations

import argparse
import sys
from typing import Any

from x_spark.errors import JobConfigException


def parse_params(items: list[str] | None) -> dict[str, Any]:
    params: dict[str, Any] = {}
    for item in items or []:
        if "=" not in item:
            raise JobConfigException(f"--param expects name=value, got {item!r}")
        k, _, v = item.partition("=")
        params[k] = v
    return params


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="x_spark")
    sub = parser.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="run an ETL job config")
    run.add_argument("config")
    run.add_argument("--param", action="append", metavar="NAME=VALUE")
    run.add_argument(
        "--dry-run", action="store_true", help="print the SQL the job would execute"
    )

    explain = sub.add_parser("explain", help="print the source query's physical plan")
    explain.add_argument("config")
    explain.add_argument("--param", action="append", metavar="NAME=VALUE")

    recon = sub.add_parser("recon", help="run a reconciliation config")
    recon.add_argument("config")
    recon.add_argument("--param", action="append", metavar="NAME=VALUE")
    recon.add_argument("--limit", type=int, default=20, help="rows to display")

    sql = sub.add_parser(
        "sql", help="run a multi-statement SQL script (';'-separated; "
        "incl. MATERIALIZED VIEW DDL + transparent aggregate routing)"
    )
    sql.add_argument("script", help="path to a .sql file")
    sql.add_argument("--param", action="append", metavar="NAME=VALUE")
    sql.add_argument("--limit", type=int, default=20, help="rows shown for the last statement")

    comp = sub.add_parser("compact", help="compact a table/path's small files")
    comp.add_argument("target", help="catalog table name or path=<dir>")
    comp.add_argument("--datasource", default="parquet")
    comp.add_argument("--target-files", type=int, default=None)

    hist = sub.add_parser("history", help="txlog table commit history")
    hist.add_argument("path", help="txlog table directory")

    show = sub.add_parser("show", help="read a txlog table (optionally time-traveled)")
    show.add_argument("path", help="txlog table directory")
    show.add_argument("--version", type=int, default=None, help="versionAsOf")
    show.add_argument("--limit", type=int, default=20)

    changes = sub.add_parser(
        "changes", help="txlog change data feed between two versions"
    )
    changes.add_argument("path", help="txlog table directory")
    changes.add_argument("--from-version", type=int, required=True)
    changes.add_argument("--to-version", type=int, default=None)
    changes.add_argument("--limit", type=int, default=20)

    clus = sub.add_parser(
        "cluster", help="rewrite a txlog table range-clustered on key columns"
    )
    clus.add_argument("path", help="txlog table directory")
    clus.add_argument("--by", required=True, help="comma-separated cluster columns")
    clus.add_argument("--target-files", type=int, default=None)
    clus.add_argument(
        "--strategy", choices=("range", "zorder", "hilbert"), default="range",
        help="range = lexicographic sort (leading column prunes); "
        "zorder = bit-interleaved Morton order (every column prunes)",
    )
    clus.add_argument(
        "--incremental", action="store_true",
        help="liquid-clustering shape: lay out ONLY files appended "
        "since the last pass (already-clustered files stay "
        "byte-identical) — maintenance cost O(new data)",
    )

    ivm = sub.add_parser(
        "ivm", help="incrementally refresh a materialized aggregate "
        "from a txlog base table's change feed"
    )
    ivm.add_argument("base", help="base txlog table directory")
    ivm.add_argument("agg", help="aggregate txlog table directory")
    ivm.add_argument("--keys", required=True, help="comma-separated group keys")
    ivm.add_argument(
        "--sums", default="", help="comma-separated numeric columns to sum"
    )
    ivm.add_argument(
        "--minmax", default="",
        help="comma-separated columns to maintain min/max for (deletes "
        "trigger targeted group rescans)",
    )
    ivm.add_argument(
        "--staleness", action="store_true",
        help="only report how many base versions the aggregate is "
        "behind; no refresh",
    )

    ivmj = sub.add_parser(
        "ivm-join", help="incrementally refresh a materialized equi-join "
        "of two txlog tables from their change feeds"
    )
    ivmj.add_argument("a", help="side-A txlog table directory")
    ivmj.add_argument("b", help="side-B txlog table directory")
    ivmj.add_argument("view", help="view txlog table directory")
    ivmj.add_argument("--on", required=True, help="comma-separated join keys")
    ivmj.add_argument("--a-cols", default="", help="side-A payload columns")
    ivmj.add_argument("--b-cols", default="", help="side-B payload columns")
    ivmj.add_argument(
        "--buckets", type=int, default=None, metavar="N",
        help="join-key hash bucket count for a NEW view (refreshes "
        "rewrite only touched buckets); default: automatic — the view "
        "migrates to 32 buckets once it outgrows full rewrites; 0 = "
        "never bucket; an existing bucketed view keeps its stored "
        "count",
    )
    ivmj.add_argument(
        "--staleness", action="store_true",
        help="only report versions-behind per side; no refresh",
    )

    ded = sub.add_parser(
        "dedup",
        help="dedup a document table (exact fingerprints, optionally "
        "incremental against a txlog fingerprint store)",
    )
    ded.add_argument("source", help="parquet path (file or directory) of the batch")
    ded.add_argument("--id-col", default="doc_id")
    ded.add_argument("--text-col", default="text")
    ded.add_argument(
        "--store",
        default=None,
        help="txlog fingerprint-store directory: survivors are checked "
        "against it (incremental mode) instead of only within the batch",
    )
    ded.add_argument(
        "--update-store",
        action="store_true",
        help="append the survivors' fingerprints to --store (atomic "
        "txlog commit), so replayed batches self-suppress",
    )
    ded.add_argument(
        "--out", default=None, help="write surviving rows as parquet here"
    )

    bpe = sub.add_parser(
        "bpe",
        help="train a BPE merge table on a document table, or apply a "
        "trained table to segment one",
    )
    bpe.add_argument("mode", choices=["train", "apply"])
    bpe.add_argument("source", help="parquet path (file or directory)")
    bpe.add_argument("--text-col", default="text")
    bpe.add_argument("--id-col", default="doc_id")
    bpe.add_argument(
        "--merges", default=None,
        help="merge-table JSON: written by train, read by apply",
    )
    bpe.add_argument("--n-merges", type=int, default=200)
    bpe.add_argument(
        "--max-words", type=int, default=50_000,
        help="train on the heaviest N words (0 = no cap)",
    )
    bpe.add_argument(
        "--out", default=None,
        help="apply: write (id, bpe_tokens) parquet here",
    )

    diff = sub.add_parser(
        "diff",
        help="row-level semantic diff of a txlog table between two "
        "versions (file-granular rewrite noise canceled)",
    )
    diff.add_argument("path", help="txlog table directory")
    diff.add_argument("from_version", type=int)
    diff.add_argument("to_version", type=int, nargs="?", default=None)
    diff.add_argument("--limit", type=int, default=100)

    prof = sub.add_parser(
        "profile", help="per-column data-quality profile of a parquet table"
    )
    prof.add_argument("source", help="parquet path (file or directory)")
    prof.add_argument(
        "--columns", default=None, help="comma-separated subset (default: all)"
    )
    prof.add_argument(
        "--exact", action="store_true",
        help="exact mode: exact per-column distincts AND exact "
        "percentiles (default: approx — HLL distincts + bounded-memory "
        "quantile sketches, the scale-safe plan)",
    )

    drift = sub.add_parser(
        "drift",
        help="per-metric profile drift between two parquet tables "
        "(the before/after post-transform gate)",
    )
    drift.add_argument("before", help="parquet path of the BEFORE state")
    drift.add_argument("after", help="parquet path of the AFTER state")
    drift.add_argument(
        "--columns", default=None, help="comma-separated subset (default: all)"
    )
    drift.add_argument(
        "--exact", action="store_true",
        help="exact distincts/percentiles (default: approx sketches)",
    )

    rst = sub.add_parser(
        "restore",
        help="restore a txlog table to an earlier version (metadata-only "
        "rollback commit; history preserved)",
    )
    rst.add_argument("source", help="txlog table path")
    rst.add_argument("version", type=int)

    shf = sub.add_parser(
        "shuffle",
        help="deterministic training-order shuffle: write a parquet corpus "
        "as N shards in seed-stable pseudo-random order",
    )
    shf.add_argument("source", help="parquet path (file or directory)")
    shf.add_argument("--shards", type=int, required=True, help="shard count")
    shf.add_argument("--seed", default="0", help="permutation seed (epoch id)")
    shf.add_argument(
        "--id-col", default="doc_id", help="unique row id column (default doc_id)"
    )
    shf.add_argument(
        "--out", default=None,
        help="output dir (partitioned by shard_id, rows in permutation "
        "order); omit to only print the per-shard manifest",
    )

    cst = sub.add_parser(
        "constraint",
        help="manage txlog CHECK constraints: add <name> <expr> / drop "
        "<name> / list (enforced on every write path before any file lands)",
    )
    cst.add_argument("action", choices=["add", "drop", "list"])
    cst.add_argument("path", help="txlog table directory")
    cst.add_argument("name", nargs="?", default=None)
    cst.add_argument("expr", nargs="?", default=None)

    det = sub.add_parser(
        "detail",
        help="DESCRIBE DETAIL of a txlog table: version, file/row counts "
        "(metadata-only, no data read), bytes, partitioning + per-partition "
        "row counts",
    )
    det.add_argument("path", help="txlog table directory")

    skt = sub.add_parser(
        "sketch",
        help="maintained HLL distinct sketches: ingest a parquet batch "
        "into a txlog sketch store, or print distinct estimates",
    )
    skt.add_argument("store", help="txlog sketch-store directory")
    skt.add_argument("--ingest", default=None, help="parquet path to ingest")
    skt.add_argument("--value-col", default="user_id")
    skt.add_argument("--unit-cols", default="day",
                     help="comma-separated unit columns")
    skt.add_argument("--where", default=None,
                     help="unit filter for the estimate (e.g. \"day >= 'd2'\")")

    cln = sub.add_parser(
        "clone",
        help="zero-copy CLONE of a txlog table (hardlinked data files; "
        "schema/partitioning/constraints/stats travel; optionally "
        "time-traveled)",
    )
    cln.add_argument("src", help="source txlog table directory")
    cln.add_argument("dst", help="destination directory (must not exist as a table)")
    cln.add_argument(
        "--version", type=int, default=None,
        help="clone this source version instead of latest",
    )

    cnv = sub.add_parser(
        "convert",
        help="CONVERT TO TXLOG: one atomic commit adopting an existing "
        "plain parquet directory's files (footer stats included) as a "
        "txlog table in place — the standard migration on-ramp",
    )
    cnv.add_argument("path", help="parquet directory to convert")
    cnv.add_argument(
        "--partitioned-by", default=None,
        help="declared hive partition layout as DDL, e.g. 'g string'",
    )

    cpi = sub.add_parser(
        "copy-into",
        help="COPY INTO: idempotent bulk file ingestion — load the "
        "source files a previous COPY has not already loaded, tracked "
        "by a ledger riding the same atomic commit as the data",
    )
    cpi.add_argument("path", help="txlog table directory (target)")
    cpi.add_argument("source", help="directory (or file) to ingest")
    cpi.add_argument("--format", default="parquet",
                     choices=["parquet", "csv", "json", "orc"])
    cpi.add_argument("--pattern", default=None,
                     help="glob over the source-relative path")
    cpi.add_argument("--option", action="append", default=[],
                     metavar="K=V", help="reader format option (repeat)")
    cpi.add_argument("--force", action="store_true",
                     help="reload files even if already loaded")
    cpi.add_argument("--merge-schema", action="store_true",
                     help="evolve the table schema to new source columns")

    man = sub.add_parser(
        "manifest",
        help="GENERATE symlink_format_manifest for a txlog table: export "
        "the snapshot's live-file list so external engines read a "
        "consistent point-in-time view",
    )
    man.add_argument("path", help="txlog table directory")
    man.add_argument(
        "--version", type=int, default=None,
        help="time-travel: manifest of this version instead of latest",
    )

    blm = sub.add_parser(
        "bloom",
        help="file-level Bloom data skipping on a txlog table: build the "
        "per-file filter sidecar for a column, or probe a point lookup "
        "and report files pruned",
    )
    blm.add_argument("path", help="txlog table directory")
    blm.add_argument("column", help="string/integer column to index")
    blm.add_argument(
        "--probe", default=None,
        help="comma-separated lookup values: prune + read instead of building",
    )
    blm.add_argument(
        "--m-bits", type=int, default=4096,
        help="filter size in bits per file (multiple of 64)",
    )

    prg = sub.add_parser(
        "purge",
        help="REORG APPLY (PURGE): rewrite only deletion-vector-masked files",
    )
    prg.add_argument("path", help="txlog table directory")

    opt = sub.add_parser(
        "optimize",
        help="bin-pack small files (optionally scoped to partitions)",
    )
    opt.add_argument("path", help="txlog table directory")
    opt.add_argument("--where", default=None,
                     help="partition predicate scoping the compaction")
    opt.add_argument("--target-mb", type=int, default=128,
                     help="target file size in MB (files below it compact)")
    opt.add_argument("--zorder-by", default=None,
                     help="comma-separated columns: re-cluster ALL "
                     "in-scope files through the space-filling curve "
                     "(OPTIMIZE ... ZORDER BY)")
    opt.add_argument("--strategy", default="zorder",
                     choices=["zorder", "hilbert", "range"],
                     help="curve for --zorder-by layouts")

    clg = sub.add_parser(
        "clean-log",
        help="bound the transaction log: drop commit files below the "
        "newest checkpoint that keeps the last N versions replayable",
    )
    clg.add_argument("path", help="txlog table directory")
    clg.add_argument("--keep-last", type=int, default=0,
                     help="versions below the latest that must stay "
                     "fully replayable")
    clg.add_argument("--min-age-sec", type=float, default=600.0,
                     help="only delete log files older than this "
                     "(0 = offline maintenance)")

    vac = sub.add_parser("vacuum", help="delete unreachable txlog data files")
    vac.add_argument("path", help="txlog table directory")
    vac.add_argument(
        "--keep-last", type=int, default=None,
        help="also drop files only reachable from versions older than the last N",
    )
    vac.add_argument(
        "--min-age-sec", type=float, default=600.0,
        help="retention guard: only delete unreferenced files older than "
        "this (protects in-flight commits; 0 = offline maintenance)",
    )
    vac.add_argument(
        "--lite", action="store_true",
        help="log-driven candidates (Delta's VACUUM LITE): no directory "
        "listing — O(log churn) at any table size; cannot see orphans",
    )
    return parser


def _split_statements(text: str) -> list[str]:
    """Comment- and quote-aware ';' split (shared with lifecycle
    script hooks — see sources/base.py:split_sql_statements)."""
    from x_spark.sources.base import split_sql_statements

    return split_sql_statements(text)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    params = parse_params(getattr(args, "param", None))

    if args.command == "run":
        from x_spark.plans.etl import init_etl_job

        job = init_etl_job(args.config, params)
        if args.dry_run:
            for stmt in job.generate_sql():
                print(f"{stmt.strip()};")
            return 0
        job.run()
        return 0

    if args.command == "explain":
        from x_spark.plans.etl import init_etl_job

        job = init_etl_job(args.config, params)
        job.step_01_source_pre_sql()
        job.step_03_create_source_view()
        print("== Physical Plan ==")
        job.source_df().explain(mode="formatted")
        return 0

    if args.command == "recon":
        from x_spark.operators.recon import init_recon_job

        result = init_recon_job(args.config, params).run()
        result.show(args.limit, truncate=False)
        return 0

    if args.command == "sql":
        # The working version of the reference's multi-statement
        # executor (wheel parent.py:129-157, commented out upstream):
        # split on ';' outside quotes, run sequentially, show the last
        # result.
        from x_spark.plans.config import substitute_params
        from x_spark.session import get_session

        with open(args.script, "r", encoding="utf-8") as fh:
            text = substitute_params(fh.read(), params)
        spark = get_session()
        result = None
        for stmt in _split_statements(text):
            result = spark.sql(stmt)
        if result is not None:
            result.show(args.limit, truncate=False)
        return 0

    if args.command == "compact":
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        ds = init_datasource(args.datasource, get_session())
        if args.target.startswith("path="):
            ref = TableRef(path=args.target[len("path="):])
        else:
            ref = TableRef(table=args.target)
        n = ds.compact(ref, args.target_files)
        print(f"compacted to {n} file(s)")
        return 0

    if args.command == "dedup":
        from pyspark.sql import functions as F

        from x_spark.functions.portable import fingerprint
        from x_spark.operators.dedup import incremental_dedup
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        if args.update_store and not args.store:
            raise JobConfigException("--update-store requires --store")
        spark = get_session()
        batch = spark.read.parquet(args.source)
        fp_schema = batch.select(
            fingerprint(args.text_col).alias("fingerprint")
        ).schema
        if args.store:
            ds = init_datasource("txlog", spark)
            ref = TableRef(path=args.store)
            if ds.table_exists(ref):
                seen = ds.read(ref)
            elif args.update_store:
                # creating the store is a write — only do it when the
                # caller asked to write (a typo'd --store on a
                # count-only run must not materialize an empty store)
                ds.create(ref, fp_schema)
                seen = ds.read(ref)
            else:
                raise JobConfigException(
                    f"fingerprint store {args.store!r} does not exist "
                    "(pass --update-store to create it)"
                )
        else:
            seen = batch.limit(0).select(
                fingerprint(args.text_col).alias("fingerprint")
            )
        survivors = incremental_dedup(
            batch, seen, id_col=args.id_col, text_col=args.text_col
        ).persist()
        kept = survivors.count()
        total = batch.count()
        print(f"{kept} of {total} rows survive dedup")
        if args.out:
            (
                batch.join(
                    survivors.select(args.id_col), args.id_col, "left_semi"
                ).write.mode("overwrite").parquet(args.out)
            )
            print(f"survivor rows written to {args.out}")
        if args.store and args.update_store:
            ds.append(survivors.select("fingerprint"), ref)
            print(f"fingerprint store updated: {args.store}")
        survivors.unpersist()
        return 0

    if args.command == "profile":
        from x_spark.operators.profile import profile_table
        from x_spark.session import get_session

        df = get_session().read.parquet(args.source)
        cols = (
            [c.strip() for c in args.columns.split(",") if c.strip()]
            if args.columns
            else None
        )
        mode = "exact" if args.exact else "approx"
        profile_table(df, cols, mode=mode).orderBy(
            "col_name", "metric"
        ).show(1000, truncate=False)
        return 0

    if args.command == "constraint":
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef
        from x_spark.sources.txlog import resolve_snapshot

        ds = init_datasource("txlog", get_session())
        ref = TableRef(path=args.path)
        if args.action == "add":
            if not args.name or not args.expr:
                print("constraint add requires <name> <expr>")
                return 2
            ds.add_constraint(ref, args.name, args.expr)
            print(f"constraint {args.name} added: CHECK ({args.expr})")
        elif args.action == "drop":
            if not args.name:
                print("constraint drop requires <name>")
                return 2
            ds.drop_constraint(ref, args.name)
            print(f"constraint {args.name} dropped")
        else:
            snap = resolve_snapshot(ds._table_path(ref))
            for name, expr in sorted((snap.constraints if snap else {}).items()):
                print(f"{name}: CHECK ({expr})")
        return 0

    if args.command == "sketch":
        from x_spark.operators.sketches import estimate_from_store, update_sketch_store
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        spark = get_session()
        ds = init_datasource("txlog", spark)
        ref = TableRef(path=args.store)
        units = [c.strip() for c in args.unit_cols.split(",") if c.strip()]
        if args.ingest:
            batch = spark.read.parquet(args.ingest)
            update_sketch_store(ds, ref, batch, args.value_col, units)
            print(f"ingested {args.ingest} into {args.store}")
        else:
            for row in estimate_from_store(ds, ref, units, where=args.where).collect():
                print(row.asDict())
        return 0

    if args.command == "clone":
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        ds = init_datasource("txlog", get_session())
        v = ds.clone(
            TableRef(path=args.src), TableRef(path=args.dst), version=args.version
        )
        n = ds.count_rows(TableRef(path=args.dst))
        print(f"cloned to {args.dst} at version {v}: {n} rows")
        return 0

    if args.command == "convert":
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        ds = init_datasource("txlog", get_session())
        n = ds.convert(TableRef(path=args.path),
                       partition_by=args.partitioned_by)
        rows = ds.count_rows(TableRef(path=args.path))
        print(f"converted {args.path}: {n} files, {rows} rows at version 0")
        return 0

    if args.command == "copy-into":
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        ds = init_datasource("txlog", get_session())
        opts = dict(kv.split("=", 1) for kv in args.option)
        files, rows = ds.copy_into(
            TableRef(path=args.path), args.source,
            file_format=args.format, pattern=args.pattern,
            format_options=opts, force=args.force,
            merge_schema=args.merge_schema,
        )
        print(f"loaded {files} files, {rows} rows into {args.path}")
        return 0

    if args.command == "manifest":
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        ds = init_datasource("txlog", get_session())
        out = ds.generate_manifest(TableRef(path=args.path), version=args.version)
        with open(out) as fh:
            n = sum(1 for _ in fh)
        print(f"{out}: {n} files")
        return 0

    if args.command == "bloom":
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef
        from x_spark.sources.bloom_index import (
            bloom_prune,
            build_bloom_index,
            read_where_in,
        )

        ds = init_datasource("txlog", get_session())
        ref = TableRef(path=args.path)
        if args.probe is None:
            summary = build_bloom_index(ds, ref, args.column, m_bits=args.m_bits)
            print(summary)
        else:
            values = [v.strip() for v in args.probe.split(",") if v.strip()]
            # integer-typed columns take integer probes
            snap_field = next(
                (f for f in ds.read(ref).schema.fields if f.name == args.column),
                None,
            )
            if snap_field is None:
                print(f"column {args.column!r} not in the table schema")
                return 1
            if snap_field.dataType.simpleString() != "string":
                values = [int(v) for v in values]
            kept, total = bloom_prune(ds, ref, args.column, values)
            print(f"files: {len(kept)}/{total} after bloom pruning")
            read_where_in(ds, ref, args.column, values).show(50, truncate=False)
        return 0

    if args.command == "detail":
        import json as _json

        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        ds = init_datasource("txlog", get_session())
        ref = TableRef(path=args.path)
        print(_json.dumps(ds.describe_detail(ref), indent=2))
        for row in ds.partition_counts(ref):
            print(row)
        return 0

    if args.command == "shuffle":
        from x_spark.operators.shards import shard_manifest, shuffle_shards, write_shards
        from x_spark.session import get_session

        spark = get_session()
        df = spark.read.parquet(args.source)
        shards = shuffle_shards(df, args.shards, id_col=args.id_col, seed=args.seed)
        if args.out:
            write_shards(df, shards, args.out, id_col=args.id_col)
            print(f"{args.shards} shards written to {args.out} (seed={args.seed})")
        shard_manifest(shards).orderBy("shard_id").show(1000, truncate=False)
        return 0

    if args.command == "restore":
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        ds = init_datasource("txlog", get_session())
        new_v = ds.restore(TableRef(path=args.source), args.version)
        print(f"restored {args.source} to v{args.version} as v{new_v}")
        return 0

    if args.command == "drift":
        from x_spark.operators.profile import profile_drift
        from x_spark.session import get_session

        spark = get_session()
        cols = (
            [c.strip() for c in args.columns.split(",") if c.strip()]
            if args.columns
            else None
        )
        profile_drift(
            spark.read.parquet(args.before),
            spark.read.parquet(args.after),
            cols,
            mode="exact" if args.exact else "approx",
        ).orderBy("col_name", "metric").show(1000, truncate=False)
        return 0

    if args.command == "bpe":
        import json as _json

        from x_spark.operators.bpe import apply_merges_str, train_bpe
        from x_spark.session import get_session

        spark = get_session()
        docs = spark.read.parquet(args.source)
        if args.mode == "train":
            if not args.merges:
                raise JobConfigException("bpe train requires --merges OUT_PATH")
            merges = train_bpe(
                docs,
                n_merges=args.n_merges,
                text_col=args.text_col,
                max_words=args.max_words or None,
            )
            with open(args.merges, "w", encoding="utf-8") as fh:
                _json.dump(merges, fh, indent=1)
            print(f"{len(merges)} merges written to {args.merges}")
            return 0
        if not args.merges or not args.out:
            raise JobConfigException("bpe apply requires --merges and --out")
        with open(args.merges, "r", encoding="utf-8") as fh:
            merges = _json.load(fh)
        seg = apply_merges_str(docs, merges, text_col=args.text_col)
        seg.select(args.id_col, "bpe_tokens").write.mode("overwrite").parquet(
            args.out
        )
        print(f"segmented table written to {args.out} ({len(merges)} merges)")
        return 0

    if args.command == "ivm":
        from x_spark.operators.ivm import AggregateView
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        ds = init_datasource("txlog", get_session())
        view = AggregateView(
            ds,
            TableRef(path=args.base),
            TableRef(path=args.agg),
            keys=[c.strip() for c in args.keys.split(",") if c.strip()],
            sums=[c.strip() for c in args.sums.split(",") if c.strip()],
            minmax=[c.strip() for c in args.minmax.split(",") if c.strip()],
        )
        if args.staleness:
            print(f"aggregate is {view.staleness()} base version(s) behind")
            return 0
        v = view.refresh()
        print(f"aggregate current through base version {v}")
        return 0

    if args.command == "ivm-join":
        from x_spark.operators.ivm import JoinView
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        ds = init_datasource("txlog", get_session())
        split = lambda v: [c.strip() for c in v.split(",") if c.strip()]  # noqa: E731
        nb = ("auto" if args.buckets is None
              else (None if args.buckets == 0 else args.buckets))
        view = JoinView(
            ds, TableRef(path=args.a), TableRef(path=args.b),
            TableRef(path=args.view), on=split(args.on),
            a_cols=split(args.a_cols), b_cols=split(args.b_cols),
            n_buckets=nb,
        )
        if args.staleness:
            va, vb = view.staleness()
            print(f"join view is behind: side A {va}, side B {vb} version(s)")
            return 0
        va, vb = view.refresh()
        print(f"join view current through A v{va} / B v{vb}")
        return 0

    if args.command == "diff":
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        ds = init_datasource("txlog", get_session())
        ds.semantic_diff(
            TableRef(path=args.path), args.from_version, args.to_version
        ).orderBy("net").show(args.limit, truncate=False)
        return 0

    if args.command in ("history", "show", "changes", "vacuum", "cluster",
                        "purge", "optimize", "clean-log"):
        from x_spark.session import get_session
        from x_spark.sources import init_datasource
        from x_spark.sources.base import TableRef

        ds = init_datasource("txlog", get_session())
        if args.command == "history":
            for h in ds.history(TableRef(path=args.path)):
                ts = h.get("timestamp")
                when = ""
                if ts is not None:
                    import datetime

                    when = " " + datetime.datetime.fromtimestamp(
                        ts / 1000.0, tz=datetime.timezone.utc
                    ).strftime("%Y-%m-%d %H:%M:%S")
                print(f"v{h['version']:>6}{when} {h['operation']}")
            return 0
        if args.command == "show":
            opts = (
                {"versionAsOf": str(args.version)} if args.version is not None else {}
            )
            ds.read(TableRef(path=args.path, options=opts)).show(
                args.limit, truncate=False
            )
            return 0
        if args.command == "changes":
            ds.changes(
                TableRef(path=args.path), args.from_version, args.to_version
            ).show(args.limit, truncate=False)
            return 0
        if args.command == "cluster":
            n = ds.cluster(
                TableRef(path=args.path),
                [c.strip() for c in args.by.split(",") if c.strip()],
                args.target_files,
                strategy=args.strategy,
                incremental=args.incremental,
            )
            print(f"clustered into {n} file(s)")
            return 0
        if args.command == "purge":
            n = ds.purge_dvs(TableRef(path=args.path))
            print(f"purged deletion vectors from {n} file(s)")
            return 0
        if args.command == "optimize":
            zcols = ([c.strip() for c in args.zorder_by.split(",")
                      if c.strip()] if args.zorder_by else None)
            out = ds.optimize(TableRef(path=args.path), where=args.where,
                              target_size_mb=args.target_mb,
                              zorder_by=zcols, strategy=args.strategy)
            print(f"optimized {out['rewritten']} file(s) into "
                  f"{out['new_files']}")
            return 0
        if args.command == "clean-log":
            gone = ds.clean_log(TableRef(path=args.path),
                                keep_last=args.keep_last,
                                min_age_sec=args.min_age_sec)
            print(f"removed {len(gone)} log file(s)")
            return 0
        deleted = ds.vacuum(TableRef(path=args.path), keep_last=args.keep_last,
                            min_age_sec=args.min_age_sec, lite=args.lite)
        print(f"deleted {len(deleted)} file(s)")
        return 0

    return 2


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
