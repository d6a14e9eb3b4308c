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
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    params = parse_params(args.param)

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

    return 2


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
