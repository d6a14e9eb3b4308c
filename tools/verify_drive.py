"""End-to-end drive of both runtime surfaces (the /verify recipe).

Surface 1: simulate the grading driver — vanilla SparkSession, run
``entry(spark)`` then every ``queries()`` entry at sf0.01 and compare
sorted stringified rows against ``oracle_sql()`` through DuckDB.

Surface 2: YAML ETL job — params, typed errors, upsert golden shape,
idempotency, multi-statement script hooks.

Run: ``python tools/verify_drive.py [--sf-dir DIR] [--only name,...]``
Exit code 0 = all OK.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
import traceback

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="verify_wh_"))
        .config("spark.sql.shuffle.partitions", "8")
        .appName("verify-drive")
        .getOrCreate()
    )


def canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [tuple(str(v) for v in row) for row in df_pandas[cols].itertuples(index=False)]
    return sorted(rows), cols


def drive_driver_contract(sf_dir: str, only: set[str] | None) -> int:
    import duckdb

    import __spark_entry__ as e

    spark = build_spark()
    fails = 0

    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows {'OK' if len(rows) >= 0 else 'FAIL'}")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = e.queries()
    oracles = e.oracle_sql()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"{name}: SPARK ERROR")
            traceback.print_exc()
            fails += 1
            continue
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (no oracle) {time.time()-t0:.1f}s OK")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"{name}: ORACLE ERROR")
            traceback.print_exc()
            fails += 1
            continue
        srows, scols = canon(sdf)
        orows, ocols = canon(odf)
        if scols != ocols:
            print(f"{name}: SCHEMA MISMATCH spark={scols} oracle={ocols}")
            fails += 1
        elif srows != orows:
            print(f"{name}: VALUE MISMATCH rows spark={len(srows)} oracle={len(orows)}")
            for a, b in list(zip(srows, orows))[:3]:
                if a != b:
                    print(f"  spark={a}\n  oracle={b}")
            fails += 1
        else:
            print(f"{name}: rows={len(srows)} {time.time()-t0:.1f}s OK")
    return fails


def drive_etl_surface() -> int:
    import os

    from x_spark.errors import ETLJobException, JobConfigException
    from x_spark.plans.etl import init_etl_job

    spark = build_spark()
    fails = 0

    def check(label, fn, want_exc=None, want_msg=""):
        nonlocal fails
        try:
            fn()
        except Exception as exc:
            if want_exc and isinstance(exc, want_exc) and want_msg in str(exc):
                print(f"etl/{label}: OK ({type(exc).__name__})")
            else:
                print(f"etl/{label}: FAIL unexpected {type(exc).__name__}: {exc}")
                fails += 1
            return
        if want_exc:
            print(f"etl/{label}: FAIL expected {want_exc.__name__}, none raised")
            fails += 1
        else:
            print(f"etl/{label}: OK")

    with tempfile.TemporaryDirectory() as tmp:
        yaml_path = os.path.join(tmp, "job.yaml")
        with open(yaml_path, "w") as fh:
            fh.write(
                """
version: 0
source:
  datasource: parquet
  query: SELECT * FROM v_src WHERE v >= ${min_v}
target:
  datasource: parquet
  table: v_tgt
  operation: upsert
  primary_key_column: pk
  update_column: v
"""
            )
        spark.sql("DROP TABLE IF EXISTS v_tgt")
        spark.sql("CREATE TABLE v_tgt (pk INT, v INT, keep STRING) USING parquet")
        spark.sql("INSERT INTO v_tgt VALUES (1, 10, 'x'), (2, 20, 'y')")
        spark.createDataFrame([(1, 100), (3, 300)], "pk int, v int").createOrReplaceTempView(
            "v_src"
        )

        check(
            "missing-param",
            lambda: init_etl_job(yaml_path, {}, spark=spark),
            JobConfigException,
            "unresolved parameters",
        )
        check(
            "bad-operation",
            lambda: init_etl_job(
                {
                    "version": 0,
                    "source": {"datasource": "parquet", "query": "SELECT 1 AS pk"},
                    "target": {"datasource": "parquet", "table": "v_tgt", "operation": "zap"},
                },
                spark=spark,
            ),
            JobConfigException,
            "not in",
        )

        init_etl_job(yaml_path, {"min_v": 0}, spark=spark).run()
        rows = sorted((r.pk, r.v, r.keep) for r in spark.table("v_tgt").collect())
        want = [(1, 100, "x"), (2, 20, "y"), (3, 300, None)]
        print(f"etl/upsert-golden-shape: {'OK' if rows == want else f'FAIL {rows}'}")
        fails += rows != want

        init_etl_job(yaml_path, {"min_v": 0}, spark=spark).run()
        n = spark.table("v_tgt").count()
        print(f"etl/upsert-idempotent: {'OK' if n == 3 else f'FAIL n={n}'}")
        fails += n != 3

        spark.createDataFrame(
            [(1, 1), (1, 2)], "pk int, v int"
        ).createOrReplaceTempView("v_src")
        check(
            "dup-source-pk",
            lambda: init_etl_job(yaml_path, {"min_v": 0}, spark=spark).run(),
            ETLJobException,
            "duplicate",
        )

        # multi-statement script hook (round-2 feature)
        spark.sql("DROP TABLE IF EXISTS v_hook")
        init_etl_job(
            {
                "version": 0,
                "source": {"datasource": "parquet", "query": "SELECT 7 AS pk, 70 AS v"},
                "target": {
                    "datasource": "parquet",
                    "table": "v_tgt2",
                    "operation": "append",
                    "sql_scripts": True,
                    "pre_sql": (
                        "DROP TABLE IF EXISTS v_tgt2; "
                        "CREATE TABLE v_tgt2 (pk INT, v INT) USING parquet; "
                        "CREATE TABLE IF NOT EXISTS v_hook (n INT) USING parquet; "
                        "INSERT INTO v_hook VALUES (1); -- done"
                    ),
                },
            },
            spark=spark,
        ).run()
        ok = spark.table("v_tgt2").count() == 1 and spark.table("v_hook").count() == 1
        print(f"etl/script-hooks: {'OK' if ok else 'FAIL'}")
        fails += not ok
        for t in ("v_tgt", "v_tgt2", "v_hook"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    return fails


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--skip-etl", action="store_true")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    fails = drive_driver_contract(args.sf_dir, only)
    if not args.skip_etl:
        fails += drive_etl_surface()
    print(f"\nverify: {'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
