"""CLI surface: run / dry-run / explain / recon (SURVEY §3.3)."""

import pytest

from x_spark.cli import main, parse_params
from x_spark.errors import JobConfigException


@pytest.fixture()
def job_yaml(tmp_path, spark):
    spark.sql("DROP TABLE IF EXISTS cli_src")
    spark.sql("DROP TABLE IF EXISTS cli_tgt")
    spark.sql("CREATE TABLE cli_src (pk1 INT, c1 INT) USING parquet")
    spark.sql("INSERT INTO cli_src VALUES (1, 10), (2, 20)")
    spark.sql("CREATE TABLE cli_tgt (pk1 INT, c1 INT) USING parquet")
    p = tmp_path / "job.yaml"
    p.write_text(
        """version: 0
source:
  query: select * from cli_src where c1 >= ${min_c1}
target:
  table: cli_tgt
  operation: append
"""
    )
    return str(p)


def test_parse_params_rejects_bare(capsys):
    with pytest.raises(JobConfigException):
        parse_params(["novalue"])
    assert parse_params(["a=1", "b=x=y"]) == {"a": "1", "b": "x=y"}


def test_cli_dry_run(job_yaml, capsys):
    assert main(["run", job_yaml, "--param", "min_c1=15", "--dry-run"]) == 0
    out = capsys.readouterr().out
    assert "CREATE OR REPLACE TEMPORARY VIEW __source_view" in out
    assert "select * from cli_src where c1 >= 15;" in out
    assert "INSERT INTO cli_tgt SELECT * FROM __source_view;" in out


def test_cli_run_appends(job_yaml, spark):
    assert main(["run", job_yaml, "--param", "min_c1=15"]) == 0
    assert [r.pk1 for r in spark.table("cli_tgt").collect()] == [2]


def test_cli_explain(job_yaml, capsys):
    assert main(["explain", job_yaml, "--param", "min_c1=0"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out


def test_cli_recon(tmp_path, spark, capsys):
    spark.sql("DROP TABLE IF EXISTS recon_a")
    spark.sql("CREATE TABLE recon_a (g STRING, v DOUBLE) USING parquet")
    spark.sql("INSERT INTO recon_a VALUES ('x', 1.0), ('x', 2.0), ('y', 5.0)")
    p = tmp_path / "recon.yaml"
    p.write_text(
        """version: 0
group_by: [g]
data:
  - name: left
    datasource: parquet
    query: select * from recon_a
    metrics:
      - sum_v: sum(v)
  - name: right
    datasource: parquet
    query: select * from recon_a
    metrics:
      - sum_v: sum(v)
"""
    )
    assert main(["recon", str(p)]) == 0
    out = capsys.readouterr().out
    assert "match_sum_v" in out and "true" in out


def test_cli_sql_script(tmp_path, spark, capsys):
    p = tmp_path / "script.sql"
    p.write_text(
        """
DROP TABLE IF EXISTS sqlscript_t;
CREATE TABLE sqlscript_t (k INT, note STRING) USING parquet;
INSERT INTO sqlscript_t VALUES (1, 'semi;colon inside'), (${k}, 'two');
SELECT count(*) AS n, max(k) AS mx FROM sqlscript_t
"""
    )
    assert main(["sql", str(p), "--param", "k=7"]) == 0
    out = capsys.readouterr().out
    assert "2" in out and "7" in out
    assert spark.table("sqlscript_t").count() == 2


def test_cli_compact(tmp_path, spark, capsys):
    path = str(tmp_path / "frag")
    spark.range(0, 1000).repartition(8).write.parquet(path)
    assert main(["compact", f"path={path}", "--target-files", "1"]) == 0
    assert "compacted to 1 file(s)" in capsys.readouterr().out
    assert len(spark.read.parquet(path).inputFiles()) == 1
    assert spark.read.parquet(path).count() == 1000


def test_cli_purge(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import DV_ENABLE_KEY

    ds = init_datasource("txlog", spark)
    path = str(tmp_path / "dvt")
    ref = TableRef(path=path)
    ds.append(spark.createDataFrame([(i,) for i in range(10)], "pk int"), ref)
    ds.set_properties(ref, {DV_ENABLE_KEY: "true"})
    ds.delete(ref, "pk < 3")
    assert main(["purge", path]) == 0
    assert "purged deletion vectors" in capsys.readouterr().out
    assert ds.read(ref).count() == 7
    from x_spark.sources.txlog import resolve_snapshot

    assert not any(
        a.get("dv") for a in resolve_snapshot(path).files.values()
    )


def test_cli_optimize(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    path = str(tmp_path / "opt")
    ref = TableRef(path=path)
    for i in range(3):
        ds.append(spark.createDataFrame([(i,)], "pk int").coalesce(1), ref)
    assert main(["optimize", path]) == 0
    assert "optimized" in capsys.readouterr().out
    assert ds.read(ref).count() == 3


def test_cli_clean_log(tmp_path, spark, capsys, monkeypatch):
    import x_spark.sources.txlog as T
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    monkeypatch.setattr(T, "CHECKPOINT_INTERVAL", 2)
    ds = init_datasource("txlog", spark)
    path = str(tmp_path / "cl")
    ref = TableRef(path=path)
    for i in range(5):
        ds.append(spark.createDataFrame([(i,)], "pk int"), ref)
    assert main(["clean-log", path, "--min-age-sec", "0"]) == 0
    assert "removed" in capsys.readouterr().out
    assert ds.read(ref).count() == 5


def test_cli_dry_run_merge_sql(tmp_path, spark):
    p = tmp_path / "upsert.yaml"
    p.write_text(
        """version: 0
source:
  query: select 1 as pk1, 2 as c1
target:
  table: cli_tgt
  operation: upsert
  primary_key_column: [pk1]
  update_column: [c1]
"""
    )
    assert main(["run", str(p), "--dry-run"]) == 0
    from x_spark.plans.etl import init_etl_job

    stmts = init_etl_job(str(p), {}).generate_sql()
    merge = stmts[-1]
    assert merge.startswith("MERGE INTO cli_tgt AS TGT")
    assert "WHEN MATCHED THEN UPDATE SET TGT.c1 = SRC.c1, TGT.pk1 = SRC.pk1" in merge
    assert "WHEN NOT MATCHED THEN INSERT (c1, pk1) VALUES (SRC.c1, SRC.pk1)" in merge


def test_cli_ivm_refresh(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    base = TableRef(path=str(tmp_path / "base"))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "pk int, part string, v int"
    )
    ds.create(base, df.schema)
    ds.append(df, base)
    agg_path = str(tmp_path / "agg")
    args = ["ivm", base.path, agg_path, "--keys", "part", "--sums", "v"]
    assert main(args) == 0
    assert "current through base version 1" in capsys.readouterr().out
    rows = {
        r.part: (r.n_rows, float(r.sum_v))
        for r in ds.read(TableRef(path=agg_path)).collect()
    }
    assert rows == {"a": (1, 10.0), "b": (1, 20.0)}
    # incremental second run picks up only the new append
    ds.append(
        spark.createDataFrame([(3, "a", 5)], "pk int, part string, v int"), base
    )
    assert main(args) == 0
    rows = {
        r.part: (r.n_rows, float(r.sum_v))
        for r in ds.read(TableRef(path=agg_path)).collect()
    }
    assert rows == {"a": (2, 15.0), "b": (1, 20.0)}


def test_cli_dedup_incremental_roundtrip(tmp_path, spark, capsys):
    store = str(tmp_path / "fp_store")
    b1 = str(tmp_path / "batch1")
    spark.createDataFrame(
        [(1, "alpha doc"), (2, "ALPHA   doc!"), (3, "beta doc")],
        "doc_id bigint, text string",
    ).write.parquet(b1)
    out1 = str(tmp_path / "out1")
    assert main(["dedup", b1, "--store", store, "--update-store", "--out", out1]) == 0
    assert "2 of 3 rows survive" in capsys.readouterr().out
    kept = {r.doc_id for r in spark.read.parquet(out1).collect()}
    assert kept == {1, 3}

    # second batch replaying batch-1 content plus one new doc
    b2 = str(tmp_path / "batch2")
    spark.createDataFrame(
        [(10, "alpha doc"), (11, "gamma doc")], "doc_id bigint, text string"
    ).write.parquet(b2)
    assert main(["dedup", b2, "--store", store, "--update-store"]) == 0
    assert "1 of 2 rows survive" in capsys.readouterr().out


def test_cli_dedup_batch_only(tmp_path, spark, capsys):
    b = str(tmp_path / "batch")
    spark.createDataFrame(
        [(1, "same text"), (2, "same  TEXT"), (3, "other")],
        "doc_id bigint, text string",
    ).write.parquet(b)
    assert main(["dedup", b]) == 0
    assert "2 of 3 rows survive" in capsys.readouterr().out


def test_cli_bpe_train_apply_roundtrip(tmp_path, spark, capsys):
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "low lower lowest low low"), (1, "new newer newest new")],
        "doc_id bigint, text string",
    ).write.parquet(src)
    merges_path = str(tmp_path / "merges.json")
    assert main(["bpe", "train", src, "--merges", merges_path,
                 "--n-merges", "8"]) == 0
    out = capsys.readouterr().out
    assert "merges written to" in out

    import json

    merges = json.load(open(merges_path))
    assert merges and all(
        set(m) == {"rank", "left", "right", "merged", "pair_freq"} for m in merges
    )

    seg_out = str(tmp_path / "seg")
    assert main(["bpe", "apply", src, "--merges", merges_path,
                 "--out", seg_out]) == 0
    seg = {r.doc_id: r.bpe_tokens for r in spark.read.parquet(seg_out).collect()}
    # the trained artifact round-trips: applying it in-process gives
    # the same segmentation
    from x_spark.operators.bpe import apply_merges_str

    df = spark.read.parquet(src)
    direct = {
        r.doc_id: r.bpe_tokens
        for r in apply_merges_str(df, merges).select("doc_id", "bpe_tokens").collect()
    }
    assert seg == direct


def test_cli_bpe_requires_artifacts(tmp_path, spark):
    src = str(tmp_path / "docs")
    spark.createDataFrame([(0, "x")], "doc_id bigint, text string").write.parquet(src)
    import pytest

    from x_spark.errors import JobConfigException

    with pytest.raises(JobConfigException):
        main(["bpe", "train", src])
    with pytest.raises(JobConfigException):
        main(["bpe", "apply", src, "--merges", str(tmp_path / "m.json")])


def test_cli_profile(tmp_path, spark, capsys):
    src = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, None)], "k bigint, s string"
    ).write.parquet(src)
    assert main(["profile", src, "--columns", "k,s"]) == 0
    out = capsys.readouterr().out
    assert "null_count" in out and "n_distinct" in out


def test_cli_diff(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    path = str(tmp_path / "t")
    ds.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "pk int, v string"),
        TableRef(path=path),
    )
    ds.delete(TableRef(path=path), "pk = 1")
    assert main(["diff", path, "1"]) == 0
    out = capsys.readouterr().out
    assert "net" in out and "-1" in out


def test_cli_drift(tmp_path, spark, capsys):
    before = str(tmp_path / "before")
    after = str(tmp_path / "after")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k bigint, v double"
    ).write.parquet(before)
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k bigint, v double"
    ).write.parquet(after)
    assert main(["drift", before, after, "--columns", "k,v", "--exact"]) == 0
    out = capsys.readouterr().out
    assert "rel_change" in out and "n_distinct" in out


def test_cli_restore(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    src = str(tmp_path / "t")
    ds.append(spark.createDataFrame([(1,)], "k int"), TableRef(path=src))
    ds.append(spark.createDataFrame([(2,)], "k int"), TableRef(path=src))
    assert main(["restore", src, "1"]) == 0
    assert "as v3" in capsys.readouterr().out
    assert sorted(r.k for r in ds.read(TableRef(path=src)).collect()) == [1]


def test_cli_shuffle(tmp_path, spark, capsys):
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(60)], "doc_id bigint, text string"
    ).write.parquet(src)
    out = str(tmp_path / "shards")
    assert main(["shuffle", src, "--shards", "3", "--seed", "e0", "--out", out]) == 0
    printed = capsys.readouterr().out
    assert "3 shards written" in printed
    back = spark.read.parquet(out)
    assert back.count() == 60
    assert sorted(r.shard_id for r in back.select("shard_id").distinct().collect()) == [0, 1, 2]
    # manifest-only mode: no write, manifest printed
    assert main(["shuffle", src, "--shards", "3", "--seed", "e0"]) == 0
    assert "shard_id" in capsys.readouterr().out


def test_cli_detail(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    path = str(tmp_path / "dtbl")
    df = spark.createDataFrame([(1, "x"), (2, "y")], "pk int, s string")
    ds.create(TableRef(path=path), df.schema)
    ds.append(df, TableRef(path=path))
    assert main(["detail", path]) == 0
    out = capsys.readouterr().out
    assert '"num_rows": 2' in out and '"version": 1' in out


def test_cli_constraint(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    path = str(tmp_path / "ctbl")
    df = spark.createDataFrame([(1, 5)], "pk int, v int")
    ds.create(TableRef(path=path), df.schema)
    ds.append(df, TableRef(path=path))
    assert main(["constraint", "add", path, "v_pos", "v > 0"]) == 0
    assert main(["constraint", "list", path]) == 0
    assert "v_pos: CHECK (v > 0)" in capsys.readouterr().out
    import pytest as _p

    from x_spark.errors import DataSourceException

    with _p.raises(DataSourceException, match="v_pos"):
        ds.append(spark.createDataFrame([(2, -1)], "pk int, v int"),
                  TableRef(path=path))
    assert main(["constraint", "drop", path, "v_pos"]) == 0
    assert main(["constraint", "add", path]) == 2  # missing name/expr


def test_cli_ivm_minmax_and_staleness(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    base = str(tmp_path / "ibase")
    agg = str(tmp_path / "iagg")
    ds.append(spark.createDataFrame(
        [("a", 1, 10), ("a", 5, 50)], "g string, v int, w int"),
        TableRef(path=base))
    args = ["ivm", base, agg, "--keys", "g", "--sums", "w", "--minmax", "v"]
    assert main(args + ["--staleness"]) == 0
    assert "1 base version(s) behind" in capsys.readouterr().out
    assert main(args) == 0
    capsys.readouterr()
    assert main(args + ["--staleness"]) == 0
    assert "0 base version(s) behind" in capsys.readouterr().out
    row = ds.read(TableRef(path=agg)).collect()[0]
    assert (row.min_v, row.max_v) == (1, 5)


def test_cli_ivm_join(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    a = str(tmp_path / "ja"); b = str(tmp_path / "jb"); v = str(tmp_path / "jv")
    ds.append(spark.createDataFrame([(1, 10), (2, 20)], "k int, av int"),
              TableRef(path=a))
    ds.append(spark.createDataFrame([(1, "x")], "k int, bv string"),
              TableRef(path=b))
    args = ["ivm-join", a, b, v, "--on", "k",
            "--a-cols", "av", "--b-cols", "bv", "--buckets", "2"]
    assert main(args + ["--staleness"]) == 0
    assert "side A 1, side B 1" in capsys.readouterr().out
    assert main(args) == 0
    got = sorted(map(tuple, ds.read(TableRef(path=v)).drop("_bucket").collect()))
    assert got == [(1, 10, "x", 1)]


def test_cli_bloom_build_and_probe(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    path = str(tmp_path / "btbl")
    ref = TableRef(path=path)
    for b in range(4):
        df = spark.createDataFrame(
            [(b + 4 * i, f"u{b + 4 * i}") for i in range(20)],
            "user_id long, name string",
        )
        ds.append(df.repartition(1), ref)
    assert main(["bloom", path, "user_id"]) == 0
    out = capsys.readouterr().out
    assert "'n_files': 4" in out
    assert main(["bloom", path, "user_id", "--probe", "5"]) == 0
    out = capsys.readouterr().out
    assert "after bloom pruning" in out and "u5" in out


def test_cli_manifest(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    path = str(tmp_path / "mtbl")
    df = spark.createDataFrame([(1, "x"), (2, "y")], "pk int, s string")
    ds.append(df.repartition(1), TableRef(path=path))
    assert main(["manifest", path]) == 0
    out = capsys.readouterr().out
    assert "_symlink_format_manifest" in out and "1 files" in out


def test_cli_clone(tmp_path, spark, capsys):
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    src = str(tmp_path / "csrc")
    df = spark.createDataFrame([(1, "x"), (2, "y")], "pk int, s string")
    ds.append(df, TableRef(path=src))
    dst = str(tmp_path / "cdst")
    assert main(["clone", src, dst]) == 0
    out = capsys.readouterr().out
    assert "version 0" in out and "2 rows" in out


def test_cli_sketch_ingest_and_estimate(tmp_path, spark, capsys):
    src = str(tmp_path / "batch.parquet")
    spark.createDataFrame(
        [("d1", i) for i in range(500)] + [("d2", i) for i in range(250, 750)],
        "day string, user_id long",
    ).write.parquet(src)
    store = str(tmp_path / "skstore")
    assert main(["sketch", store, "--ingest", src]) == 0
    capsys.readouterr()
    assert main(["sketch", store]) == 0
    out = capsys.readouterr().out
    assert "'day': 'd1'" in out and "'n_distinct'" in out
    assert main(["sketch", store, "--where", "day = 'd2'"]) == 0
    out = capsys.readouterr().out
    assert "'d1'" not in out and "'d2'" in out
