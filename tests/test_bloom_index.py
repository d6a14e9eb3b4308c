"""File-level Bloom data skipping (sources/bloom_index.py): per-file
filters built distributed over a txlog snapshot, probed driver-side.

The defining scenario: values CLUSTERED per file (each ingest batch
holds its own key set) but SCATTERED across the value range, so footer
min/max stats cannot prune anything — the Bloom index must."""

import pytest
from pyspark.sql import functions as F

from x_spark.errors import DataSourceException
from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef
from x_spark.sources.bloom_index import (
    _might_contain,
    _probe_positions,
    bloom_prune,
    build_bloom_index,
    read_where_in,
)


@pytest.fixture()
def ds(spark):
    return init_datasource("txlog", spark)


def _ref(tmp_path, name="t"):
    return TableRef(path=str(tmp_path / name))


def _batched_store(spark, ds, ref, n_batches=8, per_batch=40):
    """One append per batch; batch b holds user_ids {b, b+n, b+2n, ...}
    — every file's (min, max) spans nearly the full range, so min/max
    skipping is useless, but each id lives in exactly one file."""
    for b in range(n_batches):
        ids = [b + n_batches * i for i in range(per_batch)]
        df = spark.createDataFrame([(i, f"u{i}") for i in ids], "user_id long, name string")
        ds.append(df.repartition(1), ref)
    return n_batches


def test_probe_positions_match_jvm_build(spark):
    # the driver-side probe must be expression-identical to the JVM
    # build side: hash a value both ways and compare positions
    from x_spark.operators.text import _bloom_positions

    for v in (12345, "hello world", -7):
        jvm = spark.range(1).select(
            F.explode(
                F.expr(
                    "array("
                    + ", ".join(
                        _bloom_positions(
                            f"cast(conv(substr(md5(cast({v!r} as string)),1,8),16,10) as bigint)",
                            4096,
                        )
                    )
                    + ")"
                )
            ).alias("p")
        ).collect()
        assert [r["p"] for r in jvm] == _probe_positions(v, 4096)


def test_build_prune_and_read(spark, ds, tmp_path):
    ref = _ref(tmp_path)
    n_batches = _batched_store(spark, ds, ref)
    summary = build_bloom_index(ds, ref, "user_id")
    assert summary["n_files"] >= n_batches

    kept, total = bloom_prune(ds, ref, "user_id", [3])  # id 3 lives in batch 3
    assert total == summary["n_files"]
    # the point lookup must prune most files (fpp at 4096 bits / 40
    # values is ~1e-5 per file; equality would be flaky, dominance not)
    assert len(kept) <= max(2, total // 4)

    out = read_where_in(ds, ref, "user_id", [3, 11])
    expected = ds.read(ref).filter(F.col("user_id").isin([3, 11]))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expected.collect()))


def test_unindexed_new_files_stay_candidates(spark, ds, tmp_path):
    ref = _ref(tmp_path)
    _batched_store(spark, ds, ref, n_batches=4)
    build_bloom_index(ds, ref, "user_id")
    # a post-index append holds a brand-new id; it must still be found
    ds.append(spark.createDataFrame([(10_001, "new")], "user_id long, name string"), ref)
    rows = read_where_in(ds, ref, "user_id", [10_001]).collect()
    assert [(r.user_id, r.name) for r in rows] == [(10_001, "new")]


def test_no_index_means_no_pruning(spark, ds, tmp_path):
    ref = _ref(tmp_path)
    _batched_store(spark, ds, ref, n_batches=3)
    kept, total = bloom_prune(ds, ref, "user_id", [1])
    assert kept and len(kept) == total  # advisory: absent index keeps all
    out = read_where_in(ds, ref, "user_id", [1])
    assert out.count() == 1


def test_string_column_and_type_guard(spark, ds, tmp_path):
    ref = _ref(tmp_path)
    for b in range(4):
        df = spark.createDataFrame(
            [(f"k{b}_{i}", float(i)) for i in range(20)], "key string, x double"
        )
        ds.append(df.repartition(1), ref)
    build_bloom_index(ds, ref, "key")
    kept, total = bloom_prune(ds, ref, "key", ["k2_7"])
    assert len(kept) < total
    assert read_where_in(ds, ref, "key", ["k2_7"]).count() == 1
    with pytest.raises(DataSourceException):
        build_bloom_index(ds, ref, "x")  # float: not indexable
    with pytest.raises(DataSourceException):
        build_bloom_index(ds, ref, "nope")


def test_might_contain_no_false_negatives(spark, ds, tmp_path):
    ref = _ref(tmp_path)
    _batched_store(spark, ds, ref, n_batches=4, per_batch=30)
    build_bloom_index(ds, ref, "user_id")
    # every present id must be found through the pruned path
    all_ids = [r.user_id for r in ds.read(ref).collect()]
    got = read_where_in(ds, ref, "user_id", all_ids)
    assert got.count() == len(all_ids)


def test_index_rejects_bad_m_bits(spark, ds, tmp_path):
    ref = _ref(tmp_path)
    _batched_store(spark, ds, ref, n_batches=2, per_batch=5)
    with pytest.raises(ValueError):
        build_bloom_index(ds, ref, "user_id", m_bits=100)
