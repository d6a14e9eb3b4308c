"""Layout-adaptive fan_out (OPTIMIZATION r11) — the helper several
operators now route their heavy pre-exchange stages through — and the
fused merge source pass that replaced the separate uniqueness-check
job.

Pins:
- degenerate layout (fewer partitions than threshold x parallelism)
  -> one round-robin repartition to the session default parallelism;
- healthy layout -> PASS-THROUGH (the exact same DataFrame object, no
  added shuffle) — the 100-TB no-op claim;
- results identical with and without the fan (order-independent agg);
- merge's fused uniqueness probe keeps the groupBy semantics for NULL
  key fields (two all-NULL keys are duplicates; NULL vs non-NULL is
  not).
"""

import os

import pytest
from pyspark.sql import functions as F

from x_spark.errors import ETLJobException
from x_spark.fanout import fan_out
from x_spark.sources.base import MergeSpec, TableRef
from x_spark.sources.txlog import TxLogDataSource


def test_degenerate_layout_fans_to_default_parallelism(spark):
    df = spark.range(1000).coalesce(1)
    fanned = fan_out(df)
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_healthy_layout_passes_through_unchanged(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target)  # already at full width
    fanned = fan_out(df)
    # identity, not equivalence: no new plan node, no added shuffle
    assert fanned is df


def test_results_identical_with_and_without_fan(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").cast("decimal(30,6)").alias("v"),
    ).coalesce(1)
    plain = {
        (r["k"], str(r["sum(v)"]))
        for r in df.groupBy("k").agg(F.sum("v")).collect()
    }
    fanned = {
        (r["k"], str(r["sum(v)"]))
        for r in fan_out(df).groupBy("k").agg(F.sum("v")).collect()
    }
    assert plain == fanned


@pytest.fixture()
def _table(spark, tmp_path):
    ds = TxLogDataSource(spark)
    ref = TableRef(path=os.path.join(str(tmp_path), "t"))
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k bigint, name string, v double",
    )
    ds.create(ref, base.schema)
    ds.append(base, ref)
    return ds, ref


def test_merge_fused_check_aborts_on_duplicate_keys(spark, _table):
    ds, ref = _table
    src = spark.createDataFrame(
        [(1, "x", 9.0), (1, "y", 8.0)], "k bigint, name string, v double"
    )
    with pytest.raises(ETLJobException, match="duplicate"):
        ds.merge(src, ref, MergeSpec(["k"], ["v"]))


def test_merge_fused_check_null_key_semantics(spark, _table):
    ds, ref = _table
    # two all-NULL keys ARE duplicates (grouped together, like the
    # groupBy the fused countDistinct(struct) replaced) ...
    dup_null = spark.createDataFrame(
        [(None, "x", 9.0), (None, "y", 8.0)], "k bigint, name string, v double"
    )
    with pytest.raises(ETLJobException, match="duplicate"):
        ds.merge(dup_null, ref, MergeSpec(["k"], ["v"]))
    # ... while NULL vs non-NULL keys are distinct rows: no abort, and
    # the NULL-key row inserts (equality join never matches NULL)
    mixed = spark.createDataFrame(
        [(None, "x", 9.0), (1, "y", 8.0)], "k bigint, name string, v double"
    )
    ds.merge(mixed, ref, MergeSpec(["k"], ["v"],
                                   insert_when_not_matched=True))
    rows = ds.read(ref).collect()
    assert len(rows) == 4  # 3 base + inserted NULL-key row
    assert {str(r["v"]) for r in rows if r["k"] == 1} == {"8.0"}
