"""Replica of the driver's t2 correctness gate: every registry query
with an oracle must match DuckDB on the same parquet tables.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 for the full-scale check before committing new
queries.
"""

import pytest

from x_spark.plans.registry import ORACLES, QUERIES
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(name, spark, sf_dir):
    query_fn = QUERIES[name]
    df = query_fn(spark, sf_dir)
    assert df is not None
    oracle = ORACLES.get(name)
    if oracle is None:
        # rows-only check (driver's weaker path for non-SQL ops)
        assert df.count() >= 0
        return
    ok, msg = compare(df, oracle, sf_dir, name)
    assert ok, msg


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(queries)
    assert len(queries) >= 15
