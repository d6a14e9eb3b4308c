"""Master registry of oracle-checked queries.

``QUERIES`` maps name -> callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps name -> equivalent DuckDB SQL (omitted for
non-SQL-expressible ops; the driver then records a rows-only check).

Consumed by ``__spark_entry__.py`` (the driver contract) and by
``tests/test_oracle_parity.py`` (local replica of the driver's
correctness gate).
"""

from __future__ import annotations

from x_spark.plans.extended import EXTENDED_ORACLES, EXTENDED_QUERIES
from x_spark.plans.pipeline import PIPELINE_ORACLES, PIPELINE_QUERIES
from x_spark.plans.relational import RELATIONAL_ORACLES, RELATIONAL_QUERIES
from x_spark.plans.streams import STREAM_ORACLES, STREAM_QUERIES

QUERIES = {
    **RELATIONAL_QUERIES,
    **PIPELINE_QUERIES,
    **STREAM_QUERIES,
    **EXTENDED_QUERIES,
}
ORACLES = {
    **RELATIONAL_ORACLES,
    **PIPELINE_ORACLES,
    **STREAM_ORACLES,
    **EXTENDED_ORACLES,
}


def register(name, query_fn, oracle: str | None = None) -> None:
    QUERIES[name] = query_fn
    if oracle is not None:
        ORACLES[name] = oracle
