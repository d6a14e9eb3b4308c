"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (pricing summary aggregation battery)
on sf0.001.
``queries()`` — the full registry (one entry per implemented query;
count = ``len(x_spark.plans.registry.QUERIES)`` — never hardcoded
here) covering every implemented operator from
SURVEY.md §2 plus the LLM-data-pipeline extensions (dedup families,
ANN, text analysis, BM25 search, PII audit, corpus mixing/sampling,
multimodal, streaming incl. stream-stream join and stateful ops,
temporal joins, SCD2, graph components, TPC-H shape battery), as
(spark, sf_dir) -> DataFrame callables. The first 50 entries — the
driver-checked window — hold one representative per operator family
(see x_spark/plans/registry.py).
``oracle_sql()`` — matching DuckDB SQL per query. Intentional
omissions (rows-only checks): approx_distinct_users (HLL estimates
are engine-specific), ann_topk_ivf and ann_topk_pq (data-dependent
trained codebooks — quality pinned by the pytest recall floor and
bench's recall report), bpe_merge_table (iterative trainer — pinned
instead by exact-match tests vs a reference loop),
sketch_distinct_rollup (DataSketches HLL estimates are
engine-specific — accuracy pinned by tests/test_sketches.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    from x_spark.plans.relational import q_pricing_summary

    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from x_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from x_spark.plans.registry import ORACLES

    return dict(ORACLES)
