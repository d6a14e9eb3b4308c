"""Reconciliation engine: compare N data sources by grouped metrics.

Reference parity: recon/recon.py (init_recon_job + ReconJob).
Pipeline: per-source query -> groupBy(group_by).agg(metric exprs) ->
rename metrics to <source>_<metric> -> N-way full outer join on the
group keys -> (exactly 2 sources) delta_<m> + match_<m> columns.

Deliberate divergences (SURVEY §8.9/8.10):
- float/double tolerance compare is a native column expression
  (whole-stage codegen) instead of a row-at-a-time Python UDF
  (recon/recon.py:172-179), with NULL-safe, zero-safe semantics:
  match = |a-b| <= 1e-3 * max(|a|,|b|); both-NULL -> true.
- delta columns are added for numeric dtypes by schema check, not by
  swallowing exceptions.

Scale notes: each source aggregates map-side before its shuffle (Spark
partial aggregation); the full outer join runs on already-aggregated
(small) relations, so Catalyst/AQE typically broadcasts them.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from x_spark.errors import JobConfigException
from x_spark.plans.config import load_yaml_config, substitute_params
from x_spark.session import get_session
from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef

NUMERIC_DTYPES = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal")
FLOAT_DTYPES = ("float", "double")
DEFAULT_TOLERANCE = 1e-3


def relative_match(a, b, tolerance: float = DEFAULT_TOLERANCE):
    """NULL/zero-safe relative-tolerance equality as a native expression."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    both_null = a.isNull() & b.isNull()
    one_null = a.isNull() | b.isNull()
    denom = F.greatest(F.abs(a), F.abs(b))
    close = F.when(denom == 0, F.lit(True)).otherwise(F.abs(a - b) <= tolerance * denom)
    return F.when(both_null, F.lit(True)).when(one_null, F.lit(False)).otherwise(close)


def init_recon_job(
    config: str | dict,
    params: dict[str, Any] | None = None,
    spark: SparkSession | None = None,
) -> "ReconJob":
    if isinstance(config, str):
        raw = load_yaml_config(config, params)
    else:
        raw = {str(k).lower(): v for k, v in config.items()}
    return ReconJob(raw, spark or get_session())


class ReconJob:
    def __init__(self, config: dict, spark: SparkSession) -> None:
        for key in ("version", "group_by", "data"):
            if key not in config:
                raise JobConfigException(f"recon config missing required key {key!r}")
        self.spark = spark
        self.group_by: list[str] = list(config["group_by"])
        # 'two_source' (reference parity: compare only with exactly 2
        # sources) or 'pairwise' (extension: N sources vs the first)
        self.compare_mode: str = str(config.get("compare", "two_source")).lower()
        self.sources: dict[str, dict] = {}
        # Normalize: default names source_<i> (recon.py:62-66), metrics
        # list-of-single-pair-dicts -> one dict (recon.py:75-81).
        for i, entry in enumerate(config["data"], start=1):
            entry = dict(entry)
            name = entry.pop("name", None) or f"source_{i}"
            metrics_raw = entry.get("metrics", [])
            metrics: dict[str, str] = {}
            if isinstance(metrics_raw, dict):
                metrics = dict(metrics_raw)
            else:
                for pair in metrics_raw:
                    metrics.update(pair)
            entry["metrics"] = metrics
            if name in self.sources:
                raise JobConfigException(f"duplicate recon source name {name!r}")
            self.sources[name] = entry
        self.df: dict[str, DataFrame] = {}
        self.agg: dict[str, DataFrame] = {}
        self.metric_names: list[str] = sorted(
            {m for s in self.sources.values() for m in s["metrics"]}
        )

    # -- pipeline ------------------------------------------------------
    def step_01_query(self) -> None:
        for name, src in self.sources.items():
            ds = init_datasource(src.get("datasource", "delta"), self.spark)
            if "query" in src:
                self.df[name] = ds.sql(src["query"])
            elif "table" in src:
                self.df[name] = ds.read(TableRef(table=src["table"]))
            elif "path" in src:
                self.df[name] = ds.read(TableRef(path=src["path"]))
            else:
                raise JobConfigException(f"recon source {name!r} needs query/table/path")

    def step_02_calculate(self) -> None:
        for name, src in self.sources.items():
            metrics = src["metrics"]
            aggs = [F.expr(expr).alias(alias) for alias, expr in metrics.items()]
            agg = self.df[name].groupBy(*self.group_by).agg(*aggs)
            self.agg[name] = agg.select(*(self.group_by + list(metrics)))

    def step_03_join(self) -> DataFrame:
        renamed = []
        for name, agg in self.agg.items():
            for metric in self.sources[name]["metrics"]:
                agg = agg.withColumnRenamed(metric, f"{name}_{metric}")
            renamed.append(agg)
        joined = reduce(lambda a, b: a.join(b, on=self.group_by, how="full"), renamed)

        if self.compare_mode == "pairwise" and len(self.sources) > 2:
            # Extension beyond the reference's 2-source gate
            # (recon/recon.py:149): every non-baseline source compared
            # against the FIRST source, columns suffixed per source.
            names = list(self.sources)
            base, others = names[0], names[1:]
            base_dtypes = dict(self.agg[base].dtypes)
            for other in others:
                for metric in self.metric_names:
                    if (
                        metric not in self.sources[base]["metrics"]
                        or metric not in self.sources[other]["metrics"]
                    ):
                        continue
                    c1 = F.col(f"{base}_{metric}")
                    c2 = F.col(f"{other}_{metric}")
                    dtype = base_dtypes.get(metric, "")
                    if dtype.startswith(NUMERIC_DTYPES):
                        joined = joined.withColumn(
                            f"delta_{other}_{metric}", F.abs(c1 - c2)
                        )
                    if dtype.startswith(FLOAT_DTYPES):
                        joined = joined.withColumn(
                            f"match_{other}_{metric}", relative_match(c1, c2)
                        )
                    else:
                        joined = joined.withColumn(
                            f"match_{other}_{metric}",
                            F.when(c1.isNull() & c2.isNull(), F.lit(True)).otherwise(
                                c1.eqNullSafe(c2)
                            ),
                        )
            return joined

        if len(self.sources) == 2:
            (n1, s1), (n2, s2) = self.sources.items()
            dtypes1 = dict(self.agg[n1].dtypes)
            for metric in self.metric_names:
                if metric not in s1["metrics"] or metric not in s2["metrics"]:
                    continue
                c1, c2 = F.col(f"{n1}_{metric}"), F.col(f"{n2}_{metric}")
                dtype = dtypes1.get(metric, "")
                if dtype.startswith(NUMERIC_DTYPES):
                    joined = joined.withColumn(f"delta_{metric}", F.abs(c1 - c2))
                if dtype.startswith(FLOAT_DTYPES):
                    joined = joined.withColumn(f"match_{metric}", relative_match(c1, c2))
                else:
                    joined = joined.withColumn(
                        f"match_{metric}",
                        F.when(c1.isNull() & c2.isNull(), F.lit(True)).otherwise(
                            c1.eqNullSafe(c2)
                        ),
                    )
        return joined

    def run(self) -> DataFrame:
        self.step_01_query()
        self.step_02_calculate()
        return self.step_03_join()
