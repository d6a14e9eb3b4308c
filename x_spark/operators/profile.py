"""Table profiling: per-column data-quality metrics in long format —
the "what is actually in this table?" primitive every curation
pipeline runs before and after each transformation (null explosions,
cardinality collapse, range drift are cheaper to catch at profile
time than to debug downstream).

Output: one row per (column, metric), value as double.

Metrics:
- every column:     null_count, n_distinct (approx by default)
- numeric columns:  min, max, p25/p50/p75 (exact continuous
                    interpolation — matches DuckDB quantile_cont)
- string columns:   avg_len, max_len (NULL-excluded)

Scale design: the null/min/max/len/percentile metrics for ALL columns
come from ONE aggregation pass over the table (no per-column jobs).
Distinct counts default to ``approx_count_distinct`` (HLL, ~2%
relative error) — the scale-safe plan a 100 TB profile should get
without asking: each exact distinct is a full two-stage distinct
aggregate per column. ``exact_distinct=True`` opts in to exact
counts; those are each their own plan — deliberately NOT folded into
the shared agg because multiple countDistinct in one agg plans an
Expand that duplicates every input row per distinct aggregate
(N columns -> N x scan rows shuffled; the separate plans shuffle only
the distinct values, with partial aggregation map-side).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType, StringType

QUANTILES = (0.25, 0.5, 0.75)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Long-format profile: ``(col_name, metric, value)`` sorted output
    left to the caller. ``value`` is double (lexicographic min/max of
    string columns are out of scope — lengths profile them instead)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    shared: list = []
    labels: list[tuple[str, str]] = []  # (col, metric) per agg position

    def add(col: str, metric: str, expr) -> None:
        shared.append(expr.cast("double").alias(f"{col}__{metric}"))
        labels.append((col, metric))

    for c in cols:
        dt = fields[c]
        add(c, "null_count", F.count(F.when(F.col(c).isNull(), 1)))
        if not exact_distinct:
            # approx_count_distinct is an ordinary partial-aggregable
            # agg, so it folds into the one shared pass (the Expand
            # hazard only exists for exact countDistinct)
            add(c, "n_distinct", F.approx_count_distinct(c))
        if isinstance(dt, NumericType):
            add(c, "min", F.min(c))
            add(c, "max", F.max(c))
            for q in QUANTILES:
                add(
                    c,
                    f"p{int(q * 100)}",
                    F.expr(f"percentile(cast({c} as double), {q})"),
                )
        elif isinstance(dt, StringType):
            add(c, "avg_len", F.avg(F.length(c)))
            add(c, "max_len", F.max(F.length(c)))

    wide = df.agg(*shared)
    # unpivot the single wide row: stack(n, 'col', 'metric', value, ...)
    stack_args = ", ".join(
        f"'{c}', '{m}', `{c}__{m}`" for c, m in labels
    )
    long = wide.select(
        F.expr(
            f"stack({len(labels)}, {stack_args}) AS (col_name, metric, value)"
        )
    )

    if not exact_distinct:
        return long
    distincts = [
        df.select(
            F.lit(c).alias("col_name"),
            F.lit("n_distinct").alias("metric"),
            F.countDistinct(c).cast("double").alias("value"),
        )
        for c in cols
    ]
    return reduce(DataFrame.unionByName, distincts, long)
