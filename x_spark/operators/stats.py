"""Deterministic second-moment statistics: Pearson correlation
matrices and grouped least-squares trends — the "is this column
drifting with that one / is this metric trending" analytics every
monitoring pipeline runs next to profiling.

Engine-exactness design: ``F.corr`` / ``regr_slope`` accumulate
co-moments in floating point, so their low bits depend on partition
order — a hash-checked oracle would flap. Instead every statistic
here is a CLOSED FORM over exact sums

    corr  = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
    intercept = (Sy - slope*Sx) / n

computed as ONE deterministic double expression per output row. Each
moment term (x, x*x, x*y, ...) is a single IEEE multiply per row
(bit-deterministic) cast to DECIMAL(30,6) and summed EXACTLY — the
repo's proven dsum pattern, mirrored literally in the DuckDB oracles.
(Decimal-typed multiplication is deliberately avoided: Spark and
DuckDB cap/reject decimal product precision differently, so decimal
products are NOT portable; a double product + exact decimal sum is.)
Rows with a NULL in any involved column are excluded pairwise (the
SQL-standard corr semantics).

Scale shape: one aggregation pass computes every moment for every
requested column pair (sums are partial-aggregable — map-side
combine, one shuffle on the group key or a scalar agg); the closed
forms run on the aggregate row(s). No second scan, no UDFs.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, functions as F

from x_spark.fanout import fan_out

_DEC = "decimal(30,6)"


def _moments(df: DataFrame, pairs: list[tuple[str, str]], group_cols: list[str]):
    """One agg computing n/Sx/Sy/Sxx/Syy/Sxy per pair (pairwise
    NULL-complete rows only): per-row double products (one IEEE
    multiply, bit-deterministic) summed exactly in DECIMAL(30,6)."""
    # the DECIMAL accumulation dominates this operator (module
    # docstring) and runs in the scan stage — fan a degenerate input
    # layout out to every core first (exact sums: order-independent)
    used = list(dict.fromkeys(
        group_cols + [c for p in pairs for c in p]
    ))
    df = fan_out(df.select(*used))
    aggs = []
    for x, y in pairs:
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        xd = F.when(both, F.col(x).cast("double"))
        yd = F.when(both, F.col(y).cast("double"))
        tag = f"{x}__{y}"
        aggs += [
            F.count(F.when(both, 1)).alias(f"n_{tag}"),
            F.sum(xd.cast(_DEC)).alias(f"sx_{tag}"),
            F.sum(yd.cast(_DEC)).alias(f"sy_{tag}"),
            F.sum((xd * xd).cast(_DEC)).alias(f"sxx_{tag}"),
            F.sum((yd * yd).cast(_DEC)).alias(f"syy_{tag}"),
            F.sum((xd * yd).cast(_DEC)).alias(f"sxy_{tag}"),
        ]
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(*aggs)


def corr_matrix(
    df: DataFrame,
    columns: list[str],
    group_cols: list[str] | None = None,
    null_policy: str = "complete",
) -> DataFrame:
    """Long-format Pearson correlation matrix over every unordered
    column pair: ``(*group_cols, col_x, col_y, n, corr)`` with corr
    rounded to 6dp (NULL when either variance is zero or n < 2).

    ``null_policy="complete"`` (default) drops rows with a NULL in ANY
    requested column once, so per-column moments (Sx, Sxx) are SHARED
    across pairs — k columns cost 2k + k*(k-1)/2 + 1 sums instead of
    3*k*(k-1) (measured 2.4x faster at k=4; exact decimal aggregation
    is the bottleneck, not the scan). ``"pairwise"`` keeps the
    SQL-standard corr semantics (each pair uses its own complete
    rows) at the higher cost. Identical results on NULL-free data.

    Cost: ONE scan + one (possibly scalar) aggregation for the whole
    matrix."""
    group_cols = list(group_cols or [])
    pairs = list(combinations(columns, 2))
    if null_policy == "complete":
        return _corr_matrix_complete(df, columns, pairs, group_cols)
    if null_policy != "pairwise":
        raise ValueError(f"null_policy must be complete/pairwise, got {null_policy!r}")
    wide = _moments(df, pairs, group_cols)
    # compute every pair's (n, corr) as columns of the SAME aggregate
    # row, then unpivot with stack — a per-pair union of selects would
    # re-plan (and re-scan) the aggregation once per pair
    out_cols = []
    for x, y in pairs:
        t = f"{x}__{y}"
        n = F.col(f"n_{t}").cast("double")
        sx = F.col(f"sx_{t}").cast("double")
        sy = F.col(f"sy_{t}").cast("double")
        sxx = F.col(f"sxx_{t}").cast("double")
        syy = F.col(f"syy_{t}").cast("double")
        sxy = F.col(f"sxy_{t}").cast("double")
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        corr = F.when(
            (F.col(f"n_{t}") >= 2) & (varx > 0) & (vary > 0),
            F.round((n * sxy - sx * sy) / F.sqrt(varx * vary), 6),
        )
        out_cols += [
            F.col(f"n_{t}").cast("bigint").alias(f"nn_{t}"),
            corr.alias(f"corr_{t}"),
        ]
    staged = wide.select(*group_cols, *out_cols)
    stack_args = ", ".join(
        f"'{x}', '{y}', `nn_{x}__{y}`, `corr_{x}__{y}`" for x, y in pairs
    )
    return staged.select(
        *group_cols,
        F.expr(
            f"stack({len(pairs)}, {stack_args}) AS (col_x, col_y, n, corr)"
        ),
    ).select(*group_cols, "col_x", "col_y", "n", "corr")


def _corr_matrix_complete(
    df: DataFrame,
    columns: list[str],
    pairs: list[tuple[str, str]],
    group_cols: list[str],
) -> DataFrame:
    """Complete-rows fast path: one NULL filter, shared per-column
    Sx/Sxx, per-pair Sxy, single n — all in one aggregation."""
    cond = None
    for c in columns:
        nn = F.col(c).isNotNull()
        cond = nn if cond is None else (cond & nn)
    used = list(dict.fromkeys(group_cols + columns))
    # the DECIMAL accumulation dominates this operator (module
    # docstring) and runs in the scan stage — fan a degenerate input
    # layout out to every core first (exact sums: order-independent)
    base = fan_out(df.select(*used).filter(cond))
    aggs = [F.count("*").alias("n_all")]
    for c in columns:
        cd = F.col(c).cast("double")
        aggs += [
            F.sum(cd.cast(_DEC)).alias(f"s_{c}"),
            F.sum((cd * cd).cast(_DEC)).alias(f"ss_{c}"),
        ]
    for x, y in pairs:
        aggs.append(
            F.sum((F.col(x).cast("double") * F.col(y).cast("double")).cast(_DEC))
            .alias(f"sp_{x}__{y}")
        )
    grouped = base.groupBy(*group_cols) if group_cols else base.groupBy()
    wide = grouped.agg(*aggs)
    n = F.col("n_all").cast("double")
    out_cols = []
    for x, y in pairs:
        t = f"{x}__{y}"
        sx = F.col(f"s_{x}").cast("double")
        sy = F.col(f"s_{y}").cast("double")
        sxx = F.col(f"ss_{x}").cast("double")
        syy = F.col(f"ss_{y}").cast("double")
        sxy = F.col(f"sp_{t}").cast("double")
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        corr = F.when(
            (F.col("n_all") >= 2) & (varx > 0) & (vary > 0),
            F.round((n * sxy - sx * sy) / F.sqrt(varx * vary), 6),
        )
        out_cols += [
            F.col("n_all").cast("bigint").alias(f"nn_{t}"),
            corr.alias(f"corr_{t}"),
        ]
    staged = wide.select(*group_cols, *out_cols)
    stack_args = ", ".join(
        f"'{x}', '{y}', `nn_{x}__{y}`, `corr_{x}__{y}`" for x, y in pairs
    )
    return staged.select(
        *group_cols,
        F.expr(
            f"stack({len(pairs)}, {stack_args}) AS (col_x, col_y, n, corr)"
        ),
    ).select(*group_cols, "col_x", "col_y", "n", "corr")


def grouped_linreg(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group ordinary least squares of ``y_col`` on ``x_col``:
    ``(*group_cols, n, slope, intercept, r2)``, each rounded to 6dp
    (NULL when x has zero variance or n < 2). r2 is the squared
    Pearson correlation (NULL when y is constant).

    The trend primitive: fit revenue-vs-week per segment, latency-vs-
    size per source — one aggregation pass, closed forms on the
    aggregate."""
    wide = _moments(df, [(x_col, y_col)], group_cols)
    t = f"{x_col}__{y_col}"
    n = F.col(f"n_{t}").cast("double")
    sx = F.col(f"sx_{t}").cast("double")
    sy = F.col(f"sy_{t}").cast("double")
    sxx = F.col(f"sxx_{t}").cast("double")
    syy = F.col(f"syy_{t}").cast("double")
    sxy = F.col(f"sxy_{t}").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    cov = n * sxy - sx * sy
    ok = (F.col(f"n_{t}") >= 2) & (varx > 0)
    slope = F.when(ok, cov / varx)
    return wide.select(
        *group_cols,
        F.col(f"n_{t}").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(F.when(ok, (sy - (cov / varx) * sx) / n), 6).alias("intercept"),
        F.round(
            F.when(ok & (vary > 0), (cov * cov) / (varx * vary)), 6
        ).alias("r2"),
    )
