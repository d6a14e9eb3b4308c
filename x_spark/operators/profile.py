"""Table profiling: per-column data-quality metrics in long format —
the "what is actually in this table?" primitive every curation
pipeline runs before and after each transformation (null explosions,
cardinality collapse, range drift are cheaper to catch at profile
time than to debug downstream).

Output: one row per (column, metric), value as double.

Metrics:
- every column:     null_count, n_distinct (approx by default)
- numeric columns:  min, max, p25/p50/p75 (approx sketch by default;
                    ``mode="exact"`` switches to exact continuous
                    interpolation — matches DuckDB quantile_cont)
- string columns:   avg_len, max_len (NULL-excluded)

The single knob is ``mode``: ``"approx"`` (the default) profiles with
bounded-memory sketches everywhere an estimate exists (HLL distincts,
approx_percentile); ``"exact"`` switches BOTH distincts and
percentiles to their exact forms — one name for one promise ("this
profile is oracle-comparable"), instead of a flag whose scope quietly
grew. (``exact_distinct=`` is still accepted as a deprecated alias
for callers written against the old signature.)

Scale design: the null/min/max/len/percentile metrics for ALL columns
come from ONE aggregation pass over the table (no per-column jobs).
Distinct counts default to ``approx_count_distinct`` (HLL, ~2%
relative error) — the scale-safe plan a 100 TB profile should get
without asking: each exact distinct is a full two-stage distinct
aggregate per column. ``mode="exact"`` opts in to exact counts; those
are each their own plan — deliberately NOT folded into the shared agg
because multiple countDistinct in one agg plans an Expand that
duplicates every input row per distinct aggregate (N columns -> N x
scan rows shuffled; the separate plans shuffle only the distinct
values, with partial aggregation map-side).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import NumericType, StringType

from x_spark.fanout import fan_out

QUANTILES = (0.25, 0.5, 0.75)


def _resolve_mode(mode: str, exact_distinct: bool | None) -> bool:
    """Returns True for exact mode. ``exact_distinct`` is the
    deprecated boolean alias (it always controlled percentiles too —
    the rename makes that scope honest); it wins when passed so old
    call sites keep their behavior."""
    if exact_distinct is not None:
        return bool(exact_distinct)
    if mode not in ("approx", "exact"):
        raise ValueError(f"profile mode must be 'approx' or 'exact', got {mode!r}")
    return mode == "exact"


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    mode: str = "approx",
    exact_distinct: bool | None = None,
) -> DataFrame:
    """Long-format profile: ``(col_name, metric, value)`` sorted output
    left to the caller. ``value`` is double (lexicographic min/max of
    string columns are out of scope — lengths profile them instead).
    ``mode="exact"`` switches distincts AND percentiles to exact forms
    (see module docstring); ``exact_distinct`` is a deprecated alias."""
    exact = _resolve_mode(mode, exact_distinct)
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    shared: list = []
    labels: list[tuple[str, str]] = []  # (col, metric) per agg position
    # overrides: (col, metric) -> expr over the wide agg row, for
    # metrics packed into a shared agg value (array-form percentiles)
    unpack: dict[tuple[str, str], object] = {}

    def add(col: str, metric: str, expr) -> None:
        shared.append(expr.cast("double").alias(f"{col}__{metric}"))
        labels.append((col, metric))

    for c in cols:
        dt = fields[c]
        add(c, "null_count", F.count(F.when(F.col(c).isNull(), 1)))
        if not exact:
            # approx_count_distinct is an ordinary partial-aggregable
            # agg, so it folds into the one shared pass (the Expand
            # hazard only exists for exact countDistinct)
            add(c, "n_distinct", F.approx_count_distinct(c))
        if isinstance(dt, NumericType):
            add(c, "min", F.min(c))
            add(c, "max", F.max(c))
            if exact:
                # exact continuous-interpolation percentile — matches
                # DuckDB quantile_cont (oracle mode). ONE array-form
                # accumulator per column: the three quantiles share a
                # single value buffer + sort instead of buffering the
                # column three times (identical values — one sorted
                # buffer interpolated at three points)
                qlist = ", ".join(str(q) for q in QUANTILES)
                shared.append(
                    F.expr(
                        f"percentile(cast({c} as double), array({qlist}))"
                    ).alias(f"{c}__pq")
                )
                for i, q in enumerate(QUANTILES):
                    m = f"p{int(q * 100)}"
                    labels.append((c, m))
                    unpack[(c, m)] = F.element_at(F.col(f"{c}__pq"), i + 1)
            else:
                for q in QUANTILES:
                    # approx mode: bounded-memory quantile sketch (the
                    # plan a 100 TB profile should get by default)
                    add(c, f"p{int(q * 100)}", F.expr(
                        f"approx_percentile(cast({c} as double), {q}, 10000)"
                    ))
        elif isinstance(dt, StringType):
            add(c, "avg_len", F.avg(F.length(c)))
            add(c, "max_len", F.max(F.length(c)))

    src = df
    if exact:
        # heavy per-row work (value buffering for exact percentiles)
        # runs in the stage BEFORE the first exchange — fan a
        # degenerate input layout out to every core first (guide §2.5;
        # no-op on healthy multi-split layouts). Exact aggregates are
        # order-independent, so results are bit-identical. Approx mode
        # is left untouched: sketch merges are order-sensitive and its
        # one shared pass is already the documented 100-TB plan.
        df = fan_out(df.select(*cols))
    wide = df.agg(*shared)
    if unpack:
        wide = wide.select(
            *[
                (unpack[(c, m)] if (c, m) in unpack
                 else F.col(f"{c}__{m}")).cast("double").alias(f"{c}__{m}")
                for c, m in labels
            ]
        )
    # unpivot the single wide row: stack(n, 'col', 'metric', value, ...)
    stack_args = ", ".join(
        f"'{c}', '{m}', `{c}__{m}`" for c, m in labels
    )
    long = wide.select(
        F.expr(
            f"stack({len(labels)}, {stack_args}) AS (col_name, metric, value)"
        )
    )

    if not exact:
        return long
    # one plan per exact distinct, NOT folded into the shared agg or a
    # multi-distinct aggregate (module docstring; the multi-distinct
    # Expand variant measured 1.7x SLOWER on the profile battery —
    # duplicated rows outweigh the saved scans on a columnar source,
    # and each union branch scans only its own column anyway)
    distincts = [
        src.select(
            F.lit(c).alias("col_name"),
            F.lit("n_distinct").alias("metric"),
            F.countDistinct(c).cast("double").alias("value"),
        )
        for c in cols
    ]
    return reduce(DataFrame.unionByName, distincts, long)


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Per-group ROBUST outlier profile via median / MAD (median
    absolute deviation) — the data-quality screen that, unlike
    mean/stddev z-scores, is not itself dragged by the outliers it is
    supposed to find. A row is an outlier when
    ``|x - median| > k * MAD`` (k=3 by convention; MAD of 0 flags any
    deviation).

    Output: one row per group —
    ``(*group_cols, n, med, mad, n_outliers, outlier_frac)``.

    Scale shape: two grouped percentile aggregates (median, then MAD
    over per-row deviations) plus one counting aggregate; the
    per-group stat tables are aggregate-sized so both joins back onto
    the fact rows broadcast — the corpus is never shuffled, only
    scanned. ``percentile`` is Spark's exact continuous-interpolation
    percentile, which matches DuckDB ``quantile_cont`` (the
    ``profile_table`` precedent); deviations are rounded to 6dp before
    the MAD pass so the compare is engine-stable.
    """
    v = F.col(value_col).cast("double")
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile(cast({value_col} as double), 0.5)").alias("med")
    )
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "_dev", F.round(F.abs(v - F.col("med")), 6)
    )
    mad = dev.groupBy(*group_cols).agg(
        F.expr("percentile(_dev, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), group_cols)
    return flagged.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.round(F.first("med"), 6).alias("med"),
        F.round(F.first("mad"), 6).alias("mad"),
        F.sum(
            F.when(
                F.col("_dev") > F.lit(k) * F.round(F.col("mad"), 6), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
        F.round(
            F.sum(
                F.when(
                    F.col("_dev") > F.lit(k) * F.round(F.col("mad"), 6), 1
                ).otherwise(0)
            )
            / F.count("*"),
            6,
        ).alias("outlier_frac"),
    )


def profile_drift(
    before: DataFrame,
    after: DataFrame,
    columns: list[str] | None = None,
    mode: str = "approx",
    exact_distinct: bool | None = None,
) -> DataFrame:
    """Schema/data drift report between two table states: profile both
    sides and join per (column, metric) —
    ``(col_name, metric, before_value, after_value, delta,
    rel_change)`` with ``rel_change = delta / before`` (NULL when the
    before value is 0 or the metric exists on one side only, e.g. a
    column added or dropped).

    The canonical post-ingest / post-transform gate: run against the
    previous txlog version (``read`` at version v-1) or yesterday's
    partition and alert on n_distinct collapse, null explosions, or
    range drift. Cost is two profile passes; both sides inherit
    ``profile_table``'s scale shape (approx sketches by default;
    ``mode``/``exact_distinct`` pass straight through)."""
    a = profile_table(before, columns, mode, exact_distinct).select(
        "col_name", "metric", F.round("value", 6).alias("before_value")
    )
    b = profile_table(after, columns, mode, exact_distinct).select(
        "col_name", "metric", F.round("value", 6).alias("after_value")
    )
    j = a.join(b, ["col_name", "metric"], "full_outer")
    delta = F.round(F.col("after_value") - F.col("before_value"), 6)
    return j.select(
        "col_name",
        "metric",
        "before_value",
        "after_value",
        delta.alias("delta"),
        F.round(
            delta / F.nullif(F.col("before_value"), F.lit(0.0)), 6
        ).alias("rel_change"),
    )


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top: int = 20,
) -> DataFrame:
    """Key-skew diagnostic — the measurement you take BEFORE choosing
    a skew strategy (salted agg/join, AQE skew thresholds): the ``top``
    heaviest key tuples with their row counts and corpus share, plus
    each key's multiple of the mean key load (``x_mean`` — a key at
    30x mean is what makes one reducer run 30x longer than the
    average). Output: ``(*key_cols, n_rows, share, x_mean)``, heaviest
    first, ties by key.

    Shape: one grouped count (partial-aggregable), a broadcast scalar
    total, and a distributed top-N (TakeOrderedAndProject) — never a
    global sort, never a driver-side histogram of all keys.
    """
    if not key_cols:
        raise ValueError("skew_report requires at least one key column")
    if top < 1:
        raise ValueError("top must be >= 1")
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").cast("double").alias("_total"),
        F.count("*").cast("double").alias("_nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            F.round(
                F.col("n_rows") / (F.col("_total") / F.col("_nkeys")), 6
            ).alias("x_mean"),
        )
        .orderBy(F.desc("n_rows"), *[F.asc(c) for c in key_cols])
        .limit(top)
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    width: float,
    scale: int = 2,
    min_count: int = 1,
) -> DataFrame:
    """Fixed-width distribution histogram of a numeric column —
    ``bucket = floor(value / width)`` with exact integer bucketing:
    the value is scaled to integer units (``10^scale`` — the column's
    decimal scale), so bucket edges never suffer float-edge ambiguity;
    the only float op is one exact (< 2^52) division whose floor both
    engines agree on, including for negative values (``div``/``//``
    disagree on truncation direction across engines, so floor-division
    is spelled out explicitly).

    The distribution-drift primitive: compare a histogram before/after
    a transform, or across txlog versions, far more cheaply than exact
    percentiles.

    Bucketing is EXACT for decimal/integer columns (the unit scaling
    and its floor are exact arithmetic, including columns with more
    fractional digits than ``scale`` and including negatives). For
    float columns the unit floor quantizes at the ``10^-scale``
    resolution — values within one float ulp of a bucket edge land
    deterministically but by representation, the unavoidable
    float-histogram caveat.

    Output: ``(bucket, bucket_lo, n_rows, share)``, one row per
    non-empty bucket with at least ``min_count`` rows.

    Scale shape: one grouped count (partial-aggregable, bucket-count
    output cardinality) plus a broadcast scalar total — the corpus is
    scanned once and shuffled only as bucket partials.
    """
    if width <= 0:
        raise ValueError("width must be positive")
    mult = 10 ** scale
    wunits = int(round(width * mult))
    if wunits <= 0:
        raise ValueError("width is below the scale resolution")
    # floor (not CAST-truncation) at the unit scaling too: truncation
    # is toward zero, so a negative value with more fractional digits
    # than `scale` would land one bucket too high
    units = F.expr(f"CAST(floor({value_col} * {mult}) AS BIGINT)")
    bucket = F.floor(units.cast("double") / F.lit(wunits)).cast("bigint")
    counts = df.filter(F.col(value_col).isNotNull()).groupBy(
        bucket.alias("bucket")
    ).agg(F.count("*").cast("bigint").alias("n_rows"))
    # the share denominator is ALL scanned rows — computed before the
    # min_count filter, so suppressing a long tail of sparse buckets
    # never inflates the surviving buckets' shares
    total = counts.agg(F.sum("n_rows").cast("double").alias("_total"))
    return (
        counts.filter(F.col("n_rows") >= min_count)
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            (F.col("bucket").cast("double") * F.lit(float(width))).alias("bucket_lo"),
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        )
    )


def trimmed_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    tiebreak_cols: list[str],
    trim_frac: float = 0.01,
) -> DataFrame:
    """Per-group TRIMMED statistics: drop the lowest and highest
    ``floor(n * trim_frac)`` rows by a fully deterministic rank
    (value, then ``tiebreak_cols`` — ties never make the cut
    ambiguous) and aggregate the interior. The mean-family counterpart
    of :func:`robust_outliers`: a handful of corrupt extreme rows
    (price glitches, sensor spikes) stop dragging the mean without
    the cost of exact percentiles.

    Output: ``(*group_cols, n_total, n_kept, trimmed_mean,
    trimmed_min, trimmed_max)`` — mean via DECIMAL(30,6) accumulation,
    rounded to 6dp.

    Scale shape: ONE shuffle on the group key serves both window
    functions (row_number + the partition count share the window
    spec's exchange), then a partial-aggregable grouped pass. No
    global sort, no driver collect.
    """
    if not group_cols:
        raise ValueError("trimmed_stats requires at least one group column")
    if not 0 <= trim_frac < 0.5:
        raise ValueError("trim_frac must be in [0, 0.5)")
    order = [F.col(value_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    wp = Window.partitionBy(*group_cols)
    lo = F.floor(F.col("_n") * F.lit(trim_frac))
    kept = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wp))
        .filter((F.col("_rn") > lo) & (F.col("_rn") <= F.col("_n") - lo))
    )
    v = F.col(value_col)
    return kept.groupBy(*group_cols).agg(
        F.max("_n").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("n_kept"),
        F.round(
            F.sum(v.cast("decimal(30,6)")).cast("double") / F.count("*"), 6
        ).alias("trimmed_mean"),
        F.min(v).cast("double").alias("trimmed_min"),
        F.max(v).cast("double").alias("trimmed_max"),
    )
