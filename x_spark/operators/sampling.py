"""Deterministic sampling operators for training-data pipelines.

Content-hash based (md5 of the key), NOT seeded rand(): the sample a
row lands in is a pure function of its key, so results are
reproducible across runs, engines, partitionings, and cluster sizes —
and rows keep their assignment when the corpus is incrementally
re-processed (critical: a train/test split must never leak when data
is re-ingested). All scan-speed projections, no shuffles.

DuckDB equivalents are embedded in each helper for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from x_spark.functions.portable import hash32

DENOM = 10_000  # rate resolution: 0.01%


def _bucket(key_col: str | Column) -> Column:
    """Uniform bucket in [0, DENOM) from the key's md5.

    DuckDB: ``cast(concat('0x', substr(md5(cast(k as varchar)),1,8)) as bigint) % 10000``
    """
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(hash32(col.cast("string")), F.lit(DENOM))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically
    by key hash. Rates are quantized to 1/DENOM."""
    thresh = F.lit(int(default_rate * DENOM))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(rate * DENOM))
        ).otherwise(thresh)
    return df.filter(_bucket(key_col) < thresh)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash range — e.g.
    {"train": 0.8, "val": 0.1, "test": 0.1}. Ranges are allocated in
    sorted(split name) order so the assignment is fully specified."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _bucket(key_col)
    expr = None
    lo = 0
    for name, w in sorted(weights.items()):
        hi = lo + int(w * DENOM)
        cond = (bucket >= F.lit(lo)) & (bucket < F.lit(hi))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    # hash residue from rounding goes to the last (sorted) split
    last = sorted(weights)[-1]
    return df.withColumn(split_col, expr.otherwise(F.lit(last)))


def priority_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep ``n``
    rows where a row's inclusion probability is proportional to its
    weight (Efraimidis-Spiridakis A-Res, the exponential-race form).

    Each row draws u ~ Uniform(0,1) from its key hash (reproducible
    across partitionings) and races with arrival time -ln(u)/w, which
    is Exp(w)-distributed — the n SMALLEST arrival times win, and
    heavier rows draw systematically earlier arrivals. One global
    top-n (Spark plans TakeOrdered: per-partition partial top-n, no
    full sort shuffle).

    DuckDB: ``-ln((hash32 + 0.5)/4294967296.0) / w`` with the
    identical hash — see the registry oracle. Ties break by key.

    Weights must be finite and > 0: a zero weight would yield +Inf
    priority (silent exclusion), a negative one a negative priority
    that sorts FIRST (always included), and NULL a NULL priority —
    all of which silently skew the sample, so they raise instead
    (checked executor-side, no extra pass).
    """
    if n <= 0:
        raise ValueError("priority_sample requires n >= 1")
    col = F.col(key_col).cast("string")
    u = (hash32(col) + F.lit(0.5)) / F.lit(4294967296.0)
    w = F.col(weight_col).cast("double")
    w_checked = F.when(
        w.isNull() | (w <= 0.0) | F.isnan(w) | (w == float("inf")),
        F.raise_error(F.concat(
            F.lit(f"priority_sample: weight column {weight_col!r} must be "
                  "finite and > 0, got "),
            F.coalesce(w.cast("string"), F.lit("NULL")),
        )).cast("double"),
    ).otherwise(w)
    prio = -F.log(u) / w_checked
    return (
        df.withColumn("__prio", prio)
        .orderBy(F.asc("__prio"), F.asc(key_col))
        .limit(n)
        .drop("__prio")
    )


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    order_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> DataFrame:
    """Fill a token budget with the best documents: keep rows in
    ``(order_col DESC, id)`` order while the cumulative token count
    stays <= ``budget_tokens`` (the crosser is excluded — the simple,
    oracle-exact rule). This is "give me the best 1T tokens", the
    selection step between scoring and training.

    The cumulative sum is the scale trap: a global
    ``Window.orderBy`` drags the corpus through ONE partition. Here it
    is the distributed two-stage scan over an ARBITRARY sort key:
    range-partition on the key (partition id order == global sort
    order for a range partitioner), cumulative-sum inside each
    partition (parallel, partition-sized state), then prefix-sum the
    per-partition totals on the driver (``n_buckets`` longs) and
    broadcast them back as offsets. The result is independent of the
    sampled range boundaries — the running total is defined by the
    TOTAL order (key desc, id), whatever partition a row lands in.

    Returns ``(id_col, order_col, n_tokens, running_total)`` for the
    kept documents."""
    from x_spark.functions.portable import token_count

    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    toks = df.select(
        F.col(id_col),
        F.col(order_col),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    # PIN the range partitioning before deriving BOTH the per-partition
    # totals and the final frame from it: RangePartitioner samples its
    # boundaries with a per-execution seed, so without materialization
    # the totals job and the output job could draw different boundaries
    # and the broadcast offsets would disagree with the partitions they
    # are added to (wrong running totals at partition edges).
    parts = (
        toks.repartitionByRange(n_buckets, F.desc(order_col), F.asc(id_col))
        .withColumn("_p", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("_p").orderBy(F.desc(order_col), F.asc(id_col))
    intra = parts.withColumn("_run_in", F.sum("n_tokens").over(w))
    totals = {
        r["_p"]: r["t"]
        for r in parts.groupBy("_p").agg(F.sum("n_tokens").alias("t")).collect()
    }
    offset, acc = {}, 0
    for p in sorted(totals):
        offset[p] = acc
        acc += totals[p]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(p, v) for p, v in offset.items()], "_p int, _off bigint"
    )
    return (
        intra.join(F.broadcast(off_df), "_p")
        .withColumn(
            "running_total",
            (F.col("_off") + F.col("_run_in")).cast("bigint"),
        )
        .filter(F.col("running_total") <= F.lit(int(budget_tokens)))
        .select(id_col, order_col, "n_tokens", "running_total")
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled corpus mixing (the mT5/multilingual-sampling
    rule): target proportions proportional to ``count_s ** alpha``.
    ``alpha=1`` keeps the natural distribution; ``alpha -> 0``
    approaches uniform over sources — the standard low-resource
    up-weighting knob, here as deterministic SUBSAMPLING of the
    over-represented sources (no replication).

    Quota algebra: with weights w_s = c_s^alpha and target shares
    p_s = w_s / W, the achievable total is T = min_s(c_s / p_s) and
    quota_s = floor(p_s * T) = floor(w_s * min_s(c_s / w_s)) — the
    normalizing sum W CANCELS, so the float chain is pow / divide /
    min / multiply / floor only. At ``alpha=0.5`` the pow is sqrt,
    which IEEE requires to be correctly rounded — the whole chain is
    then bit-identical across engines (the oracle-checkable setting);
    other alphas depend on the platform's pow rounding (fine for
    production, not for a hash-compared oracle).

    Same scale shape as :func:`mix_corpus`: per-source count agg
    (source cardinality is tiny), broadcast quota join, one per-source
    rank window; rows keep/drop deterministically by key hash, so the
    mix is reproducible and incrementally stable.
    """
    if alpha <= 0 or alpha > 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from pyspark.sql import Window as W

    wt = (
        F.sqrt(F.col("__cnt").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("__cnt").cast("double"), F.lit(float(alpha)))
    )
    counts = df.groupBy(source_col).agg(F.count("*").alias("__cnt"))
    weighted = counts.select(
        source_col,
        wt.alias("__w"),
        (F.col("__cnt").cast("double") / wt).alias("__ratio"),
    )
    mr = weighted.agg(F.min("__ratio").alias("__mr"))
    quota = weighted.crossJoin(F.broadcast(mr)).select(
        source_col,
        F.floor(F.col("__w") * F.col("__mr")).cast("bigint").alias("__quota"),
    )
    w = W.partitionBy(source_col).orderBy(_bucket(key_col), F.col(key_col))
    ranked = df.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quota), source_col)
        .filter(F.col("__rk") <= F.col("__quota"))
        .drop("__rk", "__quota")
    )


def mix_corpus(
    df: DataFrame,
    source_col: str,
    proportions: dict[str, float],
    key_col: str,
) -> DataFrame:
    """Deterministic corpus mixing: subsample so the kept rows follow
    the target per-source ``proportions`` exactly (the training-data
    mixing step — e.g. 50% web, 30% code, 20% books).

    The achievable total is T = min_s floor-free(count_s / prop_s)
    (the scarcest source binds); each source keeps its
    floor(prop_s * T) lowest-hash rows, so the result is reproducible
    and incrementally stable. Sources outside ``proportions`` drop.

    Plan: tiny per-source count agg joined back broadcast; per-source
    rank is one window (shuffle on source — at 100 TB replace the
    row_number window with a per-source hash-threshold binary search if
    source cardinality is tiny and rows are huge; semantics identical).
    """
    if not proportions:
        raise ValueError("mix_corpus requires at least one source proportion")
    prop = None
    for value, p in sorted(proportions.items()):
        lit = F.lit(float(p))
        prop = F.when(F.col(source_col) == value, lit) if prop is None \
            else prop.when(F.col(source_col) == value, lit)
    prop = prop.otherwise(F.lit(None))

    tagged = df.withColumn("__p", prop).filter(F.col("__p").isNotNull())
    counts = tagged.groupBy(source_col, "__p").agg(F.count("*").alias("__cnt"))
    total = counts.agg(
        F.min(F.col("__cnt").cast("double") / F.col("__p")).alias("__t")
    )
    quota = counts.crossJoin(F.broadcast(total)).select(
        source_col,
        F.floor(F.col("__p") * F.col("__t")).cast("bigint").alias("__quota"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(source_col).orderBy(
        _bucket(key_col), F.col(key_col)
    )
    ranked = tagged.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quota), source_col)
        .filter(F.col("__rk") <= F.col("__quota"))
        .drop("__p", "__rk", "__quota")
    )
