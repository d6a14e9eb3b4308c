"""Plan-shape regression tests — the scale properties the engine
relies on must be visible in the physical plan, not assumed:
filter/column pushdown to the parquet scan, broadcast of small dims,
partition pruning on partitioned layouts, no cartesian products in
the bucketized joins, and salted aggregation correctness.
"""

from pyspark.sql import functions as F

from x_spark.plans.registry import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_column_pushdown(spark, sf_dir):
    plan = _plan(QUERIES["shipping_priority"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan
    # column pruning: the lineitem scan must not read unused columns
    li_scan = [ln for ln in plan.splitlines() if "lineitem.parquet" in ln]
    assert li_scan and all("l_quantity" not in ln for ln in li_scan)


def test_small_dims_broadcast(spark, sf_dir):
    plan = _plan(QUERIES["top_customers"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bucketized_joins_avoid_cartesian(spark, sf_dir):
    for name in ("range_click_context", "embedding_near_dups", "asof_purchase_gap"):
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "by_day")
    (
        spark.range(0, 1000)
        .withColumn("day", (F.col("id") % 10).cast("string"))
        .withColumn("v", F.col("id") * 2)
        .write.partitionBy("day")
        .parquet(path)
    )
    df = spark.read.parquet(path).filter(F.col("day") == "3").select(F.sum("v"))
    plan = _plan(df)
    assert "PartitionFilters: [isnotnull(day" in plan
    # and the pruned scan reads only the day=3 slice
    pruned = spark.read.parquet(path).filter(F.col("day") == "3")
    assert pruned.count() == 100


def test_no_fact_table_broadcast_hints(spark, sf_dir):
    """Fact-scaled tables (customer/orders/lineitem/part/supplier grow
    with SF) must never carry an explicit broadcast hint — the hint
    overrides Catalyst's size check and OOMs executors at 100x SF.
    With autoBroadcastJoinThreshold=-1 and AQE off, every
    BroadcastExchange in the plan comes from an explicit hint, so the
    count equals the number of hinted dims."""
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(QUERIES["market_share"](spark, sf_dir))
        # exactly nation + region are hinted; customer joins shuffle-side
        assert plan.count("BroadcastExchange") == 2
        # hinted-broadcast budget per query == its dim-hint count
        for name, hinted_dims in (("top_customers", 1), ("local_supplier_volume", 2)):
            p = _plan(QUERIES[name](spark, sf_dir))
            assert p.count("BroadcastExchange") <= hinted_dims, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


def test_salted_agg_matches_plain(spark):
    from x_spark.operators.skew import salted_agg

    # skewed: 90% of rows on one key
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 != 0, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    got = {
        r.k: (r.total, r.n, r.lo, r.hi)
        for r in salted_agg(
            df,
            ["k"],
            {"total": ("sum", "v"), "n": ("count", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
            n_salts=8,
        ).collect()
    }
    want = {
        r.k: (r.total, r.n, r.lo, r.hi)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_bm25_is_equi_join_and_prunes_columns(spark, sf_dir):
    """The inverted-index formulation must stay equi-join shaped (no
    cartesian between posting lists) and read only doc_id+text."""
    plan = _plan(QUERIES["bm25_search"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    doc_scan = [ln for ln in plan.splitlines() if "documents.parquet" in ln]
    assert doc_scan and all("lang" not in ln and "source" not in ln for ln in doc_scan)


def test_pii_scan_single_pass(spark, sf_dir):
    """PII audit is one scan + one agg: no joins, no shuffles beyond
    the final group-by exchange."""
    plan = _plan(QUERIES["pii_scan"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # partial/final agg exchange (+AQE read)


def test_blamed_suppliers_expand_free(spark, sf_dir):
    """Q21 flavor must keep the two-level distinct aggregation — a
    multi-countDistinct Expand doubles every lineitem row through the
    shuffle (ROADMAP invariant; measured 2x on Spark 4.1)."""
    plan = _plan(QUERIES["blamed_suppliers"](spark, sf_dir))
    assert "Expand" not in plan


def test_distributed_bruteforce_no_forced_broadcast(spark, sf_dir):
    """broadcast_queries=False removes the broadcast HINT so Catalyst
    can stream both sides: with auto-broadcast disabled (simulating a
    query side too big to fit) the plan must degrade to a partitioned
    cartesian, never an OOM-bound BroadcastExchange; with the hint
    (default path) it must stay a broadcast."""
    from x_spark.operators.similarity import brute_force_topk
    from x_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.limit(20)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(brute_force_topk(emb, q, k=3, broadcast_queries=False))
        assert "CartesianProduct" in plan and "BroadcastExchange" not in plan
        hinted = _plan(brute_force_topk(emb, q, k=3))
        assert "BroadcastExchange" in hinted  # explicit hint still wins
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_set_similarity_join_is_equi_not_cartesian(spark, sf_dir):
    """The prefix-filter candidate stage and the verification stage
    must both plan as shuffle/broadcast HASH joins on keys — a
    cartesian or nested-loop join means the prefix filter degenerated
    to all-pairs."""
    plan = _plan(QUERIES["set_similarity_dups"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_diff_plan_is_one_aggregation_no_join(spark, tmp_path):
    # the semantic diff is ONE aggregation over interval changes —
    # never a join of two full snapshots (the registry query
    # checkpoints its result, so introspect the operator directly)
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    ds = init_datasource("txlog", spark)
    ref = TableRef(path=str(tmp_path / "t"))
    df = spark.createDataFrame([(1, 10), (2, 20)], "pk int, v int")
    ds.append(df, ref)
    ds.delete(ref, "pk = 1")
    plan = _plan(ds.semantic_diff(ref, 1))
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan


def test_bpe_token_stats_is_scan_speed(spark, sf_dir):
    """The fixed-merge segmentation is a single projection over the
    scan — no join, no key shuffle. The only Exchange allowed is the
    layout-adaptive round-robin fan_out that parallelizes the
    replace-chain when the input plans as fewer tasks than cores
    (optimization guide §2.5); a hash/range exchange would mean a
    grouping or join crept in."""
    plan = _plan(QUERIES["bpe_token_stats"](spark, sf_dir))
    for op in ("Join", "CartesianProduct"):
        assert op not in plan, op
    # inverted pin (round-11 advice): enumerate the ALLOWED exchange
    # kind instead of the known-bad ones, so any future non-round-robin
    # exchange variant fails loudly rather than passing silently
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line


def test_salted_join_matches_plain_join(spark):
    """salted_join must be result-identical to the direct join, for a
    skewed fact (one hot key holding most rows) under inner and left."""
    from x_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1 if i % 10 else i % 5, i) for i in range(500)], "k int, v int"
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(4)], "k int, name string"
    )
    for how in ("inner", "left"):
        plain = sorted(map(tuple, fact.join(dim, ["k"], how).collect()))
        salted = sorted(map(tuple, salted_join(fact, dim, ["k"], how).collect()))
        assert plain == salted, how
    # salt spreads the hot key across partitions: the salted plan joins
    # on (k, salt), visible as the extra join key
    plan = salted_join(fact, dim, ["k"])._jdf.queryExecution().toString()
    assert "__x_spark_salt" in plan
