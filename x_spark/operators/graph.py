"""Iterative graph operators: connected components by min-label
propagation — dedup candidate pairs -> duplicate CLUSTERS (the step
after pairwise detection in a real dedup pipeline: pick one survivor
per component, not per pair).

Spark-first shape: the classic label-propagation loop. Each iteration
is one join + one aggregation (both shuffle on node id); the driver
only checks convergence (a limit-1 count, not data movement) and
``localCheckpoint`` cuts lineage so plan depth stays O(1) rather than
O(iterations). Iterations needed = graph diameter — near-dup clusters
are small and star-shaped, so this converges in 2-3 rounds. At 100 TB
the same loop runs with the edges bucketed by node; the
alternating-star optimization (Kiveris et al., "Connected Components
in MapReduce") slots in if diameters grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tracked_ckpt(df: DataFrame):
    """Single-id flavor of :func:`x_spark.checkpoints.tracked_ckpt`
    (the shared deterministic-free contract): superseded PageRank /
    components rounds free their blocks the moment the next round is
    pinned."""
    from x_spark.checkpoints import tracked_ckpt

    out, ids = tracked_ckpt(df)
    return out, (ids[0] if ids else None)


def _free_ckpt(df: DataFrame, rdd_id) -> None:
    from x_spark.checkpoints import free_ckpts

    if rdd_id is not None:
        free_ckpts(df.sparkSession, [rdd_id])


def select_survivors(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    order_cols: list | None = None,
) -> DataFrame:
    """One survivor per duplicate component — the step AFTER clustering
    in a dedup pipeline: drop every duplicate but the best
    representative. Documents in no component survive as their own
    singleton cluster.

    ``order_cols`` ranks candidates (first row wins; default: longest
    text via a caller-provided column, falling back to min id). The
    rank runs per component — one shuffle on the component key; the
    survivor set is exactly one row per component.
    """
    from pyspark.sql import Window as W

    comp = components.select(
        F.col("node").alias(id_col), F.col("component")
    )
    labeled = docs.join(comp, id_col, "left_outer").withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )
    order = (order_cols or []) + [F.asc(id_col)]
    w = W.partitionBy("component").orderBy(*order)
    sized = W.partitionBy("component")
    return (
        labeled.withColumn("cluster_size", F.count("*").over(sized))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def connected_components(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iterations: int = 20,
    pairs_distinct: bool = False,
    broadcast_max_nodes: int = 1_000_000,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = min node id reachable (deterministic labeling).

    ``pairs_distinct=True`` promises the input holds distinct pairs
    with ``left < right`` (true for every candidate-pair generator in
    this repo — each either ends in an explicit distinct or is
    distinct by construction, e.g. embedding_near_dup_pairs' unique
    home-cell join with zero-norm vectors guarded out) and skips the
    defensive dedup shuffle on the doubled edge list: the reversed
    union of strictly-ordered distinct pairs cannot collide.

    When the measured node count is at most ``broadcast_max_nodes``
    the per-round label table is broadcast (mirrors
    ``pagerank(broadcast_max_nodes=...)``): the pinned edge list is
    then never shuffled inside the loop — each round's only exchange
    is the min-label aggregation. Above the bound the loop keeps the
    co-partitioned shuffle plan, so the 100-TB shape is unchanged; the
    gate is a measured size, not a local-mode constant. The initial
    label table is also pinned once so round 1 does not recompute the
    node-distinct twice (union side + join side)."""
    spark = pairs.sparkSession
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # candidate-pair graphs are tiny relative to the corpus; per-round
    # jobs are scheduler-bound, so size the shuffles down
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        e = pairs.select(F.col(left_col).alias("a"), F.col(right_col).alias("b"))
        doubled = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        if not pairs_distinct:
            doubled = doubled.distinct()
        edges, edges_id = _tracked_ckpt(doubled)
        # ROUND 1 computed at init: with the trivial node->node seed,
        # the first propagation round's output is exactly
        # min({node} ∪ neighbors) = least(node, min(neighbor)) — one
        # aggregation over the doubled edge list. Seeding with it
        # collapses the old init (node-distinct + checkpoint) AND the
        # first loop round (join + union + min-agg + checkpoint) into
        # this single checkpointed aggregation; the node set is the
        # same (every node appears as `a` in the doubled list).
        labels, labels_id = _tracked_ckpt(
            edges.groupBy("a").agg(F.min("b").alias("_mb")).select(
                F.col("a").alias("node"),
                F.least(F.col("a"), F.col("_mb")).alias("component"),
            )
        )
        # one scalar job over the materialized checkpoint gates the
        # broadcast plan (node count) AND seeds the convergence sum —
        # so a graph that is stable after round 1 breaks out of the
        # loop after a single iteration
        n_nodes, prev_sum = labels.agg(
            F.count("*"), F.sum("component")
        ).first()
        small = n_nodes <= broadcast_max_nodes
        prev_id = labels_id
        for _ in range(max_iterations):
            lbl = F.broadcast(labels) if small else labels
            neighbor_labels = edges.join(
                lbl, edges["b"] == lbl["node"], "inner"
            ).select(edges["a"].alias("node"), F.col("component"))
            labels, new_id = _tracked_ckpt(
                labels.unionByName(neighbor_labels)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
            )
            # the new checkpoint is materialized (eager) and its blocks
            # are independent of the previous round's — free them now
            _free_ckpt(labels, prev_id)
            prev_id = new_id
            # labels only ever decrease, so an unchanged sum IS the
            # fixpoint — one scalar agg per round, no compare join
            cur_sum = labels.agg(F.sum("component")).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        _free_ckpt(edges, edges_id)
        # the final labels checkpoint stays alive for the caller; it is
        # freed when the JVM collects the handle (or by an explicit
        # block-manager sweep, as bench.py does between queries)
        return labels
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    edges_distinct: bool = False,
    broadcast_max_nodes: int = 1_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the
    link-graph quality signal corpus curation uses to rank sources
    (CommonCrawl-style centrality as a document prior).

    Semantics (mirrored expression-for-expression by the SQL oracle):
    ``r0 = 1/N``; each round
    ``r(v) = (1-d)/N + d * sum_{u->v}(r(u) / outdeg(u))``, with the
    per-edge contribution cast to DECIMAL(30,6) before the sum (exact,
    association-order independent — a raw double sum would not
    hash-match any oracle) and the closed form back in double.
    Dangling-node mass is NOT redistributed (the teleport term alone
    reaches no-inbound nodes) — the standard simplification when the
    output is a RANKING signal; document rankings are unaffected
    because the dropped mass scales every node uniformly at the same
    in-degree structure.

    Scale shape: per round ONE join (ranks x out-degree-annotated
    edges) and ONE aggregation; ``_tracked_ckpt`` cuts lineage each
    round and frees the superseded round's blocks, so plan depth and
    storage stay O(1) in ``n_iter``. When the measured node count is
    at most ``broadcast_max_nodes`` the per-round rank and inflow
    tables are broadcast (a node row is tens of bytes, so the default
    bounds the relation near 100 MB) — the edge table is then never
    shuffled inside the loop; above the bound the joins fall back to
    the co-partitioned shuffle plan. The only driver values are the
    node count and loop control — rank data never leaves the cluster.

    ``edges_distinct=True`` promises the input is already a distinct
    edge list and skips the defensive dedup shuffle (mirrors
    ``connected_components(pairs_distinct=...)``).

    Returns (node, rank), rank unrounded double.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    # pin the edge list once: nodes, out-degrees and the annotated
    # edge table all derive from it (previously the upstream
    # join+distinct re-ran for each derivation)
    e, e_id = _tracked_ckpt(e)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes, nodes_id = _tracked_ckpt(nodes)
    n_total = nodes.count()
    if n_total == 0:
        _free_ckpt(nodes, nodes_id)
        _free_ckpt(e, e_id)
        # a freed checkpoint cannot be recomputed — return a fresh
        # empty frame instead of the unpersisted one
        return edges.sparkSession.createDataFrame(
            [], "node string, rank double"
        )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    annotated, ann_id = _tracked_ckpt(e.join(outdeg, "src"))
    # nodes and annotated are pinned (eager checkpoints) — the raw
    # edge blocks are no longer reachable from the loop
    _free_ckpt(e, e_id)
    small = n_total <= broadcast_max_nodes
    teleport = (1.0 - damping) / n_total
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_total))
    prev_id = None
    for _ in range(n_iter):
        r = F.broadcast(ranks) if small else ranks
        contrib = annotated.join(r, annotated["src"] == r["node"]).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("outdeg")).cast("decimal(30,6)").alias("c"),
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").cast("double").alias("inflow"))
        ranks, new_id = _tracked_ckpt(
            nodes.join(
                F.broadcast(inflow) if small else inflow, "node", "left"
            ).select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        )
        _free_ckpt(ranks, prev_id)
        prev_id = new_id
    _free_ckpt(ranks, ann_id)
    _free_ckpt(ranks, nodes_id)
    return ranks
