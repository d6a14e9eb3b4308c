"""connected_components (operators/graph.py): label-propagation vs a
plain union-find reference, across shapes that exercise the seeded
round-1 fast path (component = least(node, min neighbor) computed at
init) and multi-round convergence (chains deeper than one hop)."""

import pytest
from pyspark.sql import functions as F

from x_spark.operators.graph import connected_components


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node id per component — the operator's labeling contract
    comp_min = {}
    for n in list(parent):
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return sorted((n, comp_min[find(n)]) for n in parent)


def _check(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    got = sorted(
        (r.node, r.component)
        for r in connected_components(df, pairs_distinct=True).collect()
    )
    assert got == _union_find(pairs), (got, _union_find(pairs))


def test_star_and_singleton_pairs(spark):
    # star-shaped near-dup clusters (1 hop) + isolated pairs: the
    # common dedup shape — converges on the seeded round alone
    _check(spark, [(1, 5), (1, 9), (1, 12), (20, 21), (30, 31)])


def test_chain_needs_multiple_rounds(spark):
    # a 6-node path: min label must walk 5 hops — exercises the loop
    # well past the seeded round
    _check(spark, [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15)])


def test_merging_clusters_and_bridge(spark):
    # two stars bridged by one edge: the bridge forces labels from one
    # star to flood the other after both have locally converged
    _check(spark, [(1, 2), (1, 3), (50, 51), (50, 52), (3, 52),
                   (100, 101)])


def test_high_node_beats_low_neighbor_ordering(spark):
    # labels must be the MIN reachable id even when edges are listed
    # high-to-low... pairs_distinct requires left < right, so order
    # within pairs is ascending, but cluster discovery order varies
    _check(spark, [(2, 9), (2, 7), (1, 9), (4, 5), (3, 4)])


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(df, pairs_distinct=True).collect() == []


@pytest.mark.parametrize("seed", [7, 23])
def test_random_graph_matches_union_find(spark, seed):
    import random

    rng = random.Random(seed)
    nodes = list(range(60))
    pairs = sorted({
        (min(a, b), max(a, b))
        for a, b in (
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
        )
        if a != b
    })
    _check(spark, pairs)
