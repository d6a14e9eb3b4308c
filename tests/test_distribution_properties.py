"""Property tests for the late-round-5 operators: trimmed_stats and
value_histogram vs sequential Python references on random data, and
structural invariants for pagerank and tfidf."""

import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from x_spark.operators.keywords import tfidf_topk_terms
from x_spark.operators.profile import trimmed_stats, value_histogram

_vals = st.lists(
    st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=60
)


@settings(max_examples=12, deadline=None)
@given(vals=_vals, trim_pct=st.integers(min_value=0, max_value=20))
def test_trimmed_stats_matches_sequential_reference(spark, vals, trim_pct):
    trim = trim_pct / 100.0
    df = spark.createDataFrame(
        [("g", float(v) / 100.0, i) for i, v in enumerate(vals)],
        "g string, v double, i int",
    )
    rows = trimmed_stats(df, "v", ["g"], ["i"], trim_frac=trim).collect()
    # Python reference: sort by (v, i), drop floor(n*trim) each side
    seq = sorted((float(v) / 100.0, i) for i, v in enumerate(vals))
    lo = math.floor(len(seq) * trim)
    kept = seq[lo: len(seq) - lo]
    if not kept:
        assert rows == []
        return
    (r,) = rows
    assert r.n_total == len(seq) and r.n_kept == len(kept)
    assert r.trimmed_min == kept[0][0] and r.trimmed_max == kept[-1][0]
    assert abs(r.trimmed_mean - round(sum(v for v, _ in kept) / len(kept), 6)) < 1e-6


@settings(max_examples=12, deadline=None)
@given(vals=_vals, width=st.sampled_from([0.5, 1.0, 25.0]))
def test_histogram_partitions_all_rows(spark, vals, width):
    df = spark.createDataFrame(
        [(float(v) / 100.0,) for v in vals], "v double"
    )
    rows = value_histogram(df, "v", width=width).collect()
    # buckets partition the input: counts sum to n, shares to 1
    assert sum(r.n_rows for r in rows) == len(vals)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    # reference bucketing replicating the operator's float path: the
    # double column scales by 100 then FLOORS (toward -inf — matches
    # the operator's floor-at-unit-scaling), then floor-divides by the
    # width units
    wunits = int(round(width * 100))
    ref = {}
    for v in vals:
        units = math.floor(float(v) / 100.0 * 100)
        b = math.floor(units / wunits)
        ref[b] = ref.get(b, 0) + 1
    assert {r.bucket: r.n_rows for r in rows} == ref


def test_pagerank_mass_bounded_and_monotone_in_inlinks(spark):
    from x_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x"), ("a", "y")],
        "src string, dst string",
    )
    out = {r.node: r.rank for r in pagerank(edges, n_iter=6).collect()}
    # total mass never exceeds 1 (dangling mass is dropped, not created)
    assert sum(out.values()) <= 1.0 + 1e-9
    # more in-links (same link quality) => strictly higher rank
    assert out["x"] > out["y"]
    assert all(v > 0 for v in out.values())  # teleport floor


def test_tfidf_ranks_dense_and_bounded(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 3} common w{i % 5} common") for i in range(20)],
        "doc_id long, text string",
    )
    out = tfidf_topk_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.term_rank)
    # every doc present, ranks dense 1..k, no duplicates
    assert set(by_doc) == set(range(20))
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_doc.values())
    assert all(len(v) <= 2 for v in by_doc.values())
