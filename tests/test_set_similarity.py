"""Exact set-similarity join (prefix filtering): completeness and
edge-case guarantees.

The prefix-filter candidate stage is the part that can silently lose
pairs (an off-by-one in the prefix length, or a size filter that
rejects a legal pair, drops a result with no error) — so the core test
compares the filtered operator against a brute-force cross join on
corpora engineered to sit ON the threshold boundary.
"""

import itertools

from pyspark.sql import functions as F

from x_spark.operators.dedup import set_similarity_pairs


def _brute_force(rows, num, den):
    """Ground truth on token SETS (plain Python)."""
    sets = {i: set(t.lower().split()) for i, t in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if inter * den >= union * num:
            out[(a, b)] = (inter, union)
    return out


def _run(spark, rows, threshold=(1, 2)):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.id_a, r.id_b): (r.overlap, r.set_union)
        for r in set_similarity_pairs(df, threshold=threshold).collect()
    }
    return got


def test_matches_brute_force_including_boundary_pairs(spark):
    # pairs engineered AT the tau=1/2 boundary: |a n b| * 2 == union
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon zeta"),   # inter 3, union 6 -> J = 1/2 exactly
        (3, "alpha beta gamma delta"),          # identical to 1 -> J = 1
        (4, "completely different words here"),
        (5, "alpha beta"),                      # small set vs 1: inter 2, union 4 -> 1/2
        (6, "zeta"),                            # singleton set
        (7, "zeta"),                            # identical singleton -> J = 1 with 6
        (8, ""),                                # empty doc: never paired
        (9, "ALPHA Beta GAMMA delta"),          # case-folds identical to 1
    ]
    got = _run(spark, rows)
    want = _brute_force(rows, 1, 2)
    assert set(got) == set(want)
    for pair, (inter, union) in want.items():
        assert got[pair] == (inter, union), pair


def test_stricter_rational_threshold(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),  # inter 7, union 9 -> 7/9 >= 3/4? 28 >= 27 yes
        (3, "a b c d x y z w"),  # vs 1: inter 4, union 12 -> below 3/4
    ]
    got = _run(spark, rows, threshold=(3, 4))
    want = _brute_force(rows, 3, 4)
    assert set(got) == set(want)
    assert (1, 2) in got and (1, 3) not in got


def test_duplicate_tokens_collapse_to_sets(spark):
    # token MULTIPLICITY must not matter: these two are set-identical
    rows = [
        (1, "spark spark spark joins data"),
        (2, "data joins spark"),
    ]
    got = _run(spark, rows)
    assert got == {(1, 2): (3, 3)}


def test_jaccard_value_is_exact_ratio(spark):
    rows = [
        (1, "p q r s"),
        (2, "p q r s t u v w"),  # inter 4, union 8 -> exactly 0.5
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    row = set_similarity_pairs(df).collect()[0]
    assert (row.id_a, row.id_b) == (1, 2)
    assert row.jaccard == 0.5
