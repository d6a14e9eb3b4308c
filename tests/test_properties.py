"""Property-based tests (hypothesis): the distributed algebra must
agree with a brute-force single-process model on arbitrary small
inputs — merge (Delta MERGE semantics), as-of join, range join.

Examples are kept small and the count modest because each example is a
full Spark roundtrip; the point is semantic edge coverage (empty
sides, ties, NULL predicates, all-matched / none-matched), which tiny
random tables hit quickly.
"""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from x_spark.operators.merge import merge_frames
from x_spark.operators.temporal import as_of_join, range_join
from x_spark.sources.base import MergeSpec

SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=5)
vals = st.integers(min_value=-3, max_value=3)
tss = st.integers(min_value=0, max_value=20)


@st.composite
def merge_case(draw):
    tgt = draw(
        st.lists(st.tuples(keys, vals, vals), max_size=8, unique_by=lambda r: r[0])
    )
    src = draw(
        st.lists(st.tuples(keys, vals, vals), max_size=8, unique_by=lambda r: r[0])
    )
    upsert = draw(st.booleans())
    return tgt, src, upsert


@SETTINGS
@given(merge_case())
def test_merge_matches_model(spark, case):
    tgt_rows, src_rows, upsert = case
    tgt = spark.createDataFrame(tgt_rows or [(None, None, None)], "pk int, a int, b int")
    if not tgt_rows:
        tgt = tgt.limit(0)
    src = spark.createDataFrame(src_rows or [(None, None, None)], "pk int, a int, b int")
    if not src_rows:
        src = src.limit(0)
    spec = MergeSpec(
        primary_key_columns=["pk"], update_columns=["a"], insert_when_not_matched=upsert
    )
    got = sorted(
        (r.pk, r.a, r.b) for r in merge_frames(tgt, src, spec).collect()
    )

    # model: matched -> a (and pk) from src, b kept; unmatched tgt kept;
    # upsert inserts (pk, a, NULL)
    src_by_pk = {r[0]: r for r in src_rows}
    expect = []
    for pk, a, b in tgt_rows:
        if pk in src_by_pk:
            expect.append((pk, src_by_pk[pk][1], b))
        else:
            expect.append((pk, a, b))
    if upsert:
        tgt_pks = {r[0] for r in tgt_rows}
        for pk, a, b in src_rows:
            if pk not in tgt_pks:
                expect.append((pk, a, None))
    assert got == sorted(expect)


@st.composite
def asof_case(draw):
    left = draw(st.lists(st.tuples(keys, tss), max_size=8))
    right = draw(
        st.lists(st.tuples(keys, tss, vals), max_size=8, unique_by=lambda r: (r[0], r[1]))
    )
    return left, right


@SETTINGS
@given(asof_case())
def test_asof_join_matches_model(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)] or [(0, None, None)],
        "lid int, k int, ts int",
    )
    if not left_rows:
        left = left.limit(0)
    right = spark.createDataFrame(
        right_rows or [(None, None, None)], "k int, ts int, v int"
    )
    if not right_rows:
        right = right.limit(0)
    out = as_of_join(
        left, right, key_cols=["k"], right_payload=["v"], tiebreak="v"
    )
    got = sorted((r.lid, r.v_asof, r.asof_ts) for r in out.collect())

    expect = []
    for i, (k, t) in enumerate(left_rows):
        cands = [r for r in right_rows if r[0] == k and r[1] <= t]
        if cands:
            best = max(cands, key=lambda r: (r[1], r[2]))  # latest ts, tiebreak v
            expect.append((i, best[2], best[1]))
        else:
            expect.append((i, None, None))
    assert got == sorted(expect)


@st.composite
def scd2_case(draw):
    # open dim rows: unique keys with an attribute
    dim = draw(st.lists(st.tuples(keys, vals), max_size=6, unique_by=lambda r: r[0]))
    changes = draw(st.lists(st.tuples(keys, vals), max_size=6, unique_by=lambda r: r[0]))
    return dim, changes


@SETTINGS
@given(scd2_case())
def test_scd2_matches_model(spark, case):
    from x_spark.operators.scd import scd2_apply

    dim_rows, change_rows = case
    dim = spark.createDataFrame(
        [(k, a, 100, None) for k, a in dim_rows] or [(None,) * 4],
        "k int, attr int, valid_from int, valid_to int",
    )
    if not dim_rows:
        dim = dim.limit(0)
    changes = spark.createDataFrame(
        [(k, a, 200) for k, a in change_rows] or [(None,) * 3],
        "k int, attr int, ts int",
    )
    if not change_rows:
        changes = changes.limit(0)
    got = sorted(
        (r.k, r.attr, r.valid_from, r.valid_to)
        for r in scd2_apply(dim, changes, ["k"], ["attr"]).collect()
    )

    ch = {k: a for k, a in change_rows}
    expect = []
    for k, a in dim_rows:
        if k in ch and ch[k] != a:
            expect.append((k, a, 100, 200))  # closed
            expect.append((k, ch[k], 200, None))  # reopened
        else:
            expect.append((k, a, 100, None))  # kept
    dim_keys = {k for k, _ in dim_rows}
    for k, a in change_rows:
        if k not in dim_keys:
            expect.append((k, a, 200, None))  # new key
    assert got == sorted(expect)


@SETTINGS
@given(
    st.lists(st.tuples(keys, tss), max_size=8),
    st.lists(st.tuples(keys, tss), max_size=8),
)
def test_range_join_matches_model(spark, lrows, rrows):
    # window: right_ts in [left_ts - 4, left_ts)
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)] or [(0, None, None)],
        "lid int, k int, tsec int",
    ).withColumn("ts", F.expr("timestamp_seconds(tsec)"))
    if not lrows:
        left = left.limit(0)
    right = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(rrows)] or [(0, None, None)],
        "rid int, k int, tsec int",
    ).withColumn("ts", F.expr("timestamp_seconds(tsec)"))
    if not rrows:
        right = right.limit(0)
    out = range_join(left, right, ["k"], lower_sec=-4.0, upper_sec=0.0)
    got = sorted((r.lid, r.rid_r) for r in out.collect())

    expect = sorted(
        (i, j)
        for i, (lk, lt) in enumerate(lrows)
        for j, (rk, rt) in enumerate(rrows)
        if lk == rk and lt - 4 <= rt < lt
    )
    assert got == expect


def test_priority_sample_weight_bias_and_determinism(spark):
    from x_spark.operators.sampling import priority_sample

    rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "k bigint, w double")
    s1 = {r.k for r in priority_sample(df, "w", 200, "k").collect()}
    s2 = {r.k for r in priority_sample(df.repartition(7), "w", 200, "k").collect()}
    assert s1 == s2 and len(s1) == 200  # partitioning-independent
    heavy = sum(1 for k in s1 if k % 2 == 0)
    assert heavy > 140  # 10x weight must dominate (expected ~180/200)


def test_mix_corpus_hits_quota_exactly(spark):
    from x_spark.operators.sampling import mix_corpus

    rows = [(i, "a" if i < 600 else ("b" if i < 900 else "c")) for i in range(1000)]
    df = spark.createDataFrame(rows, "k bigint, src string")
    out = mix_corpus(df, "src", {"a": 0.5, "b": 0.3, "c": 0.2}, "k")
    got = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # scarcest source: c has 100 rows / 0.2 -> T = 500
    assert got == {"a": 250, "b": 150, "c": 100}
    # deterministic under repartitioning
    out2 = mix_corpus(df.repartition(13), "src", {"a": 0.5, "b": 0.3, "c": 0.2}, "k")
    assert sorted(r.k for r in out.collect()) == sorted(r.k for r in out2.collect())


def test_priority_sample_rejects_bad_weights(spark):
    """Zero, negative, and NULL weights silently skew the race
    (+Inf priority excludes, negative sorts first, NULL drops) —
    they must raise instead."""
    import pytest
    from pyspark.sql.utils import PythonException

    from x_spark.operators.sampling import priority_sample

    for bad in (0.0, -2.0, None):
        rows = [(1, 5.0), (2, bad), (3, 1.0)]
        df = spark.createDataFrame(rows, "k bigint, w double")
        with pytest.raises(Exception, match="must be finite and > 0"):
            priority_sample(df, "w", 2, "k").collect()


# -- round-3 operator invariants ---------------------------------------------
def test_line_dedup_is_idempotent(spark):
    """Deduping an already-deduped corpus changes nothing: after the
    first pass every surviving normalized line occurs at most once."""
    from x_spark.operators.text import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared footer\nbeta"),
            (2, "shared footer\ngamma\nshared footer"),
            (3, "delta\nshared footer"),
        ],
        "doc_id bigint, text string",
    )
    once = line_dedup(docs).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = line_dedup(once).select("doc_id", "clean_text", "n_removed")
    rows = {r["doc_id"]: r for r in twice.collect()}
    assert all(r["n_removed"] == 0 for r in rows.values()), rows
    got_once = {r["doc_id"]: r["text"] for r in once.collect()}
    got_twice = {k: r["clean_text"] for k, r in rows.items()}
    assert got_once == got_twice


def test_sequence_packing_conserves_tokens_and_tiles(spark):
    """Offsets tile the token stream exactly: sorted by doc_id, each
    start_offset equals the previous doc's start+count, and the final
    end equals the corpus token total."""
    from x_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * ((i * 13) % 9 + 1))) for i in range(60)],
        "doc_id bigint, text string",
    )
    rows = sorted(
        (r["doc_id"], r["start_offset"], r["n_tokens"])
        for r in pack_sequences(docs, capacity=32, n_buckets=5).collect()
    )
    expect_off = 0
    for _, off, n in rows:
        assert off == expect_off
        expect_off += n
    assert expect_off == sum(n for _, _, n in rows)


def test_prefix_offsets_plan_has_no_single_partition_exchange(spark):
    """The distributed prefix sum must never plan a global
    single-partition sort/exchange — that is exactly the scale bug the
    two-stage scan exists to avoid."""
    from x_spark.operators.packing import token_prefix_offsets

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], "doc_id bigint, text string"
    )
    plan = (
        token_prefix_offsets(docs, n_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan, plan


# -- exact set-similarity join ----------------------------------------------
# Property: the prefix-filtered join returns EXACTLY the brute-force
# pair set at the threshold — no pair missed (the prefix lemma), none
# extra (the verification stage). Random small corpora from a tiny
# alphabet maximize boundary collisions.
_words = st.sampled_from(["a", "b", "c", "ab", "x", "yz", "q"])
_doc = st.lists(_words, min_size=0, max_size=6).map(" ".join)
_thresholds = st.sampled_from([(1, 2), (1, 3), (2, 3), (3, 4), (1, 1)])


@st.composite
def setjoin_case(draw):
    docs = draw(st.lists(_doc, min_size=2, max_size=8))
    thr = draw(_thresholds)
    return list(enumerate(docs)), thr


@SETTINGS
@given(setjoin_case())
def test_set_similarity_matches_brute_force(spark, case):
    import itertools

    from x_spark.operators.dedup import set_similarity_pairs

    rows, (num, den) = case
    sets = {i: set(t.split()) for i, t in rows}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter, union = len(sa & sb), len(sa | sb)
        if inter * den >= union * num:
            want[(a, b)] = (inter, union)

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.id_a, r.id_b): (r.overlap, r.set_union)
        for r in set_similarity_pairs(df, threshold=(num, den)).collect()
    }
    assert got == want


# -- BPE trainer ------------------------------------------------------------
# Property: the distributed trainer reproduces the reference loop
# EXACTLY on arbitrary corpora — merge sequence, tie-breaks, stop
# condition. Tiny alphabet + short words maximize pair-count ties.
_bpe_word = st.text(alphabet="abc", min_size=1, max_size=4)
_bpe_doc = st.lists(_bpe_word, min_size=1, max_size=5).map(" ".join)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_bpe_doc, min_size=1, max_size=4), st.integers(1, 4))
def test_bpe_trainer_matches_reference(spark, docs, n_merges):
    from tests.test_bpe import _ref_train
    from x_spark.operators.bpe import train_bpe

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id bigint, text string"
    )
    got = train_bpe(df, n_merges=n_merges, min_pair_freq=2)
    assert got == _ref_train(docs, n_merges, min_pair_freq=2)


def test_temperature_mix_flattens_distribution(spark):
    from x_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    kept = temperature_mix(df, "source", "doc_id", alpha=0.5)
    sizes = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # quota algebra: w=(20,10), min ratio = min(400/20, 100/10)=10
    # -> quotas floor(20*10)=200 (big), floor(10*10)=100 (small)
    assert sizes == {"big": 200, "small": 100}
    # the scarce source binds fully; the big one is downsampled toward
    # sqrt-proportional share: 2:1 instead of the natural 4:1
    # alpha=1 reduces to the natural distribution (everything kept)
    nat = temperature_mix(df, "source", "doc_id", alpha=1.0)
    assert nat.count() == 500
    # determinism across partitionings
    a = sorted(map(tuple, kept.collect()))
    b = sorted(map(tuple, temperature_mix(df.repartition(7), "source", "doc_id").collect()))
    assert a == b
    import pytest

    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, "source", "doc_id", alpha=0.0)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.integers(min_value=1, max_value=120),
    st.integers(min_value=1, max_value=9),
    st.text(alphabet="abc:0", min_size=0, max_size=6),
)
def test_shuffle_shards_is_a_partitioned_permutation(spark, n, shards, seed):
    """Property: for ANY corpus size, shard count, and seed, the shard
    map is a bijection onto (shard, dense positions) — every id
    appears exactly once, positions per shard are 0..len-1, and the
    map is invariant under input partitioning."""
    from x_spark.operators.shards import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    rows = shuffle_shards(df, shards, seed=seed).collect()
    assert sorted(r.doc_id for r in rows) == list(range(n))
    by_shard = {}
    for r in rows:
        assert 0 <= r.shard_id < shards
        by_shard.setdefault(r.shard_id, []).append(r.pos_in_shard)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    again = shuffle_shards(df.repartition(5), shards, seed=seed).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # key
            st.integers(min_value=0, max_value=5000),   # seconds offset
            st.floats(min_value=-100, max_value=100,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1, max_size=20,
    ),
    st.integers(min_value=30, max_value=600),
)
def test_resample_locf_matches_python_reference(spark, rows, step_sec):
    """Property: the distributed LOCF grid equals a direct Python
    reference (bucketize, last-ts-wins with value tie-break, dense
    range, carry forward) on arbitrary event sets."""
    import datetime as dt

    from x_spark.operators.timeseries import resample_locf

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(k, t0 + dt.timedelta(seconds=s), v) for k, s, v in rows],
        "user_id bigint, ts timestamp, value double",
    )
    got = {
        (r.user_id, r.bucket_us): (r.value, r.filled)
        for r in resample_locf(df, "user_id", "ts", "value", step_sec).collect()
    }
    # python reference
    base_us = int(t0.timestamp()) * 1_000_000
    step = step_sec * 1_000_000
    per_key = {}
    for k, s, v in rows:
        us = base_us + s * 1_000_000
        b = (us // step) * step
        cur = per_key.setdefault(k, {}).get(b)
        if cur is None or (us, v) > cur[0]:
            per_key[k][b] = ((us, v), v)
    want = {}
    for k, buckets in per_key.items():
        lo, hi = min(buckets), max(buckets)
        carry = None
        b = lo
        while b <= hi:
            if b in buckets:
                carry = buckets[b][1]
                want[(k, b)] = (carry, False)
            else:
                want[(k, b)] = (carry, True)
            b += step
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 12)),  # (quality, n words)
        min_size=1, max_size=25,
    ),
    st.integers(min_value=0, max_value=120),
)
def test_token_budget_matches_sequential_cut(spark, rows, budget):
    """Property: the distributed two-stage budget cut equals the plain
    sequential rule — sort by (quality desc, id), accumulate token
    counts, keep while <= budget — for arbitrary corpora and budgets,
    regardless of bucketing."""
    from x_spark.operators.sampling import select_token_budget

    data = [(i, q, "w " * n) for i, (q, n) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id bigint, q int, text string")
    got = sorted(
        (r.doc_id, r.running_total)
        for r in select_token_budget(df, budget, "q", n_buckets=5).collect()
    )
    want, acc = [], 0
    for i, q, text in sorted(data, key=lambda t: (-t[1], t[0])):
        acc += len(text.split())
        if acc > budget:
            break
        want.append((i, acc))
    assert got == sorted(want)
