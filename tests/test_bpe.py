"""BPE trainer: the distributed implementation must reproduce the
classic single-machine algorithm EXACTLY — same merge sequence, same
segmentation — because the merge table is a persisted artifact other
systems consume.

The reference implementation below is the textbook Sennrich'16 loop
(word-frequency dict, weighted pair counts, greedy left-to-right
merge), with the same deterministic tie-break (max count, then
lexicographic pair).
"""

from collections import Counter

from x_spark.operators.bpe import (
    END_OF_WORD,
    apply_merges,
    bpe_encode_pandas,
    train_bpe,
    word_freq_table,
)


# -- pure-Python reference --------------------------------------------------
def _ref_word_freq(texts):
    c = Counter()
    for t in texts:
        c.update(t.lower().split())
    return c


def _ref_merge_word(syms, a, b, fused):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = fused
        else:
            out.append(s)
    return out


def _ref_train(texts, n_merges, min_pair_freq=2):
    wf = {
        tuple(list(w) + [END_OF_WORD]): f for w, f in _ref_word_freq(texts).items()
    }
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for syms, f in wf.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        # max count, ties lexicographic (left, right)
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_freq:
            break
        fused = a + b
        merges.append({"rank": rank, "left": a, "right": b,
                       "merged": fused, "pair_freq": cnt})
        wf = {
            tuple(_ref_merge_word(list(s), a, b, fused)): f for s, f in wf.items()
        }
    return merges


def _ref_segment(text, merges):
    toks = []
    for w in text.lower().split():
        syms = list(w) + [END_OF_WORD]
        for m in merges:
            syms = _ref_merge_word(syms, m["left"], m["right"], m["merged"])
        toks.extend(syms)
    return toks


CORPUS = [
    "the lowest lower lowly low low low",
    "newer newest new news knew",
    "the newer the lower the better",
    "low low lowest newest newest",
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )


def test_merge_sequence_matches_reference(spark):
    got = train_bpe(_df(spark), n_merges=20)
    want = _ref_train(CORPUS, 20)
    assert got == want
    # the corpus genuinely exercises multi-round merging
    assert len(got) >= 8
    # ranks are contiguous and pair_freq never increases out of order
    assert [m["rank"] for m in got] == list(range(len(got)))


def test_word_freq_truncation_is_deterministic(spark):
    full = {r.word: r.freq for r in word_freq_table(_df(spark), max_words=None).collect()}
    top3 = {r.word: r.freq for r in word_freq_table(_df(spark), max_words=3).collect()}
    assert len(top3) == 3
    # the cut keeps the heaviest words, ties by word
    order = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert top3 == dict(order)


def test_apply_merges_matches_reference_segmentation(spark):
    merges = _ref_train(CORPUS, 12)
    seg = {
        r.doc_id: r.bpe_tokens
        for r in apply_merges(_df(spark), merges).select("doc_id", "bpe_tokens").collect()
    }
    for i, t in enumerate(CORPUS):
        assert seg[i] == _ref_segment(t, merges), t


def test_pandas_encoder_agrees_with_jvm_fold(spark):
    merges = train_bpe(_df(spark), n_merges=12)
    jvm = {
        r.doc_id: r.bpe_tokens
        for r in apply_merges(_df(spark), merges).select("doc_id", "bpe_tokens").collect()
    }
    arrow = {r.doc_id: r.bpe_tokens for r in bpe_encode_pandas(_df(spark), merges).collect()}
    assert jvm == arrow


def test_min_pair_freq_stops_training(spark):
    df = spark.createDataFrame([(0, "ab ab cd")], "doc_id bigint, text string")
    # every pair occurs at most twice ("ab" twice, "cd" once)
    merges = train_bpe(df, n_merges=50, min_pair_freq=3)
    assert merges == []
    merges2 = train_bpe(df, n_merges=50, min_pair_freq=2)
    assert merges2 and all(m["pair_freq"] >= 2 for m in merges2)


def test_consecutive_pair_merges_all_occurrences(spark):
    """Regression: in ``a b a b`` BOTH (a,b) pairs must merge in one
    round (a shared-delimiter string representation silently merged
    only the first)."""
    df = spark.createDataFrame(
        [(0, "abab abab abab")], "doc_id bigint, text string"
    )
    merges = train_bpe(df, n_merges=1, min_pair_freq=1)
    assert merges and (merges[0]["left"], merges[0]["right"]) == ("a", "b")
    # BOTH (a,b) occurrences per word counted: freq 3 words x 2 pairs
    assert merges[0]["pair_freq"] == 6
    # and after the merge the segmentation is ab,ab,</w> — pinned by
    # exact agreement with the reference for further rounds
    merges3 = train_bpe(df, n_merges=3, min_pair_freq=1)
    assert merges3 == _ref_train(["abab abab abab"], 3, min_pair_freq=1)


def test_simulation_kernel_fuzz_against_recount_loop():
    """_simulate_merges (the driver-side pair+triple simulation) must
    emit a PREFIX of the recount-after-every-merge sequence on random
    corpora — no Spark involved, so thousands of adversarial cases
    (tiny alphabets: ties, runs, chains, truncated collections) run in
    seconds."""
    import random

    from x_spark.operators.bpe import _simulate_merges

    def pair_counts(wf):
        pc = Counter()
        for syms, f in wf.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        return pc

    def triple_counts(wf):
        tc = Counter()
        for syms, f in wf.items():
            for i in range(len(syms) - 2):
                tc[(syms[i], syms[i + 1], syms[i + 2])] += f
        return tc

    rng = random.Random(20260814)
    for _ in range(2000):
        alpha = rng.choice(["ab", "abc", "abcd"])
        word_freqs = {}
        for _w in range(rng.randint(1, 8)):
            w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 5)))
            word_freqs[w] = word_freqs.get(w, 0) + rng.randint(1, 4)
        wf = {
            tuple(list(w) + [END_OF_WORD]): f for w, f in word_freqs.items()
        }
        mpf = rng.choice([1, 2])
        K = rng.choice([4, 8, 64])
        T = rng.choice([8, 16, 256])
        texts = [" ".join(w for w, f in word_freqs.items() for _ in range(f))]
        want = _ref_train(texts, 12, min_pair_freq=mpf)
        # drive the simulation round-by-round like train_bpe does
        got = []
        state = dict(wf)
        rounds = 0
        while len(got) < 12 and rounds < 40:
            pc = sorted(
                pair_counts(state).items(), key=lambda kv: (-kv[1], kv[0])
            )
            tc = sorted(
                triple_counts(state).items(), key=lambda kv: (-kv[1], kv[0])
            )
            rounds += 1
            if not pc or pc[0][1] < mpf:
                break
            top, trip = pc[:K], tc[:T]
            floor_p = top[-1][1] if len(pc) > K else 0
            floor_t = trip[-1][1] if len(tc) > T else 0
            batch = _simulate_merges(
                top, trip, floor_p, floor_t, 12 - len(got), mpf
            )
            for a, b, pf in batch:
                state = {
                    tuple(_ref_merge_word(list(s), a, b, a + b)): f
                    for s, f in state.items()
                }
                got.append(
                    {
                        "rank": len(got),
                        "left": a,
                        "right": b,
                        "merged": a + b,
                        "pair_freq": pf,
                    }
                )
        assert got == want[: len(got)] and len(got) == len(want), (
            word_freqs,
            mpf,
            K,
            T,
            got,
            want,
        )


def test_batched_trainer_matches_sequential_with_fewer_round_trips(spark):
    """The pair+triple simulation must emit the EXACT sequential merge
    sequence while spending at least 4x fewer driver round-trips on
    the real documents corpus (the verdict's bar; measured, not
    assumed — stats_out records the actual round count)."""
    from x_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    st_b, st_s = {}, {}
    batched = train_bpe(docs, n_merges=12, max_words=10_000, stats_out=st_b)
    sequential = train_bpe(
        docs, n_merges=12, max_words=10_000, batch_merges=1, stats_out=st_s
    )
    assert batched == sequential
    assert st_s["rounds"] == st_s["merges"] == 12
    assert st_b["merges"] == 12
    assert st_b["rounds"] * 4 <= st_b["merges"], st_b


def test_replace_chain_encoder_agrees_with_fold(spark):
    """apply_merges_str (the fast bulk path) must produce the exact
    segmentation of the aggregate-fold path on every doc."""
    from x_spark.operators.bpe import apply_merges_str

    merges = _ref_train(CORPUS, 12)
    fold = {
        r.doc_id: r.bpe_tokens
        for r in apply_merges(_df(spark), merges).select("doc_id", "bpe_tokens").collect()
    }
    chain = {
        r.doc_id: r.bpe_tokens
        for r in apply_merges_str(_df(spark), merges).select("doc_id", "bpe_tokens").collect()
    }
    assert fold == chain


def test_incremental_word_freq_store_trains_identically(spark, tmp_path):
    """An incrementally built word-frequency store must train to the
    IDENTICAL merge table as a from-scratch run over the union of its
    batches — the O(batch)-per-ingest lever (ROADMAP: incremental
    counts across sessions)."""
    from x_spark.operators.bpe import (
        train_bpe,
        train_bpe_from_word_freqs,
        update_word_freq_store,
    )
    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource, TxnAlreadyCommittedException

    texts = [
        "low lower lowest slow slowly",
        "new newer newest news newt",
        "low slow new lower newer low low",
    ]
    batches = [
        spark.createDataFrame([(i, t)], "doc_id bigint, text string")
        for i, t in enumerate(texts)
    ]
    full = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    ds = TxLogDataSource(spark)
    ref = TableRef(path=str(tmp_path / "wf_store"))
    for epoch, b in enumerate(batches):
        update_word_freq_store(ds, ref, b, txn=("ingest", epoch))
    # replayed epoch is exactly-once: counts unchanged
    import pytest as _pytest

    with _pytest.raises(TxnAlreadyCommittedException):
        update_word_freq_store(ds, ref, batches[-1], txn=("ingest", 2))
    store_counts = {r.word: r.freq for r in ds.read(ref).collect()}
    want_counts = {
        r.word: r.freq
        for r in __import__("x_spark.operators.bpe", fromlist=["word_freq_table"])
        .word_freq_table(full, max_words=None).collect()
    }
    assert store_counts == want_counts
    kw = dict(n_merges=8, min_pair_freq=2, max_words=None)
    from_store = train_bpe_from_word_freqs(ds.read(ref), **kw)
    from_scratch = train_bpe(full, **kw)
    assert from_store == from_scratch


def test_encode_corpus_gate_catches_bad_segmentation(spark):
    """The q_bpe_encode_corpus roundtrip gate is a real tripwire: a
    merge table whose fused symbol drops a character must produce
    nonzero rt_fail flags through the same expression."""
    from pyspark.sql import functions as F

    from x_spark.operators.bpe import END_OF_WORD, bpe_encode_pandas

    bad = [{"rank": 0, "left": "a", "right": "b", "merged": "aX"}]
    vocab = spark.createDataFrame([("abc",), ("zzz",)], "word string")
    enc = bpe_encode_pandas(
        vocab.select("word", F.col("word").alias("wtext")),
        bad, text_col="wtext", id_col="word",
    )
    flags = enc.select(
        "word",
        (F.array_join("bpe_tokens", "")
         != F.concat(F.col("word"), F.lit(END_OF_WORD)))
        .cast("int").alias("rt_fail"),
    )
    got = {r.word: r.rt_fail for r in flags.collect()}
    assert got["abc"] == 1  # 'ab' fused to 'aX': roundtrip broken
    assert got["zzz"] == 0  # untouched word still roundtrips
