"""Repetition signals + benchmark-contamination operators
(LLM-pipeline quality family, SURVEY §7 Phase E).

The registry queries exercise these on the synthetic documents table
(no newlines, tiny vocabulary); these tests pin the semantics on
constructed documents where every signal is non-vacuous.
"""

import math

import pytest
from pyspark.sql import functions as F

from x_spark.operators.text import contamination_check, repetition_signals


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_signals_on_constructed_docs(spark):
    docs = _df(
        spark,
        [
            # 4 lines, 2 distinct; 8 tokens (\s+ spans newlines),
            # 3 distinct; "spam spam" occurs 3x in doc 2
            (1, "a b\na b\nc c\nc c"),
            (2, "spam spam spam spam"),
            (3, "all distinct tokens here"),
            (4, ""),  # empty: every signal 0
        ],
    )
    out = {
        r["doc_id"]: r
        for r in repetition_signals(docs)
        .select("doc_id", "dup_line_fraction", "dup_token_fraction", "max_2gram_run")
        .collect()
    }
    assert out[1]["dup_line_fraction"] == pytest.approx(0.5)
    assert out[1]["dup_token_fraction"] == pytest.approx(1 - 3 / 8)
    assert out[2]["max_2gram_run"] == 3  # "spam spam" at positions 1,2,3
    assert out[2]["dup_token_fraction"] == pytest.approx(0.75)
    assert out[3]["dup_token_fraction"] == 0.0
    assert out[3]["max_2gram_run"] == 1
    assert out[4]["dup_line_fraction"] == 0.0
    assert out[4]["dup_token_fraction"] == 0.0
    assert out[4]["max_2gram_run"] == 0


def test_chunking_windows_and_overlap(spark):
    from x_spark.operators.text import chunk_documents

    toks = " ".join(f"t{i}" for i in range(1, 31))  # 30 tokens
    docs = _df(spark, [(1, toks), (2, "a b c"), (3, "")])
    out = chunk_documents(docs, chunk_tokens=10, overlap=2).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 1, 9, 17, 25 (stride 8); last chunk has 6 tokens
    assert [(r.start_token, r.n_chunk_tokens) for r in by_doc[1]] == [
        (1, 10), (9, 10), (17, 10), (25, 6),
    ]
    assert by_doc[1][0].chunk_text.startswith("t1 t2 ")
    # consecutive chunks share exactly `overlap` tokens
    a = by_doc[1][0].chunk_text.split()
    b = by_doc[1][1].chunk_text.split()
    assert a[-2:] == b[:2]
    # short doc: single chunk; empty doc: no chunks
    assert [(r.start_token, r.n_chunk_tokens) for r in by_doc[2]] == [(1, 3)]
    assert 3 not in by_doc
    # a trailing start adding <= overlap new tokens is suppressed:
    # 26 tokens, chunk 10/overlap 2 -> starts 1, 9, 17 (25 would add 2)
    short = _df(spark, [(9, " ".join(f"x{i}" for i in range(26)))])
    st = sorted(
        r.start_token
        for r in chunk_documents(short, chunk_tokens=10, overlap=2).collect()
    )
    assert st == [1, 9, 17]


def test_contamination_flags_only_true_overlaps(spark):
    bench = _df(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _df(
        spark,
        [
            # verbatim 8-token overlap: many shared 5-grams
            (1, "intro text the quick brown fox jumps over the lazy dog outro"),
            # shares tokens but no 5-gram
            (2, "fox dog quick brown the lazy over jumps"),
            (3, "completely unrelated words about training data pipelines"),
        ],
    )
    hits = contamination_check(corpus, bench, min_shared=3, n=5).collect()
    assert {(r.train_id, r.eval_id) for r in hits} == {(1, 100)}
    assert hits[0].shared_ngrams >= 3


def test_contamination_counts_distinct_ngrams_once(spark):
    # the same contaminated n-gram repeated in a training doc counts
    # once (hashes are per-doc distinct), so spammy repetition can't
    # inflate shared_ngrams past the true overlap
    bench = _df(spark, [(100, "one two three four five")])
    corpus = _df(spark, [(1, "one two three four five one two three four five")])
    hits = contamination_check(corpus, bench, min_shared=1, n=5).collect()
    assert len(hits) == 1
    # doc 1 holds 6 distinct 5-grams, only those matching bench count
    assert hits[0].shared_ngrams == 1  # bench has exactly one 5-gram


# -- corpus line dedup (C4 boilerplate rule) ---------------------------------
def test_line_dedup_keeps_first_occurrence_only(spark):
    from x_spark.operators.text import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "unique alpha\ncommon footer\n\nrare line"),
            (2, "unique beta\ncommon footer"),
            (3, "common footer"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    # doc 1 holds the global first occurrence of the footer; blank kept
    assert out[1]["clean_text"] == "unique alpha\ncommon footer\n\nrare line"
    assert out[1]["n_removed"] == 0
    # later occurrences dropped
    assert out[2]["clean_text"] == "unique beta"
    assert out[2]["n_removed"] == 1
    # a doc that is ALL boilerplate survives with empty text
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_kept"], out[3]["n_removed"]) == (0, 1)


def test_line_dedup_threshold(spark):
    from x_spark.operators.text import line_dedup

    docs = spark.createDataFrame(
        [(1, "pair line"), (2, "pair line")], "doc_id bigint, text string"
    )
    # min_count=3: a line must occur 3+ times to count as boilerplate
    out = {r["doc_id"]: r["clean_text"] for r in line_dedup(docs, min_count=3).collect()}
    assert out == {1: "pair line", 2: "pair line"}


def test_line_dedup_normalizes_case_and_whitespace(spark):
    from x_spark.operators.text import line_dedup

    docs = spark.createDataFrame(
        [(1, "Common Footer"), (2, "  common footer  ")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert out[1]["n_kept"] == 1  # first occurrence, original casing kept
    assert out[1]["clean_text"] == "Common Footer"
    assert out[2]["n_kept"] == 0


# -- sequence packing --------------------------------------------------------
def test_prefix_offsets_match_global_cumsum_any_bucketing(spark):
    from pyspark.sql import Window, functions as F

    from x_spark.operators.packing import token_prefix_offsets

    docs = spark.createDataFrame(
        [(i * 7 + 3, " ".join(["tok"] * (i % 5 + 1))) for i in range(40)],
        "doc_id bigint, text string",
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    expect = sorted(
        tuple(r)
        for r in docs.select(
            "doc_id",
            F.coalesce(
                F.sum(F.expr(r"regexp_count(text, '\\S+')")).over(w), F.lit(0)
            ).alias("start_offset"),
        ).collect()
    )
    for n_buckets in (1, 3, 32, 1000):
        got = sorted(
            (r["doc_id"], r["start_offset"])
            for r in token_prefix_offsets(docs, n_buckets=n_buckets).collect()
        )
        assert got == expect, f"n_buckets={n_buckets}"


def test_pack_sequences_straddles_boundaries(spark):
    from x_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1, " ".join(["t"] * 6)), (2, " ".join(["t"] * 6)), (3, "t")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in pack_sequences(docs, capacity=8).collect()}
    # doc 1: tokens 0-5 -> seq 0; doc 2: tokens 6-11 straddles 0/1
    assert (rows[1]["first_seq"], rows[1]["last_seq"], rows[1]["n_seqs"]) == (0, 0, 1)
    assert (rows[2]["first_seq"], rows[2]["last_seq"], rows[2]["n_seqs"]) == (0, 1, 2)
    assert (rows[3]["first_seq"], rows[3]["last_seq"]) == (1, 1)
    assert rows[3]["start_offset"] == 12


# -- bloom-prefiltered decontamination ---------------------------------------
def test_contamination_bloom_identical_to_exact(spark, sf_dir):
    """The Bloom prefilter must not change the answer (false positives
    die in the exact join) and must actually prune the gram stream."""
    from pyspark.sql import functions as F

    from x_spark.operators.text import (
        bloom_might_contain,
        build_gram_bloom,
        contamination_check,
        contamination_check_bloom,
        ngram_hash_table,
    )
    from x_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    exact = sorted(
        map(tuple, contamination_check(corpus, bench, min_shared=2, n=3).collect())
    )
    bloomed = sorted(
        map(tuple, contamination_check_bloom(corpus, bench, min_shared=2, n=3).collect())
    )
    assert bloomed == exact
    assert exact  # non-vacuous

    # selectivity: the filter passes a strict subset of corpus grams
    b_grams = ngram_hash_table(bench, n=3).select(F.explode("gram_hashes").alias("gh"))
    words = build_gram_bloom(b_grams)
    c_grams = ngram_hash_table(corpus, n=3).select(
        F.explode("gram_hashes").alias("gh")
    ).persist()
    total = c_grams.count()
    passed = c_grams.filter(bloom_might_contain("gh", words)).count()
    c_grams.unpersist()
    assert passed < total, (passed, total)


def test_bloom_has_no_false_negatives(spark):
    """Every member gram must pass the filter — Bloom guarantees no
    false negatives by construction; this pins the bit math."""
    from pyspark.sql import functions as F

    from x_spark.operators.text import bloom_might_contain, build_gram_bloom

    grams = spark.range(0, 3000).select(
        ((F.col("id") * 2654435761) % 4294967291).alias("gh")
    )
    words = build_gram_bloom(grams)
    assert grams.filter(~bloom_might_contain("gh", words)).count() == 0


def test_bloom_false_positive_rate_is_bloom_grade(spark):
    """Probes must not collapse to a low-bit residue check: with ~3k
    members in a 65536-bit filter (k=4), non-member FPR should be well
    under 1% (an affine-mod-2^16 bug measured ~6%)."""
    from pyspark.sql import functions as F

    from x_spark.operators.text import bloom_might_contain, build_gram_bloom

    members = spark.range(0, 3000).select(
        ((F.col("id") * 2654435761) % 4294967291).alias("gh")
    )
    words = build_gram_bloom(members)
    non_members = spark.range(3000, 23000).select(
        ((F.col("id") * 2654435761) % 4294967291).alias("gh")
    )
    fp = non_members.filter(bloom_might_contain("gh", words)).count()
    assert fp / 20000 < 0.01, fp


def test_unigram_logprob_manual(spark):
    from x_spark.operators.text import unigram_logprob

    # corpus: "a a a b" -> cnt(a)=3, cnt(b)=1, total=4
    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    ln, total = math.log, 4.0
    # decimal(30,6) per-token quantization of -ln(cnt), then /n + ln(total)
    q = lambda x: round(x, 6)
    exp1 = round(3 * q(-ln(3.0)) / 3 + ln(total), 6)
    exp2 = round(1 * q(-ln(1.0)) / 1 + ln(total), 6)
    assert out[1].n_tokens == 3 and out[2].n_tokens == 1
    assert abs(out[1].cross_entropy - exp1) < 1e-9
    assert abs(out[2].cross_entropy - exp2) < 1e-9
    # rare-token doc is more "surprising" than the common-token doc
    assert out[2].cross_entropy > out[1].cross_entropy


def test_cross_doc_spans_detects_shared_span(spark):
    from x_spark.operators.text import cross_doc_ngram_spans

    span = "one two three four five six seven eight"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, span + " tail-a unique-a"),
            (2, "head-b " + span + " tail-b"),
            (3, "totally different words with no overlap at all here"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in cross_doc_ngram_spans(docs, n=8).collect()}
    # the 8-token span is the only gram shared between docs 1 and 2
    assert out[1].shared_grams == 1 and out[2].shared_grams == 1
    assert out[1].max_span_docs == 2 and out[2].max_span_docs == 2
    assert out[3].shared_grams == 0 and out[3].max_span_docs == 0
    # doc 1: 10 tokens -> 3 distinct 8-grams; doc 3: 9 tokens -> 2
    assert out[1].total_grams == 3 and out[3].total_grams == 2


# ---------------------------------------------------------------------------
# Property: cross_doc_ngram_spans matches a brute-force Python model.

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_XSETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_xwords = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_xtexts = st.lists(_xwords, min_size=1, max_size=7).map(" ".join)


@_XSETTINGS
@given(st.lists(_xtexts, min_size=1, max_size=6))
def test_cross_doc_spans_matches_model(spark, texts):
    from x_spark.operators.text import cross_doc_ngram_spans

    n = 3
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.total_grams, r.shared_grams, r.max_span_docs)
        for r in cross_doc_ngram_spans(docs, n=n).collect()
    }

    grams = {
        i: {
            tuple(toks[j : j + n])
            for toks in [t.lower().split()]
            for j in range(len(toks) - n + 1)
        }
        for i, t in enumerate(texts)
    }
    from collections import Counter

    df_count = Counter(g for gs in grams.values() for g in gs)
    expect = {}
    for i, gs in grams.items():
        hot = [df_count[g] for g in gs if df_count[g] >= 2]
        expect[i] = (len(gs), len(hot), max(hot, default=0))
    assert got == expect


# -- filter battery with first-fail attribution -------------------------------
def test_filter_rules_first_fail_attribution(spark):
    from pyspark.sql import functions as F

    from x_spark.operators.text import apply_filter_rules, filter_attribution

    docs = spark.createDataFrame(
        [
            (0, "short text"),                                  # too_short (2 tokens)
            (1, " ".join(["normal"] * 20)),                     # PASS
            (2, " ".join(["x"] * 20)),                          # token_shape (avg len 1)
            (3, " ".join(["!!!???!!!"] * 20)),                  # token_shape fires FIRST (avg 9 ok -> punct)
            (4, " ".join(["12345abcde"] * 20)),                 # digit_heavy (0.5 digits)
        ],
        "doc_id long, text string",
    )
    flagged = {r.doc_id: r.first_failed_rule
               for r in apply_filter_rules(docs).collect()}
    assert flagged[0] == "too_short"
    assert flagged[1] is None
    assert flagged[2] == "token_shape"
    assert flagged[3] == "excess_punct"   # avg_token_len 9 passes, punct 0.95 fails
    assert flagged[4] == "digit_heavy"
    report = {r.rule: (r.n_docs, r.share) for r in filter_attribution(docs).collect()}
    assert report["PASS"][0] == 1
    assert sum(n for n, _ in report.values()) == 5
    assert abs(sum(s for _, s in report.values()) - 1.0) < 1e-6


def test_filter_rules_custom_priority_order(spark):
    from pyspark.sql import functions as F

    from x_spark.operators.text import apply_filter_rules

    docs = spark.createDataFrame([(0, "hi")], "doc_id long, text string")
    # same doc violates both; attribution follows the given order
    rules_a = [("r1", F.col("n_tokens") < 10), ("r2", F.col("n_tokens") < 5)]
    rules_b = list(reversed(rules_a))
    got_a = apply_filter_rules(docs, rules_a).collect()[0].first_failed_rule
    got_b = apply_filter_rules(docs, rules_b).collect()[0].first_failed_rule
    assert (got_a, got_b) == ("r1", "r2")
