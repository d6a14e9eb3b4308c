"""Cross-doc span REMOVAL (operators/text.scrub_cross_doc_spans):
rewritten text must match an independent per-corpus Python reference
(global-first-survivor, merged overlapping spans, literal splice)."""

import pytest
from pyspark.sql import functions as F

from x_spark.operators.text import scrub_cross_doc_spans


def _reference(docs: dict[int, str], n=6, min_docs=2):
    """Straight-line reimplementation: positions from the
    join-identity tokenization, doc-frequency over exact gram strings,
    keep the (doc_id, start)-smallest occurrence, merge intervals,
    splice."""
    occs = {}  # gram -> list[(doc, start, end)]
    for d, text in docs.items():
        toks = text.split(" ")
        starts, pos = [], 0
        for t in toks:
            starts.append(pos)
            pos += len(t) + 1
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i:i + n])
            occs.setdefault(g, []).append(
                (d, starts[i], starts[i + n - 1] + len(toks[i + n - 1]))
            )
    cuts = {d: [] for d in docs}
    for g, lst in occs.items():
        if len({d for d, *_ in lst}) < min_docs:
            continue
        for d, s, e in sorted(lst)[1:]:
            cuts[d].append((s, e))
    out = {}
    for d, text in docs.items():
        spans = sorted(cuts[d])
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        pieces, pos = [], 0
        for s, e in merged:
            pieces.append(text[pos:s])
            pos = e
        pieces.append(text[pos:])
        out[d] = ("".join(pieces), sum(e - s for s, e in merged),
                  sum(1 for _ in spans))
    return out


def _run(spark, docs, n=6, min_docs=2):
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.text_scrubbed, r.chars_removed, r.spans_cut)
        for r in scrub_cross_doc_spans(df, n=n, min_docs=min_docs).collect()
    }
    assert got == _reference(docs, n=n, min_docs=min_docs)
    return got


def test_simple_cross_doc_cut(spark):
    shared = "one two three four five six"
    docs = {
        1: f"alpha {shared} omega",
        2: f"{shared} tail words here",
        3: "an unrelated document with its own words",
    }
    got = _run(spark, docs)
    # doc 1 owns the survivor (smallest doc_id): untouched
    assert got[1][0] == docs[1] and got[1][1] == 0
    # doc 2 lost the literal span
    assert shared not in got[2][0]
    assert got[2][1] == len(shared)
    assert len(got[2][0]) == len(docs[2]) - len(shared)
    assert got[3][0] == docs[3]


def test_overlapping_spans_merge(spark):
    # an 8-token duplicated run yields 3 overlapping 6-gram cuts in the
    # copy; merged removal must count each char once
    run = "a b c d e f g h"
    docs = {1: f"{run} x", 2: f"start {run} end"}
    got = _run(spark, docs)
    assert got[1][0] == docs[1]
    assert got[2][1] == len(run)
    assert len(got[2][0]) == len(docs[2]) - len(run)


def test_within_doc_repeats_also_cut(spark):
    # second occurrence inside the SAME doc as the survivor is cut too
    g = "p q r s t u"
    docs = {1: f"{g} mid {g}", 2: f"pre {g} post"}
    got = _run(spark, docs)
    assert got[1][0].startswith(g)
    assert got[1][1] == len(g)
    assert got[2][1] == len(g)


def test_length_identity_on_corpus(spark, sf_dir):
    from x_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    out = scrub_cross_doc_spans(docs, n=6).join(
        docs.select("doc_id", F.length("text").alias("orig_len")), "doc_id"
    )
    bad = out.filter(
        F.length("text_scrubbed") != F.col("orig_len") - F.col("chars_removed")
    ).count()
    assert bad == 0
    assert out.count() == docs.count()
    # the synthetic corpus genuinely contains cross-doc spans
    assert out.filter(F.col("chars_removed") > 0).count() > 0


def test_no_op_below_min_docs(spark):
    docs = {1: "a b c d e f g", 2: "h i j k l m n"}
    got = _run(spark, docs)
    assert all(v[1] == 0 for v in got.values())
