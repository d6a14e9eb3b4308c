"""Incremental ingest dedup: O(batch) dedup of new content against a
persisted fingerprint store, including the closed txlog loop."""

import pytest

from pyspark.sql import functions as F

from x_spark.functions.portable import fingerprint
from x_spark.operators.dedup import incremental_dedup
from x_spark.sources import init_datasource
from x_spark.sources.base import TableRef


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_within_batch_and_store_dedup(spark):
    seen = _docs(spark, [(0, "already ingested doc")]).select(
        fingerprint("text").alias("fingerprint")
    )
    batch = _docs(
        spark,
        [
            (10, "brand new content"),
            (11, "Brand   NEW content!"),   # same fingerprint as 10
            (12, "ALREADY ingested doc."),  # fingerprint collides with store
            (13, "another new doc"),
        ],
    )
    out = {r.doc_id for r in incremental_dedup(batch, seen).collect()}
    # 10 survives (min id of the within-batch pair), 11 deduped within
    # the batch, 12 suppressed by the store, 13 survives
    assert out == {10, 13}


def test_closed_loop_over_txlog_store(spark, tmp_path):
    """Two ingests with the store updated between them: batch-2 rows
    whose fingerprints were ingested in batch 1 are suppressed, and a
    replay of batch 2 self-suppresses entirely."""
    ds = init_datasource("txlog", spark)
    ref = TableRef(path=str(tmp_path / "fp_store"))

    batch1 = _docs(spark, [(1, "alpha doc"), (2, "beta doc")])
    empty_store = _docs(spark, []).select(
        fingerprint("text").alias("fingerprint")
    )
    surv1 = incremental_dedup(batch1, empty_store)
    assert {r.doc_id for r in surv1.collect()} == {1, 2}
    ds.append(surv1.select("fingerprint"), ref)

    batch2 = _docs(
        spark, [(3, "ALPHA doc!"), (4, "gamma doc"), (5, "gamma    DOC")]
    )
    surv2 = incremental_dedup(batch2, ds.read(ref))
    assert {r.doc_id for r in surv2.collect()} == {4}
    ds.append(surv2.select("fingerprint"), ref)

    # replay of batch 2: every fingerprint already in the store
    assert incremental_dedup(batch2, ds.read(ref)).collect() == []


def test_extra_store_columns_ignored(spark):
    seen = _docs(spark, [(0, "seen doc")]).select(
        "doc_id", fingerprint("text").alias("fingerprint"), F.lit(7).alias("extra")
    )
    batch = _docs(spark, [(1, "seen DOC"), (2, "fresh")])
    assert {r.doc_id for r in incremental_dedup(batch, seen).collect()} == {2}


# ---------------------------------------------------------------------------
# Property: incremental_dedup matches the brute-force set model for any
# batch/store combination.

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_words = st.sampled_from(["alpha", "beta", "gamma", "Alpha!", " beta ", "delta"])
_texts = st.lists(_words, min_size=1, max_size=3).map(" ".join)


@st.composite
def _dedup_case(draw):
    batch = draw(st.lists(_texts, min_size=0, max_size=8))
    store = draw(st.lists(_texts, min_size=0, max_size=4))
    return batch, store


def _canon(text):
    import re

    return re.sub(r"[^a-z0-9]", "", text.lower())


@_SETTINGS
@given(_dedup_case())
def test_incremental_dedup_matches_set_model(spark, case):
    batch_texts, store_texts = case
    batch = _docs(spark, list(enumerate(batch_texts)))
    store = _docs(
        spark, [(1000 + i, t) for i, t in enumerate(store_texts)]
    ).select(fingerprint("text").alias("fingerprint"))

    got = {r.doc_id for r in incremental_dedup(batch, store).collect()}

    seen_canon = {_canon(t) for t in store_texts}
    first_by_canon = {}
    for i, t in enumerate(batch_texts):
        first_by_canon.setdefault(_canon(t), i)
    expect = {
        i
        for c, i in first_by_canon.items()
        if c not in seen_canon
    }
    assert got == expect


def test_null_text_rows_are_suppressible(spark):
    """NULL text canonicalizes to '' before fingerprinting — otherwise
    the NULL fingerprint slips through the anti-join on every replay."""
    batch = spark.createDataFrame(
        [(1, None), (2, ""), (3, "real content")], "doc_id bigint, text string"
    )
    empty = _docs(spark, []).select(fingerprint("text").alias("fingerprint"))
    surv1 = incremental_dedup(batch, empty)
    rows1 = {r.doc_id for r in surv1.collect()}
    # NULL and '' share the canonical fingerprint: one representative
    assert rows1 == {1, 3}
    # replay against a store holding those fingerprints: fully suppressed
    assert incremental_dedup(batch, surv1.select("fingerprint")).collect() == []
