"""Unit behavior of the BM25 and PII operators (oracle parity covers
the registry queries; these pin operator-level semantics)."""

import math

from pyspark.sql import functions as F

from x_spark.operators.pii import PII_PATTERNS, pii_counts, redact
from x_spark.operators.text_search import bm25_topk, tokenize


def test_bm25_matches_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat cat"), (3, "bird"), (4, "dog dog bird")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["cat"], k=4).collect()}
    # N=4, df(cat)=2, dl = [2,3,1,3], avgdl = 9/4
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def sat(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.25))
    assert out[1] == round(idf * sat(1, 2), 6)
    assert out[2] == round(idf * sat(3, 3), 6)
    assert 3 not in out and 4 not in out  # no "cat" -> no score row
    # tf saturation: tf=3 scores higher, but sublinearly (< 3x)
    assert out[1] < out[2] < 3 * out[1]


def test_bm25_rank_deterministic_ties(spark):
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(5)], "doc_id bigint, text string"
    )
    rows = bm25_topk(docs, ["same"], k=3).orderBy("rank").collect()
    assert [r.doc_id for r in rows] == [0, 1, 2]  # tie -> doc_id order


def test_tokenize_drops_empty(spark):
    docs = spark.createDataFrame([(1, "  A  b  ")], "doc_id bigint, text string")
    toks = [r.token for r in tokenize(docs).collect()]
    assert toks == ["a", "b"]


def test_pii_counts_and_redact_complete(spark):
    text = ("reach me at jane.doe+x@corp.example.org or +1 555-123-4567; "
            "server 10.0.42.7 logged 2 hits")
    df = spark.createDataFrame([(text,)], "text string")
    counts = df.select(
        *[c.alias(n) for n, c in pii_counts("text").items()]
    ).head()
    assert (counts.email, counts.phone, counts.ipv4) == (1, 1, 1)
    red = df.select(redact("text").alias("r")).head().r
    assert "[EMAIL]" in red and "[PHONE]" in red and "[IP]" in red
    residual = df.select(
        *[c.alias(n) for n, c in pii_counts(redact("text")).items()]
    ).head()
    assert residual.email == residual.phone == residual.ipv4 == 0
    # plain text untouched
    clean = spark.createDataFrame([("no pii here 12",)], "text string")
    assert clean.select(redact("text").alias("r")).head().r == "no pii here 12"


def test_pii_patterns_re2_compatible():
    """Patterns must stay RE2-safe (no backrefs/lookaround) so the
    DuckDB oracle and RE2-based scanners accept them verbatim."""
    for pat, _ in PII_PATTERNS.values():
        assert "(?<" not in pat and "(?=" not in pat and "\\1" not in pat


def test_indexed_bm25_matches_direct_and_prunes_buckets(spark, tmp_path):
    """The materialized inverted index returns the identical top-k as
    the direct scan, and the query-term filter prunes tf buckets
    (SelectedBucketsCount in the scan node)."""
    from x_spark.operators.text_search import (
        bm25_topk, bm25_topk_indexed, build_inverted_index,
    )
    from x_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    terms = ["dup", "vector", "spark"]
    try:
        build_inverted_index(docs, "ii_test", n_buckets=8)
        direct = bm25_topk(docs, terms, k=15).collect()
        indexed = bm25_topk_indexed(spark, "ii_test", terms, k=15).collect()
        assert sorted(map(tuple, direct)) == sorted(map(tuple, indexed))
        plan = (
            bm25_topk_indexed(spark, "ii_test", terms, k=15)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SelectedBucketsCount" in plan
        _assert_distributed_topk(plan)
    finally:
        for t in ("ii_test_tf", "ii_test_dl", "ii_test_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def _assert_distributed_topk(plan: str):
    """The scored set must reach the rank window only AFTER a
    TakeOrderedAndProject (distributed per-partition top-k + merge):
    the Window node sits ABOVE the take, so at most k rows ever cross
    a single-partition boundary — never the corpus-sized scored set."""
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.index("Window ") < plan.index("TakeOrderedAndProject"), plan


def test_topk_plans_never_sort_scored_set_on_one_partition(spark):
    """Plan-shape pin for the registry top-k family: bm25_search and
    token_topk rank via orderBy().limit(k) (TakeOrderedAndProject),
    and top_supplier_revenue has no window at all (scalar max +
    broadcast filter join)."""
    from x_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    for name in ("bm25_search", "token_topk"):
        plan = (
            QUERIES[name](spark, sf)
            ._jdf.queryExecution().executedPlan().toString()
        )
        _assert_distributed_topk(plan)
    plan = (
        QUERIES["top_supplier_revenue"](spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan


def test_bm25_invariants(spark):
    """Ranking invariants: (1) row order of the corpus cannot change
    scores (shuffle-safety), (2) a doc with strictly more matches of a
    rarer term outranks one with matches of a common term only, and
    (3) scores are non-negative and finite."""
    import math

    docs = [
        (1, "rare common common filler filler"),
        (2, "common common common filler filler"),
        (3, "filler filler filler filler filler"),
        (4, "common filler filler filler filler"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r.doc_id: r.bm25 for r in bm25_topk(df, ["rare", "common"], k=4).collect()}
    shuffled = spark.createDataFrame(list(reversed(docs)), "doc_id bigint, text string")
    out2 = {
        r.doc_id: r.bm25
        for r in bm25_topk(shuffled.repartition(3), ["rare", "common"], k=4).collect()
    }
    assert out == out2
    assert out[1] > out[2] > out[4]  # rare term dominates; tf saturates
    assert all(v >= 0 and math.isfinite(v) for v in out.values())
    assert 3 not in out  # no query terms -> no row


# -- maintained (incremental) BM25 index --------------------------------------
def test_text_index_incremental_matches_direct_bm25(spark, sf_dir, tmp_path):
    from x_spark.operators.text_search import bm25_store_topk, bm25_topk, update_text_index
    from x_spark.session import load_table
    from x_spark.sources import init_datasource

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ds = init_datasource("txlog", spark)
    terms = ["spark", "join", "window"]

    inc_root = str(tmp_path / "idx_inc")
    for b in range(3):
        update_text_index(ds, inc_root, docs.filter(f"doc_id % 3 = {b}"),
                          txn=("ing", b))
    one_root = str(tmp_path / "idx_one")
    update_text_index(ds, one_root, docs)

    want = sorted(map(tuple, bm25_topk(docs, terms, k=10).collect()))
    got_inc = sorted(map(tuple, bm25_store_topk(ds, inc_root, terms, k=10).collect()))
    got_one = sorted(map(tuple, bm25_store_topk(ds, one_root, terms, k=10).collect()))
    assert got_inc == want and got_one == want and want


def test_text_index_replay_heals_partial_ingest(spark, sf_dir, tmp_path):
    from x_spark.operators.text_search import bm25_store_topk, update_text_index
    from x_spark.session import load_table
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    ds = init_datasource("txlog", spark)
    root = str(tmp_path / "idx")
    update_text_index(ds, root, docs, txn=("app", 1))
    tf_n = ds.read(TableRef(path=root + "/tf")).count()
    dl_n = ds.read(TableRef(path=root + "/dl")).count()
    # full replay of the same epoch: both halves detected, nothing lands
    update_text_index(ds, root, docs, txn=("app", 1))
    assert ds.read(TableRef(path=root + "/tf")).count() == tf_n
    assert ds.read(TableRef(path=root + "/dl")).count() == dl_n
    assert bm25_store_topk(ds, root, ["spark"], k=3).count() <= 3


def test_text_index_query_prunes_token_buckets(spark, sf_dir, tmp_path):
    from x_spark.operators.text_search import bm25_store_topk, update_text_index
    from x_spark.session import load_table
    from x_spark.sources import init_datasource

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    ds = init_datasource("txlog", spark)
    root = str(tmp_path / "idx")
    update_text_index(ds, root, docs)
    out = bm25_store_topk(ds, root, ["spark"], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the tf scans carry a non-empty PartitionFilter on the bucket
    # directory column (e.g. "PartitionFilters: [isnotnull(tok_bucket),
    # (tok_bucket = 9)]")
    assert any(
        "PartitionFilters" in ln and "tok_bucket" in ln
        and "PartitionFilters: []" not in ln
        for ln in plan.split("\n")
    )
    _assert_distributed_topk(plan)
