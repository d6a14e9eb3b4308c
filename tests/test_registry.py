"""Registry-shape invariants for the driver correctness gate.

The driver records a CORRECTNESS row only for the first
``DRIVER_CHECKED_PREFIX`` registry entries (observed round 1) — every
distinct operator family must sit inside that window, and the window
must not overflow as queries are added.
"""

from x_spark.plans.registry import DRIVER_CHECKED_PREFIX, ORACLES, QUERIES

# one representative per operator family that MUST be driver-checked
# Rotation history: late_shipment_priority, top_orders_per_segment,
# distinct_suppliers_parts, nation_presence, quantity_by_status_pivot
# and above_avg_balance were head-checked green in r01+r02 and rotated
# to the tail in round 3 so never-checked flavors get driver rows —
# cumulative coverage only grows.
FAMILY_REPRESENTATIVES = [
    "pricing_summary",          # groupBy+agg battery (A1-A4)
    "quantity_cube",            # cube/rollup grouping sets
    "table_profile",            # per-column data-quality profile
                                # (also the exact-percentile rep since the
                                # round-4 rotation demoted quantity_percentiles)
    "txlog_version_diff",       # MERGE + DELETE on the txlog store + CDF diff
    "scalar_function_battery",  # scalar function library
    "bpe_token_stats",          # BPE merge-table application (tokenizer)
    "market_share",             # multi-join share-of-total
    "rolling_revenue",          # RANGE-frame window sums (only rangeBetween query)
    "customer_value_tiles",     # ntile/percent_rank/cume_dist
    "asof_purchase_gap",        # as-of join
    "range_click_context",      # range join
    "embedding_near_dups",
    "ann_topk_bucketed",
    "contamination_bloom",      # eval-set n-gram decontamination (r4 swap:
                                # Bloom-prefilter plan in, exact-join twin
                                # benchmark_contamination to the tail —
                                # identical oracle, stronger plan coverage)
    "document_chunks",          # overlapping token-window chunking
    "bm25_search",              # keyword search (inverted-index BM25)
    "pii_scan",                 # PII detection + redaction audit
    "multimodal_features",
    "jdbc_dim_roundtrip",       # external-DB connector round trip (r4 swap:
                                # the never-driver-checked JDBC/Derby path in,
                                # thrice-green duckdb_dim_roundtrip out)
    "stream_stateful_user_stats",
    "stream_dedup_events",      # dropDuplicatesWithinWatermark
    "stream_stream_join",
    "salted_event_totals",      # skew-mitigating salted two-stage agg
    # round-3 promotions (never driver-checked before)
    "token_fingerprints",       # rolling-hash document fingerprints
    "corpus_mixture",           # proportional corpus mixing
    "weighted_sample",          # weighted priority sampling
    "stream_sliding_profile",   # sliding event-time windows
    "dedup_survivors",          # per-component survivor selection
    "stream_upsert_totals_txlog",  # exactly-once txlog streaming upsert
    # second r3 swap (token_topk / stream_upsert_totals rotated out;
    # rolling_revenue kept — only RANGE-frame query in the battery)
    "line_dedup_boilerplate",   # C4 boilerplate line dedup
    "sequence_packing",         # token prefix-sum sequence packing
    # third r3 swap: late-round operators promoted for driver rows
    # (demoted: ngram_jaccard_dups, exact_dedup, text_statistics,
    # dup_components, simhash_near_dups, ann_topk_pandas — all green
    # r01+r02 with their family still head-represented)
    "edit_distance_dups",       # LSH-candidate edit-distance verification
    "incremental_dedup",        # ingest-vs-fingerprint-store anti-join dedup
    "quality_classifier",       # hashed-feature linear quality scoring
    "unigram_surprise",         # unigram-LM cross-entropy (perplexity filter)
    "cross_doc_spans",          # ExactSubstr-style repeated cross-doc spans
    "set_similarity_dups",      # exact prefix-filtered set-similarity join
    # round-4 promotions (verdict r3 tasks #1 and #6 + new operators;
    # demoted with family justification in registry.py: corpus_splits
    # — sampling family held by corpus_mixture + weighted_sample —
    # and stream_tumbling_profile — sliding windows generalize
    # tumbling)
    "recon_3way",               # pairwise N>2 reconciliation extension
    "dsir_selection",           # DSIR importance-resampling data selection
    "robust_outliers",          # median/MAD robust outlier screen
    # r4 second swap (demoted with justification in registry.py:
    # top_customers — TakeOrdered family held by bm25/classifier/dsir;
    # weekly_revenue_wow — lag family held by event_sessions;
    # recon_lineitem — ReconJob + tolerance compare held by recon_3way)
    "event_sessions",           # gap-based sessionization (lag + cumsum)
    "signup_funnel",            # ordered funnel stage counting
    "cohort_retention",         # weekly cohort retention matrix
    # r4 third swap: curation_pipeline (thrice-green composition;
    # stages and composition shape keep head reps) out for
    "profile_drift",            # before/after profile drift gate
    # round-5 promotions (verdict r4 tasks #1, #3, #6). Demoted with
    # justification in registry.py: language_profile,
    # repetition_profile, minhash_near_dups, stream_session_profile,
    # scd2_customer — each green >= 3 consecutive rounds, family still
    # head-represented.
    "lineitem_correlations",    # one-pass exact-decimal correlation matrix
    "salted_brand_volume",      # skew-salted replicated JOIN (agg twin:
                                # salted_event_totals, also head)
    "stream_user_stats_agg",    # JVM state-store streaming aggregation
                                # (same oracle as the applyInPandasWithState
                                # twin — both implementations driver-pinned)
    "txlog_restore_roundtrip",  # RESTORE TO VERSION rollback + CDF audit
    "join_view_refresh",        # incrementally maintained equi-join view
    "stream_ivm_user_totals",   # streaming epoch-stamped append + CDF-fold
                                # AggregateView refresh (exactly-once x2;
                                # demoted: semantic_dedup_survivors, a
                                # composition of head-covered parts)
]


def test_driver_window_holds_every_family():
    head = list(QUERIES)[:DRIVER_CHECKED_PREFIX]
    missing = [n for n in FAMILY_REPRESENTATIVES if n not in head]
    assert not missing, f"families outside the driver-checked prefix: {missing}"


def test_every_query_has_oracle_or_documented_exception():
    no_oracle = {n for n in QUERIES if n not in ORACLES}
    # intentional rows-only checks (engine-specific estimates /
    # data-dependent trained codebook)
    assert no_oracle <= {
        "approx_distinct_users",
        "ann_topk_ivf",
        "ann_topk_pq",
        "bpe_merge_table",
        "sketch_distinct_rollup",
    }, no_oracle


def test_registry_consistent():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) == len(set(QUERIES))


def test_driver_window_is_fully_hash_checkable():
    """Every driver-checked entry must have an oracle — a rows-only
    query in the head wastes a hash-check slot."""
    head = list(QUERIES)[:DRIVER_CHECKED_PREFIX]
    no_oracle = [n for n in head if n not in ORACLES]
    assert not no_oracle, f"rows-only queries in the driver window: {no_oracle}"
