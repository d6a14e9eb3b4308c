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
    # Round-7 rotation (verdict r6 task #1): the 13 never-driver-checked
    # oracle-backed queries promoted into the head; 13 multi-round-green
    # representatives demoted with per-query justification in
    # registry.py's _TAIL (pricing_summary, scalar_function_battery,
    # rolling_revenue, multimodal_features, stream_dedup_events,
    # pii_scan, sequence_packing, cross_doc_spans, set_similarity_dups,
    # quality_classifier, contamination_bloom, jdbc_dim_roundtrip,
    # event_sessions — each >= 3 straight driver-green rounds).
    "priority_order_counts",    # TPC-H Q4 shape: EXISTS semi join + counts
    "bilateral_trade",          # TPC-H Q7 shape: multi-join year split
    "product_profit",           # TPC-H Q9 shape: 6-way join profit agg
    "late_line_priority_mix",   # TPC-H Q12 shape: CASE sums by shipmode
    "promo_revenue_share",      # TPC-H Q14 shape: conditional revenue share
    "large_volume_orders",      # TPC-H Q18 shape: HAVING semi join
    "bracketed_revenue",        # TPC-H Q19 shape: disjunctive pushdown
    "order_count_distribution", # decorrelated COUNT distribution
    "top_supplier_revenue",     # scalar-max revenue view (cache-free)
    "small_quantity_revenue",   # avg-subquery decorrelation
    "dominant_suppliers",       # fraction-of-total HAVING
    "wealthy_idle_customers",   # scalar subquery + NOT EXISTS
    "corpus_vocab_overlap",     # pairwise source vocabulary Jaccard
    "stream_stateful_user_stats",
    # approx_profile_gate demoted r11 (first-round green r10; profile
    # family keeps profile_drift) — slot went to agg_view_route
    "agg_view_route",           # NEW r11: aggregate-view auto-routing
                                # (warehouse MV rewrite: covered
                                # group-bys served from maintained IVM
                                # views, auto-refresh, base fallback)
    "span_scrub",               # NEW r11: cross-doc span REMOVAL
                                # (ExactSubstr acting half: global-
                                # first survivor, island-merged cuts,
                                # splice length re-derived by oracle)
    "bpe_encode_corpus",        # NEW r11: corpus BPE encoding via
                                # vocab-encode + broadcast join with
                                # in-plan decode-roundtrip gates
    "recon_3way",               # pairwise N>2 reconciliation extension
    "dsir_selection",           # DSIR importance-resampling data selection
    "robust_outliers",          # median/MAD robust outlier screen
    "signup_funnel",            # ordered funnel stage counting
    # cohort_retention demoted round 6 (5 straight green rounds; the
    # sessionization family keeps event_sessions + signup_funnel in
    # the head) — slot went to schema_evolution_scan
    "schema_evolution_scan",    # column mapping: RENAME/ADD/DROP COLUMN
    "profile_drift",            # before/after profile drift gate
    "lineitem_correlations",    # one-pass exact-decimal correlation matrix
    "salted_brand_volume",      # skew-salted replicated JOIN
    "stream_user_stats_agg",    # JVM state-store streaming aggregation
    "txlog_restore_roundtrip",  # RESTORE TO VERSION rollback + CDF audit
    # join_view_refresh demoted r10 second swap (green r05-r09, 5
    # straight); the family slot returns to stream_ivm_join_view for a
    # fresh row (last green r07 — the strictly stronger composition)
    "stream_ivm_join_view",     # exactly-once streaming ingest into an
                                # incrementally maintained equi-join view
    "stream_quantile_sketch",   # NEW r7: streaming epoch-stamped sketch
                                # ingest -> quantiles from the store
                                # (subsumes the demoted
                                # stream_ivm_user_totals' exactly-once
                                # ingest shape; stream_ivm_join_view
                                # keeps the maintained-view head slot)
    # Round-6 rotation (verdict r5 task #1): the never-driver-checked
    # round-5 plan families promoted; the 22 demotions each carry a
    # family justification in registry.py's _TAIL comments (every one
    # >= 3 consecutive driver-green rounds with a surviving head rep).
    "supplier_pagerank",        # iterative graph kernel (PageRank)
    "bm25_indexed_search",      # MAINTAINED incremental BM25 index (same
                                # oracle as the demoted direct bm25_search)
    "ivf_store_search",         # NEW: maintained IVF store — txn-stamped
                                # ingest + replay detection + partition-
                                # pruned probe search vs closed-form oracle
    "bloom_point_lookup",       # Bloom file-skipping sidecar
    "minmax_view_refresh",      # MIN/MAX maintained view, targeted rescans
    # trimmed_price_stats demoted r11 (fresh row r10; robust-stats
    # family keeps robust_outliers)
    "events_resampled_locf",    # per-key dense grid + LOCF (as-of family;
                                # the interpolation twin demoted r7,
                                # re-promoted r10 for a fresh row,
                                # demoted again r11 — same kernel)
    "rolling_value_anomalies",  # trailing-window z-score anomalies
    "curriculum_positions",     # two-stage distributed global ranking
    "token_budget_selection",   # budget cut via distributed running sum
    "doc_keywords_tfidf",       # per-doc TF-IDF keyword extraction
    "bigram_collocations",      # PMI collocation mining
    # or_delete_skipping demoted r10 (first-round green r9; the CoW
    # DELETE + skipping family keeps dv_delete_scan, OR-pruning pinned
    # by test_typed_sidecar) — slot went to price_histogram
    "price_histogram",          # re-promoted r10: fixed-grid histogram
                                # (last row r06)
    "hard_negative_mining",     # banded-similarity contrastive negatives
    "filter_attribution",       # first-fail C4/Gopher rule attribution
    "corpus_shuffle_shards",    # deterministic shuffle + shard manifest
    "temperature_mixture",      # count^alpha temperature mixing
    "source_data_cards",        # per-source governance card
    "lineitem_key_skew",        # key-skew diagnostic top-N
    "price_trend_by_flag",      # grouped OLS second-moment twin
    "dv_delete_scan",           # deletion vectors: merge-on-read DELETE +
                                # metadata subtraction + CDF mask delta
                                # (demoted: quantity_cube, 4 straight greens)
    # events_resampled_interp demoted r11 (fresh row r10; resample
    # family keeps events_resampled_locf above)
    "default_identity_ingest",  # NEW r7: dense identity allocation +
                                # column DEFAULTs (id SET deterministic)
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
