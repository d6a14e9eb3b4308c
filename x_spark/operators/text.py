"""Text-analysis operators for large-scale training-data pipelines.

Extensions beyond the reference (SURVEY §7 Phase E): language ID
(marker-word heuristic), quality scoring, token statistics, document
fingerprinting. All column-level: pure ``pyspark.sql.functions``
expressions (JVM-side, whole-stage codegen — no Python UDFs in the hot
path), embarrassingly parallel, no shuffles. At 100 TB these run at
scan speed.

Every expression has an exact DuckDB equivalent (see
x_spark.functions.portable for the shared primitives); integer counts
and single-division ratios are bit-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from x_spark.functions.portable import fingerprint, token_count, tokens

# Marker words per language for the n-gram/stopword language heuristic.
# Word-boundary regexes are RE2/Java-regex compatible (portable to the
# DuckDB oracle). Tie-break: first language in this list wins.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}

ENGLISH_STOPWORDS = r"\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by)\b"


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append token/char statistics columns.

    n_chars_calc   length in characters
    n_tokens       whitespace-delimited token count
    avg_token_len  mean token length (0 for empty text)
    punct_ratio    punctuation chars / total chars
    digit_ratio    digit chars / total chars
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("bigint")
    n_tokens = token_count(t).cast("bigint")
    # total length of tokens = chars minus whitespace
    token_chars = (n_chars - F.regexp_count(t, F.lit(r"\s"))).cast("bigint")
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            F.when(n_tokens > 0, token_chars / n_tokens).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(
                n_chars > 0,
                F.regexp_count(t, F.lit(r"[^\sA-Za-z0-9]")).cast("bigint") / n_chars,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "digit_ratio",
            F.when(
                n_chars > 0,
                F.regexp_count(t, F.lit(r"[0-9]")).cast("bigint") / n_chars,
            ).otherwise(F.lit(0.0)),
        )
    )


def language_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language marker-word hit counts (on lowercased text)."""
    t = F.lower(F.col(text_col))
    return {
        lang: F.regexp_count(t, F.lit(pattern)).cast("bigint")
        for lang, pattern in LANG_MARKERS.items()
    }


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``lang_pred``: argmax of marker scores, 'und' when all 0.

    Tie-break is the fixed LANG_MARKERS order (first max wins), so the
    prediction is deterministic and oracle-replicable as a CASE chain.
    """
    scores = language_scores(text_col)
    out = df
    for lang, score in scores.items():
        out = out.withColumn(f"score_{lang}", score)
    langs = list(scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:  # first-in-order max wins
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return out.withColumn("lang_pred", pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append a [0,1] quality score from shape heuristics:

    0.4 * token-count saturation (n_tokens/100 capped at 1)
    0.3 * stopword presence  (en stopword hits / tokens, capped at .3->1)
    0.2 * (1 - punct_ratio excess)
    0.1 * mean-token-length plausibility (1 when 3<=avg<=12)

    Deterministic: integer counts + single divisions + least/greatest.
    Requires the ``text_stats`` columns; computes them when absent.
    """
    if "n_tokens" not in df.columns:
        df = text_stats(df, text_col)
    t = F.lower(F.col(text_col))
    stop_hits = F.regexp_count(t, F.lit(ENGLISH_STOPWORDS)).cast("bigint")
    stop_ratio = F.when(F.col("n_tokens") > 0, stop_hits / F.col("n_tokens")).otherwise(
        F.lit(0.0)
    )
    score = (
        0.4 * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
        + 0.3 * F.least(stop_ratio / F.lit(0.3), F.lit(1.0))
        + 0.2 * F.greatest(F.lit(1.0) - 2 * F.col("punct_ratio"), F.lit(0.0))
        + 0.1
        * F.when(F.col("avg_token_len").between(3.0, 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return df.withColumn("quality", score)


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the canonical md5 fingerprint (whitespace/punct/case
    insensitive) used for exact near-duplicate grouping."""
    return df.withColumn("fp", fingerprint(F.col(text_col)))


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram-LM cross-entropy — the perplexity-filter
    shape of CCNet-style pipelines, with the corpus itself as the
    language model (docs full of rare tokens score high = surprising;
    stopword-heavy prose scores low).

    score(d) = -avg_{t in d} ln p(t),  p(t) = cnt(t) / total_tokens
             = avg(-ln cnt(t)) + ln(total)

    Distributed shape: one ``groupBy(token)`` builds the vocabulary
    (Heaps'-law sublinear in corpus size — but still corpus-scaled, so
    it is NOT broadcast; the join shuffles on the token key, where each
    occurrence matches exactly one vocab row, so hot tokens inflate
    partitions, not fan-out — AQE skew split handles the rest), then
    one ``groupBy(doc)``. The vocab is persisted: it feeds both the
    totals scalar and the scoring join.

    Exactness across engines: per-token ``-ln(cnt)`` is cast to
    DECIMAL(30,6) and summed exactly (engine-independent, no
    float-summation-order drift); the single final division + ln(total)
    runs on identical doubles. Mirrored literally in the DuckDB oracle.

    Returns ``(id_col, n_tokens, cross_entropy)``.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt")).persist()
    totals = vocab.agg(F.sum("cnt").alias("total"))
    per_doc = (
        toks.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                (-F.log(F.col("cnt").cast("double"))).cast("decimal(30,6)")
            ).alias("sum_neg_ln"),
        )
    )
    return per_doc.crossJoin(F.broadcast(totals)).select(
        id_col,
        "n_tokens",
        F.round(
            F.col("sum_neg_ln").cast("double") / F.col("n_tokens")
            + F.log(F.col("total").cast("double")),
            6,
        ).alias("cross_entropy"),
    )


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append repetition-based quality signals (the Gopher-rules
    family: heavily self-repeating documents are low-value training
    data):

    dup_line_fraction    1 - distinct lines / lines
    dup_token_fraction   1 - distinct tokens / tokens
    max_2gram_run        occurrence count of the most frequent token
                         2-gram (1 = no repetition)

    All three are single-projection JVM array expressions — the
    most-frequent-2-gram count is the longest equal-adjacent run of the
    SORTED 2-gram array, folded in one ``aggregate`` pass (no explode,
    no shuffle; runs at scan speed). Ratios are single divisions of
    integer counts: bit-deterministic across engines.
    """
    t = F.col(text_col)
    lines = F.expr(f"filter(split({text_col}, '\\n'), x -> length(x) > 0)")
    tokens = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), x -> length(x) > 0)"
    )
    out = (
        df.withColumn("_lines", lines)
        .withColumn("_tokens", tokens)
        .withColumn(
            "dup_line_fraction",
            F.when(
                F.size("_lines") > 0,
                1.0
                - F.size(F.array_distinct("_lines")).cast("double")
                / F.size("_lines"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "dup_token_fraction",
            F.when(
                F.size("_tokens") > 0,
                1.0
                - F.size(F.array_distinct("_tokens")).cast("double")
                / F.size("_tokens"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "_grams",
            F.expr(
                "CASE WHEN size(_tokens) >= 2 THEN array_sort(transform("
                "sequence(1, size(_tokens) - 1), "
                "i -> concat(element_at(_tokens, i), ' ', element_at(_tokens, i + 1))"
                ")) ELSE array() END"
            ),
        )
        .withColumn(
            "max_2gram_run",
            # fold over the sorted grams: (prev, current run, best run)
            F.expr(
                "CASE WHEN size(_grams) = 0 THEN 0L ELSE aggregate(_grams, "
                "named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
                "(acc, g) -> named_struct("
                "'prev', g, "
                "'run', CASE WHEN acc.prev IS NOT NULL AND acc.prev = g "
                "THEN acc.run + 1 ELSE 1L END, "
                "'best', greatest(acc.best, CASE WHEN acc.prev IS NOT NULL "
                "AND acc.prev = g THEN acc.run + 1 ELSE 1L END)), "
                "acc -> acc.best) END"
            ),
        )
        .drop("_lines", "_tokens", "_grams")
    )
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Explode documents into overlapping fixed-token-window chunks —
    the pretraining/RAG chunking step. One row per chunk:
    (id, chunk_id, start_token, n_chunk_tokens, chunk_text).

    Window starts step by ``chunk_tokens - overlap``; a trailing start
    whose window would add <= ``overlap`` new tokens is dropped (it
    would be fully contained in the previous chunk), except the first.
    Pure array expressions + one explode — no shuffle, no Python; row
    expansion is bounded by ~n_tokens/stride per document.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> length(x) > 0)"
    starts = (
        f"CASE WHEN size(_ck_toks) = 0 THEN array() ELSE "
        f"filter(sequence(1, size(_ck_toks), {stride}), "
        f"s -> s = 1 OR s <= size(_ck_toks) - {overlap}) END"
    )
    return (
        df.withColumn("_ck_toks", F.expr(toks))
        .withColumn("start_token", F.explode(F.expr(starts)))
        .select(
            id_col,
            ((F.col("start_token") - 1) / F.lit(stride)).cast("bigint").alias("chunk_id"),
            F.col("start_token").cast("bigint"),
            F.expr(f"size(slice(_ck_toks, start_token, {chunk_tokens}))")
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.expr(
                f"array_join(slice(_ck_toks, start_token, {chunk_tokens}), ' ')"
            ).alias("chunk_text"),
        )
    )


CONTAM_NGRAM = 5  # token n-gram width for contamination overlap


def ngram_hash_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = CONTAM_NGRAM, fan: bool = True,
) -> DataFrame:
    """(id, gram_hashes) where ``gram_hashes`` holds the distinct
    32-bit hashes of the lowercased token ``n``-grams — the unit of
    benchmark-contamination overlap.

    The tokenized frame is PERSISTED before the gram lambda runs:
    Catalyst's project collapse would otherwise re-inline the
    regex split into every per-gram evaluation — measured 10x+ slower
    (the same pitfall ``dedup._sketch_table`` documents; the persist is
    the barrier). Size: id + ~tokens per row, same class as the
    minhash sketch table."""
    from x_spark.functions.portable import MINHASH_PRIME, hash32_sql

    # ONE md5 per token (not per gram): the gram hash is a polynomial
    # roll over the 32-bit token hashes — multiplier < 2^20 keeps every
    # product < 2^52 (ANSI-safe, exact in DuckDB bigint math):
    #   g = fold(h_i..h_{i+n-1}: acc -> (acc * 1000003 + h) % P)
    from x_spark.fanout import fan_out

    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> length(x) > 0)"
    tok_hashes = f"transform({toks}, t -> {hash32_sql('t')})"
    # per-token hashing and the consumers' per-gram polynomial fold
    # both run at this persisted frame's parallelism — on a degenerate
    # one-split layout that is a single task; fan the projected rows
    # out first (guide §2.5; no-op on healthy layouts, hashes are
    # order-independent). ``fan=False`` is for callers hashing a side
    # that is SMALL BY CONSTRUCTION (a benchmark/eval set): fanning a
    # few dozen rows to every core costs a shuffle plus wide-stage
    # scheduling on each downstream pass and parallelizes nothing
    # (measured: contamination_bloom 1.8 -> 2.8 s with the eval side
    # fanned).
    proj = df.select(id_col, text_col)
    toks_df = (fan_out(proj) if fan else proj).select(
        F.col(id_col).alias(id_col), F.expr(tok_hashes).alias("_cc_th")
    ).persist()
    grams = (
        f"CASE WHEN size(_cc_th) >= {n} THEN array_distinct(transform("
        f"sequence(1, size(_cc_th) - {n} + 1), "
        f"i -> aggregate(slice(_cc_th, i, {n}), 0L, "
        f"(acc, h) -> (acc * 1000003L + h) % {MINHASH_PRIME}L)"
        f")) ELSE array() END"
    )
    return toks_df.withColumn("gram_hashes", F.expr(grams)).drop("_cc_th")


def cross_doc_ngram_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-internal repeated-span signal — the distributed
    approximation of ExactSubstr dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): token ``n``-grams
    occurring in >= ``min_docs`` DISTINCT documents mark boilerplate /
    templated spans that document-level MinHash misses when they are
    pasted into otherwise-distinct documents.

    Shape: per-doc distinct gram hashes (one scan, persisted), one
    ``groupBy(gram)`` doc-frequency count, one hash-equi join back —
    never doc x doc. The gram key is a hash: uniform, no skew beyond
    genuinely-hot boilerplate grams, which is exactly the signal.

    Returns per doc: ``total_grams`` (distinct n-grams),
    ``shared_grams`` (how many also appear in other docs — the
    span-dup mass to cut or down-weight), ``max_span_docs`` (doc
    frequency of its hottest gram; 0 when nothing is shared).
    """
    grams = ngram_hash_table(df, id_col, text_col, n=n).persist()
    exploded = grams.select(F.col(id_col), F.explode("gram_hashes").alias("gh"))
    # gram_hashes is distinct-per-doc, so count(*) == distinct docs
    hot = (
        exploded.groupBy("gh")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    per_doc = (
        exploded.join(hot, "gh")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("shared"),
            F.max("n_docs").alias("max_docs"),
        )
    )
    return (
        grams.select(
            F.col(id_col), F.size("gram_hashes").cast("bigint").alias("total_grams")
        )
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "total_grams",
            F.coalesce(F.col("shared"), F.lit(0)).cast("bigint").alias("shared_grams"),
            F.coalesce(F.col("max_docs"), F.lit(0)).cast("bigint").alias("max_span_docs"),
        )
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 3,
    n: int = CONTAM_NGRAM,
) -> DataFrame:
    """Flag training documents sharing >= ``min_shared`` distinct token
    n-grams with any benchmark/eval document — the decontamination step
    every LLM training pipeline runs before training.

    Shape: both sides explode to (id, ngram_hash) and meet in a
    hash-equi join — candidate volume is bounded by true n-gram
    collisions, never |corpus| x |benchmark|. The benchmark side is
    small by nature (eval sets), so Catalyst/AQE broadcasts it; the
    corpus side streams through map-side. One groupBy on the matched
    (train, eval) pair counts shared n-grams. At 100 TB the benchmark
    hash set is a broadcast bloom/exact set — same plan shape.

    Returns (train_id, eval_id, shared_ngrams) for flagged pairs.
    """
    # fan=False on BOTH sides: warm 7-rep A/B measured the corpus-side
    # fan a net LOSS for the contamination queries (med 1.96 -> 2.67 s)
    # — the gram stage is one cheap pass feeding a hash join, so the
    # raw-text shuffle + wide-stage scheduling never pays back (the
    # same tokenize-only lesson as the BM25 rejection); contrast
    # cross_doc_ngram_spans, whose fan won its interleaved A/B.
    # At-scale tradeoff (cluster users): fan=False also removes the
    # layout-adaptive repartition, so a degenerate ONE-SPLIT multi-TB
    # corpus (e.g. a single gzip) would tokenize+hash on one core
    # before the gram join. On a healthy multi-split table the fan is
    # a structural no-op either way; if your corpus arrives as few
    # unsplittable files, repartition it upstream of this call
    # (guide §2.5 "input skew").
    c = ngram_hash_table(corpus, id_col, text_col, n, fan=False).select(
        F.col(id_col).alias("train_id"),
        F.explode("gram_hashes").alias("gh"),
    )
    b = ngram_hash_table(benchmark, id_col, text_col, n, fan=False).select(
        F.col(id_col).alias("eval_id"),
        F.explode("gram_hashes").alias("gh"),
    )
    return (
        c.join(b, "gh")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


BLOOM_BITS = 1 << 16  # 65536 bits = 1024 longs (inline-literal friendly)
BLOOM_PROBES = ((999983, 7), (999979, 13), (999961, 29), (999959, 43))


def _bloom_positions(gh_expr: str, m_bits: int) -> list[str]:
    """k probe positions for a gram hash (< 2^32): affine probes
    reduced mod a PRIME (2^32-5) before the final mod-m — an affine map
    straight into a power-of-two m would preserve the hash's low bits,
    making all k probes functions of gh % m (measured ~27x the ideal
    false-positive rate). Multipliers < 2^20 keep every product < 2^52
    (exact in bigint math on both engines)."""
    return [
        f"((({gh_expr} * {a}L + {b}L) % 4294967291L) % {m_bits}L)"
        for a, b in BLOOM_PROBES
    ]


def build_gram_bloom(
    grams: DataFrame, gh_col: str = "gh", m_bits: int = BLOOM_BITS
) -> list[int]:
    """Bloom filter over a gram-hash column, built DISTRIBUTED: each
    probe position becomes (word index, bit), bit_or-aggregated per
    word — one shuffle of at most ``m_bits/64`` groups; the driver
    collects only the filter itself (``m_bits/64`` longs — 8 KB at the
    default size). The words list is the broadcastable artifact."""
    pos_union = ", ".join(_bloom_positions(gh_col, m_bits))
    bits = (
        grams.select(F.explode(F.expr(f"array({pos_union})")).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("widx"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in bits:
        words[r["widx"]] = r["word"]
    return words


def bloom_might_contain(
    gh_expr: str, words: list[int], m_bits: int = BLOOM_BITS
):
    """Column predicate: all k probe bits set in the broadcast filter.
    The words array rides the plan as a literal (8 KB default) — pure
    JVM bit math inside whole-stage codegen, no Python round trip."""
    lits = ", ".join(f"{w}L" for w in words)
    checks = [
        f"(element_at(array({lits}), cast({p} / 64 as int) + 1) "
        f"& shiftleft(1L, cast({p} % 64 as int))) != 0"
        for p in _bloom_positions(gh_expr, m_bits)
    ]
    return F.expr(" AND ".join(checks))


def contamination_check_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 3,
    n: int = CONTAM_NGRAM,
    m_bits: int = BLOOM_BITS,
) -> DataFrame:
    """:func:`contamination_check` with a Bloom pre-filter — the
    100 TB shape spelled out: the benchmark's gram hashes build a
    Bloom filter (8 KB, broadcast as a plan literal), the corpus gram
    stream drops non-members BEFORE the shuffle, and the exact
    hash-equi join runs only on survivors. False positives are killed
    by the exact join, so the result is IDENTICAL to the exact path
    (same oracle); what changes is shuffle volume — corpus grams that
    cannot match never leave their map task."""
    # localCheckpoint (not persist): materializes once for both the
    # filter build and the join, and the blocks are released by the
    # ContextCleaner when the frame goes out of scope — repeated calls
    # don't accumulate pinned storage the way persist() would
    b_grams = ngram_hash_table(benchmark, id_col, text_col, n, fan=False).select(
        F.col(id_col).alias("eval_id"), F.explode("gram_hashes").alias("gh")
    ).localCheckpoint(eager=True)
    words = build_gram_bloom(b_grams, "gh", m_bits)
    c = (
        # fan=False: same measured decision as contamination_check
        ngram_hash_table(corpus, id_col, text_col, n, fan=False)
        .select(F.col(id_col).alias("train_id"), F.explode("gram_hashes").alias("gh"))
        .filter(bloom_might_contain("gh", words, m_bits))
    )
    out = (
        c.join(b_grams, "gh")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )
    return out


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-level line deduplication (the C4 boilerplate rule): a
    normalized line occurring ``min_count``+ times across the corpus is
    boilerplate — every occurrence is dropped except the global FIRST
    (smallest ``(doc_id, pos)``); rarer lines and blank lines always
    survive. Returns one row per input document:
    ``(id, clean_text, n_kept, n_removed)`` — a document whose every
    line is dropped survives with empty text.

    Plan shape (100 TB): explode lines -> hash-groupBy the normalized
    line (one shuffle, map-side partial counts) -> join occurrences
    back on the line key -> re-assemble per document (one shuffle on
    the doc id). No driver materialization; boilerplate heavy-hitters
    make the join key skewed — AQE skew-join splits those partitions.
    """
    order_key = F.col(id_col) * F.lit(1_000_000) + F.col("pos")  # pos < 1e6
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.trim(F.lower("line")))
    occ = (
        lines.filter(F.col("norm") != "")
        .groupBy("norm")
        .agg(
            F.count("*").alias("n_occ"),
            F.min(order_key).alias("first_key"),
        )
    )
    kept = lines.join(occ, "norm", "left").filter(
        (F.col("norm") == "")
        | (F.col("n_occ") < min_count)
        | (order_key == F.col("first_key"))
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("ls"),
            F.count("*").alias("n_kept"),
        )
        .select(
            id_col,
            F.expr("array_join(transform(ls, s -> s.line), '\n')").alias("clean_text"),
            "n_kept",
        )
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    return (
        df.select(id_col)
        .join(totals, id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )


def default_document_rules(text_col: str = "text") -> list[tuple[str, Column]]:
    """The C4/Gopher-style shape-rule battery, as (name, violation)
    pairs in PRIORITY ORDER — a doc is attributed to the FIRST rule it
    violates. Every predicate is a deterministic integer-count
    expression (token_count/regexp_count/length), so the whole battery
    is oracle-replicable as a CASE chain.

    Requires the text_stats columns (computed by the callers below
    when absent)."""
    return [
        ("too_short", F.col("n_tokens") < 10),
        ("token_shape", ~F.col("avg_token_len").between(2.0, 12.0)),
        ("excess_punct", F.col("punct_ratio") > 0.3),
        ("digit_heavy", F.col("digit_ratio") > 0.2),
    ]


def apply_filter_rules(
    df: DataFrame,
    rules: list[tuple[str, Column]] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Append ``first_failed_rule``: the name of the first violated
    rule in priority order, NULL for survivors — the per-document
    "why was this dropped" explainability every curation pipeline
    owes its auditors. One narrow pass, no shuffle."""
    if rules is None:
        rules = default_document_rules(text_col)
    if "n_tokens" not in df.columns:
        df = text_stats(df, text_col)
    verdict = F.lit(None).cast("string")
    for name, violation in reversed(rules):
        verdict = F.when(violation, F.lit(name)).otherwise(verdict)
    return df.withColumn("first_failed_rule", verdict)


def filter_attribution(
    df: DataFrame,
    rules: list[tuple[str, Column]] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level drop attribution: one row per rule (plus 'PASS')
    with the count and share of documents whose FIRST violation it is.
    First-fail attribution sums to 100% by construction — overlapping
    rules never double-count, so the report answers "which rule is
    actually doing the filtering" (the question raw per-rule violation
    counts get wrong).

    Shape: the rule battery is a narrow projection; the report is one
    grouped count over ~|rules|+1 groups plus a broadcast total."""
    flagged = apply_filter_rules(df, rules, text_col)
    counts = flagged.groupBy(
        F.coalesce(F.col("first_failed_rule"), F.lit("PASS")).alias("rule")
    ).agg(F.count("*").cast("bigint").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").cast("double").alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "rule", "n_docs", F.round(F.col("n_docs") / F.col("_total"), 6).alias("share")
    )


def scrub_cross_doc_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """ExactSubstr-style REMOVAL (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): where :func:`cross_doc_ngram_spans`
    only measures repeated-span mass, this rewrites the corpus — every
    occurrence of a token ``n``-gram that appears in >= ``min_docs``
    distinct documents is CUT except the globally first one (ordered by
    ``(doc_id, char_start)``), and overlapping cut spans merge before
    the splice so each character is removed at most once.

    Shape (never doc x doc, one window pass per stage):
      1. tokenize WITH POSITIONS: ``split(text, ' ')`` + one per-doc
         prefix-sum window gives each token's char offset — the exact
         reconstruction identity ``' '.join(tokens) == text`` makes
         every span a literal substring of the document;
      2. grams via ``lead`` over the same per-doc window (full windows
         only), so gram assembly is O(n) per token inside codegen;
      3. one ``groupBy(gram)`` doc-frequency count (the only
         corpus-wide shuffle; gram keys are near-uniform, hot keys ARE
         the boilerplate signal) + a ``row_number`` over each shared
         gram picks the global survivor;
      4. gaps-and-islands window per doc merges overlapping cut spans;
      5. the splice itself is an ``aggregate`` fold over the per-doc
         ISLAND list (O(islands), bounded by text length / n — not the
         O(bits x tokens) interpreted-HOF trap simhash hit), entirely
         JVM-side.

    Returns one row per input document: ``(id_col, text_scrubbed,
    chars_removed, spans_cut)`` — ``length(text_scrubbed) ==
    length(text) - chars_removed`` by construction (the registry oracle
    re-derives the right side declaratively, so a splice bug breaks the
    driver hash).

    Greedy caveat (same as the reference ExactSubstr pipeline): the
    kept first occurrence of gram X may itself sit inside a span cut
    because of a different gram Y overlapping it — removal is greedy
    per document, not globally optimal coverage.

    At 100 TB: stages 1-2 and 4-5 are per-document map work after an
    ``id``-hash shuffle; stage 3 shuffles (gram, doc, start) triples —
    O(tokens) rows of ~n-token strings. Hash the gram key (see
    ngram_hash_table's rolling hash) to shrink that shuffle when grams
    are long; the string key is kept here for oracle-exact parity.
    """
    from pyspark.sql import Window as W

    doc = F.col(id_col)
    toks = df.select(
        doc, F.posexplode(F.split(F.col(text_col), " ")).alias("idx", "tok")
    )
    wdoc = W.partitionBy(id_col).orderBy("idx")
    prev = wdoc.rowsBetween(W.unboundedPreceding, -1)
    toks = toks.withColumn(
        "cs",
        F.coalesce(F.sum(F.length("tok") + 1).over(prev), F.lit(0)).cast("bigint"),
    )
    gram_parts = [F.col("tok")]
    for k in range(1, n):
        gram_parts += [F.lit(" "), F.lead("tok", k).over(wdoc)]
    last_tok = F.lead("tok", n - 1).over(wdoc)
    grams = (
        toks.select(
            doc,
            F.concat(*gram_parts).alias("gram"),
            F.col("cs").alias("s"),
            (F.lead("cs", n - 1).over(wdoc) + F.length(last_tok))
            .cast("bigint")
            .alias("e"),
        )
        .filter(F.col("gram").isNotNull())
        # barrier: hot-gram groupBy and the join-back both consume this
        # frame; project collapse would re-run tokenize+window twice
        .persist()
    )
    hot = (
        grams.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    wfirst = W.partitionBy("gram").orderBy(id_col, "s")
    cut = (
        grams.join(hot, "gram")
        .withColumn("rn", F.row_number().over(wfirst))
        .filter(F.col("rn") > 1)
        .select(id_col, "s", "e")
    )
    worder = W.partitionBy(id_col).orderBy("s", "e")
    wprev = worder.rowsBetween(W.unboundedPreceding, -1)
    wrun = worder.rowsBetween(W.unboundedPreceding, 0)
    # spans_cut rides the island aggregation (count of cut rows per
    # island, summed per doc == count of cut rows per doc): a separate
    # cut.groupBy(id) would RE-RUN the gram join + row_number window —
    # Catalyst does not share the unpersisted `cut` subtree between two
    # consumers — and then need its own join in the final assembly
    # (measured: one duplicated window subtree + one shuffle + one join
    # removed, span_scrub warm med 5.2 -> see OPTIMIZATION_r11.md)
    islands = (
        cut.withColumn("pmax", F.max("e").over(wprev))
        .withColumn(
            "new_isl",
            F.when(F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1)
            .otherwise(0),
        )
        .withColumn("isl", F.sum("new_isl").over(wrun))
        .groupBy(id_col, "isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"),
             F.count("*").alias("n_spans"))
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("s", "e"))).alias("islands"),
            F.sum(F.col("e") - F.col("s")).cast("bigint").alias("chars_removed"),
            F.count("*").cast("bigint").alias("n_islands"),
            F.sum("n_spans").cast("bigint").alias("spans_cut"),
        )
    )
    # O(islands) fold: walk the sorted islands, copying the kept text
    # between them, then the tail after the last island
    splice = (
        "aggregate(islands, struct(0L as pos, '' as acc), "
        "(a, i) -> struct(i.e, concat(a.acc, "
        f"substring({text_col}, cast(a.pos + 1 as int), cast(i.s - a.pos as int)))), "
        f"a -> concat(a.acc, substring({text_col}, cast(a.pos + 1 as int), "
        f"cast(length({text_col}) - a.pos as int))))"
    )
    out = (
        df.select(doc, text_col)
        .join(islands, id_col, "left")
        .select(
            doc,
            F.when(F.col("islands").isNull(), F.col(text_col))
            .otherwise(F.expr(splice))
            .alias("text_scrubbed"),
            F.coalesce("chars_removed", F.lit(0)).cast("bigint").alias(
                "chars_removed"
            ),
            F.coalesce("spans_cut", F.lit(0)).cast("bigint").alias("spans_cut"),
        )
    )
    return out
