"""Distributed BPE tokenizer training — learn a byte-pair-encoding
merge table from a corpus, Spark-first.

A training-data platform doesn't just consume tokenizers, it builds
them: vocabulary studies, domain adapters, compression-ratio sweeps
all start with "train BPE on this corpus slice". The classic
formulation (Sennrich, Haddow & Birch, ACL'16, "Neural Machine
Translation of Rare Words with Subword Units") is inherently
iterative — each merge depends on the counts AFTER the previous
merge — so it cannot be a single declarative query; what CAN be
distributed is everything inside a round.

Scale design — the loop runs on the WORD-FREQUENCY table, never the
corpus:

1. One corpus pass builds ``(word, freq)`` (a groupBy — the only
   corpus-sized shuffle). Classic BPE operates on this table: merging
   inside a word is independent of context, so a word seen 10^6 times
   is processed once with weight 10^6. Vocabulary grows ~ Heaps' law
   (sublinear), so at 100 TB the working table is millions of rows,
   not trillions; ``max_words`` additionally caps it to the heaviest
   words (standard practice — the tail contributes ~0 to pair counts).
2. Per round: pair counts are a JVM-side array transform + explode +
   sum (weighted by freq) over that table; the driver pulls ONE row
   (the argmax — a metadata-bounded collect) and rewrites the symbol
   arrays with a JVM ``aggregate`` fold. No Python touches row data.
3. Plan depth is cut every few rounds with tracked localCheckpoints
   (superseded generations freed — the graph.py pattern).

Ties break deterministically: highest weighted count, then
lexicographic (left, right) — same corpus in, same merge table out,
regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from x_spark.functions.portable import tokens
from x_spark.operators.graph import _free_ckpt, _tracked_ckpt

END_OF_WORD = "</w>"
CKPT_EVERY = 6  # rounds between lineage cuts
_SEP = "\x1f"  # unit separator: delimits symbols in the trainer's
# string representation; words containing it are dropped from the
# frequency table (a unit separator inside a whitespace token is
# corpus noise, and one symbol colliding with the delimiter would
# corrupt every downstream merge)


def word_freq_table(
    df: DataFrame, text_col: str = "text", max_words: int | None = 50_000
) -> DataFrame:
    """``(word, freq)`` over lowercased whitespace tokens — the one
    corpus-sized pass; everything downstream is vocabulary-sized.
    ``max_words`` keeps the heaviest words (ties by word so the cut is
    deterministic), the standard BPE-training truncation."""
    wf = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    if max_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)
    return wf


def _initial_symbols(word_col: str = "word") -> Column:
    """Split a word into single-character symbols plus the end-of-word
    marker (so merges can learn suffixes like ``ing</w>``)."""
    return F.expr(
        f"concat(transform(sequence(1, length({word_col})), "
        f"i -> substr({word_col}, i, 1)), array('{END_OF_WORD}'))"
    )


def _initial_sym_string(word_col: str = "word") -> Column:
    """Trainer-internal representation: every symbol wrapped in its OWN
    separator pair and concatenated — ``low`` becomes
    ``~l~~o~~w~~</w>~`` (with ``~`` standing for ``\\x1f``). A merge of
    pair (a, b) is then ONE literal
    ``replace(s, ~a~~b~, ~ab~)`` — left-to-right, non-overlapping,
    resuming after each replacement, which is exactly BPE's greedy
    scan (``a a a`` -> ``aa a``; and in ``a b a b`` BOTH pairs merge
    because wrapped symbols never share delimiter characters).

    Why a string, not the symbol array: every training round is a NEW
    plan that whole-stage codegen must recompile, and a one-call
    ``replace`` keeps that tree tiny (measured ~0.9 s/round with an
    ``aggregate``-fold chain vs ~0.2 s/round with replace). The same
    representation is also expressible verbatim in other engines
    (plain string replace — no regex dialect involved)."""
    return F.concat(
        F.expr(
            f"array_join(transform(sequence(1, length({word_col})), "
            f"i -> concat('{_SEP}', substr({word_col}, i, 1), '{_SEP}')), '')"
        ),
        F.lit(_SEP + END_OF_WORD + _SEP),
    )


def _pair_counts(words: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Weighted adjacent-pair counts over the current segmentation —
    one explode + groupBy on the vocabulary table. ``syms_col`` may be
    an array of symbols or the trainer's delimited string."""
    if dict(words.dtypes)[syms_col] == "string":
        # strip the outermost separators, split on the doubled inner
        # delimiter -> the symbol array
        arr = (
            f"split(substring({syms_col}, 2, length({syms_col}) - 2), "
            f"'{_SEP}{_SEP}')"
        )
        pairs = F.expr(
            f"transform(sequence(1, size({arr}) - 1), "
            f"i -> struct(element_at({arr}, i) AS left, "
            f"element_at({arr}, i + 1) AS right))"
        )
        # a fully-merged word has ONE symbol — and Spark's
        # sequence(1, 0) counts DOWN, so guard to >= 2 symbols
        guard = F.expr(f"size({arr}) >= 2")
    else:
        pairs = F.expr(
            f"transform(sequence(1, size({syms_col}) - 1), "
            f"i -> struct(element_at({syms_col}, i) AS left, "
            f"element_at({syms_col}, i + 1) AS right))"
        )
        guard = F.size(syms_col) >= 2
    return (
        words.filter(guard)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def merge_pair_fold(a: str, b: str, syms_col: str = "syms") -> Column:
    """Replace every non-overlapping left-to-right occurrence of the
    adjacent pair ``(a, b)`` with the fused symbol — a JVM ``aggregate``
    fold over the symbol array (matches reference BPE's greedy scan:
    in ``a a a`` the merge ``(a,a)`` yields ``aa, a``)."""
    fused = a + b
    empty = F.array().cast("array<string>")

    def step(acc: Column, s: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(F.col(syms_col), empty, step)


def _triple_counts(words: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Weighted adjacent-TRIPLE counts over the trainer's delimited
    string representation — same shape as :func:`_pair_counts`, one
    position wider. Triples let the driver simulate several sequential
    merges exactly (the count delta a merge applies to a neighboring
    pair is a triple count)."""
    arr = (
        f"split(substring({syms_col}, 2, length({syms_col}) - 2), "
        f"'{_SEP}{_SEP}')"
    )
    trips = F.expr(
        f"transform(sequence(1, size({arr}) - 2), "
        f"i -> struct(element_at({arr}, i) AS left, "
        f"element_at({arr}, i + 1) AS mid, "
        f"element_at({arr}, i + 2) AS right))"
    )
    guard = F.expr(f"size({arr}) >= 3")
    return (
        words.filter(guard)
        .select("freq", F.explode(trips).alias("t"))
        .groupBy(
            F.col("t.left").alias("left"),
            F.col("t.mid").alias("mid"),
            F.col("t.right").alias("right"),
        )
        .agg(F.sum("freq").alias("trip_freq"))
    )


def _simulate_merges(
    top_pairs: list,
    top_trips: list,
    floor_p: int,
    floor_t: int,
    max_batch: int,
    min_pair_freq: int,
) -> list[tuple[str, str, int]]:
    """Driver-side EXACT simulation of several sequential BPE steps
    from one collected snapshot of pair + triple counts — the
    "maintain incremental pair counts" optimization, done on
    metadata-bounded state (K pairs + T triples, never the corpus).

    Why triples suffice: for a merge of (u, v) with u != v, EVERY
    textual occurrence of the pair merges (greedy left-to-right can
    only skip an occurrence whose first symbol was consumed by a
    previous overlapping match, which for u != v is impossible), so
    the exact count updates are
        count(x, u) -= T(x, u, v)     [the u was consumed]
        count(v, y) -= T(u, v, y)     [the v was consumed]
        count(x, uv) = T(x, u, v)     [x != v]
        count(uv, y) = T(u, v, y)     [y != u]
    with T(.) the adjacent-triple counts. The corner cases that need
    QUADRUPLE knowledge — the reversed pair (v, u) (an occurrence can
    lose both its symbols in an "u v u v" chain, double-counting the
    decrement) and the chain pairs (v, uv) / (uv, u) / (uv, uv) — are
    tracked as UPPER BOUNDS instead of exact counts, unless a zero
    bridging triple proves the chain empty.

    A pair with an exact count is picked as the next merge only when
    it provably outranks every upper-bounded pair, every uncollected
    pair (bounded by the collection floors), and ties break on the
    (left, right) order exactly as the distributed sort does — so the
    emitted sequence is IDENTICAL to recounting after every merge
    (pinned by the property tests). When certainty runs out, the
    round ends and the next round recounts for real.

    Triples whose symbols were touched by an applied merge flip to
    upper-bound mode positionally: (p,u,v)/(u,v,r) are fully consumed
    (count 0); a leading ``v`` or trailing ``u`` may be eaten by a
    neighbor outside the triple (bound keeps the stale value); all
    other triples are untouched — merges only create adjacencies
    involving the fused symbol. Missing triples are exactly zero when
    the triple collection was complete (floor_t == 0) and the key
    holds no batch-fused symbol; otherwise they are bounded by
    floor_t.
    """
    pairs = {p: [c, True] for p, c in top_pairs}  # pair -> [ub, exact]
    trips = {t: [c, True] for t, c in top_trips}  # trip -> [ub, exact]
    ceiling = max(floor_p, floor_t)
    batch: list[tuple[str, str, int]] = []
    fused_syms: set[str] = set()

    def tget(key):
        """-> (count_or_ub, exact). Missing original-symbol triples
        are exactly 0 iff the collection was complete."""
        t = trips.get(key)
        if t is not None:
            return t[0], t[1]
        if floor_t == 0 and not any(s in fused_syms for s in key):
            return 0, True
        return None, False

    while len(batch) < max_batch:
        exact = [(c, p) for p, (c, ex) in pairs.items() if ex]
        if not exact:
            break
        neg_c, best = min(((-c, p) for c, p in exact))
        best_c = -neg_c
        if best_c < min_pair_freq:
            break
        if batch:  # the first pick of a fresh round is the true argmax
            blocked = any(
                (not ex) and (c > best_c or (c == best_c and p < best))
                for p, (c, ex) in pairs.items()
            )
            if blocked or best_c <= ceiling:
                break
        u, v = best
        batch.append((u, v, best_c))
        fusedsym = u + v
        if u == v:
            # run-merges ("a a a a") would need quadruple counts for
            # exact updates — apply this one and end the round
            break
        pf = best_c
        pre = {p: e[0] for p, e in pairs.items()}
        del pairs[(u, v)]
        c_vuv, e_vuv = tget((v, u, v))
        c_uvu, e_uvu = tget((u, v, u))
        vuv_zero = e_vuv and c_vuv == 0
        uvu_zero = e_uvu and c_uvu == 0
        for q in list(pairs):
            x, y = q
            if q == (v, u):
                # loses occurrences on BOTH sides; overlap ("u v u v")
                # double-counts, so exact only when a bridging triple
                # is provably zero
                if (vuv_zero or uvu_zero) and e_vuv and e_uvu:
                    pairs[q][0] -= c_vuv + c_uvu
                else:
                    d = max(c_vuv if e_vuv else 0, c_uvu if e_uvu else 0)
                    pairs[q] = [pairs[q][0] - d, False]
                continue
            if y == u:
                c, e = tget((x, u, v))
                if e:
                    pairs[q][0] -= c
                else:
                    pairs[q][1] = False
            elif x == v:
                c, e = tget((u, v, y))
                if e:
                    pairs[q][0] -= c
                else:
                    pairs[q][1] = False
        for q, pc in pre.items():
            x, y = q
            if q == (u, v):
                continue
            if y == u:
                c, e = tget((x, u, v))
                if e and (x != v or vuv_zero or uvu_zero):
                    if c > ceiling:
                        pairs[(x, fusedsym)] = [c, True]
                else:
                    b2 = min(pc, pf, c if c is not None else pc)
                    if b2 > ceiling:
                        pairs[(x, fusedsym)] = [b2, False]
            if x == v:
                c, e = tget((u, v, y))
                if e and (y != u or vuv_zero or uvu_zero):
                    if c > ceiling:
                        pairs[(fusedsym, y)] = [c, True]
                else:
                    b2 = min(pc, pf, c if c is not None else pc)
                    if b2 > ceiling:
                        pairs[(fusedsym, y)] = [b2, False]
        if not (vuv_zero or uvu_zero):
            # (uv, uv) needs an "u v u v" chain; bounded by the
            # bridging reversed pair
            b2 = min(pre.get((v, u), ceiling), pf)
            if b2 > ceiling:
                pairs[(fusedsym, fusedsym)] = [b2, False]
        for t, e in trips.items():
            p, q, r = t
            if (p == u and q == v) or (q == u and r == v):
                e[0] = 0  # the embedded (u,v) always merges
            elif p == v or r == u:
                e[1] = False  # boundary symbol may be eaten outside
        fused_syms.add(fusedsym)
    return batch


def train_bpe(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_freq: int = 2,
    max_words: int | None = 50_000,
    batch_merges: int = 16,
    top_pairs: int = 64,
    top_triples: int = 4096,
    stats_out: dict | None = None,
) -> list[dict]:
    """Learn up to ``n_merges`` BPE merges; returns the merge table as
    ``[{rank, left, right, merged, pair_freq}, ...]`` (rank 0 first).
    Stops early when no pair reaches ``min_pair_freq``.

    Driver round-trips are batched: each round collects the top
    ``top_pairs`` pair counts AND the top ``top_triples`` triple
    counts in ONE action (a tagged union — still metadata-bounded),
    then :func:`_simulate_merges` replays as many sequential steps as
    it can certify exactly, and the whole batch is applied in a
    single chained-replace rewrite (each ``replace`` is one full
    greedy merge pass, so replay order == sequential semantics — the
    same argument as :func:`apply_merges_str`). The merge sequence is
    IDENTICAL to the one-merge-per-round reference loop (pinned by
    the property tests); measured round-trip reduction on the test
    corpus is ~4-6x (``stats_out`` receives ``{"rounds", "merges"}``
    so the saving is measurable, not asserted).
    ``batch_merges=1`` restores the one-at-a-time loop.

    The returned table is the ARTIFACT (like a trained IVF codebook):
    persist it, then apply with :func:`apply_merges` (JVM fold, good
    for bounded merge counts) or :func:`bpe_encode_pandas` (broadcast
    ranks + Arrow batches, the production encoder shape).

    Corpora that grow batch-by-batch should not re-tokenize from
    scratch: maintain the counts with :func:`update_word_freq_store`
    and retrain via :func:`train_bpe_from_word_freqs` — the one
    O(corpus) pass becomes O(batch) per ingest (ROADMAP incremental
    word-frequency lever).
    """
    return train_bpe_from_word_freqs(
        word_freq_table(df, text_col, max_words=None),
        n_merges=n_merges,
        min_pair_freq=min_pair_freq,
        max_words=max_words,
        batch_merges=batch_merges,
        top_pairs=top_pairs,
        top_triples=top_triples,
        stats_out=stats_out,
    )


def train_bpe_from_word_freqs(
    word_freqs: DataFrame,
    n_merges: int = 50,
    min_pair_freq: int = 2,
    max_words: int | None = 50_000,
    batch_merges: int = 16,
    top_pairs: int = 64,
    top_triples: int = 4096,
    stats_out: dict | None = None,
) -> list[dict]:
    """:func:`train_bpe`'s loop over a PREBUILT ``(word, freq)`` table
    — the entry point for the incrementally maintained word-frequency
    store (:func:`update_word_freq_store`): training never touches the
    corpus, only the vocabulary-sized counts. The ``max_words`` cut is
    applied here (same deterministic (freq desc, word) order as
    :func:`word_freq_table`), so a store built incrementally trains to
    the IDENTICAL merge table as a from-scratch run over the union of
    its batches (pinned by test)."""
    wf = word_freqs
    if max_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)
    words = (
        wf.filter(~F.col("word").contains(_SEP))
        .withColumn("syms", _initial_sym_string("word"))
        .select("freq", "syms")
    )
    words, ckpt_id = _tracked_ckpt(words)

    merges: list[dict] = []
    rounds = 0
    since_ckpt = 0
    top_k = max(top_pairs, 4)
    while len(merges) < n_merges:
        pc = (
            _pair_counts(words)
            .orderBy(F.desc("pair_freq"), F.asc("left"), F.asc("right"))
            .limit(top_k)
            .select(
                F.lit("p").alias("kind"),
                "left",
                F.lit(None).cast("string").alias("mid"),
                "right",
                F.col("pair_freq").alias("freq"),
            )
        )
        tc = (
            _triple_counts(words)
            .orderBy(
                F.desc("trip_freq"), F.asc("left"), F.asc("mid"), F.asc("right")
            )
            .limit(top_triples)
            .select(
                F.lit("t").alias("kind"),
                "left",
                "mid",
                "right",
                F.col("trip_freq").alias("freq"),
            )
        )
        rows = pc.unionByName(tc).collect()  # ONE driver round-trip
        # union does not preserve the per-branch sort — re-sort the
        # (tiny) lists driver-side; the simulation and the floor
        # computation both rely on (freq desc, key asc) order
        top = sorted(
            (((r.left, r.right), int(r.freq)) for r in rows if r.kind == "p"),
            key=lambda kv: (-kv[1], kv[0]),
        )
        trip = sorted(
            (
                ((r.left, r.mid, r.right), int(r.freq))
                for r in rows
                if r.kind == "t"
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )
        rounds += 1
        if not top or top[0][1] < min_pair_freq:
            break
        floor_p = top[-1][1] if len(top) == top_k else 0
        floor_t = trip[-1][1] if len(trip) == top_triples else 0
        batch = _simulate_merges(
            top,
            trip,
            floor_p,
            floor_t,
            max(1, min(batch_merges, n_merges - len(merges))),
            min_pair_freq,
        )
        col = F.col("syms")
        for a, b, pf in batch:
            merges.append(
                {
                    "rank": len(merges),
                    "left": a,
                    "right": b,
                    "merged": a + b,
                    "pair_freq": pf,
                }
            )
            col = F.replace(
                col,
                F.lit(_SEP + a + _SEP + _SEP + b + _SEP),
                F.lit(_SEP + a + b + _SEP),
            )
        words = words.withColumn("syms", col)
        since_ckpt += 1
        if since_ckpt >= CKPT_EVERY:
            nxt, nxt_id = _tracked_ckpt(words)
            _free_ckpt(words, ckpt_id)
            words, ckpt_id = nxt, nxt_id
            since_ckpt = 0
    _free_ckpt(words, ckpt_id)
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["merges"] = len(merges)
    return merges


def apply_merges(
    df: DataFrame, merges: list[dict], text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Segment text into BPE tokens by replaying the merge table in
    rank order — pure JVM folds (one nested expression per merge;
    fine for bounded merge tables, e.g. analysis vocabularies).

    Applies per whitespace word (BPE never merges across words), so
    the expression runs on a words array column built in-line."""
    words = F.expr(
        f"transform(regexp_extract_all(lower({text_col}), '\\\\S+', 0), "
        f"w -> concat(transform(sequence(1, length(w)), i -> substr(w, i, 1)), "
        f"array('{END_OF_WORD}')))"
    )
    out = df.withColumn("_wsyms", words)
    # fold each merge over every word's symbol array, in rank order
    empty = F.array().cast("array<string>")

    def make_step(a: str, b: str, fused: str):
        def step(acc, s):
            hit = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (s == F.lit(b))
            )
            return F.when(
                hit,
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))),
            ).otherwise(F.concat(acc, F.array(s)))

        return step

    def make_word_fold(step):
        return lambda w: F.aggregate(w, empty, step)

    col = F.col("_wsyms")
    for m in sorted(merges, key=lambda m: m["rank"]):
        step = make_step(m["left"], m["right"], m["merged"])
        col = F.transform(col, make_word_fold(step))
    return out.withColumn(out_col, F.flatten(col)).drop("_wsyms")


def apply_merges_str(
    df: DataFrame, merges: list[dict], text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Replace-chain flavor of :func:`apply_merges` — same greedy
    semantics (pinned equal by tests), via the trainer's wrapped-string
    representation: each word becomes ``~c~~c~...~</w>~`` and every
    merge is one literal ``replace`` over the whole word string. This
    is the fast JVM path for bulk encoding (measured 21 s -> ~1 s over
    the sf0.1 corpus vs the nested ``aggregate`` folds: ``replace`` is
    a tight scan, a fold is a per-element lambda with array copies)."""
    wrapped = (
        f"transform(regexp_extract_all(lower({text_col}), '\\\\S+', 0), "
        f"w -> concat(array_join(transform(sequence(1, length(w)), "
        f"i -> concat('{_SEP}', substr(w, i, 1), '{_SEP}')), ''), "
        f"'{_SEP}{END_OF_WORD}{_SEP}'))"
    )
    def make_repl(pat: str, rep: str):
        return lambda w: F.replace(w, F.lit(pat), F.lit(rep))

    col = F.expr(wrapped)
    for m in sorted(merges, key=lambda m: m["rank"]):
        col = F.transform(
            col,
            make_repl(
                _SEP + m["left"] + _SEP + _SEP + m["right"] + _SEP,
                _SEP + m["merged"] + _SEP,
            ),
        )
    toks = F.flatten(
        F.transform(
            col,
            lambda w: F.split(
                F.substring(w, 2, F.length(w) - 2), _SEP + _SEP
            ),
        )
    )
    return df.withColumn(out_col, toks)


def bpe_encode_pandas(
    df: DataFrame, merges: list[dict], text_col: str = "text",
    id_col: str = "doc_id", out_col: str = "bpe_tokens",
) -> DataFrame:
    """Production encoder shape: broadcast the merge-rank dict, apply
    greedily per word in Arrow-batched pandas (the GPT-2 encoder loop:
    repeatedly fuse the LOWEST-RANK adjacent pair present). For a
    trained table this yields the same segmentation as replaying
    merges in rank order (:func:`apply_merges`) — pinned by tests.
    """
    import pandas as pd

    spark = df.sparkSession
    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
    fuse = {(m["left"], m["right"]): m["merged"] for m in merges}
    b_ranks = spark.sparkContext.broadcast((ranks, fuse))

    def encode_word(word: str) -> list[str]:
        rk, fu = b_ranks.value
        syms = list(word) + [END_OF_WORD]
        while len(syms) >= 2:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = rk.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            pair = (syms[best], syms[best + 1])
            syms[best:best + 2] = [fu[pair]]
        return syms

    def encode_batch(it):
        for pdf in it:
            toks = [
                [t for w in str(txt).lower().split() for t in encode_word(w)]
                if txt is not None
                else []
                for txt in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    # preserve the caller's id type (string keys, ints, ...) — a
    # hardcoded bigint would silently cast or fail on non-bigint ids
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_col} array<string>"
    return df.select(id_col, text_col).mapInPandas(encode_batch, schema=schema)


def update_word_freq_store(
    ds,
    ref,
    batch: DataFrame,
    text_col: str = "text",
    txn: tuple[str, int] | None = None,
) -> None:
    """Fold one ingest batch's word counts into a txlog-backed
    ``(word, freq)`` store: ONE O(batch) tokenize+count pass, then a
    key-joined accumulate MERGE (the streaming-upsert accumulate
    shape — only touched words rewrite, key-range file skipping keeps
    the rewrite bounded). ``txn=(app_id, epoch)`` makes replays
    exactly-once, so this drops straight into a foreachBatch handler.

    The store IS the trainer input: :func:`train_bpe_from_word_freqs`
    over ``ds.read(ref)`` retrains without re-reading any document —
    at 100 TB the corpus pass happens once per batch at ingest time,
    never again at training time."""
    from x_spark.sources.base import MergeSpec

    delta = word_freq_table(batch, text_col, max_words=None)
    if not ds.table_exists(ref):
        ds.create(ref, delta.schema)
    prior = ds.read(ref).select("word", F.col("freq").alias("_old"))
    src = (
        delta.join(prior, "word", "left")
        .select(
            "word",
            (F.col("freq") + F.coalesce(F.col("_old"), F.lit(0)))
            .cast("bigint")
            .alias("freq"),
        )
        # materialize once: the merge evaluates its source for the
        # key-skipping probe, the join, and the write
        .localCheckpoint(eager=True)
    )
    ds.merge(
        src,
        ref,
        MergeSpec(
            ["word"], ["freq"],
            insert_when_not_matched=True,
            validate_unique_source_keys=False,  # groupBy word: unique
        ),
        txn=txn,
    )
