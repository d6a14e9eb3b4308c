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


def train_bpe(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_freq: int = 2,
    max_words: int | None = 50_000,
) -> list[dict]:
    """Learn up to ``n_merges`` BPE merges; returns the merge table as
    ``[{rank, left, right, merged, pair_freq}, ...]`` (rank 0 first).
    Stops early when no pair reaches ``min_pair_freq``.

    The returned table is the ARTIFACT (like a trained IVF codebook):
    persist it, then apply with :func:`apply_merges` (JVM fold, good
    for bounded merge counts) or :func:`bpe_encode_pandas` (broadcast
    ranks + Arrow batches, the production encoder shape).
    """
    words = (
        word_freq_table(df, text_col, max_words)
        .filter(~F.col("word").contains(_SEP))
        .withColumn("syms", _initial_sym_string("word"))
        .select("freq", "syms")
    )
    words, ckpt_id = _tracked_ckpt(words)

    merges: list[dict] = []
    since_ckpt = 0
    for rank in range(n_merges):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("pair_freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0].pair_freq < min_pair_freq:
            break
        a, b, pf = best[0].left, best[0].right, int(best[0].pair_freq)
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": a + b, "pair_freq": pf}
        )
        words = words.withColumn(
            "syms",
            F.replace(
                F.col("syms"),
                F.lit(_SEP + a + _SEP + _SEP + b + _SEP),
                F.lit(_SEP + a + b + _SEP),
            ),
        )
        since_ckpt += 1
        if since_ckpt >= CKPT_EVERY:
            nxt, nxt_id = _tracked_ckpt(words)
            _free_ckpt(words, ckpt_id)
            words, ckpt_id = nxt, nxt_id
            since_ckpt = 0
    _free_ckpt(words, ckpt_id)
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
