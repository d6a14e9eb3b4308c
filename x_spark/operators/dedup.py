"""Deduplication operators for large-scale training-data pipelines.

Extensions beyond the reference (SURVEY §7 Phase E):

- exact dedup           hash-groupBy on a canonical fingerprint
- MinHash + LSH         shingle -> minhash signature -> banded bucket
                        join -> candidate pairs (est. Jaccard)
- SimHash               48-bit token-hash sign aggregate; 4 bands of
                        12 bits guarantee recall for hamming <= 3
                        (pigeonhole) while keeping buckets sparse
- n-gram Jaccard        exact verification on candidate pairs

Design for 100 TB: signatures/fingerprints are computed in ONE
projection per row with higher-order array functions (JVM codegen, no
Python, no explode — shingling a row never shuffles). The only
shuffles are (a) the bucket-join on band keys, whose fan-out is
controlled by band width, and (b) the final distinct on pairs.
Candidate verification touches only bucket-collision pairs, never the
full cross product. Shingling reads a bounded prefix per document
(standard sketching trade-off).

All hash math is md5-based and < 2^52 (ANSI-safe), bit-identical in
the DuckDB oracle — see x_spark.functions.portable.
"""

from __future__ import annotations

import logging
from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from x_spark.fanout import fan_out
from x_spark.functions.portable import (
    MINHASH_PRIME,
    fingerprint,
    hash32,
    hash32_sql,
    tokens,
)

logger = logging.getLogger(__name__)

# (a, b) coefficients for the k=12 minhash permutations, mirrored
# literally in the oracle SQL:
# h_i = (a_i * h32 + b_i) mod MINHASH_PRIME; a < 2^20 keeps products < 2^52.
MINHASH_COEFFS: list[tuple[int, int]] = [
    (646271, 91813),
    (417293, 20177),
    (899809, 384203),
    (131071, 55001),
    (524287, 77213),
    (262139, 131009),
    (786431, 17291),
    (104729, 262133),
    (999983, 700001),
    (333667, 99991),
    (175003, 424243),
    (611953, 37811),
]

SHINGLE_K = 8
SHINGLE_PREFIX = 200  # bounded work per row
N_BANDS = 4  # bands of SIGS_PER_BAND signature positions each
SIGS_PER_BAND = 3  # 3-wide bands: collision prob ~J^3 — suppresses the
# boilerplate-shingle candidate blow-up a 2-wide band suffers (measured
# 68k -> ~2k candidate pairs on the synthetic corpus at sf0.1)


def _shingle_expr(text_col: str) -> str:
    """Spark-SQL expr: distinct char shingles of the text prefix.

    DuckDB: list_distinct(list_transform(range(1, greatest(length(t)-k+1,0)+1),
    i -> substr(t, i::int, k)))
    """
    t = f"substr({text_col}, 1, {SHINGLE_PREFIX})"
    return (
        f"array_distinct(CASE WHEN length({t}) >= {SHINGLE_K} "
        f"THEN transform(sequence(1, length({t})-{SHINGLE_K}+1), i -> substr({t}, i, {SHINGLE_K})) "
        f"ELSE array() END)"
    )


def with_shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("shingles", F.expr(_shingle_expr(text_col)))


def with_shingle_hashes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``shingle_hashes``: 32-bit hashes of the distinct shingles."""
    return with_shingles(df, text_col).withColumn(
        "shingle_hashes", F.expr(f"transform(shingles, t -> {hash32_sql('t')})")
    )


def _with_sigs(df: DataFrame) -> DataFrame:
    """Derive sig_0..sig_{k-1} minhash columns from ``shingle_hashes``."""
    out = df
    for i, (a, b) in enumerate(MINHASH_COEFFS):
        out = out.withColumn(
            f"sig_{i}",
            F.expr(
                f"array_min(transform(shingle_hashes, h -> ({a}L * h + {b}L) % {MINHASH_PRIME}L))"
            ),
        )
    return out


def with_minhash_signature(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append sig_0..sig_{k-1} minhash columns (one projection, no shuffle)."""
    return _with_sigs(with_shingle_hashes(df, text_col))


def _sketch_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, shingle_hashes) persisted — ONE md5/shingling pass serves
    band keys, est-Jaccard signatures AND exact verification. The
    persist is the barrier that stops Catalyst's project collapse from
    re-inlining the md5 transform into every downstream consumer
    (measured ~6x recompute without it); repeated calls on the same
    input dedupe via Spark's cache manager (canonicalized-plan key).
    Size: id + ~prefix ints per row, MEMORY_AND_DISK at scale.

    The md5 shingling dominates this operator and runs BEFORE the
    first exchange, so on a degenerate input layout (one file / one
    row group) it serializes on one or two cores — ``fan_out`` the
    projected (id, text) rows first (guide §2.5; no-op on a
    healthy multi-split table). Per-row hashes are order-independent,
    so the persisted content is identical.
    """
    return (
        with_shingle_hashes(fan_out(df.select(id_col, text_col)), text_col)
        .select(id_col, "shingle_hashes")
        .persist()
    )


def minhash_band_keys() -> list:
    """Band key columns: '<band>|<sig_rj>|...|<sig_rj+r-1>'."""
    r = SIGS_PER_BAND
    keys = []
    for j in range(N_BANDS):
        keys.append(
            F.concat_ws(
                "|", F.lit(str(j)), *[F.col(f"sig_{r * j + i}") for i in range(r)]
            ).alias(f"band_{j}")
        )
    return keys


def cap_band_buckets(
    bands: DataFrame, key_col: str, cap: int | None, label: str = "lsh"
) -> DataFrame:
    """Drop band buckets holding more than ``cap`` members — the
    escape hatch for boilerplate-heavy corpora where one hot bucket
    would otherwise produce O(n^2) candidate pairs.

    A bucket of size n yields n(n-1)/2 pairs; buckets past a few
    hundred members are near-certainly boilerplate (identical headers,
    license blocks) whose pairs are better found by exact dedup on the
    boilerplate key. Dropping a bucket can only lose pairs whose EVERY
    colliding band is hot — for genuinely similar documents other
    bands still collide, so recall on normal text is unchanged (pinned
    by test_dedup_cap.py).

    Single extra shuffle-free pass: the count runs as a window over the
    same band-key partitioning the join shuffles on. Dropped-bucket
    stats are logged with one metadata-bounded aggregate action.
    """
    if cap is None:
        return bands
    w = Window.partitionBy(key_col)
    sized = bands.withColumn("_bucket_n", F.count("*").over(w))
    dropped = (
        sized.filter(F.col("_bucket_n") > cap)
        .groupBy(key_col)
        .count()
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("count").alias("max_size"),
            F.sum("count").alias("n_members"),
        )
        .first()
    )
    if dropped and dropped["n_buckets"]:
        logger.warning(
            "%s: dropped %d hot bucket(s) over cap=%d (largest=%d, %d members) "
            "— pairs within them are not scored",
            label,
            dropped["n_buckets"],
            cap,
            dropped["max_size"],
            dropped["n_members"],
        )
    return sized.filter(F.col("_bucket_n") <= cap).drop("_bucket_n")


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: ids sharing >= 1 signature band, with the
    estimated Jaccard (fraction of equal signature positions).

    Scale: the band explode is k/2 rows per doc; the self-join shuffles
    on band keys only; hot buckets (boilerplate text) are the skew risk
    — AQE skew-join handles moderate cases, and ``max_bucket_size``
    drops pathological buckets (see :func:`cap_band_buckets`).
    """
    k = len(MINHASH_COEFFS)
    # sig derivation from the persisted hash arrays is cheap modular
    # math — fine to recompute per consumer
    sigs = _with_sigs(_sketch_table(df, id_col, text_col)).select(
        id_col, *[f"sig_{i}" for i in range(k)]
    )
    bands = sigs.select(
        id_col, F.explode(F.array(*minhash_band_keys())).alias("band_key")
    )
    bands = cap_band_buckets(bands, "band_key", max_bucket_size, "minhash-lsh")
    left = bands.alias("a")
    right = bands.alias("b")
    pairs = (
        left.join(right, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sa = sigs.select(
        F.col(id_col).alias("id_a"), *[F.col(f"sig_{i}").alias(f"sa_{i}") for i in range(k)]
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"), *[F.col(f"sig_{i}").alias(f"sb_{i}") for i in range(k)]
    )
    eq_count = reduce(
        lambda x, y: x + y,
        [
            F.when(F.col(f"sa_{i}") == F.col(f"sb_{i}"), 1).otherwise(0)
            for i in range(k)
        ],
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (eq_count.cast("double") / F.lit(float(k))).alias("est_jaccard"),
        )
    )


SIMHASH_BITS = 48  # md5-prefix token hash width; bucket sparsity ~2^12/band
SIMHASH_BANDS = 4  # 12-bit bands; hamming <= 3 => one band collides


def with_simhash(df: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """Append a ``bits``-wide simhash of the whitespace tokens.

    bit b = 1 iff sum over tokens of (2*((h>>b)&1) - 1) > 0 — pure
    integer math, single projection, exact in both engines.
    Token hash is the first bits/4 hex chars of md5 (DuckDB:
    cast(concat('0x', substr(md5(t),1,12)) as bigint)).
    """
    tok_hashes = (
        f"transform(regexp_extract_all(lower({text_col}), '\\\\S+', 0), "
        f"t -> cast(conv(substr(md5(t),1,{bits // 4}),16,10) as bigint))"
    )
    # materialize token hashes ONCE per row: inlining the md5/regex
    # expression inside the per-bit lambda would recompute it `bits`
    # times (measured 25x slower at sf0.1)
    sim = (
        f"aggregate(transform(sequence(0, {bits - 1}), b -> "
        f"CASE WHEN aggregate(_tok_hashes, 0L, (acc, h) -> acc + 2 * ((h >> b) & 1) - 1) > 0 "
        f"THEN shiftleft(1L, b) ELSE 0L END), 0L, (acc, x) -> acc + x)"
    )
    return (
        df.withColumn("_tok_hashes", F.expr(tok_hashes))
        .withColumn("simhash", F.expr(sim))
        .drop("_tok_hashes")
    )


def simhash_by_id(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  bits: int = SIMHASH_BITS) -> DataFrame:
    """``(id_col, simhash)`` — bit-identical to :func:`with_simhash`
    but computed CODEGEN-side: tokens explode, the per-bit ones-counts
    come from ``bits`` ordinary sum aggregates (whole-stage codegen +
    map-side partial aggregation), and the hash reassembles from the
    counts. The nested higher-order-function form is evaluated
    INTERPRETED per (bit x token) — measured 17.5 s vs 4.0 s for this
    path on the sf0.1 corpus, same values — and at 100 TB the
    difference is the whole job: sums scale with executors, an
    interpreted O(bits x tokens) row expression does not. Requires a
    row-identifying column (the groupBy key); the general
    column-append form without one stays :func:`with_simhash`."""
    from functools import reduce  # noqa: PLC0415
    from operator import add  # noqa: PLC0415

    tok_hashes = (
        f"transform(regexp_extract_all(lower({text_col}), '\\\\S+', 0), "
        f"t -> cast(conv(substr(md5(t),1,{bits // 4}),16,10) as bigint))"
    )
    # the md5 token hashing runs before the first exchange: fan a
    # degenerate scan layout out to every core first (guide §2.5;
    # no-op on multi-split inputs, sums are order-independent)
    toks = fan_out(df.select(id_col, text_col)).select(
        id_col, F.explode_outer(F.expr(tok_hashes)).alias("_h")
    )
    aggs = [
        F.sum(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)))
        .alias(f"_c{b}")
        for b in range(bits)
    ]
    counts = toks.groupBy(id_col).agg(
        F.count(F.col("_h")).alias("_n"), *aggs
    )
    # bit b set iff 2*ones_b - n_tokens > 0 — the same majority rule
    # as with_simhash (empty docs: counts NULL/0 -> every bit 0)
    sim = reduce(add, [
        F.when(2 * F.col(f"_c{b}") - F.col("_n") > 0,
               F.lit(1 << b).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
        for b in range(bits)
    ])
    return counts.select(id_col, sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by simhash hamming distance, found via
    banding: 4 bands of 12 bits — hamming <= 3 guarantees at least one
    equal band (pigeonhole), so the band join has full recall, while
    4096 values per band keep buckets sparse at scale (the 100 TB
    failure mode of narrow bands is quadratic bucket blow-up)."""
    band_width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << band_width) - 1
    # persist: consumed by both self-join sides x 4 band projections —
    # without it the md5 token hashing is recomputed ~10x (measured)
    sims = simhash_by_id(df, id_col, text_col).persist()
    nibbles = sims.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(str(j)),
                        F.expr(f"(simhash >> {band_width * j}) & {mask}"),
                    ).alias(f"band_{j}")
                    for j in range(SIMHASH_BANDS)
                ]
            )
        ).alias("nib_key"),
    )
    nibbles = cap_band_buckets(nibbles, "nib_key", max_bucket_size, "simhash")
    a, b = nibbles.alias("a"), nibbles.alias("b")
    return (
        a.join(b, "nib_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("simhash_a"),
            F.col("b.simhash").alias("simhash_b"),
        )
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))).cast("bigint"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for LSH candidate pairs (verification
    stage): only bucket-collision pairs are scored, never all pairs.
    The intersect runs on the 32-bit shingle-hash arrays (not the
    strings) — smaller shuffle, cheaper compare, same Jaccard (hash
    collisions within a doc are ~1e-6 and mirrored in the oracle)."""
    cands = minhash_candidate_pairs(df, id_col, text_col, max_bucket_size).select(
        "id_a", "id_b"
    )
    sh = _sketch_table(df, id_col, text_col)
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingle_hashes").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingle_hashes").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    union = F.size("sh_a").cast("bigint") + F.size("sh_b").cast("bigint") - inter
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


EDIT_PREFIX = 400  # bounded DP work per candidate pair


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 16,
    prefix: int = EDIT_PREFIX,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Levenshtein verification of LSH candidate pairs — the
    character-level complement to the shingle-set Jaccard verifier
    (catches small in-place edits that barely move set overlap).

    Scale design (the DP is O(len_a * len_b) — never run it wide open):

    1. only bucket-collision candidates are scored, never all pairs;
    2. a length-band prefilter drops pairs before any DP —
       ``|len_a - len_b| > max_dist`` alone proves dist > max_dist
       (each unmatched length unit costs >= 1 edit);
    3. the DP itself is threshold-bounded (3-arg ``F.levenshtein``:
       banded DP, O(len * max_dist), early-exit -1 past the bound)
       over a bounded prefix per document.

    Both engines compare the same ASCII corpus; note DuckDB's
    ``levenshtein`` counts bytes while Spark counts codepoints —
    identical on ASCII, diverges on multibyte text (the oracle
    documents this; on non-ASCII corpora normalize first).
    """
    cands = minhash_candidate_pairs(df, id_col, text_col, max_bucket_size).select(
        "id_a", "id_b"
    )
    txt = df.select(
        F.col(id_col), F.substring(F.col(text_col), 1, prefix).alias("t")
    )
    ta = txt.select(F.col(id_col).alias("id_a"), F.col("t").alias("t_a"))
    tb = txt.select(F.col(id_col).alias("id_b"), F.col("t").alias("t_b"))
    dist = F.levenshtein("t_a", "t_b", max_dist).cast("bigint")
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(F.abs(F.length("t_a") - F.length("t_b")) <= max_dist)
        .select(
            "id_a",
            "id_b",
            dist.alias("edit_dist"),
            F.length("t_a").cast("bigint").alias("len_a"),
            F.length("t_b").cast("bigint").alias("len_b"),
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_dist))
    )


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Keep one deterministic representative (min id) per key group —
    the distributed hash-groupBy exact dedup. One shuffle on the key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("group_size"))
    )


def incremental_dedup(
    batch: DataFrame,
    seen_fingerprints: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dedup a NEW ingest batch against the already-ingested corpus
    WITHOUT rescanning the corpus: keep one representative (min id)
    per canonical fingerprint within the batch, then anti-join against
    the persisted fingerprint store.

    The continuous-ingestion shape at 100 TB: re-running whole-corpus
    dedup per ingest is O(corpus); instead the pipeline maintains a
    fingerprint-only store (32 hex chars + id per ingested doc —
    a tiny fraction of corpus bytes), and each ingest costs O(batch)
    plus one shuffle on the fingerprint. The store-side join key is a
    hash, so it is uniformly distributed — no skew. Close the loop by
    appending the survivors' fingerprints to the store in the same
    transactional commit as the batch itself (txlog/Delta append);
    replays then self-suppress, since a replayed batch's fingerprints
    are already in the store.

    ``seen_fingerprints`` needs a ``fingerprint`` column (extra
    columns ignored). Returns surviving ``(id, fingerprint)`` rows —
    new, deduplicated content only. NULL text canonicalizes to the
    empty string BEFORE fingerprinting: a NULL fingerprint would slip
    through the anti-join forever (SQL NULL never equals NULL), making
    NULL-text rows un-suppressible replays.
    """
    fps = batch.select(
        F.col(id_col),
        fingerprint(F.coalesce(F.col(text_col), F.lit(""))).alias("fingerprint"),
    )
    within = fps.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return within.join(
        seen_fingerprints.select("fingerprint"), "fingerprint", "left_anti"
    ).select(id_col, "fingerprint")


def set_similarity_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: tuple[int, int] = (1, 2),
    element: str = "token",
    ngram_n: int = 5,
) -> DataFrame:
    """EXACT token-set Jaccard self-join via prefix filtering — every
    pair with ``J >= num/den`` is returned with its exact overlap,
    union and Jaccard; no pair is missed and no all-pairs product is
    ever formed (AllPairs/PPJoin family: Bayardo et al., WWW'07;
    Vernica, Carey & Li, SIGMOD'10 for the MapReduce decomposition).

    Complements the MinHash path: LSH gives probabilistic recall with
    tunable cost; this gives guaranteed-complete results for exact
    thresholds (dedup audits, contamination certification).

    How it stays sub-quadratic: order every doc's token set by GLOBAL
    document frequency ascending (rarest first, ties by hash — a total
    order). For ``J(a,b) >= t``, ``|a n b| >= ceil(t*max(|a|,|b|))``,
    and the classic prefix lemma says the SMALLEST common token under
    any total order must land in the first ``L - ceil(t*L) + 1``
    tokens of BOTH docs. So an equi-join on prefix tokens alone
    generates a complete candidate set — and because prefixes hold
    each doc's RAREST tokens, bucket fan-out is inherently bounded
    (stopwords never become join keys). A ``min*den >= num*max`` size
    filter prunes impossible pairs before verification.

    ``threshold`` is a rational ``(num, den)`` so every comparison —
    prefix length, size filter, final verdict — is INTEGER arithmetic:
    bit-identical in the DuckDB oracle, no float-epsilon edge at the
    threshold boundary.

    Shuffle ledger for 100 TB: (1) groupBy token-hash for document
    frequency (uniform key), (2) join freq back (same key), (3) window
    by doc id to rank within doc, (4) equi-join on prefix token-hash
    (rare keys by construction), (5) verify join on doc ids. Exact
    verification touches candidate pairs only.

    ``element`` picks the set domain: ``"token"`` (distinct lowercased
    whitespace tokens — natural-vocabulary corpora), ``"shingle"``
    (distinct char k-gram hashes of the text prefix, the
    SHINGLE_K/SHINGLE_PREFIX sketch domain shared with the MinHash
    path), or ``"ngram"`` (word ``ngram_n``-grams). CHOOSE BY
    VOCABULARY DIVERSITY: prefix filtering prunes by putting each
    set's globally-RAREST elements in the join key, so a tiny shared
    vocabulary (template/boilerplate corpora — or this repo's 32-word
    synthetic corpus) makes token sets near-identical across docs and
    the candidate stage quadratic; word n-grams draw from the
    vocabulary's n-th power and stay sparse on ANY corpus whose word
    SEQUENCES differ (measured here: token elements -> 271M candidate
    upper bound at sf0.1; 5-gram elements -> only genuine near-dups).
    """
    num, den = threshold
    # tokenization (md5 element hashing + explode) runs before the
    # first exchange — fan a degenerate scan layout out first (guide
    # §2.5; no-op on multi-split inputs; downstream consumers are
    # distinct/groupBy/joins, all order-independent)
    df = fan_out(df.select(id_col, text_col))
    if element == "shingle":
        toks = (
            with_shingle_hashes(df, text_col)
            .select(F.col(id_col), F.explode("shingle_hashes").alias("h"))
            .distinct()
        )
    elif element == "ngram":
        n = ngram_n
        grams = (
            f"CASE WHEN size(_tk) >= {n} THEN transform(sequence(1, size(_tk) - {n} + 1), "
            f"i -> array_join(slice(_tk, i, {n}), ' ')) ELSE array() END"
        )
        toks = (
            df.withColumn("_tk", tokens(text_col))
            .select(F.col(id_col), F.explode(F.expr(grams)).alias("g"))
            .select(F.col(id_col), hash32("g").alias("h"))
            .distinct()
        )
    elif element == "token":
        toks = (
            df.select(
                F.col(id_col),
                F.explode(F.array_distinct(tokens(text_col))).alias("tok"),
            )
            .select(F.col(id_col), hash32("tok").alias("h"))
            .distinct()  # md5-collision fold, mirrored in the oracle
        )
    else:
        raise ValueError(
            f"element must be 'token', 'shingle' or 'ngram', got {element!r}"
        )
    # ONE tokenization pass feeds frequency ranking AND verification
    toks = toks.persist()
    dfreq = toks.groupBy("h").agg(F.count("*").alias("dfreq"))
    w = Window.partitionBy(id_col).orderBy("dfreq", "h")
    wsz = Window.partitionBy(id_col)
    ranked = (
        toks.join(dfreq, "h")
        .select(
            F.col(id_col),
            F.col("h"),
            F.row_number().over(w).alias("rnk"),
            F.count("*").over(wsz).alias("sz"),
        )
    )
    # ceil(num*L/den) in pure integers: (num*L + den - 1) div den
    pref = ranked.filter(
        F.col("rnk") <= F.col("sz") - F.expr(f"({num}*sz + {den-1}) div {den}") + 1
    )
    pa = pref.select(F.col(id_col).alias("id_a"), "h", F.col("sz").alias("sz_a"))
    pb = pref.select(F.col(id_col).alias("id_b"), "h", F.col("sz").alias("sz_b"))
    cands = (
        pa.join(pb, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("sz_a", "sz_b") * den >= F.greatest("sz_a", "sz_b") * num
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sets = toks.groupBy(id_col).agg(F.sort_array(F.collect_list("h")).alias("hs"))
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("bigint")
    union = F.size("hs_a").cast("bigint") + F.size("hs_b").cast("bigint") - inter
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("overlap"),
            union.alias("set_union"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("overlap") * den >= F.col("set_union") * num)
    )
