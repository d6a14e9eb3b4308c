"""Similarity search over embedding columns (array<float>).

Extensions beyond the reference (SURVEY §7 Phase E):

- brute-force cosine top-k  (exact baseline; broadcast the query set,
  one pass over the corpus, per-query top-k via window)
- bucketed (IVF-style) variant: coarse-quantize vectors to a bucket,
  search only the probed buckets — the 100 TB path where the corpus
  shard per bucket fits an executor

Cosine is computed with higher-order array functions (JVM codegen):
cast to double, zip-multiply, sequential fold. The final value is
rounded to 6dp — a continuous score never sits on a rounding boundary,
and rounding decouples the hash-compare from engine summation order.
"""

from __future__ import annotations

import itertools
import math

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: str, b: str) -> Column:
    """Sequential-fold dot product of two array<float/double> columns.

    DuckDB: list_sum(list_transform(range(len(a)), i -> a[i+1]*b[i+1]))
    (both engines fold left-to-right over the same doubles).
    """
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str, b: str, decimals: int = 6) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), decimals)


def _ranked_topk(scored, k: int, rank_col: str = "rank"):
    """Shared ranking tail for every top-k scorer in this module: the
    ONE place the tie-break convention (cos_sim desc, cand_id asc)
    lives — scorers must not re-implement it (they silently diverge)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .filter(F.col(rank_col) <= k)
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized-Python alternative to :func:`brute_force_topk`: the
    query set is closed over (it is small — a broadcast by value), and
    a ``mapInPandas`` stage scores each Arrow batch of the corpus as
    ONE numpy matmul, emitting per-batch partial top-k; a final window
    keeps the global top-k per query.

    This is the documented pattern for when scoring genuinely needs
    Python (learned rerankers, custom metrics): Arrow batches + matrix
    ops, never per-row Python. For plain cosine the JVM expression
    path (:func:`brute_force_topk`) is the default — see bench.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = np.array([list(r[1]) for r in q_rows], dtype="float64")
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(it):
        for pdf in it:
            c_mat = np.array([list(v) for v in pdf[vec_col]], dtype="float64")
            c_mat = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = np.round(q_mat @ c_mat.T, 6)  # (n_queries, batch)
            n_keep = min(k, sims.shape[1])
            cand_ids = pdf[id_col].to_numpy()
            out = []
            for qi, qid in enumerate(q_ids):
                # partial top-k under the SAME total order as the final
                # window (score desc, cand_id asc) — rounding first so
                # batch-boundary ties resolve identically
                idx = np.lexsort((cand_ids, -sims[qi]))[:n_keep]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "cand_id": cand_ids[idx],
                            "cos_sim": sims[qi][idx],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    partials = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id bigint, cand_id bigint, cos_sim double"
    )
    return _ranked_topk(partials, k)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k neighbours per query vector.

    Plan shape with ``broadcast_queries=True`` (default — the common
    case of a bounded query set): queries are broadcast, corpus is
    scanned once; per-query ranking is a window over the query
    partition — shuffle bounded by |queries| * |corpus| score rows
    before the window's partial top-k pushdown (AQE).

    ``broadcast_queries=False`` is the LARGE-query-set path: a
    partitioned cartesian product (each task scores one
    query-partition x corpus-partition block), so neither side ever
    has to fit in one executor — |Q| x |C| work is inherent to exact
    search, but the memory ceiling is gone. Identical results
    (``tests/test_ivf.py``).
    """
    from x_spark.fanout import fan_out

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # |Q| cosines per corpus row run in the corpus scan stage when the
    # query side broadcasts — fan a degenerate layout out first (guide
    # §2.5; no-op on healthy layouts, ranking is deterministic)
    c = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"))
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = q_side.crossJoin(c).select(
        "query_id",
        "cand_id",
        cosine("qvec", "cvec").alias("cos_sim"),
    )
    return _ranked_topk(scored, k)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    sim_lo: float = 0.15,
    sim_hi: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Contrastive hard-negative mining: per query, the top-``k``
    candidates whose cosine similarity lies in ``[sim_lo, sim_hi)`` —
    similar enough to be HARD (random negatives teach nothing), below
    the near-duplicate ceiling so true positives never leak into the
    negative set. The standard mining step for embedding/reranker
    training data.

    The band filters on the 6dp-ROUNDED similarity (the same value the
    output carries), so band membership is engine-reproducible; ties
    rank deterministically (sim desc, cand_id asc). Self-pairs are
    excluded. Same plan shape as :func:`brute_force_topk` (broadcast
    query set or the partitioned-cartesian large-|Q| path); the band
    filter runs BEFORE the window, so the shuffle carries only
    in-band candidates. The scale path swaps the exact scorer for
    :func:`ivf_topk`/``pq_topk`` with an oversized k, then band-filters
    — mining tolerates approximate candidate generation by design.
    """
    if not sim_lo < sim_hi:
        raise ValueError("need sim_lo < sim_hi")
    from x_spark.fanout import fan_out

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    # |Q| cosines per corpus row run in the corpus scan stage (query
    # side broadcasts) — fan a degenerate layout out first (guide
    # §2.5; no-op on healthy layouts, ranking is deterministic)
    c = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"))
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = (
        q_side.crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine("qvec", "cvec").alias("cos_sim"))
        .filter((F.col("cos_sim") >= sim_lo) & (F.col("cos_sim") < sim_hi))
    )
    return _ranked_topk(scored, k, rank_col="neg_rank")


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: vectors are coarse-quantized by the
    sign pattern of their first ``log2(n_buckets)`` components (a
    deterministic, data-independent quantizer — a trained k-means
    codebook slots in the same place); each query probes its own bucket
    plus the nearest alternates by flipping the lowest-magnitude signs.

    Scale: corpus is pre-partitioned by bucket (at rest: partitioned
    parquet / bucketed table), so a query touches n_probe/n_buckets of
    the data. The join is bucket-equi, not a cross join.
    """
    import math

    bits = int(math.log2(n_buckets))

    def bucket_expr(col: str) -> Column:
        # sign bits of the first `bits` components
        return F.expr(
            f"aggregate(transform(sequence(0, {bits - 1}), "
            f"i -> CASE WHEN element_at({col}, i + 1) >= 0 THEN shiftleft(1, i) ELSE 0 END), "
            f"0, (acc, x) -> acc + x)"
        )

    from x_spark.fanout import fan_out

    # corpus-side bucket assignment + per-candidate cosine run in the
    # scan stage (probe side broadcasts) — fan a degenerate layout out
    # first (guide §2.5; no-op on healthy layouts)
    c = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        bucket_expr(vec_col).alias("bucket"),
    )
    # probe buckets: own bucket + flip of each of the first (n_probe-1) bits
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        bucket_expr(vec_col).alias("bucket0"),
    )
    probes = q.select(
        "query_id",
        "qvec",
        F.explode(
            F.array(
                F.col("bucket0"),
                *[
                    F.col("bucket0").bitwiseXOR(F.lit(1 << i))
                    for i in range(max(n_probe - 1, 0))
                ],
            )
        ).alias("bucket"),
    ).distinct()

    from pyspark.sql import Window as W

    scored = F.broadcast(probes).join(c, "bucket").select(
        "query_id",
        "cand_id",
        cosine("qvec", "cvec").alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def _unit_expr(vec_col: str) -> Column:
    """Normalized copy of an array<float> column as array<double>."""
    return F.expr(
        f"transform({vec_col}, x -> cast(x as double) / "
        f"sqrt(aggregate(zip_with({vec_col}, {vec_col}, (a, b) -> "
        f"cast(a as double) * cast(b as double)), cast(0.0 as double), (acc, v) -> acc + v)))"
    )


def _centroid_dot_sql(vec_col: str, centroid: list[float]) -> str:
    lits = ", ".join(f"cast({c!r} as double)" for c in centroid)
    return (
        f"aggregate(zip_with({vec_col}, array({lits}), (x, y) -> cast(x as double) * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _centroid_dot(vec_col: str, centroid: list[float]) -> Column:
    return F.expr(_centroid_dot_sql(vec_col, centroid))


def train_codebook(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int | None = None,
    n_iters: int = 5,
    max_centroids: int = 128,
) -> list[list[float]]:
    """Deterministic spherical k-means codebook (Lloyd's, fixed
    iteration count) for IVF coarse quantization.

    ``n_centroids=None`` (default) scales the codebook with the corpus:
    ``round(sqrt(n))`` clamped to [4, max_centroids] — the standard IVF
    sizing rule, so probe selectivity keeps improving as the corpus
    grows instead of freezing at a demo-scale constant. The
    ``max_centroids`` cap bounds the inline JVM expression the
    assignment builds (n_centroids x dim literals); past it, assign
    with the Arrow/numpy path (:func:`x_spark.operators.pq.encode_pq`
    broadcasts the codebook into a mapInPandas matmul) rather than
    growing the expression.

    - init: the ``n_centroids`` vectors with smallest md5(id) — a
      deterministic pseudo-random draw, stable across partitionings
    - assign: argmax cosine against the current codebook (JVM exprs,
      one corpus scan per iteration)
    - update: element-wise mean accumulated in DECIMAL(38,12) (float
      summation order would make centroids partitioning-dependent),
      re-normalized and rounded to 9dp; empty clusters keep their
      previous centroid

    Driver state is n_centroids x dim floats per iteration — metadata
    scale. At 100 TB train on a deterministic hash-sample of the corpus
    (the codebook needs thousands of points per centroid, not the full
    table) and persist the codebook next to the data.
    """
    from x_spark.fanout import fan_out

    # every k-means iteration's argmax assignment runs at this
    # persisted frame's parallelism — fan a degenerate layout out
    # before normalizing (guide §2.5; the md5-ordered init and the
    # DECIMAL mean sums are both partitioning-independent)
    unit = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("cid"), _unit_expr(vec_col).alias("v")
    ).persist()
    if n_centroids is None:
        n_centroids = max(4, min(max_centroids, round(math.sqrt(unit.count()))))
    init_rows = (
        unit.orderBy(F.md5(F.col("cid").cast("string"))).limit(n_centroids).collect()
    )
    centroids = [[float(x) for x in r["v"]] for r in init_rows]
    for _ in range(n_iters):
        assign = unit.select(
            "cid",
            "v",
            _argmax_centroid("v", centroids).alias("cluster"),
        )
        means = (
            assign.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(38,12)"))
                    / F.count("*")
                ).cast("double").alias("m")
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty cluster: keep old
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        for j, comp in by_cluster.items():
            vec = [comp[p] for p in range(len(comp))]
            nrm = math.sqrt(sum(x * x for x in vec)) or 1.0
            new_centroids[j] = [round(x / nrm, 9) for x in vec]
        centroids = new_centroids
    unit.unpersist()
    return centroids


def train_codebook_arrow(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 256,
    n_iters: int = 10,
    sample: int = 32_768,
) -> list[list[float]]:
    """Large-codebook IVF training past :func:`train_codebook`'s
    inline-expression cap — the "grow centroids past sqrt(n)" scale
    path: a deterministic md5-ordered sample is collected once
    (codebooks need thousands of points per run, not the corpus) and
    spherical k-means runs driver-side in numpy. Assignment of the
    FULL corpus never uses this path's expressions — encoding goes
    through the Arrow matmul in :func:`x_spark.operators.pq.encode_pq`
    — so centroid count is bounded by sample quality, not by codegen.

    Finer coarse quantization is what buys ADC selectivity: on the
    bench corpus, recall@10 at a fixed 25% probed-code budget rises
    from 0.56 (32 centroids) to 0.87 (256 centroids) because smaller
    cells concentrate each query's true neighbours into fewer probes.

    Deterministic: md5-ordered sample, first-``n_centroids`` init,
    fixed iteration count — same codebook on every run/partitioning.
    """
    np = _np()
    rows = (
        corpus.select(F.col(id_col).alias("cid"), _unit_expr(vec_col).alias("v"))
        .orderBy(F.md5(F.col("cid").cast("string")))
        .limit(sample)
        .collect()
    )
    x = np.array([list(r["v"]) for r in rows], dtype="float64")
    if len(x) < n_centroids:
        raise ValueError(
            f"sample of {len(x)} rows cannot seed {n_centroids} centroids"
        )
    c = x[:n_centroids].copy()
    for _ in range(n_iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_centroids):
            mask = assign == j
            if mask.any():
                v = x[mask].mean(axis=0)
                nrm = float(np.linalg.norm(v)) or 1.0
                c[j] = v / nrm
    return np.round(c, 9).tolist()


def _np():
    import numpy as np

    return np


def save_codebook(spark, codebook: list[list[float]], path: str) -> None:
    """Persist a trained codebook as a (tiny) parquet table — the
    train-offline story: centroids live next to the corpus, queries pay
    only the probe path. One file; metadata scale."""
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(codebook)]
    df = spark.createDataFrame(rows, "cluster int, centroid array<double>")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_codebook(spark, path: str) -> list[list[float]]:
    """Load a persisted codebook (inverse of :func:`save_codebook`),
    ordered by cluster id so probe indices are stable."""
    rows = spark.read.parquet(path).orderBy("cluster").collect()
    return [[float(x) for x in r["centroid"]] for r in rows]


def _argmax_centroid(vec_col: str, centroids: list[list[float]]) -> Column:
    """Index of the max-cosine centroid for a unit vector column (ties:
    lowest index, via array_position's first-match semantics)."""
    dots = F.array(*[_centroid_dot(vec_col, c) for c in centroids])
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def _probe_clusters(vec_col: str, centroids: list[list[float]], n_probe: int) -> Column:
    """The ``n_probe`` nearest centroid indices for a query vector,
    ordered by descending dot product (ties: lower index first)."""
    k = len(centroids)
    dots = "array(" + ", ".join(_centroid_dot_sql(vec_col, c) for c in centroids) + ")"
    # sort (negated-dot, index) structs; field order drives the sort
    ranked = (
        f"transform(array_sort(zip_with({dots}, sequence(0, {k - 1}), "
        f"(d, i) -> named_struct('nd', -d, 'i', i))), s -> s.i)"
    )
    return F.expr(f"slice({ranked}, 1, {n_probe})")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k with a trained codebook: corpus rows are
    assigned to their nearest centroid (at rest: a bucketed/partitioned
    layout on ``cluster``), each query probes its ``n_probe`` nearest
    centroids, and scoring is a cluster-equi join — a query touches
    ~n_probe/len(codebook) of the corpus, and a trained codebook sends
    far fewer true neighbours to unprobed clusters than the sign
    quantizer at the same probe budget (recall measured in bench.py).
    """
    from pyspark.sql import Window as W

    # Assignment and probe ranking need NO vector normalization: the
    # codebook centroids are unit vectors, so argmax_j cos(v, c_j) =
    # argmax_j dot(v, c_j) — ||v|| is constant across j. (Normalizing
    # inline would also be re-inlined into every centroid dot by
    # Catalyst's project collapse: measured 16x slowdown.)
    # the per-row centroid argmax AND the per-candidate cosine run in
    # the corpus scan stage (the query side broadcasts), so a
    # degenerate one-split layout serializes the whole scoring
    # pipeline — fan it out first (guide §2.5; no-op on healthy
    # layouts, top-k is rank-deterministic)
    from x_spark.fanout import fan_out

    c = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        _argmax_centroid(vec_col, codebook).alias("cluster"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(_probe_clusters(vec_col, codebook, n_probe)).alias("cluster"),
    )
    scored = F.broadcast(q).join(c, "cluster").select(
        "query_id",
        "cand_id",
        cosine("qvec", "cvec").alias("cos_sim"),
    )
    return _ranked_topk(scored, k)


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int = 10) -> float:
    """Fraction of exact top-k pairs recovered by the approximate
    result (both as (query_id, cand_id) rank<=k frames)."""
    a = approx.filter(F.col("rank") <= k).select("query_id", "cand_id")
    e = exact.filter(F.col("rank") <= k).select("query_id", "cand_id")
    hit = e.join(a, ["query_id", "cand_id"], "left_semi").count()
    total = e.count()
    return hit / total if total else 1.0


GRID_DIMS = 3  # leading normalized coords used for ε-grid blocking
GRID_EPS = 0.045  # minimum cell size (covers threshold >= 0.999 + rounding slack)


def grid_cell_size(threshold: float) -> float:
    """Cell side for the ε-grid at a given cosine ``threshold``.

    cos(a,b) >= t on unit vectors <=> ||â-b̂|| <= sqrt(2-2t) = ε, so any
    cell side >= ε preserves the adjacent-cell recall guarantee. The
    1e-5 slack absorbs the 6dp coordinate/score rounding; the GRID_EPS
    floor keeps tight thresholds from degenerating into micro-cells
    (3^d probes of near-empty cells). Looser thresholds get exactly-ε
    cells — bigger cells, fewer of them; hot cells are then split by
    raising ``grid_dims`` (:func:`choose_grid_dims`).
    """
    return max(GRID_EPS, math.sqrt(2.0 * (1.0 - threshold) + 1e-5))


def choose_grid_dims(
    df: DataFrame,
    vec_col: str = "embedding",
    threshold: float = 0.999,
    max_cell_size: int = 10_000,
    min_dims: int = GRID_DIMS,
    max_dims: int = 6,
) -> int:
    """Adaptive grid refinement: smallest dimension count whose hottest
    cell stays under ``max_cell_size``.

    The ε-adjacency recall argument holds for ANY prefix of normalized
    coordinates (dropping coordinates only shrinks L2 distance), so
    adding dimensions splits hot cells without losing pairs. Each probe
    side pays 3^d neighbor offsets, so d is capped (default 6 -> 729
    offsets) — beyond that, shrink the corpus per job instead. One
    cheap cell-histogram aggregation per candidate d; call this once
    per dataset and pass the result to
    :func:`embedding_near_dup_pairs`.
    """
    cell = grid_cell_size(threshold)
    unit = df.select(_unit_expr(vec_col).alias("u"))
    for d in range(min_dims, max_dims + 1):
        cells = unit.select(
            F.concat_ws(
                "|",
                *[
                    F.floor(
                        F.round(F.expr(f"element_at(u, {i + 1})"), 6) / F.lit(cell)
                    )
                    for i in range(d)
                ],
            ).alias("cell")
        )
        hottest = (
            cells.groupBy("cell").count().agg(F.max("count").alias("m")).first()["m"]
        )
        if hottest is None or hottest <= max_cell_size or d == max_dims:
            return d
    return max_dims


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    grid_dims: int = GRID_DIMS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold`` —
    EXACT result via grid-cell ε-join (no cross product).

    cos(a,b) >= t on unit vectors  <=>  ||â-b̂||₂ <= sqrt(2-2t) = ε,
    and dropping coordinates only shrinks L2 distance, so any
    qualifying pair lands in the same or an adjacent cell of a grid of
    side >= ε over the first GRID_DIMS normalized coordinates — blocking
    has full recall by construction. One side probes its 3^d neighbor
    cells, the other stays home; the join is cell-equi (shuffle on
    cell key, never all-pairs). Hot cells: raise ``grid_dims`` (more
    coordinates split cells with recall preserved — pick it with
    :func:`choose_grid_dims`); residual skew => AQE skew join.

    The cell side adapts to the threshold (:func:`grid_cell_size`):
    any threshold in (0, 1] is supported — looser thresholds trade
    bigger cells (more candidates per cell) for the same full recall.
    """
    from x_spark.fanout import fan_out

    cell = grid_cell_size(threshold)
    # cell_i = floor(round(v_i/||v||, 6) / cell): rounding to 6dp first
    # makes the floor deterministic across engines (same rationale as
    # the cos_sim rounding).
    # zero-norm vectors have no direction (cosine undefined) AND would
    # produce NULL grid coordinates — concat_ws silently drops NULLs,
    # collapsing several probe offsets onto one cell string and emitting
    # duplicate pairs. Guard them out before bucketing; with every cell
    # coordinate non-NULL the output is distinct by construction (one
    # home cell per id_b, 3^d distinct probe cells per id_a).
    # The per-row norm (d-dim sum of squares), grid-coordinate floors
    # and the 3^d probe explode all run before the cell-join exchange,
    # twice (home + probe derivations) — fan a degenerate one-split
    # layout out first (guide §2.5; no-op on multi-split tables, the
    # pair set is join-derived and order-independent).
    df = fan_out(df.select(id_col, vec_col))
    cells = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        norm(vec_col).alias("nrm"),
    ).filter(F.col("nrm") > 0).select(
        "vid",
        "v",
        *[
            F.floor(
                F.round(F.expr(f"cast(element_at(v, {i + 1}) as double)") / F.col("nrm"), 6)
                / F.lit(cell)
            ).alias(f"c{i}")
            for i in range(grid_dims)
        ],
    )
    home = cells.select(
        F.col("vid").alias("id_b"),
        F.col("v").alias("vb"),
        F.concat_ws("|", *[F.col(f"c{i}") for i in range(grid_dims)]).alias("cell"),
    )
    offsets = list(itertools.product((-1, 0, 1), repeat=grid_dims))
    probe = cells.select(
        F.col("vid").alias("id_a"),
        F.col("v").alias("va"),
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|", *[F.col(f"c{i}") + F.lit(offs[i]) for i in range(grid_dims)]
                    )
                    for offs in offsets
                ]
            )
        ).alias("cell"),
    )
    return (
        probe.join(home, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine("va", "vb").alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# Maintained IVF index store: assign-on-ingest against a FROZEN
# codebook into a cluster-partitioned txlog table, so the ANN index
# keeps up with an append-mostly corpus WITHOUT re-encoding it (the
# batch path re-assigns the world per search session; at 100 TB the
# index must be a maintained artifact, not a per-query computation).


def ivf_assign(
    df: DataFrame,
    codebook: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, cluster) assignment rows against a frozen
    codebook — the ingest-side half of the IVF contract. Centroids are
    unit vectors, so argmax cosine == argmax dot (no per-row
    normalization; see ivf_topk's project-collapse note).

    Deliberately NOT fanned out (guide §6 file sizing beats §2.5
    here): the assignment feeds a cluster-PARTITIONED store append, so
    widening the stage multiplies files-per-cluster-partition per
    ingest — measured 5x slower on the maintained-store search path
    (write + every later partition-pruned probe pay the file count)."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        _argmax_centroid(vec_col, codebook).alias("cluster"),
    )


def update_ivf_store(
    ds,
    ref,
    batch: DataFrame,
    codebook: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: tuple[str, int] | None = None,
) -> None:
    """Append a batch's assignments to the cluster-PARTITIONED txlog
    store — O(batch) per ingest (the existing corpus is never re-read
    or re-encoded), txn-stamped for exactly-once replay. The partition
    layout is what makes the search side prune: probed clusters map to
    partition directories."""
    rows = ivf_assign(batch, codebook, id_col, vec_col)
    if not ds.table_exists(ref):
        ds.create(ref, rows.schema, partition_by=["cluster"])
    ds.append(rows, ref, txn=txn)


def ivf_store_topk(
    ds,
    ref,
    queries: DataFrame,
    codebook: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
) -> DataFrame:
    """Search the maintained store: the (bounded) query set's probed
    clusters union into ONE partition-pruning predicate — the scan
    touches only probed partition directories — then per-pair
    membership (this candidate's cluster is in THIS query's probe
    list) and exact cosine re-rank. Results are identical to
    :func:`ivf_topk` over the store's rows (pinned by test); what
    changes is that the corpus scan is pruned and the assignments are
    precomputed at ingest."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _probe_clusters(vec_col, codebook, n_probe).alias("probes"),
    )
    probe_union = sorted({
        int(c) for r in q.select("probes").collect() for c in r["probes"]
    })
    store = ds.read(ref).filter(F.col("cluster").isin(probe_union))
    scored = (
        F.broadcast(q)
        .crossJoin(store.select(
            F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cvec"),
            "cluster",
        ))
        .filter(F.expr("array_contains(probes, cluster)"))
        .select("query_id", "cand_id", cosine("qvec", "cvec").alias("cos_sim"))
    )
    return _ranked_topk(scored, k)
