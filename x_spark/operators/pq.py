"""IVF-PQ: product-quantized approximate nearest neighbour search.

Completes the ANN ladder (ROADMAP §4) above brute force -> bucketed ->
trained-IVF (`operators/similarity.py`): vectors are stored as m
one-byte codes instead of d floats, so the per-probe scan reads
~m bytes/vector (a 32x compression at d=128/m=4) — at 100 TB the
codes table is what fits in cluster memory while raw vectors stay on
disk for the final re-rank only.

Shape (classic Jégou et al. IVF-ADC):

1. TRAIN (driver, bounded sample): residuals of unit vectors against
   their IVF centroid, split into ``m`` subvectors; k-means per
   subvector (``ks`` centroids). Deterministic: md5-ordered sample,
   fixed iterations — same codebooks on every run/partitioning.
2. ENCODE (one corpus pass, Arrow-batched numpy): cluster id + m
   nearest-subcentroid indices per vector. The codes table is the
   persisted artifact (partition by cluster at rest).
3. QUERY: per query, probe ``n_probe`` IVF clusters; build the ADC
   lookup table (m x ks dot products against the query residual —
   O(m*ks*d/m) = O(ks*d) per query-cluster, tiny); approximate score
   of a candidate = sum of m table lookups; keep ``rerank`` best.
4. RE-RANK: join the survivors back to the raw vectors, exact cosine,
   final top-k — approximation error only costs recall, never wrong
   scores in the output.

Python appears only in Arrow-batched numpy stages (encode + ADC), per
the "when Python is unavoidable" rule; everything around them is
DataFrame ops.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window as W, functions as F

from x_spark.operators.similarity import cosine


def _np():
    import numpy as np

    return np


def train_pq(
    corpus: DataFrame,
    ivf_codebook: list[list[float]],
    m: int = 4,
    ks: int = 16,
    n_iters: int = 6,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train per-subvector residual codebooks: ``m`` lists of ``ks``
    centroids of dimension d/m. Driver state is m*ks*(d/m) = ks*d
    floats — metadata scale; training uses an md5-ordered sample of
    ``sample`` rows (PQ codebooks need thousands of points, not the
    corpus)."""
    np = _np()
    rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("cid").cast("string")))
        .limit(sample)
        .collect()
    )
    vecs = np.array([list(r["v"]) for r in rows], dtype="float64")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cents = np.array(ivf_codebook, dtype="float64")
    assign = np.argmax(vecs @ cents.T, axis=1)
    resid = vecs - cents[assign]
    d = resid.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books: list[list[list[float]]] = []
    for j in range(m):
        x = resid[:, j * sub : (j + 1) * sub]
        # deterministic init: md5 of the row index string
        order = sorted(
            range(len(x)),
            key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
        )[:ks]
        c = x[order].copy()
        for _ in range(n_iters):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for ci in range(ks):
                mask = a == ci
                if mask.any():
                    c[ci] = x[mask].mean(axis=0)
        books.append(np.round(c, 9).tolist())
    return books


def train_opq(
    corpus: DataFrame,
    ivf_codebook: list[list[float]],
    m: int = 4,
    ks: int = 16,
    n_iters: int = 6,
    opq_iters: int = 8,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    errors_out: list[float] | None = None,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """OPQ (Ge et al., CVPR'13, non-parametric variant): learn an
    ORTHOGONAL rotation R so that the rotated residuals split into
    subvectors that PQ can quantize with lower error — plain PQ's
    subspace split is arbitrary, and correlated dimensions landing in
    different subvectors waste code budget.

    Alternating minimization of ||X R - Y(R)||^2 on the training
    sample: (1) fix R, run Lloyd iterations per rotated subspace
    WARM-STARTED from the previous round's codebooks (the first round
    uses the deterministic md5 init) and reconstruct Y; (2) fix the
    codes, update R by the orthogonal Procrustes solution R = U V^T
    from SVD(X^T Y). With the warm start both steps are true
    coordinate descent on the shared objective — Procrustes can only
    lower the error at fixed Y, and Lloyd from the incumbent books can
    only lower it at fixed R — so the training error is monotonically
    NON-INCREASING across outer iterations (pinned by
    test_opq_objective_is_monotone). Everything runs driver-side on
    the md5-ordered sample — the artifact is
    (R: d x d, books: m x ks x d/m), metadata scale.

    Returns ``(rotation, pq_codebooks)`` for :func:`encode_pq` /
    :func:`pq_topk` (pass as ``rotation=``). Determinism matches
    :func:`train_pq` (same sample order, same init rule).
    ``errors_out``, if given, receives the training objective after
    the initial fit and after each outer iteration (for monitoring /
    the monotonicity test).
    """
    np = _np()
    rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("cid").cast("string")))
        .limit(sample)
        .collect()
    )
    vecs = np.array([list(r["v"]) for r in rows], dtype="float64")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cents = np.array(ivf_codebook, dtype="float64")
    assign = np.argmax(vecs @ cents.T, axis=1)
    X = vecs - cents[assign]
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    R = np.eye(d)

    def fit_books(Xr, init=None):
        books, recon = [], np.empty_like(Xr)
        for j in range(m):
            x = Xr[:, j * sub : (j + 1) * sub]
            if init is None:
                order = sorted(
                    range(len(x)),
                    key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
                )[:ks]
                c = x[order].copy()
            else:
                # warm start from the incumbent codebooks: Lloyd from
                # the current solution is monotone in the shared OPQ
                # objective; a fresh md5 restart is not
                c = init[j].copy()
            for _ in range(n_iters):
                d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                a = np.argmin(d2, axis=1)
                for ci in range(ks):
                    mask = a == ci
                    if mask.any():
                        c[ci] = x[mask].mean(axis=0)
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            recon[:, j * sub : (j + 1) * sub] = c[a]
            books.append(c)
        return books, recon

    books, recon = fit_books(X @ R)
    if errors_out is not None:
        errors_out.append(float(((X @ R - recon) ** 2).sum()))
    for _ in range(opq_iters):
        # Procrustes: min_R ||X R - Y||_F with R orthogonal
        u, _, vt = np.linalg.svd(X.T @ recon)
        R = u @ vt
        books, recon = fit_books(X @ R, init=books)
        if errors_out is not None:
            errors_out.append(float(((X @ R - recon) ** 2).sum()))
    return (
        np.round(R, 12).tolist(),
        [np.round(np.array(b), 9).tolist() for b in books],
    )


def opq_reconstruction_mse(
    corpus: DataFrame,
    ivf_codebook: list[list[float]],
    pq_codebooks: list[list[list[float]]],
    rotation: list[list[float]] | None = None,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error of the (rotated) residuals on
    the md5-ordered training sample — the quantity OPQ minimizes;
    exposed so improvement over plain PQ is measurable, not asserted."""
    np = _np()
    rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("cid").cast("string")))
        .limit(sample)
        .collect()
    )
    vecs = np.array([list(r["v"]) for r in rows], dtype="float64")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cents = np.array(ivf_codebook, dtype="float64")
    X = vecs - cents[np.argmax(vecs @ cents.T, axis=1)]
    if rotation is not None:
        X = X @ np.array(rotation, dtype="float64")
    books = [np.array(b, dtype="float64") for b in pq_codebooks]
    m = len(books)
    sub = X.shape[1] // m
    err = 0.0
    for j in range(m):
        x = X[:, j * sub : (j + 1) * sub]
        d2 = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        err += float(d2.min(axis=1).sum())
    return err / len(X)


def encode_pq(
    corpus: DataFrame,
    ivf_codebook: list[list[float]],
    pq_codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """One corpus pass -> (cand_id, cluster, code array<int>): the
    persisted, 100x-smaller search artifact. Arrow-batched numpy —
    each batch is two matmuls, never per-row Python. ``rotation``
    (from :func:`train_opq`) is applied to residuals before the
    subspace split — one extra matmul per batch."""
    import pandas as pd

    np = _np()
    cents = np.array(ivf_codebook, dtype="float64")
    books = [np.array(b, dtype="float64") for b in pq_codebooks]
    rot = None if rotation is None else np.array(rotation, dtype="float64")
    m = len(books)

    def enc(it):
        for pdf in it:
            v = np.array([list(x) for x in pdf[vec_col]], dtype="float64")
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            assign = np.argmax(v @ cents.T, axis=1)
            resid = v - cents[assign]
            if rot is not None:
                resid = resid @ rot
            sub = resid.shape[1] // m
            codes = np.empty((len(v), m), dtype="int64")
            for j in range(m):
                x = resid[:, j * sub : (j + 1) * sub]
                d2 = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "cand_id": pdf[id_col].to_numpy(),
                    "cluster": assign,
                    "code": list(codes),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, "cand_id bigint, cluster int, code array<bigint>"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    ivf_codebook: list[list[float]],
    pq_codebooks: list[list[list[float]]],
    codes: DataFrame | None = None,
    k: int = 10,
    n_probe: int = 3,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via ADC over PQ codes, exact-cosine re-rank.

    The codes side carries only (cand_id, cluster, m small ints); the
    ADC stage emits ``rerank`` survivors per query; only those join
    back to raw vectors. Recall vs plain IVF at equal n_probe is
    reported by bench (same probed clusters -> same candidate pool;
    PQ only risks dropping true neighbours from the rerank pool when
    rerank is small)."""
    import pandas as pd

    np = _np()
    if codes is None:
        codes = encode_pq(
            corpus, ivf_codebook, pq_codebooks, id_col, vec_col, rotation
        )
    cents = np.array(ivf_codebook, dtype="float64")
    books = [np.array(b, dtype="float64") for b in pq_codebooks]
    rot = None if rotation is None else np.array(rotation, dtype="float64")
    m = len(books)

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows])
    q = np.array([list(r[1]) for r in q_rows], dtype="float64")
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # probe lists per query (driver-side: |Q| x n_probe ints)
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]
    # push the probed-cluster union down onto the codes scan: with the
    # codes table partitioned by cluster at rest this is partition
    # pruning (only probed clusters' files are read); results are
    # identical by construction — the ADC stage ignores unprobed
    # clusters anyway
    probed_union = sorted({int(c) for row in probe for c in row})
    codes = codes.filter(F.col("cluster").isin(probed_union))

    sub = q.shape[1] // m
    # precompute per (query, probed cluster) ADC tables: approximate
    # dot(q, v) = dot(q, c_cluster) + sum_j table[j][code_j]
    # where table[j][t] = dot(q_sub_j, book_j[t]). With an OPQ
    # rotation R, codes quantize r' = r R, and q . r = (q R) . r' by
    # orthogonality — so the lookup side rotates q; base stays q . c.
    qr = q if rot is None else q @ rot
    tables = {}  # (qi, cluster) -> (base, [m][ks] lookups)
    for qi in range(len(q)):
        for cl in probe[qi]:
            base = float(q[qi] @ cents[cl])
            luts = [
                (qr[qi][j * sub : (j + 1) * sub] @ books[j].T) for j in range(m)
            ]
            tables[(qi, int(cl))] = (base, luts)
    qid_to_idx = {int(v): i for i, v in enumerate(q_ids)}

    def adc(it):
        for pdf in it:
            clusters = pdf["cluster"].to_numpy()
            code_mat = np.array(list(pdf["code"]), dtype="int64")
            cand = pdf["cand_id"].to_numpy()
            out_q, out_c, out_s = [], [], []
            for qid, qi in qid_to_idx.items():
                for cl in probe[qi]:
                    mask = clusters == cl
                    if not mask.any():
                        continue
                    base, luts = tables[(qi, int(cl))]
                    sc = np.full(mask.sum(), base)
                    cm = code_mat[mask]
                    for j in range(m):
                        sc += luts[j][cm[:, j]]
                    out_q.append(np.full(mask.sum(), qid))
                    out_c.append(cand[mask])
                    out_s.append(sc)
            if not out_q:
                yield pd.DataFrame({"query_id": [], "cand_id": [], "adc": []}).astype(
                    {"query_id": "int64", "cand_id": "int64", "adc": "float64"}
                )
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "adc": np.concatenate(out_s),
                }
            )

    scored = codes.mapInPandas(adc, "query_id bigint, cand_id bigint, adc double")
    w = W.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("cand_id"))
    survivors = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= rerank)
        .select("query_id", "cand_id")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"))
    qdf = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    exact = (
        survivors.join(c, "cand_id")
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", "cand_id", cosine("qvec", "cvec").alias("cos_sim"))
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
