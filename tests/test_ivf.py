"""Trained-codebook IVF (VERDICT r1 item 7 / ROADMAP §4).

The codebook is data-dependent so the registry entry takes the
rows-only driver check; these tests pin the properties that matter:
deterministic training, exactness when probing every cluster, and
recall at a reduced probe budget.
"""

import pytest
from pyspark.sql import functions as F

from x_spark.operators.similarity import (
    brute_force_topk,
    bucketed_topk,
    ivf_topk,
    recall_at_k,
    train_codebook,
)
from x_spark.session import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_codebook_training_is_deterministic(emb):
    a = train_codebook(emb, n_centroids=8, n_iters=3)
    b = train_codebook(emb.repartition(7), n_centroids=8, n_iters=3)
    assert a == b  # stable across partitionings (DECIMAL accumulation)


def test_codebook_default_scales_sqrt_n(emb):
    """n_centroids=None sizes the codebook as round(sqrt(n)) clamped to
    [4, max_centroids] — selectivity grows with the corpus instead of
    freezing at a demo constant."""
    import math

    n = emb.count()
    cb = train_codebook(emb, n_iters=1)
    assert len(cb) == max(4, min(128, round(math.sqrt(n))))
    tiny = emb.limit(6)
    assert len(train_codebook(tiny, n_iters=1)) == 4
    assert len(train_codebook(emb, n_iters=1, max_centroids=5)) == 5


def test_arrow_codebook_is_deterministic_and_past_the_codegen_cap(emb):
    """train_codebook_arrow (sampled numpy k-means) must be stable
    across partitionings and support centroid counts far beyond the
    inline-expression cap of the JVM trainer."""
    from x_spark.operators.similarity import train_codebook_arrow

    a = train_codebook_arrow(emb, n_centroids=160, n_iters=3)
    b = train_codebook_arrow(emb.repartition(7), n_centroids=160, n_iters=3)
    assert a == b
    assert len(a) == 160 and len(a[0]) == len(a[1])
    with pytest.raises(ValueError, match="cannot seed"):
        train_codebook_arrow(emb.limit(8), n_centroids=16)


def test_pq_full_probe_full_rerank_is_exact(spark, emb):
    """With every cluster probed and the re-rank pool covering every
    candidate, IVF-PQ must reproduce brute force exactly — pins that
    the probed-cluster pushdown filter never drops a reachable row."""
    from x_spark.operators import pq as PQ
    from x_spark.operators.similarity import train_codebook_arrow

    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    n = corpus.count()
    cb = train_codebook_arrow(corpus, n_centroids=16, n_iters=3)
    books = PQ.train_pq(corpus, cb, m=4, ks=8)
    exact = brute_force_topk(corpus, queries, k=10)
    full = PQ.pq_topk(corpus, queries, cb, books, k=10, n_probe=16, rerank=n)
    assert recall_at_k(full, exact, 10) == 1.0


def test_ivf_probing_all_clusters_is_exact(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    cb = train_codebook(corpus, n_centroids=4, n_iters=3)
    exact = brute_force_topk(corpus, queries, k=10)
    full_probe = ivf_topk(corpus, queries, cb, k=10, n_probe=4)
    assert recall_at_k(full_probe, exact, 10) == 1.0


def test_adaptive_grid_dims_split_preserves_pairs(spark, emb):
    """Raising grid_dims (hot-cell splitting) must not lose ε-join
    pairs — recall is guaranteed for any coordinate-prefix grid."""
    from x_spark.operators.similarity import (
        choose_grid_dims,
        embedding_near_dup_pairs,
    )

    base = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in embedding_near_dup_pairs(emb, threshold=0.999).collect()
    }
    split = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in embedding_near_dup_pairs(emb, threshold=0.999, grid_dims=4).collect()
    }
    assert base == split
    # a tiny cap forces refinement past the default dims
    d = choose_grid_dims(emb, max_cell_size=2, max_dims=5)
    assert d > 3
    # a generous cap keeps the default
    assert choose_grid_dims(emb, max_cell_size=10_000_000) == 3


@pytest.mark.parametrize("threshold", [0.95, 0.90])
def test_eps_join_loose_thresholds_match_brute_force(spark, threshold):
    """The threshold-adaptive cell size must keep FULL recall at loose
    thresholds (cells grow to >= eps = sqrt(2-2t)) — pair set equals an
    all-pairs cross join.

    Synthetic corpus: 24 seed directions, 5 deterministic perturbations
    each at angles straddling both thresholds, so both parameter points
    have a non-empty, different answer set.
    """
    import math
    import random

    from x_spark.operators.similarity import cosine, embedding_near_dup_pairs

    rng = random.Random(7)
    dim = 16
    rows = []
    vid = 0
    for _ in range(24):
        seed = [rng.gauss(0, 1) for _ in range(dim)]
        nrm = math.sqrt(sum(x * x for x in seed))
        seed = [x / nrm for x in seed]
        # orthogonal-ish noise direction per seed
        noise = [rng.gauss(0, 1) for _ in range(dim)]
        d = sum(a * b for a, b in zip(seed, noise))
        noise = [n - d * s for n, s in zip(noise, seed)]
        nn = math.sqrt(sum(x * x for x in noise)) or 1.0
        noise = [x / nn for x in noise]
        for ang in (0.0, 0.1, 0.25, 0.4, 0.6):  # cos: 1, .995, .969, .921, .825
            vec = [
                math.cos(ang) * s + math.sin(ang) * n
                for s, n in zip(seed, noise)
            ]
            rows.append((vid, [float(x) for x in vec]))
            vid += 1
    small = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").persist()
    small.count()
    grid = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in embedding_near_dup_pairs(small, threshold=threshold).collect()
    }
    a = small.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = small.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    brute = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine("va", "vb").alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .collect()
    }
    small.unpersist()
    assert grid == brute
    assert brute  # non-vacuous: the loose threshold must produce pairs


def test_codebook_persistence_round_trip(spark, emb, tmp_path):
    """save_codebook/load_codebook (train-offline story) must be exact:
    a loaded codebook yields bit-identical probe results."""
    from x_spark.operators.similarity import load_codebook, save_codebook

    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5)
    cb = train_codebook(corpus, n_centroids=8, n_iters=3)
    path = str(tmp_path / "codebook.parquet")
    save_codebook(spark, cb, path)
    cb2 = load_codebook(spark, path)
    assert cb == cb2
    a = {tuple(r) for r in ivf_topk(corpus, queries, cb, k=10, n_probe=2).collect()}
    b = {tuple(r) for r in ivf_topk(corpus, queries, cb2, k=10, n_probe=2).collect()}
    assert a == b


def test_ivf_recall_at_reduced_probe_budget(spark, emb):
    """IVF at ~19% data touched must not trail the sign quantizer at
    25% — the trained codebook buys a smaller probe budget."""
    queries = emb.filter(F.col("vec_id") < 20)
    corpus = emb.filter(F.col("vec_id") >= 20)
    exact = brute_force_topk(corpus, queries, k=10).persist()
    exact.count()
    cb = train_codebook(corpus, n_centroids=16, n_iters=5)
    r_ivf = recall_at_k(ivf_topk(corpus, queries, cb, k=10, n_probe=3), exact)
    r_sign = recall_at_k(
        bucketed_topk(corpus, queries, k=10, n_buckets=8, n_probe=2), exact
    )
    assert r_ivf >= r_sign - 0.05
    assert r_ivf > 0.2  # sanity floor: far above the 3/16 random baseline
    exact.unpersist()


def test_distributed_bruteforce_matches_broadcast(spark):
    """The cartesian (large-query-set) path returns the identical
    top-k as the broadcast path."""
    from x_spark.operators.similarity import brute_force_topk
    from x_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 37 == 0)
    a = brute_force_topk(emb, queries, k=5).collect()
    b = brute_force_topk(
        emb, queries.repartition(4), k=5, broadcast_queries=False
    ).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_pq_topk_recall_and_determinism(spark):
    """IVF-PQ with exact re-rank: recall@10 within a whisker of plain
    IVF at the same probe budget (same candidate pool; ADC only risks
    dropping true neighbours from the rerank pool), deterministic
    across partitionings, and every returned score is EXACT cosine."""
    from x_spark.operators.pq import encode_pq, pq_topk, train_pq
    from x_spark.operators.similarity import (
        brute_force_topk, ivf_topk, recall_at_k, train_codebook,
    )
    from x_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 23 == 0)
    ivf_book = train_codebook(emb, n_centroids=8, n_iters=3)
    pq_books = train_pq(emb, ivf_book, m=4, ks=16, n_iters=4, sample=500)

    exact = brute_force_topk(emb, queries, k=10)
    ivf = ivf_topk(emb, queries, ivf_book, k=10, n_probe=3)
    pq = pq_topk(emb, queries, ivf_book, pq_books, k=10, n_probe=3, rerank=160)

    r_ivf = recall_at_k(ivf, exact, k=10)
    r_pq = recall_at_k(pq, exact, k=10)
    assert r_pq >= r_ivf - 0.05, (r_pq, r_ivf)

    # determinism: encoding and search survive repartitioning
    codes = encode_pq(emb.repartition(7), ivf_book, pq_books)
    pq2 = pq_topk(emb, queries, ivf_book, pq_books, codes=codes,
                  k=10, n_probe=3, rerank=160)
    assert sorted(map(tuple, pq.collect())) == sorted(map(tuple, pq2.collect()))

    # returned scores are exact cosine (match brute force where ids agree)
    ex = {(r.query_id, r.cand_id): r.cos_sim for r in exact.collect()}
    for r in pq.collect():
        if (r.query_id, r.cand_id) in ex:
            assert abs(ex[(r.query_id, r.cand_id)] - r.cos_sim) < 1e-9


def test_ann_topk_pq_registry_recall_floor(spark, sf_dir, emb):
    """The registry's ANN scale-path representative (ann_topk_pq:
    IVF-PQ + OPQ rotation + exact re-rank at ~25% probed codes / 10%
    re-rank) must hold a recall@10 floor vs brute force — the driver's
    rows-only check carries no quality signal, so this test is the
    quality pin (verdict r4 #2). Measured: 0.72 @ sf0.001 (495-row
    corpus — tiny cells, the floor case), 0.80 @ sf0.01, 0.90 @ sf0.1
    (the honest operating point reported in BENCH_DETAIL). The floor
    is set under the smallest measurement; recall climbing with corpus
    size is expected (finer cells concentrate neighbours)."""
    from x_spark.plans.pipeline import q_ann_topk_pq

    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = brute_force_topk(corpus, queries, k=10)
    approx = q_ann_topk_pq(spark, sf_dir)
    r = recall_at_k(approx, exact)
    assert r >= 0.65, f"ann_topk_pq recall@10 regressed: {r}"
    # determinism: the cached-artifact second call returns the identical
    # result set (same codebooks -> same codes -> same re-rank pool)
    again = q_ann_topk_pq(spark, sf_dir)
    assert sorted(map(tuple, approx.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_hard_negatives_band_and_self_exclusion(spark):
    from pyspark.sql import Row

    from x_spark.operators.similarity import hard_negatives

    # query q=(1,0); candidates at controlled cosines: dup (1,0)=1.0,
    # hard (0.8,0.6)=0.8... wait band [0.2, 0.95): include 0.8 and 0.5,
    # exclude the exact dup (1.0) and the orthogonal (0.0)
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),    # the query itself
        Row(vec_id=1, embedding=[2.0, 0.0]),    # cosine 1.0 -> dup, excluded
        Row(vec_id=2, embedding=[0.8, 0.6]),    # cosine 0.8 -> hard negative
        Row(vec_id=3, embedding=[0.5, 0.866]),  # cosine 0.5 -> hard negative
        Row(vec_id=4, embedding=[0.0, 1.0]),    # cosine 0.0 -> too easy
    ]
    df = spark.createDataFrame(rows)
    out = hard_negatives(
        df, df.filter("vec_id = 0"), k=5, sim_lo=0.2, sim_hi=0.95
    ).collect()
    assert [(r.cand_id, r.neg_rank) for r in out] == [(2, 1), (3, 2)]
    assert all(0.2 <= r.cos_sim < 0.95 for r in out)
    # self-pair never appears even when the query is in the corpus
    assert all(r.cand_id != 0 for r in out)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hard_negatives(df, df, sim_lo=0.9, sim_hi=0.5)


# -- maintained IVF store (assign-on-ingest) ----------------------------------
def _emb(spark, sf_dir):
    from x_spark.session import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_ivf_store_incremental_equals_batch(spark, sf_dir, tmp_path):
    from x_spark.operators.similarity import (
        ivf_store_topk,
        train_codebook,
        update_ivf_store,
    )
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    emb = _emb(spark, sf_dir)
    queries = emb.filter("vec_id < 3")
    corpus = emb.filter("vec_id >= 3")
    cb = train_codebook(corpus, n_centroids=8)
    ds = init_datasource("txlog", spark)

    inc = TableRef(path=str(tmp_path / "inc"))
    for b in range(3):  # three ingest batches
        update_ivf_store(ds, inc, corpus.filter(f"vec_id % 3 = {b}"), cb,
                         txn=("ing", b))
    one = TableRef(path=str(tmp_path / "one"))
    update_ivf_store(ds, one, corpus, cb)

    # the maintained store holds the same assignments as a one-shot build
    a = sorted(map(tuple, ds.read(inc).select("vec_id", "cluster").collect()))
    b_ = sorted(map(tuple, ds.read(one).select("vec_id", "cluster").collect()))
    assert a == b_ and len(a) == corpus.count()

    # and search results over both stores are identical
    r_inc = sorted(map(tuple, ivf_store_topk(ds, inc, queries, cb, k=5).collect()))
    r_one = sorted(map(tuple, ivf_store_topk(ds, one, queries, cb, k=5).collect()))
    assert r_inc == r_one and r_inc


def test_ivf_store_matches_inline_ivf_and_prunes(spark, sf_dir, tmp_path):
    from x_spark.operators.similarity import (
        ivf_store_topk,
        ivf_topk,
        train_codebook,
        update_ivf_store,
    )
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef

    emb = _emb(spark, sf_dir)
    queries = emb.filter("vec_id < 3")
    corpus = emb.filter("vec_id >= 3")
    cb = train_codebook(corpus, n_centroids=8)
    ds = init_datasource("txlog", spark)
    ref = TableRef(path=str(tmp_path / "store"))
    update_ivf_store(ds, ref, corpus, cb)

    got = sorted(map(tuple,
        ivf_store_topk(ds, ref, queries, cb, k=5, n_probe=2)
        .select("query_id", "cand_id", "cos_sim", "rank").collect()))
    want = sorted(map(tuple,
        ivf_topk(corpus, queries, cb, k=5, n_probe=2)
        .select("query_id", "cand_id", "cos_sim", "rank").collect()))
    assert got == want and got

    # partition pruning: the probed read plans a PartitionFilter on the
    # cluster directory column (inputFiles() lists the pre-pruning
    # index, so assert on the executed plan's scan node instead)
    import pyspark.sql.functions as F

    pruned = ds.read(ref).filter(F.col("cluster").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cluster" in plan and "IN (0,1)" in plan


def test_ivf_store_replay_is_exactly_once(spark, sf_dir, tmp_path):
    from x_spark.operators.similarity import train_codebook, update_ivf_store
    from x_spark.sources import init_datasource
    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxnAlreadyCommittedException

    emb = _emb(spark, sf_dir).filter("vec_id >= 3")
    cb = train_codebook(emb, n_centroids=4)
    ds = init_datasource("txlog", spark)
    ref = TableRef(path=str(tmp_path / "s"))
    update_ivf_store(ds, ref, emb, cb, txn=("app", 1))
    n = ds.read(ref).count()
    import pytest as _pytest

    with _pytest.raises(TxnAlreadyCommittedException):
        update_ivf_store(ds, ref, emb, cb, txn=("app", 1))
    assert ds.read(ref).count() == n
