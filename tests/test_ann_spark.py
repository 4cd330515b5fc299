"""ANN: brute-force vs SRP-LSH; cosine near-dup exact vs LSH."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.ann import cosine_neardup_pairs, cosine_topk, srp_neardup_pairs, srp_topk

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    """300 vectors in 6 tight clusters + noise: near-dups exist by
    construction (deterministic, seeded)."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((6, DIM)) * 3
    rows = []
    for i in range(300):
        c = centers[i % 6]
        v = c + rng.standard_normal(DIM) * 0.3
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_brute_force_self_top1(spark, emb):
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    top = cosine_topk(emb, q, k=5)
    first = {r.query_id: r.neighbor_id for r in top.filter("rank = 1").collect()}
    assert first == {0: 0, 1: 1, 2: 2, 3: 3}  # self is its own nearest


def test_srp_recall_vs_bruteforce(spark, emb):
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    exact = cosine_topk(emb, q, k=10)
    approx = srp_topk(emb, q, k=10, dim=DIM, n_bits=4, n_tables=12, seed=1)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.9, recall


def test_neardup_lsh_matches_exact(spark, emb):
    t = 0.9
    exact = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(emb, t).collect()}
    lsh = {(r.id_a, r.id_b) for r in srp_neardup_pairs(emb, t, dim=DIM, n_bits=4, n_tables=12, seed=1).collect()}
    assert lsh <= exact  # exact verify ⇒ no false positives
    assert len(exact) > 50  # clusters exist
    assert len(exact - lsh) <= len(exact) * 0.05  # high recall


def test_ivf_recall_vs_bruteforce(spark, emb):
    from sketchlib.ann import ivf_topk

    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    exact = cosine_topk(emb, q, k=10)
    approx = ivf_topk(emb, q, k=10, dim=DIM, n_lists=8, nprobe=3, seed=1)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.9, recall


def test_ivf_full_probe_is_exact(spark, emb):
    from sketchlib.ann import ivf_topk

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    exact = cosine_topk(emb, q, k=7)
    full = ivf_topk(emb, q, k=7, dim=DIM, n_lists=6, nprobe=6, seed=1)
    ex = {(r.query_id, r.rank, r.neighbor_id) for r in exact.collect()}
    fu = {(r.query_id, r.rank, r.neighbor_id) for r in full.collect()}
    assert ex == fu  # probing every list degenerates to brute force


def test_ivf_centroids_deterministic(spark, emb):
    from sketchlib.ann import ivf_centroids

    c1 = ivf_centroids(emb, DIM, n_lists=8, seed=3)
    c2 = ivf_centroids(emb, DIM, n_lists=8, seed=3)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_pq_topk_recall(spark, emb):
    from sketchlib.ann import pq_encode, pq_topk, pq_train

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=10).collect()
    }
    books = pq_train(emb, dim=DIM, m=8, k_cent=16, seed=3)
    assert books.shape == (8, 16, DIM // 8)
    codes = pq_encode(emb, books)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(emb, q, books, k=10, rerank=80, codes=codes).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall
    # determinism: same seed, same codebooks
    assert (books == pq_train(emb, dim=DIM, m=8, k_cent=16, seed=3)).all()


def test_neardup_tiles_string_ids(spark):
    """Regression: the per-bucket/blocked BLAS tiles must handle
    non-numeric id columns (object-dtype arrays broke np.unique)."""
    from sketchlib.ann import cosine_neardup_pairs_blocked, srp_neardup_pairs

    rng = np.random.default_rng(11)
    base = rng.standard_normal(DIM)
    rows = [(f"v{i:03d}", [float(x) for x in base + rng.standard_normal(DIM) * 0.05])
            for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    exact = {tuple(r) for r in cosine_neardup_pairs_blocked(emb, 0.95).collect()}
    lsh = {tuple(r) for r in
           srp_neardup_pairs(emb, 0.95, dim=DIM, n_bits=2, n_tables=8, seed=5).collect()}
    assert exact  # the cluster guarantees near-dup pairs exist
    assert lsh == exact


def test_semantic_dedup_subset_and_recall(spark):
    """semantic pairs are a SUBSET of exact (precision 1.0); recall is
    high on planted near-identical clusters (they share a centroid)."""
    import numpy as np

    from sketchlib.ann import cosine_neardup_pairs_blocked, semantic_dedup_pairs

    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for c in range(12):  # 12 well-separated cluster centers
        center = rng.normal(size=DIM)
        center /= np.linalg.norm(center)
        for _ in range(3):  # 3 near-identical members each
            v = center + rng.normal(scale=0.01, size=DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(60):  # background noise
        v = rng.normal(size=DIM)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    emb = spark.createDataFrame(rows, f"vec_id long, embedding array<double>")
    exact = {tuple(r) for r in cosine_neardup_pairs_blocked(emb, 0.95).collect()}
    sem = {
        tuple(r)
        for r in semantic_dedup_pairs(emb, 0.95, dim=DIM, n_lists=8, seed=3).collect()
    }
    assert sem <= exact  # precision 1.0
    assert exact, "planted clusters must produce exact pairs"
    assert len(sem & exact) / len(exact) >= 0.8


def test_semantic_dedup_list_cap(spark):
    import numpy as np

    from sketchlib.ann import semantic_dedup_pairs

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=DIM)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # cap=1 drops every list -> no pairs; default cap keeps them
    assert semantic_dedup_pairs(emb, 0.0, dim=DIM, n_lists=4, seed=3, list_cap=1).count() == 0
    assert semantic_dedup_pairs(emb, 0.0, dim=DIM, n_lists=4, seed=3).count() > 0
