"""Similarity search over embedding columns (array<float>).

Three operators (training-data-pipeline requirement):

- :func:`cosine_topk` — brute-force exact top-k: the small query set
  cross-joins the corpus and ranks by cosine, all in JVM expressions
  (``zip_with`` + ``aggregate`` folds — whole-stage codegen, no Python).
  The correctness baseline; O(|queries| × |corpus|).
- :func:`srp_topk` — the scale path: sign-random-projection LSH
  (Charikar hyperplane hashing). Signatures are one vectorized numpy
  matmul per Arrow batch; candidates come from bucket joins on
  (table, bucket-key) rows — the corpus embeddings never shuffle — and
  are exactly re-scored, so precision is 1.0 and only recall is
  approximate (pytest asserts recall vs brute force).
- :func:`cosine_neardup_pairs` — exact near-duplicate pairs
  (cos >= threshold, a < b); :func:`srp_neardup_pairs` is the
  LSH-bucketed variant with exact verify.
- :func:`ivf_topk` — IVF (inverted-file) ANN: spherical k-means coarse
  quantizer trained on a bounded hash-sample, corpus assigned to one
  inverted list each (an int per vector — vectors never shuffle for
  candidate generation), queries probe their nprobe nearest lists,
  candidates exactly re-scored. The complementary scale path to SRP:
  data-adaptive partitioning wins on clustered corpora, LSH on
  adversarially uniform ones.
- :func:`pq_topk` — product quantization (Jégou et al., TPAMI 2011):
  per-subspace k-means codebooks, corpus encoded to m small ints, ADC
  scan over the compact codes only (m LUT gathers per row), exact
  rescore of the per-partition top-rerank survivors.

Randomness: projection matrices come from ``np.random.default_rng(seed)``
(PCG64 — reproducible across processes/platforms), so signatures are
deterministic per seed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from . import caches

DEFAULT_SEED = 0x5EEDC0DE


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v)


def cosine_col(a, b):
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id: str = "query_id", q_vec: str = "qe") -> DataFrame:
    """Exact top-k neighbors per query row: (query_id, rank, neighbor_id, sim)."""
    e = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("e"))
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).cast("array<double>").alias("qe"))
    pairs = q.crossJoin(e).withColumn("sim", cosine_col(F.col("qe"), F.col("e")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "sim")
    )


def srp_signatures(emb: DataFrame, id_col: str, vec_col: str, dim: int,
                   n_bits: int = 8, n_tables: int = 8, seed: int = DEFAULT_SEED) -> DataFrame:
    """(id, keys array<long>[n_tables]): per table, the packed sign
    pattern of ``n_bits`` random hyperplanes. One matmul per batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, dim, n_bits))
    weights = 1 << np.arange(n_bits, dtype=np.int64)
    id_type = emb.schema[id_col].dataType
    narrow = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).cast("array<float>").alias("v"))
    out_schema = StructType(
        [StructField("vid", id_type, False), StructField("keys", ArrayType(LongType()), False)]
    )

    def fn(batches):
        for batch in batches:
            varr = batch.column("v")
            n = batch.num_rows
            if n == 0:
                continue
            flat = varr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            mat = flat.reshape(n, dim)
            keys = np.empty((n, n_tables), dtype=np.int64)
            for t in range(n_tables):
                signs = (mat @ planes[t]) > 0  # (n, n_bits)
                # key includes the table id so tables never cross-match
                keys[:, t] = (signs @ weights) | (np.int64(t) << np.int64(n_bits))
            offs = pa.array(np.arange(0, (n + 1) * n_tables, n_tables, dtype=np.int32))
            yield pa.RecordBatch.from_arrays(
                [batch.column("vid"), pa.ListArray.from_arrays(offs, pa.array(keys.reshape(-1)))],
                names=["vid", "keys"],
            )

    return narrow.mapInArrow(fn, out_schema)


def _bucketed(sig: DataFrame) -> DataFrame:
    return sig.select("vid", F.explode("keys").alias("key"))


def srp_topk(emb: DataFrame, queries: DataFrame, k: int = 10, dim: int = 64,
             n_bits: int = 6, n_tables: int = 8, seed: int = DEFAULT_SEED,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id: str = "query_id", q_vec: str = "qe") -> DataFrame:
    """Approximate top-k: LSH bucket join → exact cosine rescore.
    Precision 1.0 (candidates are exactly scored); recall depends on
    (n_bits, n_tables) and is asserted in tests."""
    corpus_sig = _bucketed(srp_signatures(emb, id_col, vec_col, dim, n_bits, n_tables, seed))
    qdf = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"))
    query_sig = _bucketed(
        srp_signatures(qdf, "query_id", "qv", dim, n_bits, n_tables, seed)
    ).withColumnRenamed("vid", "query_id")
    cands = (
        query_sig.join(corpus_sig, "key")
        .select("query_id", F.col("vid").alias("neighbor_id"))
        .distinct()
    )
    e = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("e"))
    q = qdf.select("query_id", F.col("qv").cast("array<double>").alias("qe"))
    scored = (
        cands.join(F.broadcast(q), "query_id")
        .join(e, "neighbor_id")
        .withColumn("sim", cosine_col(F.col("qe"), F.col("e")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "sim")
    )


def cosine_neardup_pairs(emb: DataFrame, threshold: float,
                         id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact embedding near-dup pairs: (id_a < id_b, cos >= threshold).

    Norms are computed once per side before the join (a per-pair cosine
    would redo both self-dot-products, tripling the O(n²·d) work)."""
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    ).withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    a = base.select(F.col("id").alias("id_a"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = base.select(F.col("id").alias("id_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b")
    )


def cosine_neardup_pairs_blocked(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
    n_blocks: int | None = None,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """EXACT near-dup pairs (cos >= threshold, id_a < id_b) without a
    Catalyst cartesian product: the classic 2D-blocked all-pairs scheme.

    Vectors are hashed into ``n_blocks`` balanced blocks; each of the
    ``n_blocks*(n_blocks+1)/2`` block PAIRS becomes one ``applyInPandas``
    group that computes its sim tile with a single BLAS matmul and emits
    only the >=threshold pairs. Exact threshold-join is inherently
    Ω(n²·d) FLOPS — the design choices that matter at scale are (a)
    those FLOPS run in BLAS, not per-pair Catalyst array folds (~100×),
    (b) communication is O(n·n_blocks) replicated rows (the standard 2D
    tradeoff), each tile fits executor memory, and (c) at 100 TB you
    bound n² by running this kernel per dedup-cluster / LSH bucket —
    see :func:`srp_neardup_pairs` for the sub-quadratic candidate path.
    """
    import pandas as pd

    spark = emb.sparkSession
    base = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if n_blocks is None:
        # sizing only needs an approximate row count: take the caller's
        # hint when provided (skips an extra action per call) — an off
        # estimate just changes tile granularity, never correctness
        n = n_rows_hint if n_rows_hint is not None else emb.count()
        n_blocks = max(1, -(-n // block_rows))
    bpairs = [(bp, i, j) for bp, (i, j) in enumerate(
        (i, j) for i in range(n_blocks) for j in range(i, n_blocks)
    )]
    bp_df = spark.createDataFrame(bpairs, "bp int, bi int, bj int")
    blocked = base.withColumn(
        "blk", F.pmod(F.xxhash64("vid"), F.lit(n_blocks)).cast("int")
    )
    side_a = blocked.join(F.broadcast(bp_df), F.col("blk") == F.col("bi")).select(
        "bp", F.lit(0).alias("role"), "vid", "v", (F.col("bi") == F.col("bj")).alias("diag")
    )
    side_b = blocked.join(
        F.broadcast(bp_df.filter(F.col("bi") != F.col("bj"))), F.col("blk") == F.col("bj")
    ).select("bp", F.lit(1).alias("role"), "vid", "v", F.lit(False).alias("diag"))
    id_type = emb.schema[id_col].dataType
    out_schema = StructType(
        [StructField("id_a", id_type, False), StructField("id_b", id_type, False)]
    )

    def tile(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf["role"] == 0]
        diag = bool(a["diag"].iloc[0]) if len(a) else False
        b = a if diag else pdf[pdf["role"] == 1]
        if not len(a) or not len(b):
            return pd.DataFrame({"id_a": [], "id_b": []})
        ma = np.stack(a["v"].to_numpy()).astype(np.float64)
        ma = ma / np.maximum(np.linalg.norm(ma, axis=1, keepdims=True), 1e-12)
        if diag:
            mb = ma
        else:
            mb = np.stack(b["v"].to_numpy()).astype(np.float64)
            mb = mb / np.maximum(np.linalg.norm(mb, axis=1, keepdims=True), 1e-12)
        sims = ma @ mb.T
        ia, ib = np.nonzero(sims >= threshold)
        ids_a = a["vid"].to_numpy()[ia]
        ids_b = b["vid"].to_numpy()[ib]
        lo = np.minimum(ids_a, ids_b)
        hi = np.maximum(ids_a, ids_b)
        keep = lo < hi  # drops self-pairs and diagonal double-counts
        # drop_duplicates, not np.unique(axis=0): the id column may be
        # any orderable dtype (string doc ids make object arrays, which
        # np.unique's axis kwarg rejects)
        return pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep]}).drop_duplicates()

    return side_a.unionByName(side_b).groupBy("bp").applyInPandas(tile, out_schema)


def srp_neardup_pairs(emb: DataFrame, threshold: float, dim: int = 64,
                      n_bits: int = 6, n_tables: int = 8, seed: int = DEFAULT_SEED,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      bucket_cap: int | None = 8192) -> DataFrame:
    """LSH-bucketed near-dup pairs, exactly verified (cos >= threshold).

    Candidate generation AND exact verification happen inside one
    per-bucket BLAS tile (``groupBy(key).applyInPandas``): each bucket's
    vectors are gathered once and its sim matrix computed with a single
    matmul, emitting only the >=threshold pairs. Nothing quadratic is
    ever materialized — the old shape (explode candidates -> distinct ->
    re-join both embedding arrays -> per-pair Catalyst fold) shuffled
    O(sum bucket^2) pair rows carrying two d-dim arrays each; measured
    1.9M pair rows / 22 s where the tile does the same work in <1 s at
    sf0.1. Communication is the standard LSH cost: each vector ships
    ``n_tables`` times to its buckets.

    Buckets above ``bucket_cap`` members are dropped before the vector
    join (hot-bucket guard: a degenerate key would make its tile
    O(bucket^2) with no bound); recall loss is confined to those keys
    and auditable via per-key counts.
    """
    import pandas as pd
    from pyspark import StorageLevel

    # two consumers (hot-bucket count, bucket-row join) would each
    # re-derive the signature matmul chain per action — persist the
    # tiny (vid, key) rows instead (same recompute trap measured 35x on
    # the minhash path, sketchlib/dedup.py)
    sig = caches.register(
        _bucketed(
            srp_signatures(emb, id_col, vec_col, dim, n_bits, n_tables, seed)
        ).persist(StorageLevel.MEMORY_AND_DISK),
        owner="ann.srp",
    )
    if bucket_cap is not None:
        hot = (
            sig.groupBy("key")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > bucket_cap)
            .select("key")
        )
        sig = sig.join(F.broadcast(hot), "key", "left_anti")
    base = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    rows = sig.join(base, "vid")
    id_type = emb.schema[id_col].dataType
    out_schema = StructType(
        [StructField("id_a", id_type, False), StructField("id_b", id_type, False)]
    )

    def tile(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        # epsilon guard: an all-zero embedding would otherwise turn its
        # row into NaN and silently drop its pairs (NaN >= t is False)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ m.T
        ia, ib = np.nonzero(sims >= threshold)
        ids = pdf["vid"].to_numpy()
        lo = np.minimum(ids[ia], ids[ib])
        hi = np.maximum(ids[ia], ids[ib])
        keep = lo < hi  # drops the diagonal and one triangle
        # see cosine_neardup_pairs_blocked: object-dtype-safe dedup
        return pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep]}).drop_duplicates()

    return rows.groupBy("key").applyInPandas(tile, out_schema).distinct()


def _hash_sample(
    emb: DataFrame, id_col: str, vec_col: str, sample_cap: int
) -> np.ndarray:
    """L2-normalized float64 matrix of a deterministic hash-sample of
    ~``sample_cap`` vectors — the shared bounded-sample recipe for
    codebook/centroid training (IVF and PQ)."""
    n = emb.count()
    stride = max(1, n // sample_cap)
    sample = emb.select(F.col(vec_col).cast("array<double>").alias("v")).filter(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0
    )
    mat = np.array(sample.toPandas()["v"].tolist(), dtype=np.float64)
    if mat.size:
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return mat



# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-bucketed scale path
# ---------------------------------------------------------------------------


def ivf_centroids(
    emb: DataFrame,
    dim: int,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = DEFAULT_SEED,
    sample_cap: int = 65536,
    iters: int = 10,
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained on a deterministic
    hash-sample of at most ``sample_cap`` vectors (the standard IVF
    recipe: centroids need a representative sample, not the corpus —
    the only full-corpus pass is the cheap assignment matmul). Returns
    L2-normalized (n_lists, dim) float64 centroids, reproducible per
    seed."""
    mat = _hash_sample(emb, id_col, vec_col, sample_cap)
    if mat.shape[0] < n_lists:
        raise ValueError(f"sample too small ({mat.shape[0]}) for n_lists={n_lists}")
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(mat.shape[0], size=n_lists, replace=False)]
    for _ in range(iters):
        sims = mat @ cents.T
        assign = sims.argmax(axis=1)
        dead = []
        for c in range(n_lists):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
            else:
                dead.append(c)
        if dead:
            # distinct worst-served vectors (ascending best-sim order),
            # one per dead list — see pq_train for the rationale
            worst = np.argsort(sims.max(axis=1))[: len(dead)]
            for c, p in zip(dead, worst):
                cents[c] = mat[p]
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, lst) rows: each vector's ``nprobe`` nearest coarse lists
    (one matmul against the broadcast centroid matrix per Arrow batch).
    Corpus side uses nprobe=1; query side probes several."""
    n_lists, dim = centroids.shape
    nprobe = min(nprobe, n_lists)
    id_type = df.schema[id_col].dataType
    narrow = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    out_schema = StructType(
        [StructField("vid", id_type, False), StructField("lst", IntegerType(), False)]
    )
    ct = centroids.T.copy()

    def fn(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            flat = batch.column("v").flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(n, dim)
            sims = mat @ ct
            if nprobe == 1:
                lists = sims.argmax(axis=1)[:, None]
            else:
                lists = np.argpartition(-sims, nprobe - 1, axis=1)[:, :nprobe]
            ids = np.repeat(np.asarray(batch.column("vid")), nprobe)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(lists.reshape(-1).astype(np.int32))],
                names=["vid", "lst"],
            )

    return narrow.mapInArrow(fn, out_schema)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_lists: int = 16,
    nprobe: int = 4,
    seed: int = DEFAULT_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "query_id",
    q_vec: str = "qe",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into
    ``n_lists`` inverted lists (one int per vector — the embeddings
    never shuffle for candidate generation), probe each query's
    ``nprobe`` nearest lists, exactly re-score the candidates, keep
    top-k. Precision 1.0; recall grows with nprobe (nprobe == n_lists
    degenerates to exact brute force). Same candidate-join topology as
    :func:`srp_topk` — (vid, lst) int rows shuffle, vectors join once
    by id for the rescore."""
    if centroids is None:
        centroids = ivf_centroids(emb, dim, n_lists, id_col, vec_col, seed)
    corpus = ivf_assign(emb, centroids, 1, id_col, vec_col)
    qdf = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"))
    probes = ivf_assign(qdf, centroids, nprobe, "query_id", "qv").withColumnRenamed(
        "vid", "query_id"
    )
    cands = (
        probes.join(corpus, "lst")
        .select("query_id", F.col("vid").alias("neighbor_id"))
        .distinct()
    )
    e = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("e")
    )
    q = qdf.select("query_id", F.col("qv").cast("array<double>").alias("qe"))
    scored = (
        cands.join(F.broadcast(q), "query_id")
        .join(e, "neighbor_id")
        .withColumn("sim", cosine_col(F.col("qe"), F.col("e")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "sim")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — memory-compressed ANN scan + exact rescore
# ---------------------------------------------------------------------------


def pq_train(
    emb: DataFrame,
    dim: int,
    m: int = 8,
    k_cent: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = DEFAULT_SEED,
    sample_cap: int = 65536,
    iters: int = 12,
) -> np.ndarray:
    """Train PQ codebooks (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): split the (L2-normalized)
    vector into ``m`` subspaces of dim/m and run k-means with ``k_cent``
    centroids per subspace on a deterministic hash-sample — same
    bounded-sample recipe as :func:`ivf_centroids`. Returns
    (m, k_cent, dim//m) float64 codebooks, reproducible per seed."""
    if dim % m:
        raise ValueError(f"m ({m}) must divide dim ({dim})")
    dsub = dim // m
    mat = _hash_sample(emb, id_col, vec_col, sample_cap)
    if mat.shape[0] < k_cent:
        raise ValueError(f"sample too small ({mat.shape[0]}) for k_cent={k_cent}")
    rng = np.random.default_rng(seed)
    books = np.empty((m, k_cent, dsub), dtype=np.float64)
    for mi in range(m):
        sub = mat[:, mi * dsub : (mi + 1) * dsub]
        cents = sub[rng.choice(sub.shape[0], size=k_cent, replace=False)]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            dead = []
            for c in range(k_cent):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
                else:
                    dead.append(c)
            if dead:
                # reseed each dead centroid from a DISTINCT worst-served
                # point (descending min-distance order) — reusing one
                # stale argmax for every dead centroid would collapse
                # them onto a single duplicated codebook entry
                worst = np.argsort(-d2.min(axis=1))[: len(dead)]
                for c, p in zip(dead, worst):
                    cents[c] = sub[p]
        books[mi] = cents
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, codes array<int>[m]): nearest sub-centroid per subspace for
    the L2-normalized vector — one distance matrix per subspace per
    Arrow batch. m bytes-worth of code replaces dim floats (32x at
    dim=64/m=8/k=16): at corpus scale the ADC scan reads ONLY this."""
    m, k_cent, dsub = codebooks.shape
    dim = m * dsub
    id_type = emb.schema[id_col].dataType
    narrow = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    out_schema = StructType(
        [
            StructField("vid", id_type, False),
            StructField("codes", ArrayType(IntegerType()), False),
        ]
    )
    cb = codebooks

    def fn(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            flat = batch.column("v").flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(n, dim).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            codes = np.empty((n, m), dtype=np.int32)
            for mi in range(m):
                sub = mat[:, mi * dsub : (mi + 1) * dsub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
                d2 = -2.0 * (sub @ cb[mi].T) + (cb[mi] ** 2).sum(axis=1)[None, :]
                codes[:, mi] = d2.argmin(axis=1)
            offs = pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32))
            yield pa.RecordBatch.from_arrays(
                [batch.column("vid"), pa.ListArray.from_arrays(offs, pa.array(codes.reshape(-1)))],
                names=["vid", "codes"],
            )

    return narrow.mapInArrow(fn, out_schema)


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "query_id",
    q_vec: str = "qe",
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ approximate top-k with asymmetric distance computation (ADC):
    each query precomputes an (m, k_cent) lookup table of sub-inner-
    products against the codebooks (driver-side: queries x m x k_cent
    doubles, KBs); the scan then scores every CODE row with m table
    lookups — a numpy gather over the compact codes, never touching the
    vectors — keeps the per-partition top-``rerank`` per query, and
    exactly re-scores only those by joining the true embeddings.
    Precision 1.0; recall governed by (m, k_cent, rerank)."""
    m, k_cent, dsub = codebooks.shape
    if codes is None:
        codes = pq_encode(emb, codebooks, id_col, vec_col)
    qrows = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv")).collect()
    luts, qids = [], []
    for r in qrows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        qv /= max(np.linalg.norm(qv), 1e-12)
        luts.append(
            np.stack(
                [codebooks[mi] @ qv[mi * dsub : (mi + 1) * dsub] for mi in range(m)]
            )
        )
        qids.append(r["query_id"])
    lut_arr = np.stack(luts)  # (nq, m, k_cent)
    nq = len(qids)
    id_field = codes.schema["vid"].dataType
    part_schema = StructType(
        [
            StructField("qi", IntegerType(), False),
            StructField("neighbor_id", id_field, False),
            StructField("approx", DoubleType(), False),
        ]
    )

    def scan(batches):
        midx = np.arange(m)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            carr = batch.column("codes").flatten().to_numpy(zero_copy_only=False)
            cmat = carr.reshape(n, m)
            vids = np.asarray(batch.column("vid"))
            for qi in range(nq):
                scores = lut_arr[qi][midx[None, :], cmat].sum(axis=1)
                take = min(rerank, n)
                top = np.argpartition(-scores, take - 1)[:take]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.full(take, qi, dtype=np.int32)),
                        pa.array(vids[top]),
                        pa.array(scores[top]),
                    ],
                    names=["qi", "neighbor_id", "approx"],
                )

    part_top = codes.mapInArrow(scan, part_schema)
    spark = emb.sparkSession
    qmap = spark.createDataFrame(
        list(zip(range(nq), qids)),
        StructType(
            [
                StructField("qi", IntegerType(), False),
                StructField("query_id", queries.schema[q_id].dataType, False),
            ]
        ),
    )
    wg = Window.partitionBy("qi").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    global_top = (
        part_top.withColumn("r", F.row_number().over(wg))
        .filter(F.col("r") <= rerank)
        .join(F.broadcast(qmap), "qi")
        .select("query_id", "neighbor_id")
    )
    e = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("e")
    )
    q = queries.select(
        F.col(q_id).alias("query_id"), F.col(q_vec).cast("array<double>").alias("qe")
    )
    scored = (
        global_top.join(F.broadcast(q), "query_id")
        .join(e, "neighbor_id")
        .withColumn("sim", cosine_col(F.col("qe"), F.col("e")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "sim")
    )


# ---------------------------------------------------------------------------
# Semantic dedup (cluster-then-dedup) — SemDeDup-style scale path
# ---------------------------------------------------------------------------


def semantic_dedup_pairs(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = DEFAULT_SEED,
    list_cap: int | None = 65536,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Cluster-then-dedup near-dup pairs (the SemDeDup recipe, Abbas et
    al. 2023): coarse-partition the corpus with the spherical k-means
    quantizer (:func:`ivf_centroids` / :func:`ivf_assign`, one int per
    vector — embeddings never shuffle for assignment), then compute
    EXACT cosine pairs (>= threshold, id_a < id_b) WITHIN each cluster
    as one BLAS tile per list (same fused verify as
    :func:`srp_neardup_pairs`).

    Expected FLOPs drop from n² to ~n²/n_lists; the deliberate
    trade-off is that pairs straddling a cluster boundary are missed —
    near-identical vectors (the dedup regime, cos >= ~0.9) almost
    always share a nearest centroid, and the driver query certifies the
    achieved recall against the exact kernel. Lists larger than
    ``list_cap`` are dropped before the vector join (skew guard, same
    contract as ``bucket_cap`` elsewhere; audit via a groupBy count).
    """
    import pandas as pd

    if centroids is None:
        centroids = ivf_centroids(emb, dim, n_lists, id_col, vec_col, seed)
    assign = ivf_assign(emb, centroids, 1, id_col, vec_col)
    if list_cap is not None:
        hot = (
            assign.groupBy("lst")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > list_cap)
            .select("lst")
        )
        assign = assign.join(F.broadcast(hot), "lst", "left_anti")
    base = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    rows = assign.join(base, "vid")
    id_type = emb.schema[id_col].dataType
    out_schema = StructType(
        [StructField("id_a", id_type, False), StructField("id_b", id_type, False)]
    )

    def tile(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ m.T
        ia, ib = np.nonzero(sims >= threshold)
        ids = pdf["vid"].to_numpy()
        lo = np.minimum(ids[ia], ids[ib])
        hi = np.maximum(ids[ia], ids[ib])
        keep = lo < hi
        return pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep]}).drop_duplicates()

    return rows.groupBy("lst").applyInPandas(tile, out_schema)
