"""Near-duplicate detection: MinHash + LSH banding with exact verify.

Scale shape (the 100 TB path):
1. shingle + hash JVM-side (``transform`` + ``xxhash64`` — no strings
   ever reach Python),
2. one vectorized Arrow pass turns each doc's shingle-hash array into an
   ``n_hashes`` MinHash signature and ``bands`` band keys (numpy
   ``minimum.reduceat`` over the flattened batch — no per-row Python),
3. the only shuffles move (doc_id, band_key) rows and the candidate
   pairs — never the documents,
4. candidates are *exactly* verified (Jaccard over the shingle-hash
   arrays), so false-positive buckets cost time, never correctness; a
   missed pair is bounded by the standard LSH recall
   ``1 - (1 - J^r)^b``.

MinHash/LSH are public constructions (Broder; Leskovec-Rajaraman-Ullman
ch. 3); not part of the reference, added per the training-data-pipeline
requirement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from .hashing import splitmix64

DEFAULT_SEED = 0x5EEDC0DE


def shingle_col(words_col: str, n: int = 3):
    """``array<string>`` of word n-grams (joined with spaces), built with
    JVM expressions only."""
    size_expr = F.greatest(F.size(words_col) - F.lit(n - 1), F.lit(0))
    return F.transform(
        F.slice(words_col, 1, size_expr),
        lambda w, i: F.concat_ws(
            " ", *[F.element_at(words_col, i + F.lit(j + 1)) for j in range(n)]
        ),
    )


def _signature_fn(n_hashes: int, bands: int, seed: int):
    rows_per_band = n_hashes // bands
    seeds = splitmix64(np.arange(n_hashes, dtype=np.uint64) + np.uint64(seed))

    def fn(batches):
        for batch in batches:
            ids = batch.column("doc_id")
            harr = batch.column("sh")
            lengths = harr.value_lengths().fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = harr.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            keep = lengths > 0
            if not keep.any():
                continue
            starts = (np.cumsum(lengths) - lengths)[keep]
            n_docs = int(keep.sum())
            sig = np.empty((n_docs, n_hashes), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for i in range(n_hashes):
                    mixed = splitmix64(flat ^ seeds[i])
                    sig[:, i] = np.minimum.reduceat(mixed, starts)
            # band key = hash of the band's signature slice
            bkeys = np.empty((n_docs, bands), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for b in range(bands):
                    sl = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
                    acc = np.full(n_docs, np.uint64(b) + np.uint64(0x9E3779B9), dtype=np.uint64)
                    for r in range(rows_per_band):
                        acc = splitmix64(acc ^ sl[:, r])
                    bkeys[:, b] = acc
            kept_ids = pa.array(np.asarray(ids)[keep])
            offsets = pa.array(np.arange(0, (n_docs + 1) * bands, bands, dtype=np.int32))
            band_list = pa.ListArray.from_arrays(
                offsets, pa.array(bkeys.reshape(-1).astype(np.int64).view(np.int64))
            )
            yield pa.RecordBatch.from_arrays([kept_ids, band_list], names=["doc_id", "band_keys"])

    return fn


def minhash_band_keys(
    df: DataFrame,
    id_col: str,
    words_col: str,
    shingle_n: int = 3,
    n_hashes: int = 64,
    bands: int = 32,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """(id, band_keys array<long>[bands]) per doc with >=1 shingle."""
    if n_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide n_hashes ({n_hashes})")
    id_type = df.schema[id_col].dataType
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            F.array_distinct(shingle_col(words_col, shingle_n)), lambda x: F.xxhash64(x)
        ).alias("sh"),
    )
    out_schema = StructType(
        [
            StructField("doc_id", id_type, False),
            StructField("band_keys", ArrayType(LongType()), False),
        ]
    )
    return hashed.mapInArrow(_signature_fn(n_hashes, bands, seed), out_schema)


def simhash_signatures(
    df: DataFrame,
    id_col: str,
    words_col: str,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """(doc_id, sig long): Charikar 64-bit SimHash over word hashes —
    bit b of the signature is the sign of the sum of ±1 votes from each
    word occurrence's hash bit b. One vectorized pass per Arrow batch
    (64 shift/reduceat passes over the flattened batch; no per-row
    Python)."""
    id_type = df.schema[id_col].dataType
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(F.col(words_col), lambda x: F.xxhash64(x, F.lit(seed))).alias("h"),
    )
    out_schema = StructType(
        [StructField("doc_id", id_type, False), StructField("sig", LongType(), False)]
    )

    def fn(batches):
        for batch in batches:
            harr = batch.column("h")
            lengths = harr.value_lengths().fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            keep = lengths > 0
            if not keep.any():
                continue
            flat = harr.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            starts = (np.cumsum(lengths) - lengths)[keep]
            n_docs = int(keep.sum())
            sig = np.zeros(n_docs, dtype=np.uint64)
            kept_len = lengths[keep]
            for b in range(64):
                ones = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
                votes = 2 * np.add.reduceat(ones, starts) - kept_len  # (+1/-1 sum)
                sig |= (votes > 0).astype(np.uint64) << np.uint64(b)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.asarray(batch.column("doc_id"))[keep]),
                    pa.array(sig.view(np.int64)),
                ],
                names=["doc_id", "sig"],
            )

    return hashed.mapInArrow(fn, out_schema)


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    words_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    Candidates via band blocking (pigeonhole: distance <= bands-1
    guarantees some band matches exactly, so recall is 1.0 whenever
    ``max_hamming < bands``); exact hamming verify on candidates."""
    if 64 % bands:
        raise ValueError(f"bands ({bands}) must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    sig = simhash_signatures(df, id_col, words_col, seed)
    parts = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("sig"), b * width).bitwiseAND(F.lit(mask))
                for b in range(bands)
            ])
        ).alias("band", "key"),
    )
    x, y = parts.alias("x"), parts.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.sig").alias("sig_a"),
            F.col("y.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cands.filter(hamming <= max_hamming).select("doc_a", "doc_b")


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    words_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    n_hashes: int = 64,
    bands: int = 32,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b) with exact shingle-Jaccard
    >= threshold, found via LSH candidate buckets."""
    shingles = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_sort(
            F.array_distinct(
                F.transform(shingle_col(words_col, shingle_n), lambda x: F.xxhash64(x))
            )
        ).alias("sh"),
    )
    bandkeys = minhash_band_keys(df, id_col, words_col, shingle_n, n_hashes, bands, seed)
    exploded = bandkeys.select("doc_id", F.posexplode("band_keys").alias("band", "key"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = shingles.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = shingles.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = cands.join(sa, "doc_a").join(sb, "doc_b")
    # exact verify on sorted hash arrays: |A ∩ B| / |A ∪ B| >= t, i.e.
    # 2*inter >= t' (avoid fp): inter/(sz_a+sz_b-inter) >= threshold
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return pairs.filter(inter >= F.lit(threshold) * union).select("doc_a", "doc_b")
