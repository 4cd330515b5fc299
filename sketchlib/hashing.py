"""Deterministic, vectorized 64-bit hashing shared by every sketch.

The reference library derives everything from a stable 64-bit hash per
element plus *enhanced double hashing* to fan one hash out into k
positions (Kirsch–Mitzenmacher; reference behavior at
/root/reference/src/hash_utils.rs:36-52,171-191). We keep exactly that
contract — one seedable 64-bit hash, k derived positions from two mixes —
but the primitive is splitmix64 finalization over numpy ``uint64``
arrays, which vectorizes (Rust's SipHash identity is irrelevant; only
self-consistency and dispersion matter, see SURVEY.md §1.1).

Every function here is pure numpy, Spark-free, and safe for uint64
wrap-around arithmetic.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "DEFAULT_SEED",
    "splitmix64",
    "hash_i64",
    "mix_seed",
    "k_positions",
    "uniform01",
]

DEFAULT_SEED = 0x5EED_5EED_5EED_5EED

_U = np.uint64
_GOLDEN = _U(0x9E3779B97F4A7C15)
_MIX1 = _U(0xBF58476D1CE4E5B9)
_MIX2 = _U(0x94D049BB133111EB)
# Distinct stream constants for deriving h1/h2 of double hashing.
_STREAM1 = _U(0xA24BAED4963EE407)
_STREAM2 = _U(0x9FB21C651E98DF25)


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (or scalar → 0-d array).

    Full-avalanche 64-bit mix (Steele/Lea/Flood, public domain); the same
    construction the numpy Philox/SeedSequence ecosystem uses for seeding.
    """
    with np.errstate(over="ignore"):
        z = (np.asarray(x).astype(np.uint64) + _GOLDEN) * _U(1)
        z = (z ^ (z >> _U(30))) * _MIX1
        z = (z ^ (z >> _U(27))) * _MIX2
        return z ^ (z >> _U(31))


def mix_seed(seed: int, stream: int = 0) -> np.uint64:
    """Derive a per-(seed, stream) 64-bit key."""
    s = np.uint64(seed & 0xFFFF_FFFF_FFFF_FFFF)
    with np.errstate(over="ignore"):
        return np.uint64(splitmix64(s ^ (np.uint64(stream) * _GOLDEN)))


def hash_i64(values: np.ndarray, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Hash an integer array (any width / signedness) to uint64.

    This is the element hash every sketch consumes — the analogue of the
    reference's ``BuildHasherSeeded`` (hash_utils.rs:194-214). String and
    other non-integer columns are pre-hashed to int64 JVM-side (Spark
    ``xxhash64``) before reaching this kernel, so Python never touches
    per-row objects.
    """
    v = np.asarray(values)
    if v.dtype != np.uint64:
        v = v.astype(np.int64, copy=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        return splitmix64(v ^ mix_seed(seed))


def k_positions(h: np.ndarray, k: int, m: int, seed: int) -> np.ndarray:
    """Enhanced double hashing: k positions in [0, m) per input hash.

    pos_i = (h1 + i*h2 + (i³−i)/6) mod m — two mixes per element, k
    positions by broadcasting (the reference computes the same recurrence
    scalar-wise, hash_utils.rs:118-138,171-191).

    Returns shape ``(k, len(h))`` uint64.
    """
    h = np.asarray(h, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h1 = splitmix64(h ^ mix_seed(seed, 1) ^ _STREAM1)
        h2 = splitmix64(h ^ mix_seed(seed, 2) ^ _STREAM2)
        i = np.arange(k, dtype=np.uint64)
        f = (i * i * i - i) // _U(6)  # enhanced-double-hashing tweak f(i)
        pos = h1[None, :] + i[:, None] * h2[None, :] + f[:, None]
        if m & (m - 1) == 0:
            # power-of-two m (the common CMS/Bloom config): identical
            # result, and a uint64 AND is ~3x cheaper than the division
            # behind %
            return pos & _U(m - 1)
        return pos % _U(m)


def unique_counts(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """np.unique(return_counts=True), but O(n) via bincount when the
    value range is dense enough (token-ID columns are small bounded
    ints per the input contract; hashed columns fall back to the sort
    path automatically because their range is 2^64)."""
    if vals.size == 0:
        return vals, np.zeros(0, dtype=np.int64)
    if vals.dtype.kind in "iu":
        vmin = int(vals.min())
        vmax = int(vals.max())
        rng = vmax - vmin
        if 0 <= rng <= max(4 * vals.size, 1 << 16) and rng < (1 << 26):
            if vals.dtype.kind == "u":
                # shift in the array's own unsigned dtype: uint64 values
                # >= 2^63 would promote int64-minus-python-int to float64
                shifted = (vals - vals.dtype.type(vmin)).astype(np.int64)
            else:
                shifted = vals.astype(np.int64) - vmin
            c = np.bincount(shifted, minlength=rng + 1)
            nz = np.flatnonzero(c)
            return (nz.astype(vals.dtype) + vals.dtype.type(vmin)), c[nz]
    return np.unique(vals, return_counts=True)


def uniform01(h: np.ndarray) -> np.ndarray:
    """Map uint64 hashes to uniform floats in [0, 1) (53-bit mantissa)."""
    return (np.asarray(h, dtype=np.uint64) >> _U(11)).astype(np.float64) * (2.0**-53)
