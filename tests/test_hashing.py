"""Hashing kernel tests — determinism is the single most important
invariant (SURVEY.md §1.1): same seed ⇒ same hash on every executor."""

import numpy as np

from sketchlib.hashing import hash_i64, k_positions, splitmix64, uniform01


def test_splitmix64_deterministic():
    x = np.arange(1000, dtype=np.uint64)
    a, b = splitmix64(x), splitmix64(x)
    assert np.array_equal(a, b)
    assert a.dtype == np.uint64


def test_splitmix64_avalanche():
    # flipping one input bit flips ~half the output bits on average
    x = np.arange(10_000, dtype=np.uint64)
    d = splitmix64(x) ^ splitmix64(x ^ np.uint64(1))
    popcnt = np.array([bin(v).count("1") for v in d])
    assert 28 < popcnt.mean() < 36


def test_hash_i64_seed_independence():
    v = np.arange(1000, dtype=np.int64)
    assert not np.array_equal(hash_i64(v, seed=1), hash_i64(v, seed=2))
    assert np.array_equal(hash_i64(v, seed=7), hash_i64(v, seed=7))


def test_hash_i64_accepts_int32_and_negative():
    v32 = np.array([-5, 0, 5], dtype=np.int32)
    v64 = v32.astype(np.int64)
    assert np.array_equal(hash_i64(v32), hash_i64(v64))


def test_k_positions_shape_and_range():
    h = hash_i64(np.arange(500, dtype=np.int64))
    pos = k_positions(h, k=5, m=273, seed=42)
    assert pos.shape == (5, 500)
    assert (pos < 273).all()
    # the k rows must differ (double hashing actually fans out)
    assert not np.array_equal(pos[0], pos[1])


def test_k_positions_roughly_uniform():
    h = hash_i64(np.arange(100_000, dtype=np.int64))
    pos = k_positions(h, k=3, m=64, seed=0).ravel()
    counts = np.bincount(pos.astype(np.int64), minlength=64)
    expected = pos.size / 64
    assert (np.abs(counts - expected) < 6 * np.sqrt(expected)).all()


def test_uniform01_range():
    u = uniform01(splitmix64(np.arange(100_000, dtype=np.uint64)))
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.01


def test_golden_hash_values():
    """Pin the hash forever — any change silently invalidates every
    committed sketch golden and every persisted checkpoint."""
    got = hash_i64(np.array([0, 1, 2**40, -1], dtype=np.int64), 0)
    assert got.dtype == np.uint64
    expected = np.array(
        [
            12035550249420947055,
            627405149472732430,
            14485895299514490415,
            3303439293501059696,
        ],
        dtype=np.uint64,
    )
    assert np.array_equal(got, expected)
