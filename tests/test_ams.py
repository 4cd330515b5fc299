"""CountSketch / AMS kernel: unbiasedness, F2 guarantee, merge, codec."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.ams import CountSketch
from sketchlib.codec import SketchParamMismatch


def _zipf_stream(n=200_000, vocab=20_000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.zipf(1.3, n).astype(np.int64) % vocab)


def test_point_estimates_unbiased_and_bounded():
    v = _zipf_stream()
    uniq, counts = np.unique(v, return_counts=True)
    cs = CountSketch(8192, 5, seed=42)
    cs.update(v)
    est = cs.query_points(uniq)
    f2 = float(np.sum(counts.astype(np.float64) ** 2))
    # per-element: |err| <= 3*sqrt(F2/w) for almost all elements
    bound = 3.0 * np.sqrt(f2 / 8192)
    err = np.abs(est - counts)
    assert np.mean(err <= bound) > 0.97
    # top items essentially exact relative to their size
    top = np.argsort(counts)[-10:]
    assert np.all(np.abs(est[top] - counts[top]) <= 0.2 * counts[top] + bound)
    # unbiasedness shows as tiny MEAN error across many keys (CMS would
    # drift strictly positive here)
    assert abs(np.mean(est - counts)) < bound / 5


def test_f2_within_ams_bound():
    v = _zipf_stream(seed=3)
    counts = np.unique(v, return_counts=True)[1].astype(np.float64)
    f2 = float(np.sum(counts**2))
    w = 4096
    cs = CountSketch(w, 7, seed=42)
    cs.update(v)
    rel = abs(cs.f2() - f2) / f2
    assert rel <= 3.0 / np.sqrt(w)
    assert cs.l2() == pytest.approx(np.sqrt(cs.f2()))


def test_merge_equals_whole_byte_identical():
    v = _zipf_stream(seed=5)
    whole = CountSketch(2048, 5, seed=9)
    whole.update(v)
    parts = np.array_split(v, 7)
    acc = None
    for p in parts:
        k = CountSketch(2048, 5, seed=9)
        k.update(p)
        k = CountSketch.from_bytes(k.to_bytes())  # through the codec
        acc = k if acc is None else acc.merge(k)
    assert acc.to_bytes() == whole.to_bytes()


def test_dense_and_sparse_paths_identical():
    v = _zipf_stream(n=50_000, seed=7)
    a = CountSketch(8192, 4, seed=1)
    a.update(v)  # dense bincount path
    b = CountSketch(8192, 4, seed=1)
    for i in range(0, v.size, 97):  # tiny chunks -> add.at path
        b.update(v[i : i + 97])
    assert a.to_bytes() == b.to_bytes()


def test_codec_roundtrip_and_errors():
    cs = CountSketch(272, 3, seed=11)
    cs.update(np.arange(1000))
    back = CountSketch.from_bytes(cs.to_bytes())
    assert back.params() == cs.params()
    assert np.array_equal(back.table, cs.table)
    assert back.to_bytes() == cs.to_bytes()
    with pytest.raises(SketchParamMismatch):
        cs.merge(CountSketch(273, 3, seed=11))
    with pytest.raises(ValueError):
        CountSketch(0, 3)
    with pytest.raises(ValueError):
        CountSketch(16, 65)  # d > 64: no sign bit left
    w = CountSketch.with_point_error(0.02)
    assert w.w == 2500
    assert CountSketch(16, 2).is_empty()
    cs.clear()
    assert cs.is_empty()


def test_signed_deletion_net_zero():
    """Signed counters support turnstile updates: adding then removing
    the same multiset returns the exact zero table."""
    v = _zipf_stream(n=20_000, seed=13)
    cs = CountSketch(1024, 5, seed=2)
    uniq, counts = np.unique(v, return_counts=True)
    cs.update_hashed(__import__("sketchlib.hashing", fromlist=["hash_i64"]).hash_i64(uniq, 2), counts)
    cs.update_hashed(__import__("sketchlib.hashing", fromlist=["hash_i64"]).hash_i64(uniq, 2), -counts)
    assert cs.is_empty()


def test_huge_counts_stay_exact_past_float53():
    """ADVICE r5 (same gate as cms.py): a signed batch whose Σ|c|
    crosses 2^53 must take the exact int64 np.add.at path — float64
    bincount weights would silently round the odd low bit."""
    import numpy as np

    big = np.int64(1) << np.int64(53)
    h = np.arange(64, dtype=np.int64)
    counts = np.ones(64, dtype=np.int64)
    counts[0] = big + 1  # odd: float64 rounds to even above 2^53
    from sketchlib.hashing import hash_i64

    cs = CountSketch(16, 1, seed=3)  # dense-eligible shape
    cs.update_hashed(hash_i64(h, cs.seed), counts)
    # net table mass is exactly Σ sign*c; remove everything and the
    # exact-zero invariant only holds if no float rounding occurred
    cs.update_hashed(hash_i64(h, cs.seed), -counts)
    assert cs.is_empty()
