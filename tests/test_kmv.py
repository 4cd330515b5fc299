"""KMV bottom-k kernel: exactness below k, Beyer estimator bounds,
Jaccard accuracy on planted overlaps, merge ≡ whole-build byte-identity."""

import numpy as np
import pytest

from sketchlib.kmv import KMV
from sketchlib.codec import SketchParamMismatch


def test_exact_below_k():
    s = KMV(k=64, seed=1)
    s.update(np.arange(40))
    assert s.distinct() == 40.0
    assert s.relative_error() == 0.0
    # duplicates don't inflate
    s.update(np.arange(40))
    assert s.distinct() == 40.0


def test_estimator_within_bound():
    k = 1024
    for seed, n in [(1, 50_000), (2, 200_000), (3, 10_000)]:
        s = KMV(k=k, seed=seed)
        s.update(np.arange(n))
        rel = abs(s.distinct() - n) / n
        assert rel < 5.0 / np.sqrt(k - 2), (seed, n, rel)


def test_merge_byte_identical_to_whole_build():
    rng = np.random.default_rng(9)
    data = rng.integers(0, 30_000, size=100_000)
    whole = KMV(k=512, seed=4)
    whole.update(data)
    parts = []
    for chunk in np.array_split(data, 7):
        p = KMV(k=512, seed=4)
        p.update(chunk)
        parts.append(p.to_bytes())
    acc = KMV.from_bytes(parts[0])
    for b in parts[1:]:
        acc.merge(KMV.from_bytes(b))
    assert acc.to_bytes() == whole.to_bytes()


def test_prefilter_keeps_bottom_k_with_duplicates():
    # a large batch whose smallest values are heavily duplicated must
    # not evict other bottom-k members (the dedup-before-truncate rule)
    k = 16
    s = KMV(k=k, seed=7)
    base = np.arange(200)
    batch = np.concatenate([np.zeros(5000, dtype=np.int64), base])
    s.update(batch)
    ref = KMV(k=k, seed=7)
    ref.update(np.concatenate([[0], base]))
    assert s.to_bytes() == ref.to_bytes()


def test_jaccard_planted_overlap():
    k = 2048
    a, b = KMV(k=k, seed=5), KMV(k=k, seed=5)
    # |A|=|B|=30k sharing 20k elements: J = 20k/40k = 0.5
    a.update(np.arange(0, 30_000))
    b.update(np.arange(10_000, 40_000))
    j = a.jaccard(b)
    assert abs(j - 0.5) < 5 * 0.5 / np.sqrt(k)
    inter = a.intersection_distinct(b)
    assert abs(inter - 20_000) / 20_000 < 0.15
    union = a.union_distinct(b)
    assert abs(union - 40_000) / 40_000 < 5.0 / np.sqrt(k - 2)
    # symmetric
    assert j == pytest.approx(b.jaccard(a))


def test_jaccard_disjoint_and_identical():
    k = 256
    a, b = KMV(k=k, seed=2), KMV(k=k, seed=2)
    a.update(np.arange(0, 5000))
    b.update(np.arange(5000, 10_000))
    assert a.jaccard(b) < 0.05
    c = KMV(k=k, seed=2)
    c.update(np.arange(0, 5000))
    assert a.jaccard(c) == 1.0


def test_codec_roundtrip_and_param_mismatch():
    s = KMV(k=64, seed=3)
    s.update(np.arange(1000))
    r = KMV.from_bytes(s.to_bytes())
    assert r.k == 64 and r.seed == 3
    assert np.array_equal(r.mins, s.mins)
    assert r.distinct() == s.distinct()
    other = KMV(k=128, seed=3)
    with pytest.raises(SketchParamMismatch):
        s.merge(other)
    with pytest.raises(SketchParamMismatch):
        s.jaccard(KMV(k=64, seed=99))


def test_ctor_validation():
    with pytest.raises(ValueError):
        KMV(k=4)
    with pytest.raises(ValueError):
        KMV.with_relative_error(1.5)
    # with_relative_error sizing: eps=0.05 -> k = 402
    assert KMV.with_relative_error(0.05).k == 402


def test_empty_and_clear():
    s = KMV(k=32)
    assert s.is_empty() and s.distinct() == 0.0
    s.update(np.arange(10))
    assert not s.is_empty()
    s.clear()
    assert s.is_empty()
    e = KMV(k=32)
    assert e.jaccard(s) == 0.0


def test_with_relative_error_clamps_to_min_k():
    # eps above ~0.41 would compute k < 8; the factory clamps
    assert KMV.with_relative_error(0.5).k == 8
    assert KMV.with_relative_error(0.9).k == 8


def test_difference_planted_overlap():
    k = 2048
    a, b = KMV(k=k, seed=5), KMV(k=k, seed=5)
    # |A|=|B|=30k sharing 20k: |A\B| = |B\A| = 10k, |A∪B| = 40k
    a.update(np.arange(0, 30_000))
    b.update(np.arange(10_000, 40_000))
    d_ab = a.difference_distinct(b)
    d_ba = b.difference_distinct(a)
    # std of the only-A fraction <= 0.5/sqrt(k) of |A∪B| = 40k
    tol = 5 * 0.5 / np.sqrt(k) * 40_000 + 0.15 * 10_000
    assert abs(d_ab - 10_000) < tol
    assert abs(d_ba - 10_000) < tol
    # identities: A\A = 0; disjoint: A\B = |A|; and the three-way
    # decomposition inter + diff = distinct(A) holds exactly on the
    # same union synopsis (both read the same bottom-k' sample)
    assert a.difference_distinct(a) == 0.0
    c = KMV(k=256, seed=2)
    c.update(np.arange(0, 5000))
    e = KMV(k=256, seed=2)
    e.update(np.arange(5000, 10_000))
    assert abs(c.difference_distinct(e) - 5000) / 5000 < 0.2
