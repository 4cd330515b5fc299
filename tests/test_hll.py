"""HyperLogLog++ kernel tests.

Mirrors the reference test strategy (SURVEY.md §5): exact goldens under a
fixed seed at the same (b, n) grid the reference pins
(/root/reference/src/hyperloglog/mod.rs:436-524), merge ≡ single-sketch
equivalence (mod.rs:556-574), parameter-mismatch raises (mod.rs:576-591),
ctor bounds (mod.rs:393-413), bias-lookup edge cases (issue #74,
mod.rs:631-698), serde round-trip (serde.rs:155-189)."""

import numpy as np
import pytest

from sketchlib.codec import SketchParamMismatch
from sketchlib.hll import HLL, _bit_length_u64

# Exact committed goldens for OUR hash (seed=DEFAULT), same grid as the
# reference's golden table — numbers differ (different hasher), the
# pattern (fixed seed ⇒ exactly reproducible estimate) is the contract.
GOLDENS = {
    (4, 1000): 1220,
    (8, 1000): 1036,
    (12, 1000): 1011,
    (16, 1000): 1000,
    (8, 10000): 9297,
    (12, 10000): 9927,
    (16, 10000): 9992,
    (16, 100000): 99794,
    (16, 1000000): 1005341,
}


@pytest.mark.parametrize("b,n", sorted(GOLDENS))
def test_goldens(b, n):
    h = HLL(b)
    h.update(np.arange(n, dtype=np.int64))
    assert h.count() == GOLDENS[(b, n)]


@pytest.mark.parametrize("b,n", sorted(GOLDENS))
def test_error_bound(b, n):
    h = HLL(b)
    h.update(np.arange(n, dtype=np.int64))
    rel = abs(h.count() - n) / n
    assert rel <= 3 * h.relative_error(), (b, n, rel)


def test_bit_length_u64_exact():
    vals = np.array(
        [0, 1, 2, 3, 4, (1 << 52) - 1, 1 << 52, (1 << 53) + 1, (1 << 63), (1 << 64) - 1],
        dtype=np.uint64,
    )
    expected = np.array([int(v).bit_length() for v in vals], dtype=np.uint8)
    assert np.array_equal(_bit_length_u64(vals), expected)


def test_merge_equals_single_sketch():
    # reference: merge(A, B) has identical state to sketch(A ∪ B)
    a, b = HLL(12), HLL(12)
    a.update(np.arange(0, 600))
    b.update(np.arange(400, 1000))
    whole = HLL(12)
    whole.update(np.arange(0, 1000))
    a.merge(b)
    assert np.array_equal(a.regs, whole.regs)
    assert a.count() == whole.count()


def test_merge_any_partitioning_any_order():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 10_000, 50_000)
    whole = HLL(10)
    whole.update(data)
    for n_parts in (2, 7, 64):
        parts = np.array_split(data, n_parts)
        order = rng.permutation(n_parts)
        acc = HLL(10)
        for i in order:
            s = HLL(10)
            s.update(parts[i])
            acc.merge(s)
        assert np.array_equal(acc.regs, whole.regs), n_parts


def test_merge_param_mismatch_raises():
    with pytest.raises(SketchParamMismatch):
        HLL(8).merge(HLL(9))
    with pytest.raises(SketchParamMismatch):
        HLL(8, seed=1).merge(HLL(8, seed=2))


@pytest.mark.parametrize("b", [0, 3, 19, 64])
def test_ctor_bounds(b):
    with pytest.raises(ValueError):
        HLL(b)


def test_ctor_valid_range():
    for b in (4, 18):
        assert HLL(b).m == 1 << b


def test_count_never_crashes_across_cardinalities():
    # the reference fixed an out-of-bounds bias lookup (issue #74,
    # mod.rs:631-698); sweep cardinalities so the raw estimate crosses
    # every bias-table boundary at small b
    for b in (4, 5, 6):
        h = HLL(b)
        for n in (0, 1, 2, 5, 10, 50, 100, 500, 1000, 10_000):
            h.clear()
            if n:
                h.update(np.arange(n, dtype=np.int64))
            assert h.count() >= 0


def test_empty_and_clear():
    h = HLL(8)
    assert h.is_empty() and h.count() == 0
    h.update(np.arange(10))
    assert not h.is_empty()
    h.clear()
    assert h.is_empty()


def test_serde_roundtrip_then_continue():
    h = HLL(10)
    h.update(np.arange(500))
    h2 = HLL.from_bytes(h.to_bytes())
    assert np.array_equal(h.regs, h2.regs)
    assert h2.params() == h.params()
    # continue adding to the deserialized sketch ⇒ identical to uninterrupted
    h.update(np.arange(500, 1000))
    h2.update(np.arange(500, 1000))
    assert np.array_equal(h.regs, h2.regs)


def test_from_bytes_wrong_length_raises():
    h = HLL(10)
    blob = h.to_bytes()
    with pytest.raises(ValueError):
        HLL.from_bytes(blob[:-7])


def test_update_empty_batch_noop():
    h = HLL(8)
    h.update(np.zeros(0, dtype=np.int64))
    assert h.is_empty()
