"""Bloom filter kernel tests (reference strategy:
/root/reference/src/filters/bloomfilter.rs — insert/query/union
:409-427, mismatch raises :429-459, ctor bounds :468-484, sizing golden
:462-466, len estimate :296-304)."""

import numpy as np
import pytest

from sketchlib.bloom import BloomFilter
from sketchlib.codec import SketchParamMismatch


def test_sizing_golden():
    # reference golden: n=1000, p=0.1 → k=3, m=4792
    f = BloomFilter.with_properties(1000, 0.1)
    assert (f.m, f.k) == (4792, 3)


@pytest.mark.parametrize("n,p", [(0, 0.1), (-1, 0.1), (10, 0.0), (10, 1.0), (10, -0.5)])
def test_property_ctor_bounds(n, p):
    with pytest.raises(ValueError):
        BloomFilter.with_properties(n, p)


@pytest.mark.parametrize("m,k", [(0, 1), (10, 0), (-5, 2)])
def test_ctor_bounds(m, k):
    with pytest.raises(ValueError):
        BloomFilter(m, k)


def test_insert_query_pair():
    f = BloomFilter(100, 2)
    assert f.is_empty()
    f.update(np.array([1]))
    assert f.query(np.array([1]))[0]
    assert not f.is_empty()


def test_no_false_negatives_and_fpr():
    f = BloomFilter.with_properties(10_000, 0.02)
    keys = np.arange(10_000, dtype=np.int64)
    f.update(keys)
    assert f.query(keys).all(), "Bloom filters never have false negatives"
    absent = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    fpr = f.query(absent).mean()
    assert fpr <= 2 * 0.02, fpr


def test_len_estimate():
    f = BloomFilter.with_properties(10_000, 0.02)
    assert f.len_estimate() == 0
    f.update(np.arange(10_000))
    assert abs(f.len_estimate() - 10_000) < 600


def test_union_is_or_and_idempotent():
    a, b = BloomFilter(1000, 3), BloomFilter(1000, 3)
    a.update(np.array([1, 2]))
    b.update(np.array([2, 3]))
    whole = BloomFilter(1000, 3)
    whole.update(np.array([1, 2, 3]))
    a.union(b)
    assert np.array_equal(a.bits, whole.bits)
    # idempotent: merging again changes nothing
    a.union(b)
    assert np.array_equal(a.bits, whole.bits)


def test_merge_param_mismatch_raises():
    with pytest.raises(SketchParamMismatch):
        BloomFilter(100, 2).merge(BloomFilter(200, 2))
    with pytest.raises(SketchParamMismatch):
        BloomFilter(100, 2).merge(BloomFilter(100, 3))
    with pytest.raises(SketchParamMismatch):
        BloomFilter(100, 2, seed=1).merge(BloomFilter(100, 2, seed=2))


def test_serde_roundtrip_then_continue():
    f = BloomFilter.with_properties(1000, 0.05)
    f.update(np.arange(500))
    f2 = BloomFilter.from_bytes(f.to_bytes())
    assert np.array_equal(f.bits, f2.bits)
    f.update(np.arange(500, 700))
    f2.update(np.arange(500, 700))
    assert np.array_equal(f.bits, f2.bits)
