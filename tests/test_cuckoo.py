"""CuckooFilter kernel tests (reference: filters/cuckoofilter.rs tests)."""

import numpy as np
import pytest

from sketchlib.cuckoo import CuckooFilter, CuckooFilterFull
from sketchlib.codec import SketchParamMismatch


class TestCtor:
    def test_param_bounds(self):
        with pytest.raises(ValueError):
            CuckooFilter(bucketsize=1)
        with pytest.raises(ValueError):
            CuckooFilter(n_buckets=100)  # not a power of 2
        with pytest.raises(ValueError):
            CuckooFilter(l_fingerprint=1)
        with pytest.raises(ValueError):
            CuckooFilter(l_fingerprint=65)

    def test_properties_bounds(self):
        with pytest.raises(ValueError):
            CuckooFilter.with_properties_4(0.0, 100)
        with pytest.raises(ValueError):
            CuckooFilter.with_properties_4(0.02, 0)

    def test_properties_sizing(self):
        f = CuckooFilter.with_properties_4(0.02, 10_000)
        # l = ceil(log2(2*4/0.02)) = ceil(log2 400) = 9
        assert f.l_fingerprint == 9
        assert f.n_buckets & (f.n_buckets - 1) == 0
        # must actually hold 10k elements
        f.update(np.arange(10_000))
        assert len(f) == 10_000


class TestOps:
    def test_insert_query_len(self):
        f = CuckooFilter(4, 1024, 16, seed=3)
        f.update(np.arange(1000))
        assert len(f) == 1000
        assert f.query(np.arange(1000)).all()  # zero false negatives
        fpr = f.query(np.arange(100_000, 110_000)).mean()
        assert fpr <= 0.01  # 2*4/2^16 ≈ 0.00012 design rate, generous cap

    def test_duplicates_counted(self):
        f = CuckooFilter(4, 64, 16)
        f.update(np.array([7, 7, 7]))
        assert len(f) == 3

    def test_delete(self):
        f = CuckooFilter(4, 256, 16, seed=1)
        f.update(np.arange(100))
        assert f.delete(np.array([5])).all()
        assert len(f) == 99
        # deleting again removes nothing once all copies are gone
        assert not f.delete(np.array([5])).any()
        present = f.query(np.arange(100))
        assert present.sum() >= 99  # 5 may still FP, everything else present

    def test_full_raises_and_rolls_back(self):
        f = CuckooFilter(2, 2, 8, seed=5)  # 4 slots total
        with pytest.raises(CuckooFilterFull):
            f.update(np.arange(100))
        # rollback: n_elements matches actually-stored fingerprints
        assert np.count_nonzero(f.table) == len(f)

    def test_union(self):
        a = CuckooFilter(4, 512, 16, seed=2)
        b = CuckooFilter(4, 512, 16, seed=2)
        a.update(np.arange(0, 300))
        b.update(np.arange(300, 600))
        a.merge(b)
        assert len(a) == 600
        assert a.query(np.arange(600)).all()

    def test_union_param_mismatch(self):
        with pytest.raises(SketchParamMismatch):
            CuckooFilter(4, 512, 16).merge(CuckooFilter(4, 256, 16))

    def test_union_full_restores(self):
        a = CuckooFilter(2, 2, 8, seed=5)
        b = CuckooFilter(2, 2, 8, seed=5)
        a.update(np.arange(3))
        b.update(np.arange(10, 13))
        before = a.to_bytes()
        with pytest.raises(CuckooFilterFull):
            a.merge(b)
        assert a.to_bytes() == before  # full state rollback (:514-555)

    def test_roundtrip_and_determinism(self):
        f = CuckooFilter(4, 1024, 12, seed=9)
        f.update(np.arange(2000))
        g = CuckooFilter.from_bytes(f.to_bytes())
        assert g.to_bytes() == f.to_bytes()
        g.update(np.arange(2000, 2100))
        f.update(np.arange(2000, 2100))
        assert g.to_bytes() == f.to_bytes()  # rng counter serialized
