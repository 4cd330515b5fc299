"""QuotientFilter kernel tests (reference: filters/quotientfilter.rs)."""

import numpy as np
import pytest

from sketchlib.codec import SketchParamMismatch
from sketchlib.quotient import QuotientFilter, QuotientFilterFull


class TestCtor:
    def test_bounds(self):
        with pytest.raises(ValueError):
            QuotientFilter(0, 4)
        with pytest.raises(ValueError):
            QuotientFilter(4, 0)
        with pytest.raises(ValueError):
            QuotientFilter(33, 32)  # q + r > 64


class TestOps:
    def test_insert_query(self):
        f = QuotientFilter(12, 10, seed=1)  # 4096 slots
        f.update(np.arange(2000))
        assert f.query(np.arange(2000)).all()  # zero false negatives
        fpr = f.query(np.arange(50_000, 60_000)).mean()
        # design FPR ≈ load / 2^r = 0.49/1024; generous cap
        assert fpr <= 0.01

    def test_dedup_len(self):
        f = QuotientFilter(8, 8, seed=2)
        f.update(np.array([5, 5, 5, 9]))
        assert len(f) == 2  # duplicate fingerprints not stored twice

    def test_full_raises(self):
        f = QuotientFilter(2, 16, seed=3)  # 4 slots
        with pytest.raises(QuotientFilterFull):
            f.update(np.arange(100))
        assert len(f) <= 4

    def test_union_matches_single(self):
        whole = QuotientFilter(12, 10, seed=4)
        whole.update(np.arange(1500))
        a = QuotientFilter(12, 10, seed=4)
        b = QuotientFilter(12, 10, seed=4)
        a.update(np.arange(0, 700))
        b.update(np.arange(700, 1500))
        a.merge(b)
        assert len(a) == len(whole)
        # identical stored fingerprint sets ⇒ identical decoded pairs
        assert sorted(a._iter_pairs()) == sorted(whole._iter_pairs())
        assert a.query(np.arange(1500)).all()

    def test_union_param_mismatch(self):
        with pytest.raises(SketchParamMismatch):
            QuotientFilter(8, 8).merge(QuotientFilter(8, 9))

    def test_union_full_restores(self):
        a = QuotientFilter(2, 30, seed=5)
        b = QuotientFilter(2, 30, seed=5)
        a.update(np.arange(3))
        b.update(np.arange(10, 14))
        before = a.to_bytes()
        with pytest.raises(QuotientFilterFull):
            a.merge(b)
        assert a.to_bytes() == before

    def test_roundtrip(self):
        f = QuotientFilter(10, 12, seed=6)
        f.update(np.arange(500))
        g = QuotientFilter.from_bytes(f.to_bytes())
        assert g.to_bytes() == f.to_bytes()
        assert g.query(np.arange(500)).all()
        g.update(np.arange(500, 600))
        f.update(np.arange(500, 600))
        assert g.to_bytes() == f.to_bytes()

    def test_wraparound_cluster(self):
        # force quotients near the top of the address space so clusters
        # wrap past index 0: insert many values and verify no FN
        f = QuotientFilter(4, 20, seed=7)  # 16 slots
        vals = np.arange(12)
        f.update(vals)
        assert f.query(vals).all()
        assert len(f) == len(set(f._iter_pairs()))