"""LossyCounter / TopK / Reservoir kernel tests.

Mirrors the reference's inline test corpus (FIXTURES.md §2):
- skewed_mod10  → topk/cmsheap.rs:77-93, topk/lossycounter.rs:22-39
- lossy_tail    → topk/lossycounter.rs:359-373
- reservoir_parts → reservoirsampling.rs:208-222
"""

import numpy as np
import pytest

from sketchlib import LossyCounter, Reservoir, TopK
from sketchlib.codec import SketchParamMismatch


def skewed_mod10(n=1000):
    i = np.arange(n, dtype=np.int64)
    j = i % 10
    return np.where(j < 4, 0, np.where(j < 7, 1, i))


def lossy_tail(n=1000):
    i = np.arange(n, dtype=np.int64)
    j = i % 10
    return np.where(j <= 6, i, j)


# ---------------------------------------------------------------- lossy


class TestLossyCounter:
    def test_ctor_bounds(self):
        for eps in (0.0, 1.0, -0.1):
            with pytest.raises(ValueError):
                LossyCounter(eps)

    def test_heavy_hitters_skewed(self):
        lc = LossyCounter(0.01)
        lc.update(skewed_mod10())
        items, f = lc.query(0.2)
        assert set(items.tolist()) == {0, 1}

    def test_tail_query(self):
        # j in {7,8,9} each appear 100× (10%); others unique
        lc = LossyCounter(0.01)
        lc.update(lossy_tail())
        items, _ = lc.query(0.05)
        assert set(items.tolist()) == {7, 8, 9}

    def test_undercount_bound(self):
        data = skewed_mod10(5000)
        lc = LossyCounter(0.01)
        lc.update(data)
        items, f = lc.query(0.2)
        exact = {v: int((data == v).sum()) for v in items.tolist()}
        for it, fv in zip(items.tolist(), f.tolist()):
            assert fv <= exact[it]  # never overcounts
            assert fv >= exact[it] - lc.epsilon * lc.n  # bounded undercount

    def test_merge_superset_guarantee(self):
        data = lossy_tail(4000)
        parts = np.array_split(data, 7)
        lcs = [LossyCounter(0.01) for _ in parts]
        for lc, p in zip(lcs, parts):
            lc.update(p)
        merged = lcs[0]
        for lc in lcs[1:]:
            merged.merge(lc)
        assert merged.n == data.size
        items, f = merged.query(0.05)
        # heavy hitters {7,8,9} (10% each) must survive the merge
        assert {7, 8, 9} <= set(items.tolist())
        # and nothing below (theta - eps) sneaks in
        exact_all = {v: int((data == v).sum()) for v in set(items.tolist())}
        for it in items.tolist():
            assert exact_all[it] >= (0.05 - 2 * merged.epsilon) * merged.n

    def test_merge_param_mismatch(self):
        with pytest.raises(SketchParamMismatch):
            LossyCounter(0.01).merge(LossyCounter(0.02))

    def test_roundtrip(self):
        lc = LossyCounter(0.02)
        lc.update(skewed_mod10())
        lc2 = LossyCounter.from_bytes(lc.to_bytes())
        assert lc2.n == lc.n
        np.testing.assert_array_equal(lc2.items, lc.items)
        np.testing.assert_array_equal(lc2.f, lc.f)
        np.testing.assert_array_equal(lc2.delta, lc.delta)
        assert lc2.to_bytes() == lc.to_bytes()

    def test_batch_order_windows(self):
        # many small batches == one big batch (same windows)
        data = lossy_tail(3000)
        a = LossyCounter(0.01)
        a.update(data)
        b = LossyCounter(0.01)
        for chunk in np.array_split(data, 17):
            b.update(chunk)
        assert a.to_bytes() == b.to_bytes()


# ---------------------------------------------------------------- topk


class TestTopK:
    def test_ctor_bounds(self):
        with pytest.raises(ValueError):
            TopK(0)

    def test_topk_skewed(self):
        tk = TopK(k=2, w=2048, d=4)
        tk.update(skewed_mod10())
        items, counts = tk.query()
        assert items.tolist() == [0, 1]  # 400× and 300×
        assert counts[0] >= 400 and counts[1] >= 300  # CMS never undercounts

    def test_merge_equals_whole_on_heavy_items(self):
        # candidate trimming is stream-order dependent (like the
        # reference's CMSHeap heap evictions, cmsheap.rs:156-211), so the
        # contract is: the true heavy hitters and their CMS counts agree
        # (CMS merge itself is an exact elementwise sum)
        data = skewed_mod10(5000)
        whole = TopK(k=2, w=4096, d=4)
        whole.update(data)
        parts = np.array_split(data, 9)
        merged = None
        for p in parts:
            tk = TopK(k=2, w=4096, d=4)
            tk.update(p)
            merged = tk if merged is None else merged.merge(tk)
        wi, wc = whole.query()
        mi, mc = merged.query()
        np.testing.assert_array_equal(wi, mi)
        np.testing.assert_array_equal(wc, mc)
        assert mi.tolist() == [0, 1]

    def test_roundtrip(self):
        tk = TopK(k=5, w=512, d=3)
        tk.update(skewed_mod10())
        tk2 = TopK.from_bytes(tk.to_bytes())
        assert tk2.to_bytes() == tk.to_bytes()
        np.testing.assert_array_equal(tk2.query()[0], tk.query()[0])


# ---------------------------------------------------------------- reservoir


class TestReservoir:
    def test_ctor_bounds(self):
        with pytest.raises(ValueError):
            Reservoir(0)

    def test_fill_and_size(self):
        r = Reservoir(100, seed=7)
        r.update(np.arange(40))
        assert r.sample.size == 40 and r.n == 40
        r.update(np.arange(40, 5000))
        assert r.sample.size == 100 and r.n == 5000

    def test_proportion(self):
        # reference fixture: 1500×0, 7500×1, 1000×0, k=100 → ≈75 ones ±5
        data = np.concatenate([np.zeros(1500), np.ones(7500), np.zeros(1000)])
        r = Reservoir(100, seed=3)
        for chunk in np.array_split(data, 13):
            r.update(chunk)
        ones = int(r.sample.sum())
        assert 65 <= ones <= 85

    def test_merge_proportion(self):
        rs = []
        for i, (val, cnt) in enumerate([(0, 1500), (1, 7500), (0, 1000)]):
            r = Reservoir(100, seed=3)
            r.update(np.full(cnt, val, dtype=np.float64))
            rs.append(r)
        merged = rs[0]
        for r in rs[1:]:
            merged.merge(r)
        assert merged.n == 10000 and merged.sample.size == 100
        ones = int(merged.sample.sum())
        assert 60 <= ones <= 90

    def test_uniformity_chi2ish(self):
        # sample from 0..9999: mean of sample ≈ population mean within 3 SEM
        r = Reservoir(400, seed=11)
        r.update(np.arange(10000, dtype=np.float64))
        sem = 10000 / np.sqrt(12) / np.sqrt(400)
        assert abs(r.sample.mean() - 4999.5) < 4 * sem

    def test_determinism_and_roundtrip(self):
        a, b = Reservoir(50, seed=5), Reservoir(50, seed=5)
        data = np.arange(3000, dtype=np.float64)
        a.update(data)
        b.update(data)
        assert a.to_bytes() == b.to_bytes()
        c = Reservoir.from_bytes(a.to_bytes())
        assert c.to_bytes() == a.to_bytes()

    def test_merge_param_mismatch(self):
        with pytest.raises(SketchParamMismatch):
            Reservoir(10, seed=1).merge(Reservoir(10, seed=2))
