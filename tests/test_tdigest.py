"""t-digest kernel tests.

The tiny-case tables are ported verbatim from the reference — they are
hasher-independent exact interpolation goldens
(/root/reference/src/tdigest.rs:1374-1540). Distribution test mirrors
tdigest.rs:1335-1372; validation mirrors :927-937,1542-1630."""

import math

import numpy as np
import pytest

from sketchlib.codec import SketchParamMismatch
from sketchlib.tdigest import TDigest


def test_with_single():
    d = TDigest(100.0)
    d.update(np.array([13.37]))
    assert d.count() == 1.0
    assert d.sum() == 13.37
    assert d.mean() == 13.37
    assert d.min == 13.37 and d.max == 13.37
    assert d.n_centroids == 1
    assert d.quantile(0.0) == 13.37
    assert d.quantile(0.5) == 13.37
    assert d.quantile(1.0) == 13.37
    assert d.cdf(13.36) == 0.0
    assert d.cdf(13.37) == 1.0
    assert d.cdf(13.38) == 1.0


def test_with_two_symmetric():
    d = TDigest(100.0)
    d.update(np.array([10.0, 20.0]))
    assert d.count() == 2.0 and d.sum() == 30.0 and d.mean() == 15.0
    assert d.n_centroids == 2
    for q, e in [(0.0, 10.0), (0.25, 10.0), (0.375, 12.5), (0.5, 15.0),
                 (0.625, 17.5), (0.75, 20.0), (1.0, 20.0)]:
        assert d.quantile(q) == pytest.approx(e, abs=1e-12), q
    for x, e in [(10.0, 0.25), (12.5, 0.375), (15.0, 0.5), (17.5, 0.625), (20.0, 1.0)]:
        assert d.cdf(x) == pytest.approx(e, abs=1e-12), x


def test_with_two_asymmetric_weighted():
    d = TDigest(100.0)
    d.update(np.array([10.0, 20.0]), np.array([1.0, 9.0]))
    assert d.count() == 10.0 and d.sum() == 190.0 and d.mean() == 19.0
    assert d.n_centroids == 2
    for q, e in [(0.0, 10.0), (0.05, 10.0), (0.175, 12.5), (0.3, 15.0),
                 (0.425, 17.5), (0.55, 20.0), (1.0, 20.0)]:
        assert d.quantile(q) == pytest.approx(e, abs=1e-12), q
    for x, e in [(10.0, 0.05), (12.5, 0.175), (15.0, 0.3), (17.5, 0.425), (20.0, 1.0)]:
        assert d.cdf(x) == pytest.approx(e, abs=1e-12), x


def test_zero_weight_is_noop():
    d = TDigest(2.0)
    d.update(np.array([13.37]), np.array([0.0]))
    assert d.n_centroids == 0
    assert d.is_empty()
    assert math.isnan(d.quantile(0.5))
    assert d.cdf(13.37) == 0.0
    assert d.count() == 0.0 and d.sum() == 0.0
    assert math.isnan(d.mean())
    assert math.isinf(d.min) and d.min > 0
    assert math.isinf(d.max) and d.max < 0


def test_highly_compressed():
    d = TDigest(2.0)
    d.update(np.array([10.0, 20.0]))
    for _ in range(100):
        d.update(np.array([15.0]))
    assert d.count() == 102.0 and d.sum() == 1530.0 and d.mean() == 15.0
    assert d.n_centroids == 1
    for q, e in [(0.0, 10.0), (0.125, 11.25), (0.25, 12.5), (0.5, 15.0),
                 (0.75, 17.5), (0.875, 18.75), (1.0, 20.0)]:
        assert d.quantile(q) == pytest.approx(e, abs=1e-12), q
    for x, e in [(10.0, 0.0), (11.25, 0.125), (12.5, 0.25), (15.0, 0.5),
                 (17.5, 0.75), (18.75, 0.875), (20.0, 1.0)]:
        assert d.cdf(x) == pytest.approx(e, abs=1e-12), x


def test_normal_distribution():
    # reference tolerance: quantiles within 0.01 of N(0,1) truth, count
    # exact, mean within 1e-4, min/max exact (tdigest.rs:1335-1372)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(100_000)
    d = TDigest(100.0)
    for chunk in np.array_split(x, 10):
        d.update(chunk)
    for q, e in [(0.1, -1.2816), (0.25, -0.6745), (0.5, 0.0), (0.75, 0.6745), (0.9, 1.2816)]:
        assert abs(d.quantile(q) - e) < 0.01, q
    assert d.count() == 100_000.0
    assert abs(d.mean() - x.mean()) < 1e-4
    assert d.min == x.min() and d.max == x.max()
    assert d.n_centroids < 100  # compression actually compresses


def test_distributed_merge_accuracy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(100_000)
    parts = np.array_split(x, 32)
    digests = []
    for p in parts:
        d = TDigest(100.0)
        d.update(p)
        digests.append(d)
    m = digests[0]
    for d in digests[1:]:
        m.merge(d)
    assert m.count() == 100_000.0
    assert m.min == x.min() and m.max == x.max()
    for q, e in [(0.1, -1.2816), (0.5, 0.0), (0.9, 1.2816)]:
        assert abs(m.quantile(q) - e) < 0.02, q


@pytest.mark.parametrize("delta", [1.0, 0.5, -3.0, math.inf, math.nan])
def test_ctor_delta_bounds(delta):
    with pytest.raises(ValueError):
        TDigest(delta)


def test_input_validation():
    d = TDigest(100.0)
    with pytest.raises(ValueError):
        d.update(np.array([math.inf]))
    with pytest.raises(ValueError):
        d.update(np.array([math.nan]))
    with pytest.raises(ValueError):
        d.update(np.array([1.0]), np.array([-1.0]))
    with pytest.raises(ValueError):
        d.quantile(-0.1)
    with pytest.raises(ValueError):
        d.quantile(1.1)


def test_merge_param_mismatch_raises():
    with pytest.raises(SketchParamMismatch):
        TDigest(100.0).merge(TDigest(50.0))
    with pytest.raises(SketchParamMismatch):
        TDigest(100.0, scale="k1").merge(TDigest(100.0, scale="k2"))


@pytest.mark.parametrize("scale", ["k0", "k1", "k2", "k3"])
def test_all_scale_functions(scale):
    rng = np.random.default_rng(3)
    x = rng.random(50_000)
    d = TDigest(100.0, scale=scale)
    d.update(x)
    for q in (0.25, 0.5, 0.75):
        assert abs(d.quantile(q) - q) < 0.02, (scale, q)


def test_serde_roundtrip_then_continue():
    d = TDigest(100.0)
    d.update(np.arange(1000, dtype=np.float64))
    d2 = TDigest.from_bytes(d.to_bytes())
    assert np.array_equal(d.sums, d2.sums)
    assert np.array_equal(d.counts, d2.counts)
    assert d2.n_samples == d.n_samples
    d.update(np.arange(1000, 2000, dtype=np.float64))
    d2.update(np.arange(1000, 2000, dtype=np.float64))
    assert d.quantile(0.5) == d2.quantile(0.5)


def test_compression_stability_small_delta():
    # reference regression: δ=1.1 compaction stays stable (tdigest.rs:1663-1684)
    d = TDigest(1.1)
    rng = np.random.default_rng(5)
    for _ in range(50):
        d.update(rng.random(100))
    assert d.n_centroids <= 10
    assert d.count() == 5000.0
