"""DDSketch kernel: relative-error quantile guarantee at every rank,
merge ≡ whole-build byte-identity under any partitioning, codec
roundtrip, sign/zero handling, cap + param-mismatch failures (Masson et
al. VLDB'19; extra beyond the reference — SURVEY §2.6)."""

import numpy as np
import pytest

from sketchlib.codec import SketchParamMismatch
from sketchlib.ddsketch import DDSketch


def rel_err(est, true):
    return abs(est - true) / abs(true) if true else abs(est)


def check_quantiles(dd, values, qs=(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)):
    s = np.sort(values)
    n = values.size
    for q in qs:
        true = s[int(np.floor(q * (n - 1)))]
        est = dd.quantile(q)
        if true == 0.0:
            assert est == 0.0, (q, est)
        else:
            assert rel_err(est, true) <= dd.alpha + 1e-12, (q, est, true)


def test_relative_error_longtail():
    rng = np.random.default_rng(1)
    values = np.exp(rng.normal(5, 3, size=100_000))  # lognormal, 8 decades
    dd = DDSketch(alpha=0.01)
    dd.update(values)
    assert dd.count() == values.size
    check_quantiles(dd, values)


def test_signs_and_zeros():
    rng = np.random.default_rng(2)
    values = np.concatenate(
        [
            -np.exp(rng.normal(2, 2, size=30_000)),
            np.zeros(5_000),
            np.exp(rng.normal(2, 2, size=30_000)),
        ]
    )
    rng.shuffle(values)
    dd = DDSketch(alpha=0.02)
    for chunk in np.array_split(values, 7):
        dd.update(chunk)
    check_quantiles(dd, values)


def test_merge_byte_identical_to_whole_build():
    rng = np.random.default_rng(3)
    values = np.exp(rng.normal(0, 4, size=80_000)) * rng.choice(
        [-1.0, 0.0, 1.0], size=80_000, p=[0.3, 0.05, 0.65]
    )
    whole = DDSketch(alpha=0.01)
    whole.update(values)
    parts = []
    for chunk in np.array_split(values, 11):
        p = DDSketch(alpha=0.01)
        p.update(chunk)
        parts.append(p.to_bytes())
    order = rng.permutation(len(parts))
    acc = DDSketch.from_bytes(parts[order[0]])
    for i in order[1:]:
        acc.merge(DDSketch.from_bytes(parts[i]))
    assert acc.to_bytes() == whole.to_bytes()
    check_quantiles(acc, values, qs=(0.1, 0.5, 0.9))


def test_codec_roundtrip_and_failures():
    dd = DDSketch(alpha=0.05, max_buckets=512)
    dd.update(np.array([1.0, 2.0, 3.0, -4.0, 0.0]))
    rt = DDSketch.from_bytes(dd.to_bytes())
    assert rt.to_bytes() == dd.to_bytes()
    assert rt.n == 5 and rt.zero == 1 and rt.alpha == 0.05
    other = DDSketch(alpha=0.01)
    other.update(np.arange(1, 5, dtype=np.float64))
    with pytest.raises(SketchParamMismatch):
        dd.merge(other)
    with pytest.raises(ValueError):
        dd.update(np.array([np.nan]))
    with pytest.raises(ValueError):
        dd.quantile(1.5)
    with pytest.raises(ValueError):
        DDSketch(alpha=0.0)
    with pytest.raises(ValueError):
        DDSketch().quantile(0.5)  # empty


def test_cap_raises_loudly():
    dd = DDSketch(alpha=0.001, max_buckets=64)
    with pytest.raises(OverflowError):
        dd.update(np.exp(np.linspace(0, 20, 5000)))


def test_exact_on_tiny_inputs():
    dd = DDSketch(alpha=0.01)
    dd.update(np.array([42.0]))
    assert rel_err(dd.quantile(0.0), 42.0) <= 0.01
    assert rel_err(dd.quantile(1.0), 42.0) <= 0.01
    dd2 = DDSketch(alpha=0.01)
    dd2.update(np.zeros(3))
    assert dd2.quantile(0.5) == 0.0


def test_cdf_brackets_and_quantile_consistency():
    rng = np.random.default_rng(9)
    values = np.exp(rng.normal(2, 2, size=60_000))
    dd = DDSketch(alpha=0.01)
    dd.update(values)
    s = np.sort(values)
    for x in np.percentile(values, [1, 10, 50, 90, 99]):
        est = dd.cdf(x)
        lo = np.searchsorted(s, x / (1 + 2 * dd.alpha), side="right") / s.size
        hi = np.searchsorted(s, x * (1 + 2 * dd.alpha), side="right") / s.size
        assert lo - 1e-12 <= est <= hi + 1e-12, (x, est, lo, hi)
    # inverse consistency on the sketch's own readouts
    for q in (0.1, 0.5, 0.9):
        assert abs(dd.cdf(dd.quantile(q)) - q) <= 0.02
    with pytest.raises(ValueError):
        DDSketch().cdf(1.0)


def test_quantiles_batch_equals_per_q():
    rng = np.random.default_rng(12)
    values = np.exp(rng.normal(0, 3, size=40_000)) * rng.choice(
        [-1.0, 1.0], size=40_000
    )
    dd = DDSketch(alpha=0.01)
    dd.update(values)
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    batch = dd.quantiles(qs)
    assert batch.tolist() == [dd.quantile(q) for q in qs]
    with pytest.raises(ValueError):
        dd.quantiles([0.5, 1.5])
    with pytest.raises(ValueError):
        DDSketch().quantiles([0.5])
