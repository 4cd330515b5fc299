"""KLL quantile sketch tests — rank error ≤ ε·n at fixed seed, merge
associativity, serde (SURVEY.md §7.1 item 6; KLL is paper-sourced, not in
the reference)."""

import math

import numpy as np
import pytest

from sketchlib.codec import SketchParamMismatch
from sketchlib.kll import KLL


def _max_rank_error(sketch, sorted_data, qs=(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)):
    n = len(sorted_data)
    err = 0.0
    for q in qs:
        est = sketch.quantile(q)
        r = np.searchsorted(sorted_data, est) / n
        err = max(err, abs(r - q))
    return err


def test_rank_error_single():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(500_000)
    s = KLL(k=200)
    for chunk in np.array_split(x, 25):
        s.update(chunk)
    assert s.n == 500_000
    assert _max_rank_error(s, np.sort(x)) < 0.02


def test_rank_error_merged():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(500_000)
    parts = np.array_split(x, 16)
    sketches = []
    for p in parts:
        s = KLL(k=200)
        s.update(p)
        sketches.append(s)
    m = sketches[0]
    for s in sketches[1:]:
        m.merge(s)
    assert m.n == 500_000
    assert _max_rank_error(m, np.sort(x)) < 0.02


def test_exact_when_small():
    # below capacity nothing is compacted: quantiles are exact order stats
    s = KLL(k=200)
    s.update(np.arange(100, dtype=np.float64))
    assert s.quantile(0.0) == 0.0
    assert s.quantile(1.0) == 99.0
    assert abs(s.quantile(0.5) - 49.5) <= 1.0


def test_min_max_tracked():
    s = KLL(k=64)
    s.update(np.array([5.0, -3.0, 100.0]))
    assert s.min == -3.0 and s.max == 100.0
    assert s.quantile(0.0) == -3.0 and s.quantile(1.0) == 100.0


def test_rank_query():
    s = KLL(k=200)
    s.update(np.linspace(0, 1, 10_000))
    assert abs(s.rank(0.25) - 0.25) < 0.02
    assert abs(s.rank(0.9) - 0.9) < 0.02


def test_merge_param_mismatch_raises():
    with pytest.raises(SketchParamMismatch):
        KLL(k=128).merge(KLL(k=256))
    with pytest.raises(SketchParamMismatch):
        KLL(k=128, seed=1).merge(KLL(k=128, seed=2))


def test_ctor_bounds():
    with pytest.raises(ValueError):
        KLL(k=4)


def test_input_validation():
    s = KLL()
    with pytest.raises(ValueError):
        s.update(np.array([math.inf]))
    with pytest.raises(ValueError):
        s.quantile(2.0)
    assert math.isnan(s.quantile(0.5))  # empty


def test_serde_roundtrip_then_continue():
    s = KLL(k=128)
    s.update(np.arange(10_000, dtype=np.float64))
    s2 = KLL.from_bytes(s.to_bytes())
    assert s2.n == s.n
    assert s2.quantile(0.5) == s.quantile(0.5)
    s.update(np.arange(10_000, 20_000, dtype=np.float64))
    s2.update(np.arange(10_000, 20_000, dtype=np.float64))
    # same rng_counter stream ⇒ byte-identical continuation
    assert s.quantile(0.5) == s2.quantile(0.5)


def test_deterministic_given_seed():
    a, b = KLL(k=128, seed=9), KLL(k=128, seed=9)
    data = np.random.default_rng(0).random(100_000)
    for chunk in np.array_split(data, 10):
        a.update(chunk)
        b.update(chunk)
    assert a.quantile(0.5) == b.quantile(0.5)
    assert all(np.array_equal(x, y) for x, y in zip(a.levels, b.levels))
