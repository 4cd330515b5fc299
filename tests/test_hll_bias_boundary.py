"""HLL++ bias-correction boundary sweep (VERDICT r01 item 6).

The reference's estimate_bias is an expanding 6-NN search seeded by a
binary search (hyperloglog/mod.rs:209-272) with two load-bearing
quirks: an exact table hit is counted TWICE in the neighbor mean, and
the seed search has Rust ``binary_search_by`` semantics (early return
on a probed midpoint), which matters where the raw tables are not
strictly monotonic. These tests pin sketchlib's port against an
independently written oracle on every precision's table boundaries,
replicate the reference's own neighbor_search_startpoints expectations
(mod.rs:705-731), and replay the issue-74 crash regime (estimate far
beyond the p=4 table's right end, mod.rs:631-698).
"""

import numpy as np
import pytest

from sketchlib.hll import _BIAS, _RAW_ESTIMATE, HLL


def rust_binary_search(arr, e):
    """Independent replica of Rust slice::binary_search_by."""
    left, right = 0, len(arr)
    while left < right:
        mid = (left + right) // 2
        if arr[mid] < e:
            left = mid + 1
        elif arr[mid] > e:
            right = mid
        else:
            return True, mid
    return False, left


def startpoints(arr, e):
    ok, i = rust_binary_search(arr, e)
    if ok:
        return i, i
    if i == 0:
        return None, 0
    if i == len(arr):
        return len(arr) - 1, None
    return i - 1, i


def oracle_bias(p, e):
    """Expanding search oracle, written independently of hll.py."""
    raw = _RAW_ESTIMATE[p]
    bias = _BIAS[p]
    il, ir = startpoints(raw, e)
    picks = []
    for _ in range(6):
        if il is not None and ir is not None:
            if abs(raw[ir] - e) < abs(raw[il] - e):
                picks.append(ir)
                ir = ir + 1 if ir < raw.size - 1 else None
            else:
                picks.append(il)
                il = il - 1 if il > 0 else None
        elif il is not None:
            picks.append(il)
            il = il - 1 if il > 0 else None
        else:
            picks.append(ir)
            ir = ir + 1 if ir < raw.size - 1 else None
    return float(np.mean([bias[i] for i in picks]))


def probes_for(p):
    raw = _RAW_ESTIMATE[p]
    out = [float(raw[0]) - 5.0, float(raw[0]), float(raw[-1]), float(raw[-1]) + 5.0,
           float(raw[-1]) * 2.0]
    out += [float(x) for x in raw[:8]] + [float(x) for x in raw[-8:]]
    out += [float((raw[i] + raw[i + 1]) / 2) for i in range(7)]
    out += [float((raw[i] + raw[i + 1]) / 2) for i in range(raw.size - 8, raw.size - 1)]
    rng = np.random.default_rng(p)
    lo, hi = float(raw[0]), float(raw[-1])
    out += [float(x) for x in rng.uniform(lo, hi, 40)]
    return out


@pytest.mark.parametrize("p", range(4, 19))
def test_bias_matches_reference_semantics_everywhere(p):
    h = HLL(p)
    for e in probes_for(p):
        assert h._estimate_bias(e) == pytest.approx(oracle_bias(p, e), abs=1e-12), (p, e)


def test_exact_hit_double_counts_neighbor():
    """mod.rs Ok(i) => (Some(i), Some(i)): first pick is i (left tie
    preference) WITHOUT advancing the right pointer, so i is used twice."""
    p = 4
    raw, bias = _RAW_ESTIMATE[p], _BIAS[p]
    e = float(raw[0])  # 11.0 per the reference table
    # expected picks: 0, 0, 1, 2, 3, 4
    expected = (2 * bias[0] + bias[1] + bias[2] + bias[3] + bias[4]) / 6.0
    assert HLL(p)._estimate_bias(e) == pytest.approx(float(expected), abs=1e-12)


def test_reference_startpoint_expectations():
    """The reference's own neighbor_search_startpoints test values for
    b=4 (mod.rs:705-731) — also pins the shipped table data."""
    raw = _RAW_ESTIMATE[4]
    assert startpoints(raw, 0.0) == (None, 0)
    assert startpoints(raw, 100.0) == (78, None)
    assert startpoints(raw, 20.0) == (14, 15)
    assert startpoints(raw, 11.0) == (0, 0)
    assert startpoints(raw, 77.2394) == (78, 78)
    assert startpoints(raw, 13.2882) == (4, 4)


def test_issue_74_regime():
    """56 distinct items into HLL(p=4): the bias-corrected estimate sits
    beyond the p=4 raw table's right end — the reference's issue-74
    crash. count() must return something sane, not raise."""
    h = HLL(4)
    h.update(np.arange(56, dtype=np.int64))
    c = h.count()
    assert 0 < c < 200


@pytest.mark.parametrize("p", [4, 8, 12, 14])
def test_count_sweep_no_crash_and_bounded(p):
    """Cardinality sweep across the bias-correction regime boundary
    (e <= 5m vs beyond) at several precisions."""
    m = 1 << p
    for n in [1, 2, m // 4, m, 2 * m, 5 * m, 10 * m]:
        h = HLL(p, seed=1)
        h.update(np.arange(n, dtype=np.int64))
        c = h.count()
        err = 4 * 1.04 / np.sqrt(m)
        assert abs(c - n) <= max(err * n, 6.0), (p, n, c)
