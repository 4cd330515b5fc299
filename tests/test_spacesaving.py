"""SpaceSaving / Misra–Gries kernel: undercount + err-bound + superset
guarantees on skewed streams, merge commutativity in bytes and validity
under arbitrary split/merge-tree shapes, codec roundtrip, pre-agg
equivalence (guarantees per Metwally et al. ICDT'05; mergeability per
Agarwal et al. PODS'12 — extra beyond the reference's src/topk/)."""

import numpy as np
import pytest

from sketchlib.codec import SketchParamMismatch
from sketchlib.topk import SpaceSaving


def zipf_stream(n, n_keys, a, seed):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(a, size=n).astype(np.int64)
    return np.minimum(ranks, n_keys)  # clamp tail into the key domain


def exact_counts(values):
    uniq, counts = np.unique(values, return_counts=True)
    return dict(zip(uniq.tolist(), counts.tolist()))


def check_guarantees(ss, values, phi):
    true = exact_counts(values)
    n = values.size
    assert ss.n == n
    # error ledger bound: err <= n / (m + 1)
    assert ss.err <= n // (ss.m + 1) + (n % (ss.m + 1) > 0)
    stored = dict(zip(ss.items.tolist(), ss.f.astype("int64").tolist()))
    for item, f in stored.items():
        t = true.get(item, 0)
        assert f <= t, (item, f, t)  # never overcounts
        assert t - f <= ss.err, (item, f, t, ss.err)  # undercount bounded
    # unmonitored items have true count <= err
    for item, t in true.items():
        if item not in stored:
            assert t <= ss.err, (item, t, ss.err)
    # query(phi) is a superset of the true phi-heavy hitters whenever
    # the detection precondition err < ceil(phi*n) holds (it always
    # does once m >= ceil(1/phi); asserted rather than skipped here)
    got_items, got_f = ss.query(phi)
    got = set(got_items.tolist())
    if n:
        assert ss.err < max(int(np.ceil(phi * n)), 1) or ss.m + 1 < 1.0 / phi
        hh_true = {i for i, t in true.items() if t >= phi * n}
        if ss.err < int(np.ceil(phi * n)):
            assert hh_true <= got, hh_true - got
    # reported f are the stored (undercounting) counts, item-sorted
    assert np.all(np.diff(got_items) > 0)
    for i, f in zip(got_items.tolist(), got_f.tolist()):
        assert stored[i] == f


def test_guarantees_on_zipf():
    values = zipf_stream(200_000, 50_000, 1.3, seed=1)
    ss = SpaceSaving(m=199)
    for chunk in np.array_split(values, 13):
        ss.update(chunk)
    check_guarantees(ss, values, phi=0.02)
    assert len(ss.items) <= ss.m


def test_guarantees_on_uniform_adversarial():
    # near-uniform data: nothing is heavy; superset may be empty, bounds
    # must still hold and the table must stay within m entries
    rng = np.random.default_rng(2)
    values = rng.integers(0, 100_000, size=150_000)
    ss = SpaceSaving(m=63)
    ss.update(values)
    check_guarantees(ss, values, phi=0.01)
    assert len(ss.items) <= ss.m


def test_single_batch_matches_update_unique():
    values = zipf_stream(30_000, 5_000, 1.5, seed=3)
    a = SpaceSaving(m=99)
    a.update(values)
    uniq, counts = np.unique(values, return_counts=True)
    b = SpaceSaving(m=99)
    b.update_unique(uniq, counts)
    assert a.to_bytes() == b.to_bytes()


def test_merge_commutative_in_bytes_and_valid_any_tree():
    values = zipf_stream(120_000, 20_000, 1.2, seed=4)
    parts = []
    for chunk in np.array_split(values, 9):
        p = SpaceSaving(m=149)
        p.update(chunk)
        parts.append(p.to_bytes())
    a, b = SpaceSaving.from_bytes(parts[0]), SpaceSaving.from_bytes(parts[1])
    ab = SpaceSaving.from_bytes(parts[0]).merge(SpaceSaving.from_bytes(parts[1]))
    ba = SpaceSaving.from_bytes(parts[1]).merge(SpaceSaving.from_bytes(parts[0]))
    assert ab.to_bytes() == ba.to_bytes()  # pairwise merge is byte-commutative
    # any merge-tree shape keeps every guarantee (estimate-equivalence)
    rng = np.random.default_rng(5)
    for _ in range(3):
        order = rng.permutation(len(parts))
        blobs = [parts[i] for i in order]
        while len(blobs) > 1:
            i = int(rng.integers(0, len(blobs) - 1))
            merged = SpaceSaving.from_bytes(blobs[i]).merge(
                SpaceSaving.from_bytes(blobs[i + 1])
            )
            blobs[i : i + 2] = [merged.to_bytes()]
        check_guarantees(SpaceSaving.from_bytes(blobs[0]), values, phi=0.02)


def test_codec_roundtrip_and_param_mismatch():
    ss = SpaceSaving(m=31)
    ss.update(zipf_stream(10_000, 1_000, 1.4, seed=6))
    rt = SpaceSaving.from_bytes(ss.to_bytes())
    assert rt.to_bytes() == ss.to_bytes()
    assert rt.m == 31 and rt.n == ss.n and rt.err == ss.err
    other = SpaceSaving(m=32)
    other.update(np.arange(10))
    with pytest.raises(SketchParamMismatch):
        ss.merge(other)


def test_empty_and_small():
    ss = SpaceSaving(m=8)
    assert ss.is_empty()
    items, f = ss.query(0.1)
    assert items.size == 0 and f.size == 0
    ss.update(np.empty(0, dtype=np.int64))
    assert ss.is_empty() and ss.err == 0
    # fewer distinct items than m: exact counts, zero error
    ss.update(np.array([5, 5, 7, 9, 5], dtype=np.int64))
    assert ss.err == 0 and ss.n == 5
    assert exact_counts(np.array([5, 5, 7, 9, 5])) == dict(
        zip(ss.items.tolist(), ss.f.astype("int64").tolist())
    )
    with pytest.raises(ValueError):
        SpaceSaving(m=0)


def test_top_k_readout():
    values = np.concatenate(
        [np.full(100, 1), np.full(60, 2), np.full(30, 3), np.arange(100, 200)]
    ).astype(np.int64)
    ss = SpaceSaving(m=50)
    ss.update(values)
    items, f = ss.top(2)
    assert items.tolist() == [1, 2]
    assert f[0] >= f[1]
